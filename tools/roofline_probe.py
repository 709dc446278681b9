"""Measure the three hardware floors docs/PERF.md's roofline argument
rests on, on the actual chip (VERDICT r4 #5: hardware-grounded numbers,
not datasheet/cost-model ones):

  1. streaming bandwidth: x = x + b at 512 MB operands -> achieved GB/s
     (the practical "peak BW" for this chip/runtime, to compare against
     the 819 GB/s v5e datasheet figure);
  2. random-gather latency: pointer-chase idx = table[idx] at 4.2M
     indices (the disturbance sample gather's index count) -> ns/index;
  3. i32 key+payload sort throughput at 4.2M and 20.8M elements (the
     disturbance and binning sorts' shapes) -> ms.

Each probe runs K iterations INSIDE one jitted `lax.fori_loop` with a
carried data dependency, so the number is pure device execution — no
per-call dispatch/tunnel latency (the axon remote platform adds large
and variable per-dispatch costs that poison host-side loops in either
direction; bench.py's back-to-back dispatch pipeline hides them, a
serial host loop cannot).

The results are the *floors* the train step's ops compete with — if an
op in the step trace sits at its probe floor, no bandwidth-style
optimization can move it; only removing the op can.

Usage: python tools/roofline_probe.py [--json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _time_loop(loop_fn, init, iters):
    """Run jit(fori_loop(iters, body)) twice (compile + measure) and
    return seconds per body iteration."""
    import jax

    out = loop_fn(init)           # compile + warmup
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = loop_fn(init)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", action="store_true")
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    import bench
    bench._enable_compile_cache()

    dev = jax.devices()[0]
    res = {"device_kind": dev.device_kind}
    K = args.iters

    # 1) streaming: x = x + b, 128M f32 (512 MB) each; 3 passes/iter
    n = 128 * 1024 * 1024
    b = jnp.ones((n,), jnp.float32)

    @jax.jit
    def stream(x):
        return lax.fori_loop(0, K, lambda i, v: v + b, x)

    dt, _ = _time_loop(stream, jnp.zeros((n,), jnp.float32), K)
    res["stream_gbps"] = round(3 * 4 * n / dt / 1e9, 1)

    # 2) random gather: vectorized pointer-chase through a 4.2M-entry
    #    random permutation — every iteration is one 4.2M-index gather
    #    whose indices depend on the previous one
    m = 16 * 512 * 512
    rng = np.random.default_rng(0)
    perm = jnp.asarray(rng.permutation(m).astype(np.int32))
    idx0 = jnp.asarray(rng.integers(0, m, size=m, dtype=np.int32))

    @jax.jit
    def chase(ix):
        return lax.fori_loop(0, K, lambda i, v: perm[v], ix)

    dt, _ = _time_loop(chase, idx0, K)
    res["gather_ns_per_index"] = round(dt / m * 1e9, 2)
    res["gather_4p2m_ms"] = round(dt * 1e3, 2)

    # 3) sorts: i32 key + i32 payload; keys re-randomized each iteration
    #    by a wrapping odd-constant multiply (bijective, so the key
    #    distribution stays uniform; TPU sorts are data-independent
    #    bitonic networks anyway)
    for label, k in (("sort_4p2m_ms", m), ("sort_20p8m_ms", 5 * m)):
        keys0 = jnp.asarray(rng.integers(0, 1 << 30, size=k, dtype=np.int32))
        pay0 = jnp.asarray(np.arange(k, dtype=np.int32))

        @jax.jit
        def sort_loop(state):
            def body(i, st):
                kk, pp = st
                mult = np.int32(np.uint32(2654435761).view(np.int32))
                kk, pp = lax.sort((kk * mult, pp), num_keys=1)
                return kk, pp
            return lax.fori_loop(0, K, body, state)

        dt, _ = _time_loop(sort_loop, (keys0, pay0), K)
        res[label] = round(dt * 1e3, 2)

    if args.json:
        print(json.dumps(res))
    else:
        for kk, v in res.items():
            print(f"{kk}: {v}")


if __name__ == "__main__":
    main()

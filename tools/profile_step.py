"""Trace one compiled training step on TPU and print the op-cost table.

Reproduces the perfetto-trace workflow behind docs/PERF.md: build the
bench.py workload (rgb_sequential_tracking, bs=16, 512^2, tex 2048), trace
a few steps with jax.profiler, then aggregate device-side op durations by
fusion/kernel name directly from the trace protobuf (.xplane.pb via
tensorboard_plugin_profile is unavailable here, so the trace-event json is
parsed instead).

Usage: python tools/profile_step.py [--steps 5] [--out /tmp/vhap_trace]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_step():
    import jax
    import jax.numpy as jnp
    import numpy as np

    import bench

    bench._enable_compile_cache()
    from vhap_tpu.config.base import BaseTrackingConfig
    from vhap_tpu.model.flame import FlameHead, FlameTexPainted
    from vhap_tpu.tracker import params as P
    from vhap_tpu.tracker.energy import make_albedo_fn, make_energy_fn
    from vhap_tpu.tracker.optim import (leaf_learning_rates, make_train_step,
                                        stage_optimizable_leaves)

    H, W = bench.IMAGE
    B, T = bench.BATCH_SIZE, 64
    cfg = BaseTrackingConfig()
    cfg.model.tex_resolution = bench.TEX_RES
    cfg.model.use_static_offset = True
    cfg.batch_size = B
    cfg.__post_init__()
    head = FlameHead.build(
        n_shape=cfg.model.n_shape, n_expr=cfg.model.n_expr,
        add_teeth=cfg.model.add_teeth, face_clusters=cfg.model.tex_clusters)
    get_albedo = make_albedo_fn(
        cfg, FlameTexPainted(head.assets.tex_painted, bench.TEX_RES), None)
    params = P.init_params(
        T, cfg.model.n_shape, cfg.model.n_expr, cfg.model.n_tex,
        head.num_verts, bench.TEX_RES, cfg.model.tex_painted,
        cfg.model.tex_extra, True, cfg.model.use_static_offset, False, False)
    params["translation"] = params["translation"].at[:, 2].set(0.0)

    stage = "rgb_sequential_tracking"
    energy = make_energy_fn(head, cfg, get_albedo, (H, W), T, stage)
    opt_leaves = stage_optimizable_leaves(cfg, stage, params)
    init_fn, step_fn = make_train_step(energy, opt_leaves,
                                       leaf_learning_rates(cfg))
    opt_state = init_fn(params)

    rng = np.random.default_rng(0)
    batch = {
        "rgb": jnp.asarray(rng.uniform(size=(B, H, W, 3)).astype(np.float32)),
        "lmk2d": jnp.asarray(np.concatenate(
            [rng.uniform(0, W, (B, 70, 2)), np.ones((B, 70, 1))],
            -1).astype(np.float32)),
        "timestep_index": jnp.asarray(np.arange(B) % T, jnp.int32),
        "weight": jnp.ones((B,), jnp.float32),
    }
    key = jax.random.PRNGKey(0)
    return step_fn, params, opt_state, batch, key


def aggregate_trace(trace_dir: str, n_steps: int):
    """Sum device-op durations from the trace-viewer json.gz."""
    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        print("no trace json found under", trace_dir)
        return
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    by_name = defaultdict(float)
    device_pids = set()
    for ev in data.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            name = ev.get("args", {}).get("name", "")
            if "TPU" in name or "/device:" in name or "XLA" in name:
                device_pids.add(ev["pid"])
    for ev in data.get("traceEvents", []):
        if ev.get("ph") == "X" and ev.get("pid") in device_pids:
            by_name[ev.get("name", "?")] += ev.get("dur", 0.0)
    total = sum(by_name.values())
    print(f"\n== device op totals over {n_steps} steps "
          f"(us, from {os.path.basename(path)}) ==")
    for name, dur in sorted(by_name.items(), key=lambda kv: -kv[1])[:45]:
        print(f"{dur / n_steps:12.0f}  {100 * dur / total:5.1f}%  {name[:110]}")
    print(f"{total / n_steps:12.0f}  total device us/step")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--out", default="/tmp/vhap_trace")
    args = ap.parse_args()

    import jax

    step_fn, params, opt_state, batch, key = build_step()
    import jax.numpy as jnp
    lrf = jnp.asarray(1.0)
    params, opt_state, E, log = step_fn(params, opt_state, batch, key, lrf)
    jax.block_until_ready(E)

    import time
    t0 = time.perf_counter()
    with jax.profiler.trace(args.out):
        for _ in range(args.steps):
            params, opt_state, E, log = step_fn(params, opt_state, batch,
                                                key, lrf)
        jax.block_until_ready(E)
    dt = (time.perf_counter() - t0) / args.steps
    print(f"step time: {dt * 1e3:.1f} ms")
    aggregate_trace(args.out, args.steps)


if __name__ == "__main__":
    main()

"""Hardware check of the multi-chip code path (VERDICT r3 #4).

Two checks, both over the REAL shard_map + compiled-Pallas path (the same
code dryrun_multichip exercises in interpret mode on virtual CPU devices):

1. ``--mode tpu1``: on the real TPU chip, jit the full photometric train
   step over ``mesh = make_mesh(jax.devices()[:1])`` — shard_map'd Pallas
   kernels, compiled (NOT interpret) — run one step, and assert the
   energy and updated parameters numerically match the mesh-free step on
   identical inputs. This proves the multi-chip program COMPILES AND RUNS
   on hardware; N>1 only changes the collective sizes.

2. ``--mode hlo8``: self-provision 8 virtual CPU devices in a child
   process, compile the same 8-way step, and inspect the optimized HLO
   for the expected cross-chip collectives: the batch->replicated
   gradient all-reduce and the texel-scatter psum from shard_map's
   transpose. Prints every all-reduce with its shape; fails if none
   reduce a tensor of the mip-pyramid/parameter sizes (which would mean
   GSPMD silently replicated the 33M-tap scatter instead of reducing it).

Default mode ``both`` runs 1 then 2. Output is JSON-per-line; commit the
result into docs/PERF.md.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

H, W, T, TEX = 128, 256, 8, 256


def _setup(B):
    import __graft_entry__ as g
    cfg, head, get_albedo, params = g._build_small(
        n_shape=30, n_expr=10, tex_res=TEX, image=(H, W), T=T)
    cfg.batch_size = B
    cfg.render.backend = "pallas"
    cfg.render.texture_grad_impl = "pallas"
    batch = g._make_batch(B, H, W, T)
    return cfg, head, get_albedo, params, batch


def _make_step(cfg, head, get_albedo, params, mesh):
    from vhap_tpu.tracker.energy import make_energy_fn
    from vhap_tpu.tracker.optim import (leaf_learning_rates, make_train_step,
                                        stage_optimizable_leaves)
    stage = "rgb_sequential_tracking"
    energy = make_energy_fn(head, cfg, get_albedo, (H, W), T, stage,
                            mesh=mesh)
    opt_leaves = stage_optimizable_leaves(cfg, stage, params)
    init_fn, step_fn = make_train_step(energy, opt_leaves,
                                       leaf_learning_rates(cfg))
    return init_fn, step_fn


def run_tpu1():
    """Mesh(1) shard_map step on the real chip vs the mesh-free step."""
    import jax
    import jax.numpy as jnp

    from vhap_tpu.parallel.sharding import (make_mesh, replicate_tree,
                                            shard_batch)

    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
    dev = jax.devices()[0]
    assert "TPU" in dev.device_kind.upper() or "tpu" in str(dev).lower(), \
        f"run_tpu1 expects a TPU device, got {dev.device_kind}"

    B = 4
    cfg, head, get_albedo, params, batch = _setup(B)
    key = __import__("jax").random.PRNGKey(0)
    # the step donates params/opt_state: keep host copies so both runs
    # start from identical inputs
    params_np = {k: np.asarray(v) for k, v in params.items()}
    fresh = lambda: {k: jnp.asarray(v) for k, v in params_np.items()}

    # mesh-free step
    init_fn, step_fn = _make_step(cfg, head, get_albedo, params, mesh=None)
    p0 = fresh()
    t0 = time.time()
    p1, s1, E1, _ = step_fn(p0, init_fn(p0), dict(batch), key,
                            jnp.asarray(1.0))
    jax.block_until_ready(E1)
    t_free = time.time() - t0
    p1 = {k: np.asarray(v) for k, v in p1.items()}

    # mesh(1) shard_map step — same code path multi-chip runs
    mesh = make_mesh(jax.devices()[:1])
    init_fn2, step_fn2 = _make_step(cfg, head, get_albedo, params, mesh=mesh)
    pm = replicate_tree(fresh(), mesh)
    bm = shard_batch(dict(batch), mesh)
    km = replicate_tree(key, mesh)
    t0 = time.time()
    p2, s2, E2, _ = step_fn2(pm, replicate_tree(init_fn2(fresh()), mesh), bm,
                             km, jnp.asarray(1.0))
    jax.block_until_ready(E2)
    t_mesh = time.time() - t0

    e1, e2 = float(E1), float(E2)
    rel = abs(e1 - e2) / max(abs(e1), 1e-12)
    leaf_rel = {}
    for k in sorted(p1):
        a, b = np.asarray(p1[k], np.float32), np.asarray(p2[k], np.float32)
        denom = max(float(np.abs(a).max()), 1e-12)
        leaf_rel[k] = float(np.abs(a - b).max() / denom)
    worst = max(leaf_rel, key=leaf_rel.get)
    result = {
        "check": "tpu_mesh1_vs_meshfree",
        "device": dev.device_kind,
        "E_meshfree": e1, "E_mesh1": e2, "E_rel_err": rel,
        "param_update_rel_err_worst": {worst: leaf_rel[worst]},
        "t_first_call_meshfree_s": round(t_free, 1),
        "t_first_call_mesh1_s": round(t_mesh, 1),
        "ok": bool(rel < 1e-3 and leaf_rel[worst] < 1e-2),
    }
    print(json.dumps(result), flush=True)
    assert result["ok"], result
    return result


def run_hlo8_child():
    """Child (8 virtual CPU devices): compile the 8-way step, print the
    all-reduce inventory of the optimized HLO."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from vhap_tpu.parallel.sharding import (make_mesh, replicate_tree,
                                            shard_batch)

    n = 8
    assert len(jax.devices()) >= n, len(jax.devices())
    mesh = make_mesh(jax.devices()[:n])
    B = n
    cfg, head, get_albedo, params, batch = _setup(B)
    # CPU has no Mosaic: interpret-mode kernels; the shard_map structure —
    # and therefore the collectives GSPMD emits — is identical to TPU.
    cfg.render.interp_impl = "fused_interpret"
    key = jax.random.PRNGKey(0)

    init_fn, step_fn = _make_step(cfg, head, get_albedo, params, mesh=mesh)
    pm = replicate_tree(dict(params), mesh)
    sm = replicate_tree(init_fn(params), mesh)
    bm = shard_batch(dict(batch), mesh)
    km = replicate_tree(key, mesh)
    compiled = step_fn.lower(pm, sm, bm, km, jnp.asarray(1.0)).compile()
    hlo = compiled.as_text()

    # every all-reduce with its (possibly variadic-tuple) result shape,
    # e.g. `%ar = (f32[8,10]{1,0}, f32[87381,3]{1,0}, f32[]) all-reduce(`
    ars = re.findall(r"= (\([^=]*?\)|\S+) all-reduce\(", hlo)
    # expected reductions: (a) parameter-gradient all-reduces (leaf shapes,
    # e.g. f32[8,V,3] offsets / f32[30] shape), (b) the texture-gradient
    # reduce whose payload is mip-pyramid sized (sum of TEX_l^2 texels)
    def _components(s):
        out = []
        for dims in re.findall(r"\w+\[([0-9,]*)\]", s):
            if dims == "":
                out.append(1)
            else:
                out.append(int(np.prod([int(d) for d in dims.split(",")])))
        return out or [1]

    shapes = [(s, max(_components(s))) for s in ars]
    big = [s for s, n in shapes if n >= TEX * TEX]           # texel reduce
    small = [s for s, n in shapes if 1 <= n < TEX * TEX]
    gathers = re.findall(r"= (\([^=]*?\)|\S+) all-gather\(", hlo)
    result = {
        "check": "hlo8_collectives",
        "n_all_reduce": len(shapes),
        "n_all_gather": len(gathers),
        "texel_scale_reduces": big,
        "param_scale_reduces_n": len(small),
        "ok": bool(len(big) >= 1 and len(small) >= 1),
    }
    print(json.dumps(result), flush=True)
    assert result["ok"], f"missing expected collectives: {result}"


def run_hlo8():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["_VHAP_MESH_CHECK_CHILD"] = "1"
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if "xla_force_host_platform_device_count" not in f]
    flags.append("--xla_force_host_platform_device_count=8")
    env["XLA_FLAGS"] = " ".join(flags)
    r = subprocess.run([sys.executable, __file__, "--mode", "hlo8-child"],
                       env=env, cwd=str(REPO))
    if r.returncode != 0:
        raise RuntimeError(f"hlo8 child failed rc={r.returncode}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["tpu1", "hlo8", "hlo8-child", "both"],
                    default="both")
    args = ap.parse_args()
    if args.mode == "hlo8-child":
        run_hlo8_child()
        return
    if args.mode in ("tpu1", "both"):
        run_tpu1()
    if args.mode in ("hlo8", "both"):
        run_hlo8()


if __name__ == "__main__":
    main()

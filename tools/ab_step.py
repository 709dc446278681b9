"""A/B the bench train step across render-config variants on real TPU.

Builds the exact bench.py workload once per variant (stage
rgb_sequential_tracking, bs=16, 512^2, tex 2048) and prints one line per
variant with the measured steady-state step time. Use for kernel/config
experiments without editing bench.py:

    python tools/ab_step.py                      # default pair:
                                                 # planes vs fused interp
    python tools/ab_step.py --set interp_impl=planes,fused \
                            --set color_dtype=bf16

Every --set names a RenderConfig field and a comma list of values; the
variant grid is their cross product.
"""

from __future__ import annotations

import argparse
import itertools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_step(render_overrides, size=None):
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

    H, W = size or bench.IMAGE
    B, T = bench.BATCH_SIZE, 64
    cfg = BaseTrackingConfig()
    cfg.model.tex_resolution = bench.TEX_RES
    cfg.model.use_static_offset = True
    cfg.batch_size = B
    for k, v in render_overrides.items():
        assert hasattr(cfg.render, k), f"RenderConfig has no field {k!r}"
        setattr(cfg.render, k, v)
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
    return step_fn, params, opt_state, batch, jax.random.PRNGKey(0)


def measure(render_overrides, iters, size=None):
    import jax
    import jax.numpy as jnp
    step_fn, params, opt_state, batch, key = build_step(render_overrides,
                                                        size)
    lrf = jnp.asarray(1.0)
    params, opt_state, E, _ = step_fn(params, opt_state, batch, key, lrf)
    jax.block_until_ready(E)
    t0 = time.perf_counter()
    for _ in range(iters):
        params, opt_state, E, _ = step_fn(params, opt_state, batch, key, lrf)
    jax.block_until_ready(E)
    return (time.perf_counter() - t0) / iters, float(E)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--set", action="append", default=[],
                    metavar="FIELD=V1,V2",
                    help="RenderConfig field and comma list of values")
    ap.add_argument("--iters", type=int, default=15)
    ap.add_argument("--size", default=None, metavar="H,W",
                    help="image size override, e.g. 550,802 for the "
                         "documented NeRSemble recipe resolution")
    args = ap.parse_args()
    size = tuple(int(x) for x in args.size.split(",")) if args.size else None

    sets = args.set or ["interp_impl=planes,fused"]
    fields, value_lists = [], []
    def coerce(v: str):
        """Typed config values: ints/floats/bools parse, else string."""
        for cast in (int, float):
            try:
                return cast(v)
            except ValueError:
                pass
        return {"true": True, "false": False, "none": None}.get(v.lower(), v)

    for s in sets:
        f, vals = s.split("=", 1)
        fields.append(f)
        value_lists.append([coerce(v) for v in vals.split(",")])

    for combo in itertools.product(*value_lists):
        overrides = dict(zip(fields, combo))
        label = " ".join(f"{k}={v}" for k, v in overrides.items())
        try:
            dt, E = measure(overrides, args.iters, size)
            print(f"{label:50s} {dt * 1e3:8.1f} ms/step  E={E:.4f}",
                  flush=True)
        except Exception as e:  # surface per-variant failures, keep going
            print(f"{label:50s} FAILED: {type(e).__name__}: {e}",
                  flush=True)


if __name__ == "__main__":
    main()

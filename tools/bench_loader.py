"""Multiview data-loader throughput vs TPU step time (VERDICT r3 #5).

Generates a synthetic NeRSemble-layout sequence (16 cameras, JPEG + alpha
+ per-camera affine color correction) and times `getitem_by_timestep` —
the per-step host work of multiview tracking — through the C++ native
loader vs the PIL path, on this 1-core host. Prints one JSON line with
timesteps/sec for both and the headroom vs a given TPU step time.

Usage: python tools/bench_loader.py [--cams 16] [--size 512]
       [--step-ms 268] [--out /tmp/bench_loader]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ["JAX_PLATFORMS"] = "cpu"


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")

    ap = argparse.ArgumentParser()
    ap.add_argument("--cams", type=int, default=16)
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--step-ms", type=float, default=268.0,
                    help="TPU train-step time to compare against "
                         "(bench.py step_ms)")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", type=Path, default=Path("/tmp/bench_loader"))
    args = ap.parse_args()

    from vhap_tpu.config.nersemble import NersembleDataConfig
    from vhap_tpu.data.nersemble_dataset import NeRSembleDataset
    from vhap_tpu.tools.make_synthetic_multiview import generate_multiview

    root = args.out
    if not (root / "camera_params").exists():
        print(f"generating {args.cams}-cam synthetic sequence at "
              f"{args.size}^2 ...", flush=True)
        gt, cam_ids = generate_multiview(root, n_cams=args.cams,
                                         n_frames=args.frames,
                                         size=args.size)
    else:
        import json as _json
        cam_ids = sorted(_json.load(open(
            root / "camera_params" / "001" / "camera_params.json"
        ))["world_2_cam"].keys())

    ccdir = root / "color_correction" / "001"
    ccdir.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(3)
    for cid in cam_ids:
        if not (ccdir / f"{cid}.npy").exists():
            m = np.concatenate([np.eye(3) + rng.normal(0, 0.03, (3, 3)),
                                rng.normal(0, 0.01, (3, 1))], axis=1)
            np.save(ccdir / f"{cid}.npy", m)

    cfg = NersembleDataConfig()
    cfg.root_folder = root
    cfg.subject = "001"
    cfg.sequence = "SEN-01"
    cfg.align_cameras_to_axes = False
    cfg.use_color_correction = True
    cfg.background_color = "white"
    cfg.use_alpha_map = True
    ds = NeRSembleDataset(cfg, img_to_tensor=True)
    n_ts = ds.num_timesteps

    def time_path(label):
        ds.getitem_by_timestep(0)  # warm caches (lmk npz, image hw)
        t0 = time.perf_counter()
        n = 0
        for _ in range(args.reps):
            for t in range(n_ts):
                item = ds.getitem_by_timestep(t)
                n += 1
        dt = (time.perf_counter() - t0) / n
        print(f"{label}: {dt * 1e3:.1f} ms/timestep "
              f"({item['rgb'].shape})", flush=True)
        return dt

    native_ok = (ds.supports_native_batch()
                 and ds.load_batch_native([0]) is not None)
    dt_native = time_path("native") if native_ok else None
    ds.supports_native_batch = lambda: False
    dt_pil = time_path("pil")

    step_s = args.step_ms / 1e3
    result = {
        "metric": f"multiview loader ms/timestep ({args.cams} cams, "
                  f"{args.size}^2, CC+composite, 1-core host)",
        "native_ms": None if dt_native is None else round(dt_native * 1e3, 1),
        "pil_ms": round(dt_pil * 1e3, 1),
        "tpu_step_ms": args.step_ms,
        "native_headroom_x": (None if dt_native is None
                              else round(step_s / dt_native, 2)),
        "pil_headroom_x": round(step_s / dt_pil, 2),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()

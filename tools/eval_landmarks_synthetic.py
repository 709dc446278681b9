"""Quantify the in-image landmark path on held-out synthetic renders.

VERDICT r3 #8: the bundled fan_weights.npz are synthetic-trained
(vhap_tpu/tools/train_fan_synthetic.py) and their accuracy was
unquantified. This tool renders held-out FLAME heads (a seed disjoint
from training), runs the REAL detector entry
(LandmarkDetectorFANJax.detect_single_image — whole-image scan + refined
crop, exactly what annotate_landmarks(source='fan-jax') executes), and
reports pixel error vs the ground-truth landmark projections plus the
standard inter-ocular-normalized NME.

Usage: python tools/eval_landmarks_synthetic.py [--n 32] [--seed 123]
Prints one JSON line; the number lives in docs/PARITY.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=32)
    ap.add_argument("--seed", type=int, default=123,
                    help="held-out seed (training used 0/1)")
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).resolve().parents[1] / ".jax_cache"))

    from vhap_tpu.model.flame import FlameHead, FlameTexPainted
    from vhap_tpu.preprocess.landmarks import LandmarkDetectorFANJax
    from vhap_tpu.tools.train_fan_synthetic import (IMG_SIZE, _sample_params,
                                                    make_render_fn)

    head = FlameHead.build(n_shape=50, n_expr=30, add_teeth=False)
    tex = FlameTexPainted(head.assets.tex_painted, 256)()
    uv = np.asarray(head.verts_uvs)
    verts_uv = jnp.asarray(np.stack([uv[:, 0], 1.0 - uv[:, 1]], -1))
    render = jax.jit(make_render_fn(head, tex, verts_uv))

    det = LandmarkDetectorFANJax()
    rng = np.random.default_rng(args.seed)

    px_errs, nmes, misses = [], [], 0
    n_done = 0
    while n_done < args.n:
        p = {k: jnp.asarray(v) for k, v in
             _sample_params(rng, head, args.batch).items()}
        imgs, gt_px = render(p)
        imgs = np.asarray(jnp.clip(imgs, 0, 1))
        gt_px = np.asarray(gt_px)                       # (B, L, 2) pixels
        for b in range(min(args.batch, args.n - n_done)):
            frame = (imgs[b] * 255).astype(np.uint8)
            bb, lmks = det.detect_single_image(frame)
            n_done += 1
            if (lmks[:, :2] < 0).all():
                misses += 1
                continue
            pred = lmks[:, :2] * IMG_SIZE               # back to pixels
            L = min(pred.shape[0], gt_px.shape[1])
            d = np.linalg.norm(pred[:L] - gt_px[b, :L], axis=-1)
            iod = np.linalg.norm(gt_px[b, 36] - gt_px[b, 45])
            px_errs.append(float(d.mean()))
            nmes.append(float(d.mean() / max(iod, 1e-6)))

    out = {
        "check": "fan_jax_synthetic_landmark_eval",
        "n_frames": n_done,
        "detection_misses": misses,
        "img_size": IMG_SIZE,
        "px_err_mean": round(float(np.mean(px_errs)), 3) if px_errs else None,
        "px_err_median": round(float(np.median(px_errs)), 3) if px_errs else None,
        "px_err_p90": round(float(np.percentile(px_errs, 90)), 3) if px_errs else None,
        "nme_interocular_mean": round(float(np.mean(nmes)), 4) if nmes else None,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

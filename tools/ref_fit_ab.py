"""Landmark-only fit A/B: reference GlobalTracker vs vhap_tpu (VERDICT r3 #1b).

Runs BOTH trackers end-to-end on the same synthetic monocular sequence —
the actual reference optimization loop (vhap/model/tracker.py, torch CPU,
with only its absent pip deps stubbed via tests/ref_compat.py; the
renderer is never invoked in landmark-only mode) and the vhap_tpu tracker
— under the reference's landmark-only recipe (exp.photometric=False,
w.photo=None), then compares the fitted FLAME parameters by forwarding
both through the SAME FlameHead and reporting mean/max vertex error in mm
(plus each fit vs the synthesis ground truth).

This is the in-image proxy for the <0.5 mm north star (BASELINE.md): the
FLAME weights are synthetic stand-ins (license-gated files absent), but
the template is the real head_template_mesh.obj and the full reference
OPTIMIZATION PATH runs for real.

Usage:
  python tools/ref_fit_ab.py [--frames 16] [--size 256] [--out /tmp/ref_fit_ab]

Prints one JSON line with the error metrics; also appended to
docs/PARITY.md by hand after a run.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import types
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ["JAX_PLATFORMS"] = "cpu"

N_SHAPE, N_EXPR = 50, 20


def _force_cpu_jax():
    import jax
    jax.config.update("jax_platforms", "cpu")


def build_tpu_cfg(seq_root: Path, sequence: str, out: Path):
    from vhap_tpu.config.base import (BaseTrackingConfig, DataConfig,
                                      ExperimentConfig, LogConfig,
                                      LossWeightConfig, ModelConfig)
    return BaseTrackingConfig(
        data=DataConfig(root_folder=seq_root, sequence=sequence,
                        landmark_source="star"),
        model=ModelConfig(n_shape=N_SHAPE, n_expr=N_EXPR, add_teeth=False,
                          use_static_offset=False, tex_extra=False),
        exp=ExperimentConfig(output_folder=out, photometric=False),
        w=LossWeightConfig(photo=None),
        log=LogConfig(interval_scalar=200, interval_media=10**9),
    )


def run_tpu_fit(seq_root: Path, sequence: str, out: Path) -> Path:
    _force_cpu_jax()
    from vhap_tpu.tracker.tracker import GlobalTracker
    cfg = build_tpu_cfg(seq_root, sequence, out)
    tracker = GlobalTracker(cfg)
    tracker.optimize()
    npzs = sorted(tracker.out_dir.glob("tracked_flame_params_*.npz"),
                  key=lambda p: int(p.stem.rsplit("_", 1)[1]))
    assert npzs, f"no tracked params under {tracker.out_dir}"
    return npzs[-1]


def build_ref_cfg(seq_root: Path, sequence: str, out: Path):
    from vhap.config.base import (BaseTrackingConfig, DataConfig,
                                  ExperimentConfig, LearningRateConfig,
                                  LogConfig, LossWeightConfig, ModelConfig,
                                  PipelineConfig, RenderConfig,
                                  StageLmkGlobalTrackingConfig,
                                  StageLmkInitAllConfig,
                                  StageLmkInitRigidConfig,
                                  StageLmkSequentialTrackingConfig,
                                  StageRgbGlobalTrackingConfig,
                                  StageRgbInitAllConfig,
                                  StageRgbInitOffsetConfig,
                                  StageRgbInitTextureConfig,
                                  StageRgbSequentialTrackingConfig)
    return BaseTrackingConfig(
        data=DataConfig(root_folder=seq_root, sequence=sequence,
                        landmark_source="star"),
        model=ModelConfig(n_shape=N_SHAPE, n_expr=N_EXPR, add_teeth=False,
                          use_static_offset=False, tex_extra=False),
        render=RenderConfig(),
        log=LogConfig(interval_scalar=200, interval_media=10**9),
        exp=ExperimentConfig(output_folder=out, photometric=False,
                             reuse_landmarks=True),
        lr=LearningRateConfig(),
        w=LossWeightConfig(photo=None),
        pipeline=PipelineConfig(
            lmk_init_rigid=StageLmkInitRigidConfig(),
            lmk_init_all=StageLmkInitAllConfig(),
            lmk_sequential_tracking=StageLmkSequentialTrackingConfig(),
            lmk_global_tracking=StageLmkGlobalTrackingConfig(),
            rgb_init_texture=StageRgbInitTextureConfig(),
            rgb_init_all=StageRgbInitAllConfig(),
            rgb_init_offset=StageRgbInitOffsetConfig(),
            rgb_sequential_tracking=StageRgbSequentialTrackingConfig(),
            rgb_global_tracking=StageRgbGlobalTrackingConfig(),
        ),
        device="cpu",
    )


def run_ref_fit(seq_root: Path, sequence: str, out: Path,
                asset_work: Path) -> Path:
    from ref_compat import install_all_stubs, write_ref_asset_tree
    install_all_stubs()

    from vhap_tpu.model.assets import load_flame_assets
    assets = load_flame_assets(allow_synthetic=True, seed=0)
    root = write_ref_asset_tree(asset_work, assets)

    import torch

    import vhap.model.tracker as RT

    # 1-core host: in-process data loading beats 4 worker forks
    class _InlineLoader(torch.utils.data.DataLoader):
        def __init__(self, *a, num_workers=0, **k):
            super().__init__(*a, num_workers=0, **k)

    RT.DataLoader = _InlineLoader
    # yaml.dump cannot represent the config dataclasses; the dump is
    # logging-only in the reference
    RT.yaml = types.SimpleNamespace(dump=lambda cfg, *a, **k: repr(cfg))
    # evaluate() renders photometrically (stubbed nvdiffrast) and reads
    # log_dict["photo"] unconditionally (tracker.py:1102) — in
    # landmark-only mode reduce it to its checkpointing side effect
    RT.GlobalTracker.evaluate = (
        lambda self, make_visualization=True, epoch=0:
        self.save_result(epoch=epoch))

    cfg = build_ref_cfg(seq_root, sequence, out)
    cwd = os.getcwd()
    os.chdir(root)  # reference asset paths are relative constants
    try:
        tracker = RT.GlobalTracker(cfg)
        tracker.optimize()
        out_dir = tracker.out_dir
    finally:
        os.chdir(cwd)
    npzs = sorted(Path(out_dir).glob("tracked_flame_params_*.npz"),
                  key=lambda p: int(p.stem.rsplit("_", 1)[1]))
    assert npzs, f"no tracked params under {out_dir}"
    return npzs[-1]


def _forward_verts(head, z, n_frames: int) -> np.ndarray:
    import jax
    import jax.numpy as jnp

    @jax.jit
    def fwd(shape, expr, rotation, neck, jaw, eyes, translation):
        v, _ = head(shape=shape, expr=expr, rotation=rotation, neck=neck,
                    jaw=jaw, eyes=eyes, translation=translation)
        return v

    T = n_frames
    verts = fwd(
        jnp.broadcast_to(jnp.asarray(z["shape"])[None], (T, N_SHAPE)),
        jnp.asarray(z["expr"][:T, :N_EXPR]),
        jnp.asarray(z["rotation"][:T]),
        jnp.asarray(z["neck_pose"][:T]),
        jnp.asarray(z["jaw_pose"][:T]),
        jnp.asarray(z["eyes_pose"][:T]),
        jnp.asarray(z["translation"][:T]),
    )
    return np.asarray(verts)


def compare(npz_ref: Path, npz_tpu: Path, gt_path: Path, n_frames: int):
    _force_cpu_jax()
    from vhap_tpu.model.flame import FlameHead
    head = FlameHead.build(n_shape=N_SHAPE, n_expr=N_EXPR, add_teeth=False)

    za = dict(np.load(npz_ref))
    zb = dict(np.load(npz_tpu))
    gt = dict(np.load(gt_path))
    gt.setdefault("translation", gt["translation"])

    va = _forward_verts(head, za, n_frames)
    vb = _forward_verts(head, zb, n_frames)
    vg = _forward_verts(head, gt, n_frames)

    def err_mm(x, y):
        d = np.linalg.norm(x - y, axis=-1) * 1000.0
        return float(d.mean()), float(d.max())

    ab_mean, ab_max = err_mm(va, vb)
    ag_mean, ag_max = err_mm(va, vg)
    bg_mean, bg_max = err_mm(vb, vg)
    return {
        "frames": n_frames,
        "vertex_err_ref_vs_tpu_mm": {"mean": ab_mean, "max": ab_max},
        "vertex_err_ref_vs_gt_mm": {"mean": ag_mean, "max": ag_max},
        "vertex_err_tpu_vs_gt_mm": {"mean": bg_mean, "max": bg_max},
        "npz_ref": str(npz_ref),
        "npz_tpu": str(npz_tpu),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--out", type=Path, default=Path("/tmp/ref_fit_ab"))
    ap.add_argument("--skip-ref", action="store_true")
    ap.add_argument("--skip-tpu", action="store_true")
    args = ap.parse_args()

    _force_cpu_jax()
    out = args.out
    seq_root = out / "data"
    seq_dir = seq_root / "synthetic"

    if not (seq_dir / "gt_params.npz").exists():
        from vhap_tpu.tools.make_synthetic_sequence import generate
        generate(seq_dir, n_frames=args.frames, size=args.size,
                 n_shape=N_SHAPE, n_expr=N_EXPR, seed=0)
        print(f"synthetic sequence at {seq_dir}", flush=True)

    t0 = time.time()
    npz_tpu = (None if args.skip_tpu
               else run_tpu_fit(seq_root, "synthetic", out / "tpu"))
    t1 = time.time()
    print(f"vhap_tpu fit: {t1 - t0:.1f}s -> {npz_tpu}", flush=True)

    npz_ref = (None if args.skip_ref
               else run_ref_fit(seq_root, "synthetic", out / "ref",
                                out / "ref_assets"))
    t2 = time.time()
    print(f"reference fit: {t2 - t1:.1f}s -> {npz_ref}", flush=True)

    if npz_ref and npz_tpu:
        result = compare(npz_ref, npz_tpu, seq_dir / "gt_params.npz",
                         args.frames)
        result["t_fit_tpu_s"] = round(t1 - t0, 1)
        result["t_fit_ref_s"] = round(t2 - t1, 1)
        print(json.dumps(result))


if __name__ == "__main__":
    main()

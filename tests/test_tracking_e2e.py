"""End-to-end tracking on a synthetic sequence (CPU-runnable).

Covers BASELINE config 1 (landmark-only fit) and the param/checkpoint
machinery: full staged pipeline, warm-start, global refinement, npz schema.
"""

from pathlib import Path

import numpy as np
import pytest
import jax


@pytest.fixture(scope="module")
def synth_seq(tmp_path_factory):
    from vhap_tpu.tools.make_synthetic_sequence import generate
    root = tmp_path_factory.mktemp("seq")
    gt = generate(root / "obama", n_frames=6, size=128)
    return root, gt


def _make_cfg(root, out):
    from vhap_tpu.config.base import BaseTrackingConfig
    cfg = BaseTrackingConfig()
    cfg.data.root_folder = Path(root)
    cfg.data.sequence = "obama"
    cfg.data.background_color = None
    cfg.model.n_shape, cfg.model.n_expr = 50, 20
    cfg.model.add_teeth = False
    cfg.model.use_static_offset = False
    cfg.model.tex_extra = False
    cfg.exp.photometric = False
    cfg.exp.output_folder = Path(out)
    cfg.w.photo = None
    cfg.batch_size = 4
    cfg.pipeline.lmk_init_rigid.num_steps = 250
    cfg.pipeline.lmk_init_all.num_steps = 250
    cfg.pipeline.lmk_sequential_tracking.num_steps = 40
    cfg.pipeline.lmk_global_tracking.num_epochs = 2
    cfg.log.interval_scalar = 10 ** 6
    cfg.log.interval_media = 10 ** 6
    cfg.__post_init__()
    return cfg


def test_landmark_only_fit_recovers_pose(synth_seq, tmp_path):
    root, gt = synth_seq
    cfg = _make_cfg(root, tmp_path / "out")

    from vhap_tpu.tracker.tracker import GlobalTracker
    tr = GlobalTracker(cfg)
    tr.optimize()

    ckpts = sorted(Path(tr.out_dir).glob("tracked_flame_params_*.npz"))
    assert ckpts, "no checkpoints written"
    z = np.load(ckpts[-1])

    # reference npz schema (vhap/model/tracker.py:1152-1218)
    for key in ("rotation", "translation", "neck_pose", "jaw_pose",
                "eyes_pose", "shape", "expr", "timestep_id",
                "n_processed_frames", "image_size", "focal_length", "lights"):
        assert key in z.files, key

    assert np.abs(z["rotation"] - gt["rotation"]).mean() < 0.08
    assert np.abs(z["translation"] - gt["translation"]).mean() < 0.03
    assert np.abs(z["jaw_pose"] - gt["jaw_pose"]).mean() < 0.06


def test_photometric_staged_pipeline(synth_seq, tmp_path):
    """Full photometric staged schedule on CPU at tiny resolution: all five
    rgb stages + sequential warm-start + a global epoch, the wiring the
    reference runs at vhap/model/tracker.py:1343-1416. Asserts the total
    eval energy decreases and the checkpoint carries the photometric
    parameters (texture residual, lights, static offset)."""
    root, gt = synth_seq
    cfg = _make_cfg(root, tmp_path / "out")
    cfg.exp.photometric = True
    cfg.w.photo = 30.0
    cfg.model.tex_resolution = 64
    cfg.model.use_static_offset = True
    cfg.model.tex_extra = True
    cfg.data.scale_factor = 0.5          # 128 -> 64 pixels
    cfg.pipeline.lmk_init_rigid.num_steps = 50
    cfg.pipeline.lmk_init_all.num_steps = 30
    cfg.pipeline.rgb_init_texture.num_steps = 10
    cfg.pipeline.rgb_init_all.num_steps = 10
    cfg.pipeline.rgb_init_offset.num_steps = 10
    cfg.pipeline.rgb_sequential_tracking.num_steps = 10
    cfg.pipeline.rgb_global_tracking.num_epochs = 1
    cfg.__post_init__()

    from vhap_tpu.tracker.tracker import GlobalTracker
    tr = GlobalTracker(cfg)
    key = jax.random.PRNGKey(123)
    batch0 = tr._make_batch(list(range(min(4, tr.n_timesteps))))
    energy = tr._eval_energy()
    E0 = float(energy(tr.params, batch0, key)[0])
    tr.optimize()
    E1 = float(energy(tr.params, batch0, key)[0])
    assert np.isfinite(E1)
    assert E1 < E0, f"staged photometric fit failed to descend ({E0} -> {E1})"

    ckpts = sorted(Path(tr.out_dir).glob("tracked_flame_params_*.npz"))
    assert ckpts, "no checkpoints written"
    z = np.load(ckpts[-1])
    for key_ in ("rotation", "translation", "expr", "tex_extra", "lights",
                 "static_offset", "timestep_id", "image_size"):
        assert key_ in z.files, key_
    assert z["tex_extra"].shape[-2:] == (64, 64)
    assert np.isfinite(z["static_offset"]).all()


def test_warm_start_from_checkpoint(synth_seq, tmp_path):
    root, gt = synth_seq
    cfg = _make_cfg(root, tmp_path / "out")

    from vhap_tpu.tracker import params as P
    p = P.init_params(6, 50, 20, 100, 100, 64, True, False, True, False, False, False)
    p2 = dict(p)
    p2["rotation"] = p["rotation"] + 0.123
    path = tmp_path / "ckpt.npz"
    P.save_result(p2, path, np.arange(6), 6, (128, 128), False, True)

    loaded = P.load_from_tracked_flame_params(p, path)
    np.testing.assert_allclose(np.asarray(loaded["rotation"]),
                               np.asarray(p2["rotation"]), atol=1e-6)


def test_copy_forward():
    import jax.numpy as jnp
    from vhap_tpu.tracker import params as P
    p = P.init_params(5, 4, 3, 2, 10, 8, True, False, False, False, False, True)
    p["expr"] = p["expr"].at[2].set(7.0)
    out = P.copy_forward(p, 2, jnp.asarray([3, 4]))
    assert np.allclose(np.asarray(out["expr"][3]), 7.0)
    assert np.allclose(np.asarray(out["expr"][4]), 7.0)
    assert np.allclose(np.asarray(out["expr"][1]), 0.0)


def test_cli_parsing():
    from vhap_tpu.config.base import BaseTrackingConfig
    from vhap_tpu.config.cli import parse_cli
    cfg = parse_cli(BaseTrackingConfig, [
        "--data.root_folder", "/tmp/x", "--data.sequence", "obama",
        "--model.n_shape", "150", "--model.no-use-static-offset",
        "--w.reg_tex_tv", "1e5", "--model.occluded", "hair,boundary",
    ])
    assert str(cfg.data.root_folder) == "/tmp/x"
    assert cfg.model.n_shape == 150
    assert cfg.model.use_static_offset is False
    assert cfg.w.reg_tex_tv == 1e5
    assert "hair" in cfg.model.occluded
    # post-init merged occlusions into photometric stage except-lists
    assert "hair" in cfg.pipeline.rgb_sequential_tracking.align_texture_except
    # no static/dynamic offset -> hair auto-added once, not twice
    assert cfg.pipeline.rgb_sequential_tracking.align_texture_except.count("hair") <= 2


def test_mid_run_resume(synth_seq, tmp_path):
    """Interrupt after the sequential phase and resume into global refinement."""
    root, gt = synth_seq
    cfg = _make_cfg(root, tmp_path / "out")
    cfg.pipeline.lmk_init_rigid.num_steps = 60
    cfg.pipeline.lmk_init_all.num_steps = 60
    cfg.pipeline.lmk_sequential_tracking.num_steps = 10
    cfg.pipeline.lmk_global_tracking.num_epochs = 1

    from vhap_tpu.tracker.tracker import GlobalTracker
    tr = GlobalTracker(cfg)
    tr._run_sequential_phase()
    tr.save_run_state("global", 0)
    state_path = tr.out_dir / "run_state.npz"
    assert state_path.exists()
    rot_before = np.asarray(tr.params["rotation"]).copy()

    tr2 = GlobalTracker(cfg)
    tr2.optimize(resume_state_path=state_path)  # skips sequential phase
    # resumed run restored the sequential-phase params before refining
    assert not np.allclose(np.asarray(tr2.params["rotation"]), 0.0)
    ckpts = sorted((tr2.out_dir).glob("tracked_flame_params_*.npz"))
    assert ckpts


def test_cli_parsing_nersemble_variants():
    """The NeRSemble v1/v2 CLIs expose the reference's flag surface,
    including the per-subject occlusion table (config/nersemble.py:73-82)."""
    from vhap_tpu.config.cli import parse_cli
    from vhap_tpu.config.nersemble import NersembleTrackingConfig
    from vhap_tpu.config.nersemble_v2 import NersembleV2TrackingConfig

    cfg = parse_cli(NersembleTrackingConfig, [
        "--data.root_folder", "/tmp/n", "--data.subject", "018",
        "--data.sequence", "EXP-1", "--data.n_downsample_rgb", "4",
    ])
    assert cfg.data.subject == "018" and cfg.data.n_downsample_rgb == 4
    assert cfg.w.landmark == 3        # nersemble-specific weight
    assert cfg.data.calibrated is True

    cfg2 = parse_cli(NersembleV2TrackingConfig, [
        "--data.root_folder", "/tmp/n", "--data.subject", "030",
        "--data.sequence", "EXP-2", "--data.no-use-color-correction",
    ])
    assert cfg2.data.use_color_correction is False
    assert "nersemble_v2_dataset" in cfg2.data._target


def test_begin_stage_skips_earlier_stages():
    """--begin_stage zeroes the step counts of every stage before it
    (vhap/config/base.py:349-358 debug skip)."""
    from vhap_tpu.config.base import BaseTrackingConfig
    from vhap_tpu.config.cli import parse_cli

    cfg = parse_cli(BaseTrackingConfig, [
        "--data.root_folder", "/tmp/x", "--data.sequence", "s",
        "--begin_stage", "rgb_init_texture",
    ])
    assert cfg.pipeline.lmk_init_rigid.num_steps == 0
    assert cfg.pipeline.lmk_init_all.num_steps == 0
    assert cfg.pipeline.rgb_init_texture.num_steps > 0
    assert cfg.pipeline.rgb_sequential_tracking.num_steps > 0


def test_photometric_pipeline_fused_interp(synth_seq, tmp_path):
    """Staged photometric mini-run through the fused deferred-interp
    kernel (interpret mode; needs W % 128 == 0, so full 128px res). The
    stage mix exercises every flag-row count the kernel sees: texture
    stages (align masks on), disturbance stages (cluster ids), and the
    flagless eval render."""
    root, gt = synth_seq
    cfg = _make_cfg(root, tmp_path / "out")
    cfg.exp.photometric = True
    cfg.w.photo = 30.0
    cfg.model.tex_resolution = 64
    cfg.model.use_static_offset = True
    cfg.model.tex_extra = True
    cfg.render.interp_impl = "fused_interpret"
    cfg.pipeline.lmk_init_rigid.num_steps = 30
    cfg.pipeline.lmk_init_all.num_steps = 10
    cfg.pipeline.rgb_init_texture.num_steps = 5
    cfg.pipeline.rgb_init_all.num_steps = 5
    cfg.pipeline.rgb_init_offset.num_steps = 5
    cfg.pipeline.rgb_sequential_tracking.num_steps = 5
    cfg.pipeline.rgb_global_tracking.num_epochs = 1
    cfg.__post_init__()

    from vhap_tpu.tracker.tracker import GlobalTracker
    tr = GlobalTracker(cfg)
    key = jax.random.PRNGKey(5)
    batch0 = tr._make_batch(list(range(min(4, tr.n_timesteps))))
    energy = tr._eval_energy()
    E0 = float(energy(tr.params, batch0, key)[0])
    tr.optimize()
    E1 = float(energy(tr.params, batch0, key)[0])
    assert np.isfinite(E1) and E1 < E0, (E0, E1)

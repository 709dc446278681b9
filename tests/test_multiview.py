"""NeRSemble-layout multiview dataset: camera decoding + render consistency."""

from pathlib import Path

import numpy as np
import pytest
import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def mv_seq(tmp_path_factory):
    from vhap_tpu.tools.make_synthetic_multiview import generate_multiview
    root = tmp_path_factory.mktemp("mv")
    gt, cam_ids = generate_multiview(root, n_cams=3, n_frames=2, size=128)
    return root, gt, cam_ids


def _data_cfg(root):
    from vhap_tpu.config.nersemble import NersembleDataConfig
    cfg = NersembleDataConfig()
    cfg.root_folder = Path(root)
    cfg.subject = "001"
    cfg.sequence = "SEN-01"
    cfg.align_cameras_to_axes = False
    cfg.use_color_correction = False
    cfg.background_color = None
    return cfg


def test_dataset_structure(mv_seq):
    root, gt, cam_ids = mv_seq
    from vhap_tpu.data.nersemble_dataset import NeRSembleDataset
    ds = NeRSembleDataset(_data_cfg(root), img_to_tensor=True)
    assert len(ds) == 2  # batchified: one item per timestep
    assert ds.num_cameras == 3
    item = ds.getitem_by_timestep(0)
    assert item["rgb"].shape == (3, 128, 128, 3)
    assert item["extrinsic"].shape == (3, 3, 4)
    assert item["lmk2d"].shape[0] == 3


def test_camera_roundtrip_renders_match(mv_seq):
    """Dataset-decoded cameras must reproduce the generator's renders:
    GT params -> photometric residual at the jpeg floor, landmarks exact."""
    root, gt, cam_ids = mv_seq
    from vhap_tpu.config.nersemble import NersembleTrackingConfig
    from vhap_tpu.data.nersemble_dataset import NeRSembleDataset
    from vhap_tpu.model.flame import FlameHead, FlameTexPainted
    from vhap_tpu.tracker import params as P
    from vhap_tpu.tracker.energy import make_albedo_fn, make_energy_fn

    cfg = NersembleTrackingConfig()
    cfg.data = _data_cfg(root)
    cfg.model.n_shape, cfg.model.n_expr = 30, 10
    cfg.model.add_teeth = False
    cfg.model.use_static_offset = False
    cfg.model.tex_resolution = 128
    cfg.render.backend = "xla"
    cfg.__post_init__()

    ds = NeRSembleDataset(cfg.data, img_to_tensor=True)
    head = FlameHead.build(n_shape=30, n_expr=10, add_teeth=False)
    get_albedo = make_albedo_fn(
        cfg, FlameTexPainted(head.assets.tex_painted, 128), None)
    energy = make_energy_fn(head, cfg, get_albedo, (128, 128), 2, None,
                            with_aux=True)

    p = P.init_params(2, 30, 10, 100, head.num_verts, 128, True, True, True,
                      False, False, True)
    p["shape"] = jnp.asarray(gt["shape"])
    for k in ("expr", "rotation", "neck_pose", "jaw_pose", "eyes_pose", "translation"):
        p[k] = jnp.asarray(gt[k])

    item = ds.getitem_by_timestep(0)
    batch = {
        "rgb": jnp.asarray(item["rgb"], jnp.float32),
        "lmk2d": jnp.asarray(item["lmk2d"], jnp.float32),
        "intrinsic": jnp.asarray(item["intrinsic"], jnp.float32),
        "extrinsic": jnp.asarray(item["extrinsic"], jnp.float32),
        "timestep_index": jnp.zeros((3,), jnp.int32),
        "weight": jnp.ones((3,), jnp.float32),
    }
    E, (log, aux) = energy(p, batch, jax.random.PRNGKey(0))
    assert float(log["lmk"]) < 1e-3
    err = np.abs(np.asarray(aux["gt_rgb"])
                 - np.clip(np.asarray(aux["pred_rgb"]), 0, 1)).mean()
    assert err < 0.01  # jpeg floor


def test_camera_divisions(mv_seq):
    root, gt, cam_ids = mv_seq
    from vhap_tpu.data.nersemble_dataset import NeRSembleDataset
    cfg = _data_cfg(root)
    cfg.division = "side-view"  # cameras[0:1]; front-view assumes a 16-cam rig
    ds = NeRSembleDataset(cfg, img_to_tensor=False)
    assert ds.num_cameras == 1


def test_color_correction_math():
    from vhap_tpu.util.color_correction import (
        cctf_decoding, cctf_encoding, matrix_augmented_Cheung2004,
        color_correction_Cheung2004_precomputed)
    x = np.linspace(0, 1, 11)
    np.testing.assert_allclose(cctf_encoding(cctf_decoding(x)), x, atol=1e-9)
    rgb = np.random.default_rng(0).uniform(size=(5, 3))
    for terms in (3, 5, 7, 8, 10, 11):
        e = matrix_augmented_Cheung2004(rgb, terms)
        assert e.shape == (5, terms)
    # identity CCM (terms=3) is a no-op
    img = np.random.default_rng(1).uniform(size=(4, 4, 3))
    out = color_correction_Cheung2004_precomputed(img, np.eye(3))
    np.testing.assert_allclose(out, img, atol=1e-12)


def test_multiview_tracker_loop(mv_seq, tmp_path):
    """GlobalTracker end-to-end on the calibrated multiview path (lmk-only)."""
    root, gt, cam_ids = mv_seq
    from vhap_tpu.config.nersemble import NersembleTrackingConfig
    cfg = NersembleTrackingConfig()
    cfg.data.root_folder = Path(root)
    cfg.data.subject = "001"
    cfg.data.sequence = "SEN-01"
    cfg.data.align_cameras_to_axes = False
    cfg.data.use_color_correction = False
    cfg.data.background_color = None
    cfg.model.n_shape, cfg.model.n_expr = 30, 10
    cfg.model.add_teeth = False
    cfg.model.use_static_offset = False
    cfg.model.tex_extra = False
    cfg.exp.photometric = False
    cfg.exp.output_folder = Path(tmp_path / "mvout")
    cfg.w.photo = None
    cfg.pipeline.lmk_init_rigid.num_steps = 120
    cfg.pipeline.lmk_init_all.num_steps = 120
    cfg.pipeline.lmk_sequential_tracking.num_steps = 20
    cfg.pipeline.lmk_global_tracking.num_epochs = 1
    cfg.log.interval_scalar = 10 ** 6
    cfg.log.interval_media = 10 ** 6
    cfg.__post_init__()

    from vhap_tpu.tracker.tracker import GlobalTracker
    tr = GlobalTracker(cfg)
    assert tr.batchify_all_views and tr.n_timesteps == 2
    tr.optimize()
    z = np.load(sorted(Path(tr.out_dir).glob("tracked_flame_params_*.npz"))[-1])
    # multiview triangulation pins translation without focal ambiguity
    assert np.abs(z["translation"] - gt["translation"]).mean() < 0.02
    assert np.abs(z["rotation"] - gt["rotation"]).mean() < 0.08
    assert "focal_length" not in z.files  # calibrated -> not optimized

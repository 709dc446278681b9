"""Headless viewer/editor smoke + misc util coverage."""

from pathlib import Path

import numpy as np
import pytest


def test_flame_viewer_headless(tmp_path):
    from vhap_tpu.tracker import params as P
    from vhap_tpu.flame_viewer import FlameViewer

    p = P.init_params(2, 20, 10, 100, 100, 64, True, True, True, False, False, False)
    path = tmp_path / "tracked.npz"
    P.save_result(p, path, ["00000", "00001"], 2, (128, 128), False, True)

    viewer = FlameViewer(path, n_shape=20, n_expr=10, add_teeth=False,
                         W=128, H=128)
    assert viewer.n_timesteps == 2
    frame = viewer.render_frame(0)
    assert frame.shape == (128, 128, 3) and frame.dtype == np.uint8
    assert frame.std() > 0  # something rendered

    viewer.cam.orbit(30, 10)
    viewer.cam.scale(1)
    frame2 = viewer.render_frame(0)
    assert not np.array_equal(frame, frame2)  # camera moved

    viewer.render_sequence(tmp_path / "out", video=False)
    assert len(list((tmp_path / "out/frames").glob("*.png"))) == 2


def test_flame_editor_sweep(tmp_path):
    from vhap_tpu.flame_editor import FlameEditor

    ed = FlameEditor(n_shape=20, n_expr=10, add_teeth=False, W=96, H=96)
    grid = ed.render_sweep(tmp_path, "jaw", -0.2, 0.2, steps=3)
    assert grid.shape == (96, 96 * 3, 3)
    # jaw sweep must change the image
    assert not np.array_equal(grid[:, :96], grid[:, -96:])
    assert (tmp_path / "sweep_jaw.png").exists()


def test_editor_region_highlight():
    from vhap_tpu.flame_editor import FlameEditor
    ed = FlameEditor(n_shape=10, n_expr=5, add_teeth=False,
                     highlight_region="face", W=64, H=64)
    img = ed.render()
    assert img.shape == (64, 64, 3)


def test_config_yaml_roundtrip(tmp_path):
    from vhap_tpu.config.base import BaseTrackingConfig
    from vhap_tpu.config.cli import save_yaml, to_yaml
    import yaml

    cfg = BaseTrackingConfig()
    cfg.model.n_shape = 123
    text = to_yaml(cfg)
    raw = yaml.safe_load(text)
    assert raw["model"]["n_shape"] == 123
    assert raw["pipeline"]["rgb_global_tracking"]["num_epochs"] == 30
    save_yaml(cfg, tmp_path / "c.yml")
    assert (tmp_path / "c.yml").exists()

    # export's config reloader rebuilds a config object from the dump
    from vhap_tpu.export_as_nerf_dataset import _config_from_dict
    cfg2 = _config_from_dict(raw)
    assert cfg2.model.n_shape == 123


def test_orbit_camera():
    from vhap_tpu.util.camera_np import OrbitCamera
    cam = OrbitCamera(640, 480, r=2.0, fovy=45)
    K = cam.intrinsics
    assert K[2] == 320 and K[3] == 240
    pose0 = cam.pose.copy()
    cam.orbit(45, 0)
    assert not np.allclose(cam.pose, pose0)
    # world_view_transform is the inverse of pose
    np.testing.assert_allclose(cam.world_view_transform @ cam.pose,
                               np.eye(4), atol=1e-5)


def test_step_timer():
    import time
    from vhap_tpu.util.profiling import StepTimer
    t = StepTimer()
    t.tick("s")
    time.sleep(0.01)
    t.tick("s")
    assert t.steps_per_sec > 0
    assert "seconds/s" in t.summary()

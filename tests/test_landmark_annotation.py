"""Landmark annotation plumbing with a fake detector (npz contract)."""

from pathlib import Path

import numpy as np
import pytest


class FakeDetector:
    """Deterministic stand-in: landmarks on a grid, one no-face frame."""

    def __init__(self):
        self.calls = 0

    def detect_single_image(self, img):
        from vhap_tpu.preprocess.landmarks import NO_FACE_BBOX, NO_FACE_LMKS
        self.calls += 1
        if self.calls == 2:  # second frame: no face found
            return NO_FACE_BBOX.copy(), NO_FACE_LMKS.copy()
        h, w = img.shape[:2]
        xy = np.stack([np.linspace(0.2, 0.8, 68),
                       np.linspace(0.3, 0.7, 68)], -1).astype(np.float32)
        lmks = np.concatenate([xy, np.ones((68, 1), np.float32)], -1)
        bbox = np.asarray([0.2, 0.3, 0.8, 0.7, 1.0], np.float32)
        return bbox, lmks


def test_annotate_and_consume(tmp_path):
    from vhap_tpu.config.base import DataConfig
    from vhap_tpu.data.video_dataset import VideoDataset
    from vhap_tpu.preprocess.landmarks import annotate_landmarks
    from vhap_tpu.tools.make_synthetic_sequence import generate

    generate(tmp_path / "seq", n_frames=3, size=64)
    # drop the generator's landmarks so annotation produces them
    (tmp_path / "seq/landmark2d/STAR.npz").unlink()

    cfg = DataConfig(root_folder=tmp_path, sequence="seq")
    cfg.use_landmark = False
    cfg.background_color = None
    ds = VideoDataset(cfg, img_to_tensor=False)
    annotate_landmarks(ds, source="star", detector=FakeDetector())

    npz_path = tmp_path / "seq/landmark2d/STAR.npz"
    assert npz_path.exists()
    z = np.load(npz_path)
    assert z["face_landmark_2d"].shape == (3, 68, 3)
    assert z["bounding_box"].shape == (3, 5)
    # frame 1 had no face -> -1 sentinel rows
    assert (z["face_landmark_2d"][1] == -1).all()

    # dataset consumes: zero confidence on the no-face frame
    # (vhap/data/video_dataset.py:235-238)
    cfg2 = DataConfig(root_folder=tmp_path, sequence="seq")
    cfg2.background_color = None
    ds2 = VideoDataset(cfg2, img_to_tensor=True)
    assert ds2[0]["lmk2d"][:, 2].min() == 1.0
    assert ds2[1]["lmk2d"][:, 2].max() == 0.0


def test_landmark_source_fan_jax_from_config(tmp_path):
    """Zero-download CLI path: `--data.landmark_source fan-jax` makes the
    tracker annotate with the bundled pure-JAX FAN into its own source dir
    and consume the result (VERDICT r2 item 5)."""
    weights = (Path(__file__).resolve().parents[1] / "vhap_tpu" / "assets"
               / "fan_weights.npz")
    if not weights.exists():
        pytest.skip("no bundled FAN weights")

    from vhap_tpu.config.base import BaseTrackingConfig
    from vhap_tpu.tools.make_synthetic_sequence import generate
    from vhap_tpu.tracker.tracker import GlobalTracker

    generate(tmp_path / "seq", n_frames=2, size=64)
    (tmp_path / "seq/landmark2d/STAR.npz").unlink()

    cfg = BaseTrackingConfig()
    cfg.data.root_folder = Path(tmp_path)
    cfg.data.sequence = "seq"
    cfg.data.landmark_source = "fan-jax"
    cfg.data.background_color = None
    cfg.model.n_shape, cfg.model.n_expr = 10, 5
    cfg.model.add_teeth = False
    cfg.model.use_static_offset = False
    cfg.model.tex_extra = False
    cfg.exp.photometric = False
    cfg.exp.output_folder = Path(tmp_path / "out")
    cfg.w.photo = None
    cfg.batch_size = 2
    cfg.pipeline.lmk_init_rigid.num_steps = 3
    cfg.log.interval_scalar = 10 ** 6
    cfg.log.interval_media = 10 ** 6
    cfg.__post_init__()

    tr = GlobalTracker(cfg)  # annotates with fan-jax on construction
    assert (tmp_path / "seq/landmark2d/fan-jax.npz").exists()
    batch = tr._make_batch([0, 1])
    assert batch["lmk2d"].shape[1:] in ((68, 3), (70, 3))
    tr.optimize_stage("lmk_init_rigid", batch)
    assert np.isfinite(np.asarray(tr.params["rotation"])).all()


def test_gated_detectors_error_clearly():
    from vhap_tpu.preprocess.landmarks import (LandmarkDetectorFA,
                                               LandmarkDetectorSTAR)
    with pytest.raises(RuntimeError, match="face-alignment|face_alignment"):
        LandmarkDetectorFA()
    with pytest.raises(RuntimeError, match="dlib|STAR"):
        LandmarkDetectorSTAR()


def test_fan_jax_detector_on_synthetic_render():
    """The synthetic-trained FAN recovers landmarks on a rendered face.

    End-to-end over the runnable in-image path (VERDICT #6 / BASELINE
    config 5): render a FLAME head -> detect with the bundled weights ->
    compare against the ground-truth landmark projections.
    """
    from pathlib import Path
    weights = (Path(__file__).resolve().parents[1] / "vhap_tpu" / "assets"
               / "fan_weights.npz")
    if not weights.exists():
        pytest.skip("no bundled FAN weights (run tools/train_fan_synthetic)")

    import numpy as np
    import jax.numpy as jnp
    from vhap_tpu.model.flame import FlameHead, FlameTexPainted
    from vhap_tpu.preprocess.landmarks import LandmarkDetectorFANJax
    from vhap_tpu.tools.train_fan_synthetic import (IMG_SIZE, _sample_params,
                                                    make_render_fn)

    head = FlameHead.build(n_shape=50, n_expr=30, add_teeth=False)
    tex = FlameTexPainted(head.assets.tex_painted, 256)()
    uv = np.asarray(head.verts_uvs)
    verts_uv = jnp.asarray(np.stack([uv[:, 0], 1.0 - uv[:, 1]], -1))
    render = make_render_fn(head, tex, verts_uv)
    rng = np.random.default_rng(123)
    p = {k: jnp.asarray(v) for k, v in _sample_params(rng, head, 1).items()}
    img, px = render(p)
    img_u8 = (np.asarray(img[0]).clip(0, 1) * 255).astype(np.uint8)

    det = LandmarkDetectorFANJax()
    bb, lmks = det.detect_single_image(img_u8)
    assert bb[0] >= 0, "no face found on a rendered head"
    pred_px = lmks[:, :2] * IMG_SIZE
    err = np.linalg.norm(pred_px - np.asarray(px[0]), axis=-1).mean()
    # synthetic-domain detector: lenient bound that still catches garbage
    assert err < 15.0, f"mean landmark error {err:.1f}px at {IMG_SIZE}px"

"""Native C++ frame loader: build, decode correctness, dataset integration."""

from pathlib import Path

import numpy as np
import pytest
from PIL import Image

from vhap_tpu.data import native_loader


@pytest.fixture(scope="module")
def jpgs(tmp_path_factory):
    d = tmp_path_factory.mktemp("jpgs")
    rng = np.random.default_rng(0)
    paths, apaths = [], []
    for i in range(4):
        img = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
        a = rng.integers(0, 255, (64, 64), dtype=np.uint8)
        p = d / f"{i}.jpg"
        ap = d / f"a{i}.jpg"
        Image.fromarray(img).save(p, quality=95)
        Image.fromarray(a).save(ap, quality=95)
        paths.append(str(p))
        apaths.append(str(ap))
    return paths, apaths


def test_decode_matches_pil(jpgs):
    paths, _ = jpgs
    out = native_loader.decode_batch(paths, 64, 64)
    if out is None:
        pytest.skip("native loader unavailable (no toolchain)")
    for i, p in enumerate(paths):
        ref = np.array(Image.open(p))
        np.testing.assert_array_equal(out[i], ref)  # same libjpeg, no resize


def test_composite_matches_reference_formula(jpgs):
    paths, apaths = jpgs
    res = native_loader.decode_composite_batch(paths, apaths, 64, 64,
                                               (1.0, 1.0, 1.0))
    if res is None:
        pytest.skip("native loader unavailable")
    rgb, alpha = res
    a = np.array(Image.open(apaths[0])).astype(np.float32) / 255
    r = np.array(Image.open(paths[0])).astype(np.float32) / 255
    expect = a[..., None] * r + (1 - a[..., None])  # video_dataset.py:305-323
    np.testing.assert_allclose(rgb[0], expect, atol=1e-5)
    np.testing.assert_allclose(alpha[0], a, atol=1e-5)


def test_missing_file_reports_failure(jpgs):
    paths, _ = jpgs
    out = native_loader.decode_batch(paths[:1] + ["/nonexistent.jpg"], 64, 64)
    assert out is None  # partial batch -> explicit failure, PIL fallback


def test_dataset_native_batch(tmp_path):
    from vhap_tpu.config.base import DataConfig
    from vhap_tpu.data.video_dataset import VideoDataset
    from vhap_tpu.tools.make_synthetic_sequence import generate

    generate(tmp_path / "seq", n_frames=3, size=128)
    cfg = DataConfig(root_folder=tmp_path, sequence="seq")
    cfg.background_color = "white"
    ds = VideoDataset(cfg, img_to_tensor=True)
    nat = ds.load_batch_native([0, 1, 2])
    if nat is None:
        pytest.skip("native loader unavailable")
    rgb, alpha = nat
    assert rgb.shape == (3, 128, 128, 3) and rgb.dtype == np.float32
    # must match the PIL path
    ref = ds[0]["rgb"]
    assert np.abs(rgb[0] - ref).max() < 1e-2  # uint8 rounding differences
    lmk = ds.load_lmk2d(0)
    np.testing.assert_allclose(lmk, ds[0]["lmk2d"], atol=1e-4)


# ---------------------------------------------------------------------------
# Full-chain load_batch: CC + PIL-BILINEAR resize + composite (VERDICT r3 #5)
# ---------------------------------------------------------------------------

def _python_chain(rgb_path, alpha_path, cc, oh, ow, bg):
    """The dataset's transform chain in numpy/PIL, for goldens:
    apply_color_correction -> apply_scale_factor -> apply_background_color
    -> apply_to_tensor."""
    rgb = np.array(Image.open(rgb_path))
    if cc is not None:
        x = rgb / 255
        x = x @ cc[:3, :3] + cc[np.newaxis, :3, 3]
        rgb = (np.clip(x, 0, 1) * 255).astype(np.uint8)
    if rgb.shape[:2] != (oh, ow):
        rgb = np.array(Image.fromarray(rgb).resize((ow, oh), Image.BILINEAR))
    a = np.array(Image.open(alpha_path))
    if a.shape[:2] != (oh, ow):
        a = np.array(Image.fromarray(a).resize((ow, oh), Image.BILINEAR))
    w = a[..., None] / 255
    if bg is not None:
        bg255 = np.full_like(rgb, int(bg[0] * 255))
        rgb = (w * rgb + (1 - w) * bg255).astype(np.uint8)
    return rgb.astype(np.float32) / 255, a.astype(np.float32) / 255


def test_load_batch_cc_resize_composite_golden(jpgs):
    paths, apaths = jpgs
    rng = np.random.default_rng(7)
    cc = np.concatenate([
        np.eye(3) + rng.normal(0, 0.05, (3, 3)),
        rng.normal(0, 0.02, (3, 1))], axis=1)  # (3, 4) affine
    ccs = np.stack([cc] * len(paths))
    res = native_loader.load_batch(paths, apaths, 32, 32, (1.0, 1.0, 1.0),
                                   color_correction=ccs)
    if res is None:
        pytest.skip("native loader unavailable")
    rgb, alpha = res
    for i in range(len(paths)):
        want_rgb, want_a = _python_chain(paths[i], apaths[i], cc, 32, 32,
                                         (1.0, 1.0, 1.0))
        # resize coefficients are float here vs PIL's 8-bit fixed point
        assert np.abs(rgb[i] - want_rgb).max() <= 3 / 255, i
        assert np.abs(alpha[i] - want_a).max() <= 3 / 255, i


def test_load_batch_no_resize_cc_bitexact(jpgs):
    """Without resize, the CC + quantize + composite chain must be
    bit-exact against the reference formulas (truncating astype)."""
    paths, apaths = jpgs
    rng = np.random.default_rng(8)
    ccs = np.stack([np.concatenate([
        np.eye(3) + rng.normal(0, 0.05, (3, 3)),
        rng.normal(0, 0.02, (3, 1))], axis=1) for _ in paths])
    res = native_loader.load_batch(paths, apaths, 64, 64, (0.0, 0.0, 0.0),
                                   color_correction=ccs)
    if res is None:
        pytest.skip("native loader unavailable")
    rgb, alpha = res
    for i in range(len(paths)):
        want_rgb, want_a = _python_chain(paths[i], apaths[i], ccs[i], 64, 64,
                                         (0.0, 0.0, 0.0))
        np.testing.assert_array_equal(rgb[i], want_rgb, err_msg=str(i))
        np.testing.assert_array_equal(alpha[i], want_a, err_msg=str(i))


def test_multiview_native_matches_pil_path(tmp_path):
    """getitem_by_timestep's native fast path must agree with the pure
    PIL path on a NeRSemble-layout sequence with color correction AND
    scale_factor — the exact config the loader previously bailed on."""
    from vhap_tpu.config.nersemble import NersembleDataConfig
    from vhap_tpu.data.nersemble_dataset import NeRSembleDataset
    from vhap_tpu.tools.make_synthetic_multiview import generate_multiview

    root = tmp_path
    gt, cam_ids = generate_multiview(root, n_cams=3, n_frames=2, size=128)
    rng = np.random.default_rng(9)
    ccdir = root / "color_correction" / "001"
    ccdir.mkdir(parents=True)
    for cid in cam_ids:
        m = np.concatenate([np.eye(3) + rng.normal(0, 0.05, (3, 3)),
                            rng.normal(0, 0.02, (3, 1))], axis=1)
        np.save(ccdir / f"{cid}.npy", m)

    cfg = NersembleDataConfig()
    cfg.root_folder = root
    cfg.subject = "001"
    cfg.sequence = "SEN-01"
    cfg.align_cameras_to_axes = False
    cfg.use_color_correction = True
    cfg.background_color = "white"
    cfg.use_alpha_map = True
    cfg.scale_factor = 0.5
    ds = NeRSembleDataset(cfg, img_to_tensor=True)
    if not ds.supports_native_batch() or ds.load_batch_native([0]) is None:
        pytest.skip("native loader unavailable")

    nat = ds.getitem_by_timestep(0)
    ds.supports_native_batch = lambda: False  # force the PIL path
    ref = ds.getitem_by_timestep(0)

    assert nat["rgb"].shape == ref["rgb"].shape == (3, 64, 64, 3)
    assert np.abs(nat["rgb"] - ref["rgb"]).max() <= 3 / 255
    assert np.abs(nat["alpha_map"] - ref["alpha_map"]).max() <= 3 / 255
    np.testing.assert_allclose(nat["lmk2d"], ref["lmk2d"], atol=1e-4)
    np.testing.assert_allclose(nat["intrinsic"], ref["intrinsic"], rtol=1e-6)
    np.testing.assert_allclose(nat["extrinsic"], ref["extrinsic"], rtol=1e-6)

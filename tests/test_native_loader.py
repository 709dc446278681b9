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

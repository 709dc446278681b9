"""Foreground alpha matting backends that run without external downloads.

The reference preprocesses footage with two torch models fetched from the
network: RobustVideoMatting (monocular, vhap/preprocess_video.py:54-86) and
BackgroundMattingV2 (multiview with background plates, :88-134). Those
remain available behind their original gates in vhap_tpu/preprocess/video.py;
this module adds two self-contained backends with the same output contract
(alpha_maps/<frame>.jpg):

  * background_diff_matting — classical matting for the calibrated rig
    case where background plates exist: robust color distance against the
    plate, hysteresis thresholding, and a guided-filter refinement (He et
    al. 2010) against the image luminance.
  * MattingUNetJax — a small encoder/decoder network in pure JAX, trained
    in-repo on synthetic FLAME renders over augmented backgrounds
    (vhap_tpu/tools/train_matting_synthetic.py) — the monocular path with
    no plates and no downloads.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional

import numpy as np

from vhap_tpu.util.log import get_logger

logger = get_logger(__name__)


# ---------------------------------------------------------------------------
# classical: background-difference matting with guided-filter refinement
# ---------------------------------------------------------------------------

def _box(img: np.ndarray, r: int) -> np.ndarray:
    """Box filter with edge-clamped window sums via integral images."""
    h, w = img.shape[:2]
    pad = np.pad(img, [(1, 0), (1, 0)] + [(0, 0)] * (img.ndim - 2))
    ii = pad.cumsum(0).cumsum(1)
    y0 = np.clip(np.arange(h) - r, 0, h)
    y1 = np.clip(np.arange(h) + r + 1, 0, h)
    x0 = np.clip(np.arange(w) - r, 0, w)
    x1 = np.clip(np.arange(w) + r + 1, 0, w)
    area = ((y1 - y0)[:, None] * (x1 - x0)[None, :]).astype(np.float32)
    s = ii[y1[:, None], x1[None, :]] - ii[y0[:, None], x1[None, :]] \
        - ii[y1[:, None], x0[None, :]] + ii[y0[:, None], x0[None, :]]
    return s / area.reshape(area.shape + (1,) * (img.ndim - 2))


def guided_filter(guide: np.ndarray, src: np.ndarray, r: int = 8,
                  eps: float = 1e-3) -> np.ndarray:
    """Single-channel guided filter (guide, src (H, W) float32)."""
    mean_i = _box(guide, r)
    mean_p = _box(src, r)
    corr_ip = _box(guide * src, r)
    corr_ii = _box(guide * guide, r)
    cov_ip = corr_ip - mean_i * mean_p
    var_i = corr_ii - mean_i * mean_i
    a = cov_ip / (var_i + eps)
    b = mean_p - a * mean_i
    return _box(a, r) * guide + _box(b, r)


def alpha_from_background_diff(img: np.ndarray, bg: np.ndarray,
                               lo: float = 0.04, hi: float = 0.14,
                               refine_r: int = 8) -> np.ndarray:
    """img, bg (H, W, 3) float32 in [0,1] -> alpha (H, W) float32.

    Distance is the max channel difference with a local-mean term for
    robustness to noise; lo/hi give a soft hysteresis ramp; the guided
    filter snaps the ramp to image edges.
    """
    d = np.abs(img - bg)
    dist = 0.5 * d.max(-1) + 0.5 * _box(d.mean(-1), 2)
    alpha = np.clip((dist - lo) / (hi - lo), 0.0, 1.0).astype(np.float32)
    guide = img.mean(-1).astype(np.float32)
    alpha = np.clip(guided_filter(guide, alpha, refine_r), 0.0, 1.0)
    return alpha


def background_diff_matting(image_dir: Path, background_folder: Path,
                            lo: float = 0.04, hi: float = 0.14):
    """Write alpha_maps/ for every frame using per-camera background plates
    (same output contract as vhap/preprocess_video.py:88-134)."""
    from PIL import Image
    from vhap_tpu.preprocess.video import _find_background

    image_dir = Path(image_dir)
    out_dir = image_dir.parent / "alpha_maps"
    out_dir.mkdir(exist_ok=True, parents=True)
    frames = sorted(p for p in image_dir.iterdir()
                    if p.suffix.lower() in (".jpg", ".png", ".jpeg"))
    bg_cache: Dict[str, np.ndarray] = {}
    for f in frames:
        cam = f.stem.split("_")[0]
        if cam not in bg_cache:
            bg_path = _find_background(Path(background_folder), cam)
            bg_cache[cam] = np.asarray(
                Image.open(bg_path), np.float32)[..., :3] / 255.0
        img = np.asarray(Image.open(f), np.float32)[..., :3] / 255.0
        bg = bg_cache[cam]
        if bg.shape != img.shape:
            bg = np.asarray(Image.fromarray(
                (bg * 255).astype(np.uint8)).resize(
                    (img.shape[1], img.shape[0])), np.float32) / 255.0
        alpha = alpha_from_background_diff(img, bg, lo, hi)
        Image.fromarray((alpha * 255).astype(np.uint8)).save(
            out_dir / f"{f.stem}.jpg", quality=95)
    logger.info(f"background_diff_matting: wrote {len(frames)} alpha maps "
                f"to {out_dir}")


# ---------------------------------------------------------------------------
# learned: small U-Net in pure JAX (synthetic-trained)
# ---------------------------------------------------------------------------

def init_unet_params(key, base: int = 16, levels: int = 4, in_ch: int = 3):
    """Encoder/decoder with skip connections; output 1-channel logit."""
    import jax
    from vhap_tpu.preprocess.fan import _init_conv

    keys = iter(jax.random.split(key, 6 * levels + 4))
    p: Dict = {"meta": {"base": base, "levels": levels, "in_ch": in_ch}}
    c_in = in_ch
    for i in range(levels):
        c_out = base << i
        p[f"enc{i}_a"] = _init_conv(next(keys), 3, 3, c_in, c_out)
        p[f"enc{i}_b"] = _init_conv(next(keys), 3, 3, c_out, c_out)
        c_in = c_out
    for i in range(levels - 2, -1, -1):
        c_skip = base << i
        c_up = base << (i + 1)
        p[f"dec{i}_a"] = _init_conv(next(keys), 3, 3, c_up + c_skip, c_skip)
        p[f"dec{i}_b"] = _init_conv(next(keys), 3, 3, c_skip, c_skip)
    p["out"] = _init_conv(next(keys), 3, 3, base, 1)
    return p


def unet_forward(params: Dict, x):
    """x (B, H, W, in_ch) -> alpha logits (B, H, W, 1). H, W % 2^levels == 0."""
    import jax
    import jax.numpy as jnp
    from vhap_tpu.preprocess.fan import avg_pool2, conv2d, upsample2_nearest

    levels = int(params["meta"]["levels"])
    skips = []
    h = x
    for i in range(levels):
        h = jax.nn.relu(conv2d(h, params[f"enc{i}_a"], padding=1))
        h = jax.nn.relu(conv2d(h, params[f"enc{i}_b"], padding=1))
        if i < levels - 1:
            skips.append(h)
            h = avg_pool2(h)
    for i in range(levels - 2, -1, -1):
        h = jnp.concatenate([upsample2_nearest(h), skips[i]], axis=-1)
        h = jax.nn.relu(conv2d(h, params[f"dec{i}_a"], padding=1))
        h = jax.nn.relu(conv2d(h, params[f"dec{i}_b"], padding=1))
    return conv2d(h, params["out"], padding=1)


class MattingUNetJax:
    """Per-frame alpha matting with the synthetic-trained JAX U-Net."""

    def __init__(self, params_path: Optional[str] = None, params=None):
        from vhap_tpu.preprocess.fan import load_fan_params
        if params is None:
            if params_path is None:
                params_path = str(Path(__file__).resolve().parents[1]
                                  / "assets" / "matting_weights.npz")
            if not Path(params_path).exists():
                raise RuntimeError(
                    f"No matting weights at {params_path}; train them with "
                    "python -m vhap_tpu.tools.train_matting_synthetic")
            params = load_fan_params(str(params_path))
        import jax
        self.params = params
        self._fwd = jax.jit(
            lambda x: jax.nn.sigmoid(unet_forward(params, x))[..., 0])

    def predict(self, img: np.ndarray) -> np.ndarray:
        """img (H, W, 3) float32 [0,1] -> alpha (H, W) float32 [0,1].

        Pads to the U-Net's stride, runs at full resolution, and refines
        with the guided filter like the classical path.
        """
        h, w = img.shape[:2]
        stride = 1 << (int(self.params["meta"]["levels"]) - 1)
        ph = (-h) % stride
        pw = (-w) % stride
        x = np.pad(img, ((0, ph), (0, pw), (0, 0)), mode="edge")
        alpha = np.asarray(self._fwd(x[None].astype(np.float32)))[0][:h, :w]
        alpha = np.clip(guided_filter(img.mean(-1).astype(np.float32),
                                      alpha, 4), 0.0, 1.0)
        return alpha


def matting_jax(image_dir: Path, params_path: Optional[str] = None):
    """Write alpha_maps/ for every frame with MattingUNetJax (monocular,
    no background plates — the RobustVideoMatting slot)."""
    from PIL import Image

    net = MattingUNetJax(params_path)
    image_dir = Path(image_dir)
    out_dir = image_dir.parent / "alpha_maps"
    out_dir.mkdir(exist_ok=True, parents=True)
    frames = sorted(p for p in image_dir.iterdir()
                    if p.suffix.lower() in (".jpg", ".png", ".jpeg"))
    for f in frames:
        img = np.asarray(Image.open(f), np.float32)[..., :3] / 255.0
        alpha = net.predict(img)
        Image.fromarray((alpha * 255).astype(np.uint8)).save(
            out_dir / f"{f.stem}.jpg", quality=95)
    logger.info(f"matting_jax: wrote {len(frames)} alpha maps to {out_dir}")

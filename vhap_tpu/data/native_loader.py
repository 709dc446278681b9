"""ctypes bindings for the native frame loader (vhap_tpu/native).

Builds libframeloader.so on first use (g++ + libjpeg, both in the image)
and exposes batch decode / decode+composite. Callers fall back to the PIL
path automatically when the toolchain or libjpeg is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import List, Optional, Tuple

import numpy as np

from vhap_tpu.util.log import get_logger

logger = get_logger(__name__)

_NATIVE_DIR = Path(__file__).resolve().parents[1] / "native"
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build() -> Optional[Path]:
    so = _NATIVE_DIR / "libframeloader.so"
    src = _NATIVE_DIR / "frameloader.cpp"
    if so.exists() and so.stat().st_mtime >= src.stat().st_mtime:
        return so
    try:
        subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                       capture_output=True)
        return so
    except Exception as e:
        logger.warning(f"native frameloader build failed ({e}); "
                       "falling back to PIL decoding")
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    so = _build()
    if so is None:
        return None
    lib = ctypes.CDLL(str(so))
    lib.fl_decode_batch.restype = ctypes.c_int
    lib.fl_decode_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.c_int]
    lib.fl_decode_composite_batch.restype = ctypes.c_int
    lib.fl_decode_composite_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_int]
    lib.fl_load_batch.restype = ctypes.c_int
    lib.fl_load_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int, ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_int]
    _LIB = lib
    return _LIB


def _paths_array(paths: List[Optional[str]]):
    arr = (ctypes.c_char_p * len(paths))()
    for i, p in enumerate(paths):
        arr[i] = None if p is None else str(p).encode()
    return arr


def decode_batch(paths: List[str], oh: int, ow: int,
                 n_threads: int = 4) -> Optional[np.ndarray]:
    """Decode+resize a batch of JPEGs to (n, oh, ow, 3) uint8."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(paths)
    out = np.empty((n, oh, ow, 3), np.uint8)
    ok = lib.fl_decode_batch(
        _paths_array(paths), n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), oh, ow, n_threads)
    if ok != n:
        logger.warning(f"native decode: {ok}/{n} frames decoded")
        return None
    return out


def decode_composite_batch(
    rgb_paths: List[str], alpha_paths: Optional[List[Optional[str]]],
    oh: int, ow: int, background: Optional[Tuple[float, float, float]],
    n_threads: int = 4,
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Decode rgb (+ alpha) pairs -> float32 rgb [0,1] composited onto a
    constant background, plus float32 alpha. background=None skips
    compositing."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(rgb_paths)
    out_rgb = np.empty((n, oh, ow, 3), np.float32)
    out_alpha = np.empty((n, oh, ow), np.float32)
    bg = background if background is not None else (-1.0, -1.0, -1.0)
    alpha_arr = (_paths_array(alpha_paths) if alpha_paths is not None
                 else ctypes.cast(None, ctypes.POINTER(ctypes.c_char_p)))
    ok = lib.fl_decode_composite_batch(
        _paths_array(rgb_paths), alpha_arr, n,
        out_rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out_alpha.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        oh, ow, bg[0], bg[1], bg[2], n_threads)
    if ok != n:
        logger.warning(f"native decode+composite: {ok}/{n} frames decoded")
        return None
    return out_rgb, out_alpha


def load_batch(
    rgb_paths: List[str], alpha_paths: Optional[List[Optional[str]]],
    oh: int, ow: int, background: Optional[Tuple[float, float, float]],
    color_correction: Optional[np.ndarray] = None,
    n_threads: int = 4,
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Full dataset transform chain in C++: decode, optional per-frame
    3x4 affine color correction (reference quantization semantics),
    PIL-BILINEAR resize to (oh, ow), optional background composite ->
    float32 rgb [0,1] + float32 alpha. Replicates apply_color_correction +
    apply_scale_factor + apply_background_color + apply_to_tensor
    (vhap/data/nersemble_dataset.py:165-171, video_dataset.py:272-323)."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(rgb_paths)
    out_rgb = np.empty((n, oh, ow, 3), np.float32)
    out_alpha = np.empty((n, oh, ow), np.float32)
    bg = background if background is not None else (-1.0, -1.0, -1.0)
    alpha_arr = (_paths_array(alpha_paths) if alpha_paths is not None
                 else ctypes.cast(None, ctypes.POINTER(ctypes.c_char_p)))
    if color_correction is not None:
        cc = np.ascontiguousarray(color_correction, np.float64)
        assert cc.shape == (n, 3, 4), cc.shape
        cc_ptr = cc.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
    else:
        cc_ptr = ctypes.cast(None, ctypes.POINTER(ctypes.c_double))
    ok = lib.fl_load_batch(
        _paths_array(rgb_paths), alpha_arr, n, cc_ptr,
        out_rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out_alpha.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        oh, ow, bg[0], bg[1], bg[2], n_threads)
    if ok != n:
        logger.warning(f"native load_batch: {ok}/{n} frames loaded")
        return None
    return out_rgb, out_alpha

"""Shading: vertex/face normals, spherical-harmonics lighting, vector ops.

Ports vhap/util/vector_ops.py and the shading stack of
vhap/util/render_nvdiffrast.py:19-53,297-347 to JAX.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np


def dot(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(x * y, axis=-1, keepdims=True)


def reflect(x: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    return 2 * dot(x, n) * n - x


def length(x: jnp.ndarray, eps: float = 1e-20) -> jnp.ndarray:
    # eps-clamped sqrt keeps grad(sqrt(0)) finite (vhap/util/vector_ops.py:10-11)
    return jnp.sqrt(jnp.clip(dot(x, x), eps, None))


def safe_normalize(x: jnp.ndarray, eps: float = 1e-20) -> jnp.ndarray:
    return x / length(x, eps)


def compute_face_normals(verts: jnp.ndarray, faces: jnp.ndarray) -> jnp.ndarray:
    """(B, V, 3) x (F, 3) -> unit face normals (B, F, 3)
    (vhap/util/render_nvdiffrast.py:318-330)."""
    v0 = verts[:, faces[:, 0]]
    v1 = verts[:, faces[:, 1]]
    v2 = verts[:, faces[:, 2]]
    fn = jnp.cross(v1 - v0, v2 - v0)
    return safe_normalize(fn)


def compute_v_normals(verts: jnp.ndarray, faces: jnp.ndarray) -> jnp.ndarray:
    """Area-weighted vertex normals via scatter-add
    (vhap/util/render_nvdiffrast.py:297-316)."""
    v0 = verts[:, faces[:, 0]]
    v1 = verts[:, faces[:, 1]]
    v2 = verts[:, faces[:, 2]]
    fn = jnp.cross(v1 - v0, v2 - v0)          # un-normalized (area weighting)
    # one packed scatter-add instead of three (scatters dominate on TPU)
    all_idx = jnp.concatenate([faces[:, 0], faces[:, 1], faces[:, 2]])
    fn3 = jnp.concatenate([fn, fn, fn], axis=1)
    vn = jnp.zeros_like(verts).at[:, all_idx].add(fn3)
    fallback = jnp.asarray([0.0, 0.0, 1.0], verts.dtype)
    vn = jnp.where(dot(vn, vn) > 1e-20, vn, fallback)
    return safe_normalize(vn)


# constant factors of the first three SH bands
# (vhap/util/render_nvdiffrast.py:81-97)
_pi = np.pi
SH_CONST = np.array([
    1 / np.sqrt(4 * _pi),
    ((2 * _pi) / 3) * np.sqrt(3 / (4 * _pi)),
    ((2 * _pi) / 3) * np.sqrt(3 / (4 * _pi)),
    ((2 * _pi) / 3) * np.sqrt(3 / (4 * _pi)),
    (_pi / 4) * 3 * np.sqrt(5 / (12 * _pi)),
    (_pi / 4) * 3 * np.sqrt(5 / (12 * _pi)),
    (_pi / 4) * 3 * np.sqrt(5 / (12 * _pi)),
    (_pi / 4) * (3 / 2) * np.sqrt(5 / (12 * _pi)),
    (_pi / 4) * (1 / 2) * np.sqrt(5 / (4 * _pi)),
], dtype=np.float32)


def sh_shading(normals: jnp.ndarray, sh_coefficients: jnp.ndarray) -> jnp.ndarray:
    """9-band SH diffuse shading (vhap/util/render_nvdiffrast.py:19-53).

    normals (..., 3); sh_coefficients (B, 9, 3) broadcast over pixels.
    Returns (..., 3).
    """
    N = normals
    sh = jnp.stack([
        N[..., 0] * 0.0 + 1.0,
        N[..., 0], N[..., 1], N[..., 2],
        N[..., 0] * N[..., 1], N[..., 0] * N[..., 2], N[..., 1] * N[..., 2],
        N[..., 0] ** 2 - N[..., 1] ** 2,
        3 * (N[..., 2] ** 2) - 1,
    ], axis=-1) * jnp.asarray(SH_CONST)
    # (B, ..., 9) x (B|1, 9, 3) -> (B, ..., 3). Broadcast shared lights to
    # the pixel batch explicitly: an ellipsis einsum that absorbs the batch
    # axis ("...k,bkc->...c") silently SUMS over the lights batch instead,
    # shading every pixel with the sum of all batch elements' lights.
    if sh_coefficients.shape[0] == 1 and sh.shape[0] != 1:
        sh_coefficients = jnp.broadcast_to(
            sh_coefficients, (sh.shape[0],) + sh_coefficients.shape[1:])
    return jnp.einsum("b...k,bkc->b...c", sh, sh_coefficients)


def shade(normal: jnp.ndarray, lighting_type: str,
          lights: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Per-pixel diffuse term (vhap/util/render_nvdiffrast.py:332-347)."""
    if lighting_type == "constant":
        return jnp.ones_like(normal[..., :3])
    if lighting_type == "front":
        d = dot(normal, jnp.asarray([0.0, 0.0, 1.0], normal.dtype))
        return jnp.where(d < 0, jnp.abs(d) * 0.3, d)
    if lighting_type == "front-range":
        bias = 0.75
        d = dot(normal, jnp.asarray([0.0, 0.0, 1.0], normal.dtype)) + bias
        return jnp.clip(d, 0.0, 1.0)
    if lighting_type == "SH":
        return sh_shading(normal, lights)
    raise NotImplementedError(f"Unknown lighting type: {lighting_type}")


def shade_planes(nx, ny, nz, lighting_type: str, lights=None):
    """Channel-plane `shade`: unit-normal component planes of one common
    shape (B, ...) -> [r, g, b] diffuse planes. Used by the tiled render
    path, where trailing-channel tensors would break the (16, 128) layout
    (docs/PERF.md round 5); same math as shade()/sh_shading()."""
    if lighting_type == "constant":
        one = jnp.ones_like(nx)
        return [one, one, one]
    if lighting_type == "front":
        d = jnp.where(nz < 0, jnp.abs(nz) * 0.3, nz)
        return [d, d, d]
    if lighting_type == "front-range":
        d = jnp.clip(nz + 0.75, 0.0, 1.0)
        return [d, d, d]
    if lighting_type == "SH":
        basis = [jnp.ones_like(nx), nx, ny, nz, nx * ny, nx * nz, ny * nz,
                 nx * nx - ny * ny, 3.0 * nz * nz - 1.0]
        B = nx.shape[0]
        L = lights
        if L.shape[0] == 1 and B != 1:
            L = jnp.broadcast_to(L, (B,) + L.shape[1:])
        pix = (1,) * (nx.ndim - 1)
        out = []
        for c in range(3):
            acc = None
            for k in range(9):
                term = basis[k] * (float(SH_CONST[k])
                                   * L[:, k, c].reshape((B,) + pix))
                acc = term if acc is None else acc + term
            out.append(acc)
        return out
    raise NotImplementedError(f"Unknown lighting type: {lighting_type}")


def uniform_sh_lights() -> np.ndarray:
    """SH coefficients of uniform white light (vhap/model/tracker.py:1301-1304)."""
    lights = np.zeros((9, 3), np.float32)
    lights[0] = np.sqrt(4 * np.pi)
    return lights

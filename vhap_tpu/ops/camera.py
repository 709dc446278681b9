"""Camera transforms: intrinsics -> GL projection, world/camera/clip/NDC.

JAX port of the transform stack in vhap/util/render_nvdiffrast.py:102-214,
preserving the exact convention (OpenGL clip space, z_sign = -1, y-up in
clip space => rendered buffers are bottom-up until the final flip).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def projection_from_intrinsics(K: jnp.ndarray, image_size: Tuple[int, int],
                               near: float = 0.1, far: float = 10.0) -> jnp.ndarray:
    """Intrinsics (N,3,3) or (N,4)[fx,fy,cx,cy] -> GL projection (N,4,4).

    Matches vhap/util/render_nvdiffrast.py:117-160 (camera space x-right,
    y-up, z-out; clip space x-right, y-down... see reference docstring).
    """
    if K.shape[-2:] == (3, 3):
        fx, fy = K[..., 0, 0], K[..., 1, 1]
        cx, cy = K[..., 0, 2], K[..., 1, 2]
    elif K.shape[-1] == 4:
        fx, fy, cx, cy = K[..., 0], K[..., 1], K[..., 2], K[..., 3]
    else:
        raise ValueError(f"Expected K (N,3,3) or (N,4), got {K.shape}")

    B = K.shape[0]
    h, w = image_size
    z = jnp.zeros_like(fx)
    o = jnp.ones_like(fx)
    row0 = jnp.stack([fx * 2 / w, z, (w - 2 * cx) / w, z], axis=-1)
    row1 = jnp.stack([z, fy * 2 / h, (h - 2 * cy) / h, z], axis=-1)
    row2 = jnp.stack([z, z, o * (-(far + near) / (far - near)),
                      o * (-2 * far * near / (far - near))], axis=-1)
    row3 = jnp.stack([z, z, -o, z], axis=-1)
    return jnp.stack([row0, row1, row2, row3], axis=-2)


def _pad_rt(RT: jnp.ndarray) -> jnp.ndarray:
    """(N,3,4) world->camera -> (N,4,4) homogeneous."""
    if RT.shape[-2] == 4:
        return RT
    bottom = jnp.zeros_like(RT[..., :1, :]).at[..., 0, 3].set(1.0)
    return jnp.concatenate([RT, bottom], axis=-2)


def _homogenize(vtx: jnp.ndarray) -> jnp.ndarray:
    if vtx.shape[-1] == 4:
        return vtx
    return jnp.concatenate([vtx, jnp.ones_like(vtx[..., :1])], axis=-1)


def world_to_camera(vtx: jnp.ndarray, RT: jnp.ndarray) -> jnp.ndarray:
    """(B,V,3|4) x (B,3|4,4) -> (B,V,4). vhap/util/render_nvdiffrast.py:162-179."""
    mv = _pad_rt(RT)
    return jnp.einsum("bvc,brc->bvr", _homogenize(vtx), mv)


def camera_to_clip(vtx: jnp.ndarray, K: jnp.ndarray, image_size) -> jnp.ndarray:
    """(B,V,3|4) -> clip (B,V,4). vhap/util/render_nvdiffrast.py:181-197."""
    proj = projection_from_intrinsics(K, image_size)
    return jnp.einsum("bvc,brc->bvr", _homogenize(vtx), proj)


def world_to_clip(vtx: jnp.ndarray, RT: jnp.ndarray, K: jnp.ndarray, image_size) -> jnp.ndarray:
    return camera_to_clip(world_to_camera(vtx, RT), K, image_size)


def world_to_ndc(vtx: jnp.ndarray, RT: jnp.ndarray, K: jnp.ndarray, image_size,
                 flip_y: bool = False) -> jnp.ndarray:
    """NDC positions (B,V,3). vhap/util/render_nvdiffrast.py:208-214."""
    clip = world_to_clip(vtx, RT, K, image_size)
    ndc = clip[..., :3] / clip[..., 3:]
    if flip_y:
        ndc = ndc * jnp.asarray([1.0, -1.0, 1.0], ndc.dtype)
    return ndc

"""UV-space rasterization helpers (vhap/util/render_uvmap.py).

Renders the UV layout itself (uv verts as positions) with vertex colors or
a texture — used to bake per-region texel masks and for debugging.
"""

from __future__ import annotations

import jax.numpy as jnp

from vhap_tpu.ops.antialias import antialias
from vhap_tpu.ops.rasterize import interpolate, rasterize
from vhap_tpu.ops.texture import texture_sample


def transform_vt(vt: jnp.ndarray) -> jnp.ndarray:
    """UV verts (Vt, 2) -> clip space (1, Vt, 4) (render_uvmap.py:22-28)."""
    xy = vt * 2 - 1
    w = jnp.ones_like(vt[:, :1])
    z = -w
    return jnp.concatenate([xy, z, w], axis=-1)[None]


def render_uvmap_vtex(pos, pos_idx, v_color, col_idx, resolution,
                      backend="xla"):
    """Rasterize the UV layout with per-vertex colors (render_uvmap.py:30-37).

    NOTE: UV-space triangles have arbitrary winding, so culling is off.
    """
    pos_clip = transform_vt(pos)
    rast, rast_db, tri_id = rasterize(pos_clip, pos_idx, tuple(resolution),
                                      backend=backend, cull_backfaces=False)
    color, _ = interpolate(v_color[None], rast, col_idx)
    color = antialias(color, rast, pos_clip, pos_idx)
    return color


def render_uvmap_texmap(pos, pos_idx, verts_uv, faces_uv, tex, resolution,
                        enable_mip=True, max_mip_level=None, backend="xla"):
    """Rasterize the UV layout sampling a texture (render_uvmap.py:39-51)."""
    pos_clip = transform_vt(pos)
    rast, rast_db, tri_id = rasterize(pos_clip, pos_idx, tuple(resolution),
                                      backend=backend, cull_backfaces=False)
    if enable_mip:
        texc, texd = interpolate(verts_uv[None], rast, faces_uv,
                                 rast_db=rast_db, diff_attrs="all")
        color = texture_sample(tex[None], texc, texd,
                               filter_mode="linear-mipmap-linear",
                               max_mip_level=max_mip_level)
    else:
        texc, _ = interpolate(verts_uv[None], rast, faces_uv)
        color = texture_sample(tex[None], texc, filter_mode="linear")
    color = antialias(color, rast, pos_clip, pos_idx)
    return color

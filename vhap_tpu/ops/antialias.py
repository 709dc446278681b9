"""Analytic silhouette antialiasing with vertex-position gradients.

TPU-native replacement for nvdiffrast's `dr.antialias`
(vhap/util/render_nvdiffrast.py:463-466). This op is the *only* source of
gradients that move the mesh silhouette across the image, so its gradient
sign/structure matters far more than its exact pixel values.

Method (vectorized over all adjacent pixel pairs, horizontal + vertical):
  * a pair participates when the two pixels have different triangle ids and
    the boundary is a *silhouette* — one side is background, or the two
    triangles do not share an edge (two common vertices);
  * the foreground pixel is the one covered by the nearer (or only)
    triangle; its triangle's edges are intersected with the segment between
    the two pixel centers, giving the crossing position t in [0, 1]
    (computed from the affine barycentric planes, hence differentiable
    w.r.t. the clip-space vertex positions);
  * blending transfers color across the pair proportionally to how far the
    edge pokes past the midpoint: if t > 1/2 the neighbor pixel receives
    `w = t - 1/2` of the foreground color; if t < 1/2 the foreground pixel
    receives `w = 1/2 - t` of the neighbor color;
  * each edge is owned by its dominant axis (nvdiffrast's rule), so
    diagonal edges are not double-blended by both passes.

Implementation note: everything is carried as separate (B, H, W) channel
planes gathered from per-face (B, F) tables — 5-D per-pixel tensors with
tiny minor dims would be tiled catastrophically on TPU (see
rasterize.py's layout note).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from vhap_tpu.ops.rasterize import (face_attribute_planes,
                                    gather_face_planes_packed, pixel_grid)


AA_PLANE_KEYS = ("a0x", "a0y", "a0c", "a1x", "a1y", "a1c")


def _pixel_planes(verts_clip, faces, tri_id, vid_planes=None,
                  a_planes=None) -> Dict[str, jnp.ndarray]:
    """Per-pixel edge-plane channels + corner vertex ids of the winning face.

    vid_planes / a_planes: optional precomputed pixel planes (render_rgba's
    fused gather already produced them — reuse saves 4M-pixel gathers and
    their ~60 ms backward scatters)."""
    B, H, W = tri_id.shape
    fid = jnp.maximum(tri_id - 1, 0)
    if a_planes is not None:
        out = dict(zip(AA_PLANE_KEYS, a_planes))
    else:
        p = face_attribute_planes(verts_clip, faces)
        packed = jnp.stack([p[k] for k in AA_PLANE_KEYS], axis=1)  # (B, 6, F)
        out = dict(zip(AA_PLANE_KEYS, gather_face_planes_packed(packed, fid)))
    out["a2x"] = -(out["a0x"] + out["a1x"])
    out["a2y"] = -(out["a0y"] + out["a1y"])
    out["a2c"] = 1.0 - out["a0c"] - out["a1c"]
    if vid_planes is None:
        vid_tables = jnp.broadcast_to(faces.T[None], (B, 3, faces.shape[0]))
        vid_planes = gather_face_planes_packed(vid_tables, fid)
    for k in range(3):
        out[f"vid{k}"] = vid_planes[k]
    return out


def _pair_weights(tri_id_p, tri_id_q, zw_p, zw_q, pl_p, pl_q,
                  cx_p, cy_p, cx_q, cy_q, horizontal: bool):
    """Edge-crossing blend weights for adjacent pixel pairs p, q.

    All inputs are channel-plane arrays of one common shape. Returns
    (w_f, w_o, p_is_fg): foreground-side and other-side blend weights
    (already masked by pair activity) and which side is foreground.
    Shared by the image-layout and tiled-layout antialias paths.
    """
    differs = tri_id_p != tri_id_q
    both_fg = (tri_id_p > 0) & (tri_id_q > 0)

    # interior edges (two shared corners) are not antialiased
    shared = jnp.zeros(tri_id_p.shape, jnp.int32)
    for i in range(3):
        for j in range(3):
            shared += (pl_p[f"vid{i}"] == pl_q[f"vid{j}"]).astype(jnp.int32)
    silhouette = jnp.where(both_fg, shared < 2, True)
    active = differs & silhouette & ((tri_id_p > 0) | (tri_id_q > 0))

    # foreground side: covered and nearer
    p_is_fg = jnp.where(both_fg, zw_p < zw_q, tri_id_p > 0)
    sel = lambda a, b: jnp.where(p_is_fg, a, b)

    cx_f, cy_f = sel(cx_p, cx_q), sel(cy_p, cy_q)
    cx_o, cy_o = sel(cx_q, cx_p), sel(cy_q, cy_p)

    # edge crossing between the centers for each of the fg face's 3 edges
    t_star = None
    ax_star = ay_star = None
    for i in range(3):
        ax = sel(pl_p[f"a{i}x"], pl_q[f"a{i}x"])
        ay = sel(pl_p[f"a{i}y"], pl_q[f"a{i}y"])
        ac = sel(pl_p[f"a{i}c"], pl_q[f"a{i}c"])
        bf = ax * cx_f + ay * cy_f + ac
        bo = ax * cx_o + ay * cy_o + ac
        denom = bf - bo
        denom = jnp.where(jnp.abs(denom) > 1e-12, denom, 1e-12)
        t = bf / denom
        crossing = (bf >= 0) & (bo < 0)
        t = jnp.where(crossing, t, 2.0)            # inactive edge -> beyond
        if t_star is None:
            t_star, ax_star, ay_star = t, ax, ay
        else:
            closer = t < t_star
            ax_star = jnp.where(closer, ax, ax_star)
            ay_star = jnp.where(closer, ay, ay_star)
            t_star = jnp.minimum(t, t_star)

    has_cross = t_star <= 1.0
    t_star = jnp.clip(t_star, 0.0, 1.0)

    # dominant-axis ownership: |ax| >= |ay| <=> edge is more vertical
    axis_ok = (jnp.abs(ax_star) >= jnp.abs(ay_star) if horizontal
               else jnp.abs(ay_star) > jnp.abs(ax_star))

    w = t_star - 0.5
    active = active & has_cross & axis_ok
    w_o = jnp.clip(w, 0.0, 0.5) * active
    w_f = jnp.clip(-w, 0.0, 0.5) * active
    return w_f, w_o, p_is_fg


def _pair_blend(color_p, color_q, tri_id_p, tri_id_q, zw_p, zw_q,
                pl_p, pl_q, cx_p, cy_p, cx_q, cy_q, horizontal: bool):
    """Blend deltas for adjacent pixel pairs p, q (channel-plane arrays)."""
    w_f, w_o, p_is_fg = _pair_weights(
        tri_id_p, tri_id_q, zw_p, zw_q, pl_p, pl_q,
        cx_p, cy_p, cx_q, cy_q, horizontal)
    color_f = jnp.where(p_is_fg[..., None], color_p, color_q)
    color_o = jnp.where(p_is_fg[..., None], color_q, color_p)

    # blend in the color dtype (bf16 color chain): the f32 edge weights
    # cast down at the multiply; their cotangent (the silhouette gradient)
    # casts back up to f32 on the geometry side
    delta_f = w_f.astype(color_f.dtype)[..., None] * (color_o - color_f)
    delta_o = w_o.astype(color_f.dtype)[..., None] * (color_f - color_o)

    delta_p = jnp.where(p_is_fg[..., None], delta_f, delta_o)
    delta_q = jnp.where(p_is_fg[..., None], delta_o, delta_f)
    return delta_p, delta_q


def antialias(color: jnp.ndarray, rast: jnp.ndarray, verts_clip: jnp.ndarray,
              faces: jnp.ndarray, vid_planes=None, a_planes=None) -> jnp.ndarray:
    """Edge antialiasing (nvdiffrast `dr.antialias` role).

    color (B, H, W, C); rast (B, H, W, 4) from rasterize; verts_clip
    (B, V, 4) — possibly with rows detached for boundary control
    (vhap/util/render_nvdiffrast.py:463-465); faces (F, 3).
    """
    B, H, W, C = color.shape
    tri_id = rast[..., 3].astype(jnp.int32)
    zw = rast[..., 2]

    pl = _pixel_planes(verts_clip, faces, tri_id, vid_planes, a_planes)
    px, py = pixel_grid(H, W)
    cx = jnp.broadcast_to(px, (H, W))
    cy = jnp.broadcast_to(py, (H, W))

    out = color

    # horizontal pairs: p = (i, j), q = (i, j+1)
    pl_p = {k: v[:, :, :-1] for k, v in pl.items()}
    pl_q = {k: v[:, :, 1:] for k, v in pl.items()}
    dp, dq = _pair_blend(
        color[:, :, :-1], color[:, :, 1:],
        tri_id[:, :, :-1], tri_id[:, :, 1:],
        zw[:, :, :-1], zw[:, :, 1:], pl_p, pl_q,
        cx[:, :-1], cy[:, :-1], cx[:, 1:], cy[:, 1:],
        horizontal=True,
    )
    out = out.at[:, :, :-1].add(dp)
    out = out.at[:, :, 1:].add(dq)

    # vertical pairs: p = (i, j), q = (i+1, j)
    pl_p = {k: v[:, :-1] for k, v in pl.items()}
    pl_q = {k: v[:, 1:] for k, v in pl.items()}
    dp, dq = _pair_blend(
        color[:, :-1], color[:, 1:],
        tri_id[:, :-1], tri_id[:, 1:],
        zw[:, :-1], zw[:, 1:], pl_p, pl_q,
        cx[:-1], cy[:-1], cx[1:], cy[1:],
        horizontal=False,
    )
    out = out.at[:, :-1].add(dp)
    out = out.at[:, 1:].add(dq)
    return out

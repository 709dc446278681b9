"""Silhouette antialiasing on the TILED (B, T, th, tw) channel layout.

Same math as ops/antialias.py (nvdiffrast `dr.antialias` role,
vhap/util/render_nvdiffrast.py:463-466) — the shared `_pair_weights`
guarantees it — but operating on the rasterizer's tile layout so the train
path never untiles to (B, H, W, C) images. The image-layout antialias
chain costs ~7 ms/step at bench shapes, almost entirely relayouts of
channel-last (B, H, W, 4) tensors (minor dim 4 -> T(4, 128) padding); the
tiled form's planes are perfect (16, 128) hardware tiles and the whole
pass fuses into a handful of elementwise loops (docs/PERF.md round 5).

Pair decomposition: adjacent-pixel pairs are intra-tile (lane shift for
horizontal, sublane shift for vertical) except those crossing a tile
boundary, which are handled on thin strips after reshaping the tile axis
T -> (ty, tx). Every delta is built as a zero-padded full-size plane and
summed, so XLA fuses the whole blend into one loop per channel instead of
a chain of dynamic-update-slices.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp

from vhap_tpu.ops.antialias import _pair_weights


def _derive_planes(aa: Sequence[jnp.ndarray], vids: Sequence[jnp.ndarray]
                   ) -> Dict[str, jnp.ndarray]:
    """6 AA edge planes + 3 corner-vid planes -> the pl dict
    _pair_weights consumes (a2* derived from the affine identity)."""
    a0x, a0y, a0c, a1x, a1y, a1c = aa
    pl = dict(a0x=a0x, a0y=a0y, a0c=a0c, a1x=a1x, a1y=a1y, a1c=a1c,
              a2x=-(a0x + a1x), a2y=-(a0y + a1y), a2c=1.0 - a0c - a1c)
    for k in range(3):
        pl[f"vid{k}"] = vids[k]
    return pl


def _apply_pair(colors, out, sl_p, sl_q, tri, zw, pl, cx, cy, horizontal,
                pad_p, pad_q, live=None):
    """Compute deltas for the pair set (sl_p, sl_q) and add them to `out`
    as zero-padded full-size planes. sl_* are indexing tuples; pad_* are
    jnp.pad configs mapping the strip back to full shape. live: optional
    (1, ...) bool plane — pairs touching a dead (tile-padding) pixel are
    inactive, matching the reference where the image simply ends there."""
    pl_p = {k: v[sl_p] for k, v in pl.items()}
    pl_q = {k: v[sl_q] for k, v in pl.items()}
    w_f, w_o, p_is_fg = _pair_weights(
        tri[sl_p], tri[sl_q], zw[sl_p], zw[sl_q], pl_p, pl_q,
        cx[sl_p[1:]], cy[sl_p[1:]], cx[sl_q[1:]], cy[sl_q[1:]], horizontal)
    if live is not None:
        ok = live[sl_p] & live[sl_q]
        w_f = w_f * ok
        w_o = w_o * ok
    wp = jnp.where(p_is_fg, w_f, w_o)
    wq = jnp.where(p_is_fg, w_o, w_f)
    for i, c in enumerate(colors):
        d = (c[sl_q] - c[sl_p]).astype(c.dtype)
        wpc, wqc = wp.astype(c.dtype), wq.astype(c.dtype)
        out[i] = out[i] + jnp.pad(wpc * d, pad_p) + jnp.pad(-wqc * d, pad_q)
    return out


def antialias_tiled(colors: List[jnp.ndarray], tri: jnp.ndarray,
                    zw: jnp.ndarray, vids: Sequence[jnp.ndarray],
                    aa: Sequence[jnp.ndarray], tiles_x: int,
                    tile_h: int, tile_w: int, H: int, W: int,
                    live: jnp.ndarray = None, ndc=None) -> List[jnp.ndarray]:
    """Antialias color planes in tiled layout.

    colors: list of (B, T, npx) color-dtype planes (rgba);
    tri (B, T, npx) int32; zw (B, T, npx) f32; vids: 3 int32 planes;
    aa: the 6 AA_PLANE_KEYS planes; live: optional (1, T, npx) bool
    (tile-padding mask — pairs with a dead side are skipped);
    ndc=(h0, w0): pixel->NDC scale of the ORIGINAL image when the canvas
    is tile-padded (rasterize.pixel_grid — keeps padding bit-exact).
    Returns blended color planes.
    """
    B, T, npx = tri.shape
    ty, tx = T // tiles_x, tiles_x
    th, tw = tile_h, tile_w
    shape5 = (B, ty, tx, th, tw)

    def v5(x):
        return x.reshape((x.shape[0],) + shape5[1:])

    colors5 = [v5(c) for c in colors]
    tri5, zw5 = v5(tri), v5(zw)
    live5 = v5(live) if live is not None else None
    pl5 = {k: v5(v) for k, v in _derive_planes(aa, vids).items()}

    # NDC pixel centers, constant (ty, tx, th, tw)
    nh, nw = ndc if ndc is not None else (H, W)
    gy = (jnp.arange(ty * th, dtype=jnp.float32) + 0.5) * (2.0 / nh) - 1.0
    gx = (jnp.arange(tx * tw, dtype=jnp.float32) + 0.5) * (2.0 / nw) - 1.0
    cy = jnp.broadcast_to(gy.reshape(ty, 1, th, 1), (ty, tx, th, tw))
    cx = jnp.broadcast_to(gx.reshape(1, tx, 1, tw), (ty, tx, th, tw))

    out = list(colors5)
    A = slice(None)
    z4 = ((0, 0),) * 4

    # intra-tile horizontal pairs: (r, c) - (r, c+1), c < tw-1
    out = _apply_pair(
        colors5, out,
        (A, A, A, A, slice(None, -1)), (A, A, A, A, slice(1, None)),
        tri5, zw5, pl5, cx, cy, True,
        z4 + ((0, 1),), z4 + ((1, 0),), live5)
    # intra-tile vertical pairs: (r, c) - (r+1, c), r < th-1
    out = _apply_pair(
        colors5, out,
        (A, A, A, slice(None, -1), A), (A, A, A, slice(1, None), A),
        tri5, zw5, pl5, cx, cy, False,
        (*z4[:3], (0, 1), (0, 0)), (*z4[:3], (1, 0), (0, 0)), live5)
    # cross-tile horizontal: tile (ty, tx) col tw-1 with tile (ty, tx+1) col 0
    if tx > 1:
        out = _apply_pair(
            colors5, out,
            (A, A, slice(None, -1), A, slice(-1, None)),
            (A, A, slice(1, None), A, slice(None, 1)),
            tri5, zw5, pl5, cx, cy, True,
            ((0, 0), (0, 0), (0, 1), (0, 0), (tw - 1, 0)),
            ((0, 0), (0, 0), (1, 0), (0, 0), (0, tw - 1)), live5)
    # cross-tile vertical: tile (ty, tx) row th-1 with tile (ty+1, tx) row 0
    if ty > 1:
        out = _apply_pair(
            colors5, out,
            (A, slice(None, -1), A, slice(-1, None), A),
            (A, slice(1, None), A, slice(None, 1), A),
            tri5, zw5, pl5, cx, cy, False,
            ((0, 0), (0, 1), (0, 0), (th - 1, 0), (0, 0)),
            ((0, 0), (1, 0), (0, 0), (0, th - 1), (0, 0)), live5)

    return [o.reshape(B, T, npx) for o in out]

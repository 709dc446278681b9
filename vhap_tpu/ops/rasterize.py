"""Differentiable mesh rasterization for TPU.

Replaces nvdiffrast's `dr.rasterize` (vhap/util/render_nvdiffrast.py:247-260)
with a TPU-native two-phase design:

1. **Visibility** (non-differentiable): per-pixel winning triangle id via
   depth test with backface culling (the ShenhanQian nvdiffrast fork's
   behavior, README.md:48-52). Backends:
     * 'xla'    — chunked brute force (reference/testing; exact),
     * 'pallas' — tile-binned Pallas TPU kernel (production; see
       vhap_tpu/ops/rasterize_pallas.py).
2. **Attributes** (differentiable): given the frozen tri-id buffer,
   barycentrics (u, v), depth z/w and screen-space uv derivatives are
   *recomputed* from clip positions with plain JAX ops, so JAX autodiff
   yields the exact analytic gradients nvdiffrast implements by hand.

Conventions match nvdiffrast: pixel (i, j) covers NDC
x = (j+0.5)/W*2-1, y = (i+0.5)/H*2-1 (row 0 = bottom, y up); the output
`rast` packs (u, v, z/w, tri_id+1) with tri_id 0 = background; `rast_db`
packs (du/dx, du/dy, dv/dx, dv/dy) in *pixel* units.
"""

from __future__ import annotations

from functools import partial
from typing import Literal, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

W_EPS = 1e-6     # minimum clip w for a usable vertex
AREA_EPS = 1e-12  # minimum |signed area| (NDC^2) for a non-degenerate face


# ---------------------------------------------------------------------------
# Face setup (shared by all visibility backends)
# ---------------------------------------------------------------------------

def _homogeneous_planes(v: jnp.ndarray):
    """Clipless (2D-homogeneous) face setup for near-plane-straddling faces
    (Olano & Greer '97; the role nvdiffrast fills by geometric clipping,
    vhap/util/render_nvdiffrast.py:254-260).

    The clip-space edge functions n_i(p) = (adj M p)_i with M = [x; y; w]
    columns per vertex are AFFINE in the pixel (px, py, 1) and well-defined
    for any vertex w sign. The screen barycentrics b_i = n_i * w_i / det
    remain affine, sum to 1, and extend the NDC formulas continuously, so
    the whole downstream plane machinery (interp, z/w, uv derivatives)
    works unchanged; only the COVERAGE test must flip per-vertex:
    the visible (w(p) > 0) part of a straddling face is exactly
    {p : n_i(p) >= 0 for all i} = {p : sign(w_i) * b_i(p) >= 0}.

    v: (B, F, 3, 4) face vertices in clip space. Returns
    (abc (B,F,2,3) b0/b1 planes, zpln (B,F,3) z/w plane, det (B,F)).
    """
    x, y, w = v[..., 0], v[..., 1], v[..., 3]
    x0, x1, x2 = x[..., 0], x[..., 1], x[..., 2]
    y0, y1, y2 = y[..., 0], y[..., 1], y[..., 2]
    w0, w1, w2 = w[..., 0], w[..., 1], w[..., 2]
    n0 = (y1 * w2 - y2 * w1, x2 * w1 - x1 * w2, x1 * y2 - x2 * y1)
    n1 = (y2 * w0 - y0 * w2, x0 * w2 - x2 * w0, x2 * y0 - x0 * y2)
    n2 = (y0 * w1 - y1 * w0, x1 * w0 - x0 * w1, x0 * y1 - x1 * y0)
    det = n0[2] * w0 + n1[2] * w1 + n2[2] * w2   # = sum_i n_i(p) w_i, any p
    ok = jnp.abs(det) > AREA_EPS
    inv_det = jnp.where(ok, 1.0 / jnp.where(ok, det, 1.0), 0.0)

    def plane(n, wi):
        s = wi * inv_det
        return jnp.stack([n[0] * s, n[1] * s, n[2] * s], axis=-1)

    abc = jnp.stack([plane(n0, w0), plane(n1, w1)], axis=-2)
    # z/w(p) = sum_i n_i(p) z_i / det — affine even across the near plane
    z = v[..., 2]
    zpln = jnp.stack(
        [sum(n[k] * z[..., i] for i, n in enumerate((n0, n1, n2)))
         * inv_det for k in range(3)], axis=-1)
    return abc, zpln, det


def face_setup(verts_clip: jnp.ndarray, faces: jnp.ndarray,
               cull_backfaces: bool = True,
               clip_straddling: bool = False) -> dict:
    """Per-face screen-space setup.

    verts_clip: (B, V, 4); faces: (F, 3) int.
    Returns dict of (B, F, ...) arrays:
      abc:   (B, F, 2, 3) affine barycentric plane coefficients for b0, b1
             (b_i = ax*x + ay*y + c  in NDC)
      zpln:  (B, F, 3) plane coefficients of z/w
      bbox:  (B, F, 4) [xmin, ymin, xmax, ymax] in NDC
      valid: (B, F) bool (w>eps, non-degenerate, front-facing)
      wsign: (B, F, 3) per-vertex coverage sign (+1/-1); only != +1 when
             clip_straddling admits near-plane-straddling faces

    clip_straddling=True additionally admits faces that straddle the
    near plane (some w <= eps) via the clipless homogeneous setup
    (_homogeneous_planes): their visible part renders exactly like
    nvdiffrast's geometric clipping. Supported by the brute-force 'xla'
    visibility backend; the binned/Pallas backends drop such faces whole
    (their conservative bbox would be the full screen — heads never
    straddle the near plane, so the production path keeps the cheap form;
    divergence pinned in tests/test_rasterize.py).
    """
    v = verts_clip[:, faces]                   # (B, F, 3, 4)
    w = v[..., 3]
    w_ok = jnp.all(w > W_EPS, axis=-1)         # (B, F)
    w_safe = jnp.where(jnp.abs(w) > W_EPS, w, W_EPS)
    sx = v[..., 0] / w_safe                    # (B, F, 3)
    sy = v[..., 1] / w_safe
    szw = v[..., 2] / w_safe

    x0, x1, x2 = sx[..., 0], sx[..., 1], sx[..., 2]
    y0, y1, y2 = sy[..., 0], sy[..., 1], sy[..., 2]
    area = (x1 - x0) * (y2 - y0) - (x2 - x0) * (y1 - y0)

    if cull_backfaces:
        # Front faces wind counter-clockwise in NDC (y up), giving positive
        # signed area — the fork culls the rest.
        orient_ok = area > AREA_EPS
    else:
        orient_ok = jnp.abs(area) > AREA_EPS
    valid = w_ok & orient_ok

    # NaN-safe reciprocal: substitute the denominator BEFORE dividing —
    # where(c, 1/area, 0) leaks inf into backward via the unselected branch
    ok = jnp.abs(area) > AREA_EPS
    area_safe = jnp.where(ok, area, 1.0)
    inv_area = jnp.where(ok, 1.0 / area_safe, 0.0)
    # b0 plane: ((y1-y2)(x-x2) + (x2-x1)(y-y2)) / area
    a0x = (y1 - y2) * inv_area
    a0y = (x2 - x1) * inv_area
    a0c = -(a0x * x2 + a0y * y2)
    # b1 plane: ((y2-y0)(x-x2) + (x0-x2)(y-y2)) / area
    a1x = (y2 - y0) * inv_area
    a1y = (x0 - x2) * inv_area
    a1c = -(a1x * x2 + a1y * y2)

    z0, z1, z2 = szw[..., 0], szw[..., 1], szw[..., 2]
    # z/w is affine in screen space: z = b0*z0 + b1*z1 + (1-b0-b1)*z2
    zx = a0x * (z0 - z2) + a1x * (z1 - z2)
    zy = a0y * (z0 - z2) + a1y * (z1 - z2)
    zc = a0c * (z0 - z2) + a1c * (z1 - z2) + z2

    abc = jnp.stack([jnp.stack([a0x, a0y, a0c], -1),
                     jnp.stack([a1x, a1y, a1c], -1)], axis=-2)  # (B,F,2,3)
    zpln = jnp.stack([zx, zy, zc], axis=-1)
    bbox = jnp.stack([jnp.min(sx, -1), jnp.min(sy, -1),
                      jnp.max(sx, -1), jnp.max(sy, -1)], axis=-1)
    wsign = jnp.ones_like(w)

    if clip_straddling:
        straddle = jnp.any(w > W_EPS, axis=-1) & jnp.logical_not(w_ok)
        abc_h, zpln_h, det = _homogeneous_planes(v)
        # culling in clip space: det = area * w0*w1*w2 for all-front faces,
        # so the det sign test extends the NDC area test continuously
        orient_h = det > AREA_EPS if cull_backfaces \
            else jnp.abs(det) > AREA_EPS
        sel = straddle[..., None, None]
        abc = jnp.where(sel, abc_h, abc)
        zpln = jnp.where(straddle[..., None], zpln_h, zpln)
        # conservative full-screen bbox: the visible part of a straddling
        # face is unbounded in NDC (cold path — heads never straddle)
        bbox = jnp.where(straddle[..., None],
                         jnp.asarray([-1.0, -1.0, 1.0, 1.0], bbox.dtype),
                         bbox)
        valid = valid | (straddle & orient_h)
        wsign = jnp.where(straddle[..., None],
                          jnp.where(w > 0, 1.0, -1.0), wsign)

    return dict(abc=abc, zpln=zpln, bbox=bbox, valid=valid, wsign=wsign)


def pixel_grid(H: int, W: int, dtype=jnp.float32, ndc=None
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """NDC coordinates of pixel centers; row 0 = y just above -1.

    ndc=(ndc_h, ndc_w) decouples the pixel->NDC scale from the canvas size
    (tile padding, ops/render.py RenderSettings.crop_size): pixel i keeps
    the ORIGINAL image's center bit-for-bit and padded pixels extend past
    NDC +1 — the padded render is bit-exact on live pixels."""
    nh, nw = ndc if ndc is not None else (H, W)
    px = (jnp.arange(W, dtype=dtype) + 0.5) * (2.0 / nw) - 1.0
    py = (jnp.arange(H, dtype=dtype) + 0.5) * (2.0 / nh) - 1.0
    return px[None, :], py[:, None]  # broadcastable to (H, W)


def adaptive_bin_K(F: int, n_tiles: int) -> int:
    """Per-tile face-list capacity: few tiles (small images) must admit most
    of the mesh per tile, many tiles admit a fraction (undersizing silently
    drops faces -> holes, surfaced via the overflow count)."""
    return min(F, max(1024, -(-8 * F // n_tiles) // 256 * 256 + 256))


# ---------------------------------------------------------------------------
# Visibility: brute-force XLA backend (exact; used for tests & CPU)
# ---------------------------------------------------------------------------

def _visibility_xla(verts_clip, faces, H, W, cull_backfaces=True, chunk=64,
                    clip_straddling=True, ndc=None):
    """Chunked scan over faces with a running (z, id) buffer.

    The exact reference backend: near-plane-straddling faces render their
    visible part (clipless homogeneous setup — nvdiffrast clipping parity,
    vhap/util/render_nvdiffrast.py:254-260); coverage flips per vertex via
    setup["wsign"] (+1 everywhere for ordinary faces)."""
    B = verts_clip.shape[0]
    F = faces.shape[0]
    s = face_setup(verts_clip, faces, cull_backfaces,
                   clip_straddling=clip_straddling)
    px, py = pixel_grid(H, W, ndc=ndc)

    Fp = ((F + chunk - 1) // chunk) * chunk
    pad = Fp - F

    def pad0(x):
        return jnp.pad(x, [(0, 0), (0, pad)] + [(0, 0)] * (x.ndim - 2))

    abc = pad0(s["abc"]).reshape(B, Fp // chunk, chunk, 2, 3)
    zpln = pad0(s["zpln"]).reshape(B, Fp // chunk, chunk, 3)
    valid = jnp.pad(s["valid"], [(0, 0), (0, pad)]).reshape(B, Fp // chunk, chunk)
    wsign = pad0(s["wsign"]).reshape(B, Fp // chunk, chunk, 3)

    def body(carry, inp):
        best_z, best_id = carry
        abc_c, zpln_c, valid_c, wsign_c, base = inp
        # (B, chunk, H, W)
        b0 = (abc_c[..., 0, 0, None, None] * px + abc_c[..., 0, 1, None, None] * py
              + abc_c[..., 0, 2, None, None])
        b1 = (abc_c[..., 1, 0, None, None] * px + abc_c[..., 1, 1, None, None] * py
              + abc_c[..., 1, 2, None, None])
        b2 = 1.0 - b0 - b1
        z = (zpln_c[..., 0, None, None] * px + zpln_c[..., 1, None, None] * py
             + zpln_c[..., 2, None, None])
        inside = ((wsign_c[..., 0, None, None] * b0 >= 0)
                  & (wsign_c[..., 1, None, None] * b1 >= 0)
                  & (wsign_c[..., 2, None, None] * b2 >= 0)
                  & valid_c[..., None, None] & (z >= -1.0) & (z <= 1.0))
        z = jnp.where(inside, z, jnp.inf)
        k = jnp.argmin(z, axis=1)                              # (B, H, W)
        zmin = jnp.min(z, axis=1)
        fid = base + k + 1
        upd = zmin < best_z
        return (jnp.where(upd, zmin, best_z),
                jnp.where(upd, fid.astype(jnp.int32), best_id)), None

    init = (jnp.full((B, H, W), jnp.inf, jnp.float32),
            jnp.zeros((B, H, W), jnp.int32))
    bases = jnp.arange(0, Fp, chunk, dtype=jnp.int32)
    xs = (abc.transpose(1, 0, 2, 3, 4), zpln.transpose(1, 0, 2, 3),
          valid.transpose(1, 0, 2), wsign.transpose(1, 0, 2, 3), bases)
    (best_z, best_id), _ = jax.lax.scan(body, init, xs)
    return best_id


# ---------------------------------------------------------------------------
# Tile binning (shared by the Pallas kernel and the binned-XLA backend)
# ---------------------------------------------------------------------------

def bin_faces(setup: dict, H: int, W: int, tile_h: int, tile_w: int,
              max_faces_per_tile: int, ndc=None):
    """Build per-tile face lists from face bboxes.

    Returns (lists (B, T, K) int32 face ids with K drop slot semantics,
    counts (B, T) int32, (tiles_y, tiles_x), overflow). Faces beyond K per
    tile are dropped; `overflow` is the int32 count of dropped (face, tile)
    pairs — nonzero means holes in the render and corrupted boundary
    gradients, so callers must surface it (nvdiffrast is always exact,
    vhap/util/render_nvdiffrast.py:254-260).
    """
    order, ov_sum, (ty, tx) = _bin_overlap(setup, H, W, tile_h, tile_w,
                                           ndc=ndc)
    K = max_faces_per_tile
    lists = order[..., :K].astype(jnp.int32)
    counts = jnp.minimum(ov_sum, K).astype(jnp.int32)
    overflow = jnp.maximum(ov_sum - K, 0).sum().astype(jnp.int32)
    return lists, counts, (ty, tx), overflow


def _bin_overlap(setup: dict, H: int, W: int, tile_h: int, tile_w: int,
                 ndc=None):
    """Shared binning core: per-tile face compaction from face bboxes.

    Returns (order (B, T, F) int32 — overlapping faces first, ascending id,
    ov_sum (B, T) int32 overlap counts, (tiles_y, tiles_x)). ndc=(h0, w0)
    decouples the NDC scale from the canvas for tile padding (see
    pixel_grid)."""
    bbox, valid = setup["bbox"], setup["valid"]
    B, F = valid.shape
    ty, tx = H // tile_h, W // tile_w
    nh, nw = ndc if ndc is not None else (H, W)

    # tile rects in NDC
    x0 = jnp.arange(tx, dtype=jnp.float32) * (2.0 * tile_w / nw) - 1.0
    y0 = jnp.arange(ty, dtype=jnp.float32) * (2.0 * tile_h / nh) - 1.0
    tx0 = jnp.tile(x0, ty)             # (T,)
    ty0 = jnp.repeat(y0, tx)
    tx1 = tx0 + 2.0 * tile_w / nw
    ty1 = ty0 + 2.0 * tile_h / nh

    # overlap: (B, T, F)
    ov = ((bbox[:, None, :, 0] <= tx1[None, :, None])
          & (bbox[:, None, :, 2] >= tx0[None, :, None])
          & (bbox[:, None, :, 1] <= ty1[None, :, None])
          & (bbox[:, None, :, 3] >= ty0[None, :, None])
          & valid[:, None, :])

    # compaction by stable argsort (overlapping faces first, ascending id):
    # TPU sorts are fast and avoid the ~10x-more-expensive scatter path.
    # NOTE a 1-operand self-keyed variant (flag in bit 30 of the id)
    # measured SLOWER on hardware (17.1 vs 13.3 ms at bench shapes): the
    # bool-key sort is partition-like and beats full i32 comparisons even
    # carrying the iota payload. Keep the argsort.
    order = jnp.argsort(jnp.logical_not(ov), axis=-1, stable=True)
    ov_sum = ov.sum(-1).astype(jnp.int32)
    return order.astype(jnp.int32), ov_sum, (ty, tx)


def flat_bin_budget(F: int, n_tiles: int) -> int:
    """Total 128-slot chunk budget for the flat bins: one chunk per tile
    (so every output tile is owned by some grid step) plus a shared extra
    pool of ~2 (face, tile) pairs per face for dense tiles. Multiple of 8
    (the lbc chunk-group width in the flat kernels)."""
    pc = n_tiles + -(-2 * F // 128)
    return -(-pc // 8) * 8


def bin_faces_flat(setup: dict, H: int, W: int, tile_h: int, tile_w: int,
                   budget_chunks: int = 0, ndc=None):
    """Globally-budgeted flat face work list (the dense (B, T, K) lists are
    ~94% padding at bench shapes: mean tile occupancy 65 vs K=1024 —
    docs/PERF.md round 4).

    Per-tile segments of 128-slot chunks are packed back-to-back into one
    flat array: every tile owns >= 1 chunk; denser tiles draw extra chunks
    from a single shared budget instead of a fixed per-tile capacity, so a
    tile can exceed the old per-tile cap while the TOTAL table shrinks ~4x.
    Pairs beyond the budget are dropped and surfaced in `overflow`
    (the rast_overflow contract, same as the dense path's per-tile K drops).

    Returns dict:
      fids     (B, PC*128) int32  face ids, -1 on pad slots
      ctile    (B, PC)     int32  owning tile of each chunk (tail -> T-1)
      start128 (B, T)      int32  first chunk index of tile t
      counts   (B, T)      int32  granted faces per tile
      overflow ()          int32  dropped (face, tile) pairs
      meta: PC (static), (ty, tx)
    """
    order, ov_sum, (ty, tx) = _bin_overlap(setup, H, W, tile_h, tile_w,
                                           ndc=ndc)
    B, T, F = order.shape
    PC = budget_chunks if budget_chunks > 0 else flat_bin_budget(F, T)
    PC = min(PC, -(-(T * F) // 128) + T)   # never exceed the dense total

    # chunk grant: every tile gets 1 chunk; extras first-come-first-served
    # against the shared pool (cumsum order = tile raster order)
    want_chunks = -(-ov_sum // 128)                     # ceil, 0 for empty
    extra = jnp.maximum(want_chunks - 1, 0)
    excl = jnp.cumsum(extra, axis=1) - extra            # exclusive cumsum
    pool = PC - T
    granted_extra = jnp.clip(pool - excl, 0, extra)
    start128 = (jnp.arange(T, dtype=jnp.int32)[None]
                + jnp.minimum(excl, pool)).astype(jnp.int32)
    slots = (1 + granted_extra) * 128
    counts = jnp.minimum(ov_sum, slots).astype(jnp.int32)
    overflow = (ov_sum - counts).sum().astype(jnp.int32)

    # owning tile per chunk (tail chunks -> T-1; their slots stay -1 so they
    # contribute nothing and only extend tile T-1's revisit run)
    c = jnp.arange(PC, dtype=jnp.int32)
    ctile = (jnp.sum(start128[:, None, :] <= c[None, :, None], axis=2) - 1
             ).astype(jnp.int32)

    # flat ids: slot p of chunk c -> order[b, ctile[c], (c-start)*128 + j]
    j = jnp.arange(128, dtype=jnp.int32)
    t_of = ctile[:, :, None]                            # (B, PC, 1)
    s_of = (c[None, :, None] - jnp.take_along_axis(start128, ctile, axis=1)
            [:, :, None]) * 128 + j[None, None, :]      # (B, PC, 128)
    valid_slot = s_of < jnp.take_along_axis(counts, ctile, axis=1)[:, :, None]
    gidx = (t_of * F + jnp.clip(s_of, 0, F - 1)).reshape(B, -1)
    fids = jnp.take_along_axis(order.reshape(B, T * F), gidx, axis=1)
    fids = jnp.where(valid_slot.reshape(B, -1), fids, -1)

    return dict(fids=fids, ctile=ctile, start128=start128, counts=counts,
                overflow=overflow, PC=PC, tiles=(ty, tx))


# ---------------------------------------------------------------------------
# Differentiable attribute recompute — "channel-planes" form
#
# TPU layout note: gathering per-pixel vertex tuples as (B, H, W, 3, 4)
# tensors makes XLA tile the tiny minor dims (3, 4) onto (8, 128) hardware
# tiles — a 40x memory expansion that OOMs HBM during backward. Instead we
# compute differentiable *per-face* coefficient tables (B, F) and gather
# each per-pixel as its own (B, H, W) plane: perfect tiling, small scatter
# targets in backward, and the per-pixel math stays fully fused elementwise.
# ---------------------------------------------------------------------------

PLANE_KEYS = ("a0x", "a0y", "a0c", "a1x", "a1y", "a1c",
              "iw0", "iw1", "iw2", "z0", "z1", "z2")


def face_attribute_planes(verts_clip: jnp.ndarray, faces: jnp.ndarray,
                          clip_straddling: bool = True) -> dict:
    """Differentiable per-face coefficients for attribute recompute.

    Returns a dict of (B, F) float arrays:
      a0x a0y a0c a1x a1y a1c   affine barycentric planes of b0, b1 (NDC)
      iw0 iw1 iw2               1 / clip-w per corner (sign-preserving)
      z0 z1 z2                  z/w per corner

    clip_straddling=True substitutes the clipless homogeneous planes for
    near-plane-straddling faces (_homogeneous_planes): the per-pixel chain
    n_i = b_i * iw_i, u = n_i / sum(n), zw = sum(b_i z_i) stays exact on
    their visible part (signed iw carries the coverage flip).
    """
    v = verts_clip[:, faces]                   # (B, F, 3, 4) — face-level only
    w = v[..., 3]
    # sign-preserving clamp: straddling faces legitimately carry negative
    # w; ordinary valid faces have w > eps, so this matches the old
    # positive clamp wherever it mattered
    w_safe = jnp.where(jnp.abs(w) > W_EPS, w,
                       jnp.where(w < 0, -W_EPS, W_EPS))
    sx = v[..., 0] / w_safe
    sy = v[..., 1] / w_safe
    szw = v[..., 2] / w_safe

    x0, x1, x2 = sx[..., 0], sx[..., 1], sx[..., 2]
    y0, y1, y2 = sy[..., 0], sy[..., 1], sy[..., 2]
    area = (x1 - x0) * (y2 - y0) - (x2 - x0) * (y1 - y0)
    ok = jnp.abs(area) > AREA_EPS
    area_safe = jnp.where(ok, area, 1.0)   # NaN-safe reciprocal (see above)
    inv_area = jnp.where(ok, 1.0 / area_safe, 0.0)

    a0x = (y1 - y2) * inv_area
    a0y = (x2 - x1) * inv_area
    a0c = -(a0x * x2 + a0y * y2)
    a1x = (y2 - y0) * inv_area
    a1y = (x0 - x2) * inv_area
    a1c = -(a1x * x2 + a1y * y2)

    out = dict(
        a0x=a0x, a0y=a0y, a0c=a0c, a1x=a1x, a1y=a1y, a1c=a1c,
        iw0=1.0 / w_safe[..., 0], iw1=1.0 / w_safe[..., 1],
        iw2=1.0 / w_safe[..., 2],
        z0=szw[..., 0], z1=szw[..., 1], z2=szw[..., 2],
    )
    if clip_straddling:
        straddle = (jnp.any(w > W_EPS, axis=-1)
                    & jnp.logical_not(jnp.all(w > W_EPS, axis=-1)))
        abc_h, zpln_h, _ = _homogeneous_planes(v)
        for i, k in enumerate(("a0x", "a0y", "a0c")):
            out[k] = jnp.where(straddle, abc_h[..., 0, i], out[k])
        for i, k in enumerate(("a1x", "a1y", "a1c")):
            out[k] = jnp.where(straddle, abc_h[..., 1, i], out[k])
        # z_i = z_clip * iw (signed-safe) already extends continuously; the
        # zw = sum b_i z_i identity holds with the homogeneous b planes
    return out


def gather_face_plane(table: jnp.ndarray, fid: jnp.ndarray) -> jnp.ndarray:
    """(B, F) face table -> (B, H, W) per-pixel plane via winner face ids."""
    B, H, W = fid.shape
    out = jnp.take_along_axis(table, fid.reshape(B, -1), axis=1)
    return out.reshape(B, H, W)


def gather_face_planes_packed(tables: jnp.ndarray, fid: jnp.ndarray):
    """(B, C, F) packed face tables -> list of C (B, H, W) pixel planes.

    One gather for all channels means ONE shared-index scatter-add in
    backward — per-channel gathers cost a full (~30 ms) scatter each on TPU,
    which dominated the train step before packing.
    """
    B, H, W = fid.shape
    C = tables.shape[1]
    out = jnp.take_along_axis(tables, fid.reshape(B, 1, -1), axis=2)
    out = out.reshape(B, C, H, W)
    return [out[:, c] for c in range(C)]


def rasterize_attributes(verts_clip: jnp.ndarray, faces: jnp.ndarray,
                         tri_id: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Recompute (u, v, z/w) + uv pixel derivatives for the winning faces.

    Differentiable w.r.t. verts_clip (visibility in `tri_id` is frozen,
    matching nvdiffrast's gradient model). Returns
      rast    (B, H, W, 4): (u, v, z/w, tri_id float)
      rast_db (B, H, W, 4): (du/dx, du/dy, dv/dx, dv/dy) in pixel units.
    """
    rast, rast_db, _, _ = fused_rast_and_planes(verts_clip, faces, tri_id,
                                                None)
    return rast, rast_db


def _resolve_plane_impl(impl: str, lists, H: int, W: int, tile_h: int,
                        tile_w: int, mesh) -> str:
    if lists is None or H % tile_h != 0 or W % tile_w != 0:
        return "xla"
    if impl == "auto":
        on_tpu = jax.default_backend() == "tpu"
        return "pallas" if on_tpu and (mesh is not None
                                       or jax.device_count() == 1) else "xla"
    return impl


def fused_rast_and_planes(verts_clip, faces, tri_id,
                          extra_tables: Optional[jnp.ndarray],
                          lists: Optional[jnp.ndarray] = None,
                          plane_impl: str = "xla",
                          plane_max_list: int = 0,
                          tile_h: int = 16, tile_w: int = 128,
                          mesh=None):
    """rasterize_attributes + arbitrary extra per-face channels in ONE
    per-pixel gather (each extra 4M-pixel gather costs ~25 ms and its
    backward scatter ~60 ms on TPU — see docs/PERF.md).

    extra_tables: (B|1, CE, F) or None. Returns (rast, rast_db,
    extra_planes list of CE (B, H, W) arrays, plane_overflow int32).

    With `lists` (the rasterizer's per-tile face lists) and a Pallas
    plane_impl, the per-pixel gather runs as the tile-local one-hot kernel
    (vhap_tpu/ops/plane_pallas.py) whose backward replaces the 4M-pixel
    scatter; `plane_overflow` counts foreground pixels beyond the capped
    lists (0 on the XLA path).
    """
    B, H, W = tri_id.shape
    mask = tri_id > 0
    fid = jnp.maximum(tri_id - 1, 0)

    p = face_attribute_planes(verts_clip, faces)
    packed = jnp.stack([p[k] for k in PLANE_KEYS], axis=1)   # (B, 12, F)
    if extra_tables is not None:
        if extra_tables.shape[0] == 1 and B > 1:
            extra_tables = jnp.broadcast_to(
                extra_tables, (B,) + extra_tables.shape[1:])
        packed = jnp.concatenate([packed, extra_tables], axis=1)

    impl = _resolve_plane_impl(plane_impl, lists, H, W, tile_h, tile_w, mesh)
    plane_overflow = jnp.zeros((), jnp.int32)
    if impl in ("pallas", "pallas_interpret"):
        from vhap_tpu.ops.plane_pallas import plane_gather_tiled
        interp = impl == "pallas_interpret"
        if mesh is not None and B % mesh.size == 0:
            from jax.sharding import PartitionSpec as PS
            axis = mesh.axis_names[0]

            def _pg(pk, ti, ls):
                pln, ovf = plane_gather_tiled(
                    pk, ti, ls, tile_h, tile_w, plane_max_list, interp)
                return pln, jax.lax.psum(ovf, axis)

            planes_bchw, plane_overflow = jax.shard_map(
                _pg, mesh=mesh, in_specs=(PS(axis), PS(axis), PS(axis)),
                out_specs=(PS(axis), PS()), check_vma=False)(
                    packed, tri_id, lists)
        else:
            planes_bchw, plane_overflow = plane_gather_tiled(
                packed, tri_id, lists, tile_h, tile_w, plane_max_list,
                interp)
        planes = [planes_bchw[:, c] for c in range(planes_bchw.shape[1])]
    else:
        planes = gather_face_planes_packed(packed, fid)
    (a0x, a0y, a0c, a1x, a1y, a1c,
     iw0, iw1, iw2, z0, z1, z2) = planes[:len(PLANE_KEYS)]
    extra_planes = planes[len(PLANE_KEYS):]

    px, py = pixel_grid(H, W)
    b0 = a0x * px + a0y * py + a0c
    b1 = a1x * px + a1y * py + a1c
    b2 = 1.0 - b0 - b1

    zw = b0 * z0 + b1 * z1 + b2 * z2               # affine z/w

    n0, n1, n2 = b0 * iw0, b1 * iw1, b2 * iw2      # perspective-correct
    S = n0 + n1 + n2
    S = jnp.where(jnp.abs(S) > 1e-12, S, 1e-12)
    u = n0 / S
    vv = n1 / S

    a2x, a2y = -(a0x + a1x), -(a0y + a1y)
    n0x, n0y = a0x * iw0, a0y * iw0
    n1x, n1y = a1x * iw1, a1y * iw1
    n2x, n2y = a2x * iw2, a2y * iw2
    Sx, Sy = n0x + n1x + n2x, n0y + n1y + n2y
    inv_S2 = 1.0 / (S * S)
    dudx = (n0x * S - n0 * Sx) * inv_S2 * (2.0 / W)
    dudy = (n0y * S - n0 * Sy) * inv_S2 * (2.0 / H)
    dvdx = (n1x * S - n1 * Sx) * inv_S2 * (2.0 / W)
    dvdy = (n1y * S - n1 * Sy) * inv_S2 * (2.0 / H)

    m = mask.astype(u.dtype)
    rast = jnp.stack([u * m, vv * m, zw * m,
                      tri_id.astype(u.dtype)], axis=-1)
    rast_db = jnp.stack([dudx * m, dudy * m, dvdx * m, dvdy * m], axis=-1)
    return rast, rast_db, extra_planes, plane_overflow


# ---------------------------------------------------------------------------
# Public entry
# ---------------------------------------------------------------------------

def visibility_dispatch(verts_clip, faces, H: int, W: int, backend: str,
                        cull_backfaces: bool, tile_h: int = 16,
                        tile_w: int = 128, max_faces_per_tile: int = 0,
                        mesh=None, return_lists: bool = False, ndc=None):
    """Resolve the visibility backend and run it, shard_mapping the Pallas
    kernel over the batch axis when a mesh is given (the kernel is
    batch-local; GSPMD cannot partition the custom call on its own —
    vhap_tpu/parallel/sharding.py).

    return_lists=True additionally returns the per-tile face lists
    (B, T, K) at the (tile_h, tile_w) tiling for the plane-gather kernel
    (free on the Pallas backend; one bin_faces pass on the XLA backend).
    return_lists="flat" returns the globally-budgeted flat bins dict
    (bin_faces_flat) for the flat fused-interp kernel instead —
    max_faces_per_tile is then interpreted as the total chunk budget
    (0 = adaptive)."""
    if return_lists == "flat":
        return _visibility_dispatch_flat(
            verts_clip, faces, H, W, backend, cull_backfaces, tile_h,
            tile_w, max_faces_per_tile, mesh, ndc=ndc)
    if backend == "auto":
        if mesh is not None:
            # under shard_map the kernel sees local shapes; pick Pallas on
            # TPU meshes, XLA on CPU meshes (interpret mode is test-only)
            backend = "pallas" if (
                jax.default_backend() == "tpu"
                and H % tile_h == 0 and W % tile_w == 0) else "xla"
        else:
            # single-chip TPU only: GSPMD cannot partition the custom call
            backend = "pallas" if (
                jax.default_backend() == "tpu" and jax.device_count() == 1
                and H % tile_h == 0 and W % tile_w == 0) else "xla"

    vc = jax.lax.stop_gradient(verts_clip)
    lists = None
    if backend == "pallas":
        from vhap_tpu.ops.rasterize_pallas import visibility_pallas
        if mesh is not None and verts_clip.shape[0] % mesh.size == 0:
            from jax.sharding import PartitionSpec as PS
            axis = mesh.axis_names[0]

            def _vis(vc_, faces_):
                out = visibility_pallas(
                    vc_, faces_, H, W, cull_backfaces=cull_backfaces,
                    tile_h=tile_h, tile_w=tile_w,
                    max_faces_per_tile=max_faces_per_tile,
                    return_lists=return_lists, ndc=ndc)
                return (out[0], jax.lax.psum(out[1], axis)) + tuple(out[2:])

            specs = (PS(axis), PS()) + ((PS(axis),) if return_lists else ())
            out = jax.shard_map(
                _vis, mesh=mesh, in_specs=(PS(axis), PS()),
                out_specs=specs, check_vma=False)(vc, faces)
        else:
            out = visibility_pallas(
                vc, faces, H, W, cull_backfaces=cull_backfaces,
                tile_h=tile_h, tile_w=tile_w,
                max_faces_per_tile=max_faces_per_tile,
                return_lists=return_lists, ndc=ndc)
        tri_id, overflow = out[0], out[1]
        if return_lists:
            lists = out[2]
    else:
        tri_id = _visibility_xla(vc, faces, H, W,
                                 cull_backfaces=cull_backfaces, ndc=ndc)
        overflow = jnp.zeros((), jnp.int32)
        if return_lists and H % tile_h == 0 and W % tile_w == 0:
            F = faces.shape[0]
            K = (min(F, max_faces_per_tile) if max_faces_per_tile > 0
                 else adaptive_bin_K(F, (H // tile_h) * (W // tile_w)))
            setup = face_setup(vc, faces, cull_backfaces)
            lists, _, _, _ = bin_faces(setup, H, W, tile_h, tile_w, K,
                                       ndc=ndc)
    if return_lists:
        return tri_id, overflow, lists
    return tri_id, overflow


def _visibility_dispatch_flat(verts_clip, faces, H, W, backend,
                              cull_backfaces, tile_h, tile_w, budget_chunks,
                              mesh, ndc=None):
    """Flat-bins flavor of visibility_dispatch: (tri_id, overflow, bins).

    overflow is the bins' dropped-pair count (the dense path's contract);
    Pallas backends also rasterize from the flat list, XLA backends
    rasterize exactly and bin separately."""
    if backend == "auto":
        on_tpu = jax.default_backend() == "tpu"
        single = mesh is not None or jax.device_count() == 1
        backend = "pallas" if (on_tpu and single and H % tile_h == 0
                               and W % tile_w == 0) else "xla"
    vc = jax.lax.stop_gradient(verts_clip)
    if backend in ("pallas", "pallas_interpret"):
        from vhap_tpu.ops.rasterize_pallas import visibility_pallas_flat
        interpret = backend == "pallas_interpret"
        if mesh is not None and verts_clip.shape[0] % mesh.size == 0:
            from jax.sharding import PartitionSpec as PS
            axis = mesh.axis_names[0]

            def _vis(vc_, faces_):
                tri_id, bins = visibility_pallas_flat(
                    vc_, faces_, H, W, cull_backfaces=cull_backfaces,
                    tile_h=tile_h, tile_w=tile_w,
                    budget_chunks=budget_chunks, interpret=interpret,
                    ndc=ndc)
                return (tri_id, jax.lax.psum(bins["overflow"], axis),
                        bins["fids"], bins["ctile"], bins["start128"],
                        bins["counts"])

            out = jax.shard_map(
                _vis, mesh=mesh, in_specs=(PS(axis), PS()),
                out_specs=(PS(axis), PS(), PS(axis), PS(axis), PS(axis),
                           PS(axis)), check_vma=False)(vc, faces)
            tri_id, overflow, fids, ctile, start128, counts = out
            F, T = faces.shape[0], (H // tile_h) * (W // tile_w)
            PC = (budget_chunks if budget_chunks > 0
                  else flat_bin_budget(F, T))
            PC = min(PC, -(-(T * F) // 128) + T)
            bins = dict(fids=fids, ctile=ctile, start128=start128,
                        counts=counts, overflow=overflow, PC=PC,
                        tiles=(H // tile_h, W // tile_w))
        else:
            tri_id, bins = visibility_pallas_flat(
                vc, faces, H, W, cull_backfaces=cull_backfaces,
                tile_h=tile_h, tile_w=tile_w, budget_chunks=budget_chunks,
                interpret=interpret, ndc=ndc)
            overflow = bins["overflow"]
    else:
        tri_id = _visibility_xla(vc, faces, H, W,
                                 cull_backfaces=cull_backfaces, ndc=ndc)
        setup = face_setup(vc, faces, cull_backfaces)
        bins = bin_faces_flat(setup, H, W, tile_h, tile_w, budget_chunks,
                              ndc=ndc)
        overflow = bins["overflow"]
    return tri_id, overflow, bins


@partial(jax.jit, static_argnames=("image_size", "backend", "cull_backfaces",
                                   "tile_h", "tile_w", "max_faces_per_tile",
                                   "grad_enabled", "with_overflow", "mesh"))
def rasterize(
    verts_clip: jnp.ndarray,
    faces: jnp.ndarray,
    image_size: Tuple[int, int],
    backend: Literal["auto", "xla", "pallas"] = "auto",
    cull_backfaces: bool = True,
    tile_h: int = 16,
    tile_w: int = 128,
    max_faces_per_tile: int = 0,   # 0 = adaptive (see visibility_pallas)
    grad_enabled: bool = True,
    with_overflow: bool = False,
    mesh=None,
):
    """Full rasterization: visibility + differentiable attributes.

    Returns (rast (B,H,W,4), rast_db (B,H,W,4), tri_id (B,H,W) int32), plus
    the int32 dropped-faces count when with_overflow=True (always 0 on the
    exact 'xla' backend).
    """
    H, W = image_size
    tri_id, overflow = visibility_dispatch(
        verts_clip, faces, H, W, backend, cull_backfaces, tile_h, tile_w,
        max_faces_per_tile, mesh)

    if not grad_enabled:
        verts_clip = jax.lax.stop_gradient(verts_clip)
    rast, rast_db = rasterize_attributes(verts_clip, faces, tri_id)
    if with_overflow:
        return rast, rast_db, tri_id, overflow
    return rast, rast_db, tri_id


def interpolate(
    attr: jnp.ndarray,        # (B|1, Va, C) vertex attributes
    rast: jnp.ndarray,        # (B, H, W, 4) from rasterize
    faces: jnp.ndarray,       # (F, 3) indices into attr rows
    rast_db: Optional[jnp.ndarray] = None,
    diff_attrs: Optional[str] = None,
):
    """Barycentric attribute interpolation (nvdiffrast `dr.interpolate`).

    With `rast_db` + diff_attrs='all', also returns screen-space pixel
    derivatives of the attributes (used for texture lod selection).
    """
    B, H, W, _ = rast.shape
    C = attr.shape[-1]
    tri_id = rast[..., 3].astype(jnp.int32)
    mask = tri_id > 0
    fid = jnp.maximum(tri_id - 1, 0)

    # face-level corner tables packed (B, 3C, F) -> one per-pixel gather
    tables = []
    for k in range(3):
        corner_rows = attr[:, faces[:, k], :]          # (B|1, F, C)
        tables.append(jnp.moveaxis(corner_rows, -1, 1))
    packed = jnp.concatenate(tables, axis=1)           # (B|1, 3C, F)
    if packed.shape[0] == 1 and B > 1:
        packed = jnp.broadcast_to(packed, (B,) + packed.shape[1:])
    planes = gather_face_planes_packed(packed, fid)
    a_corner = [planes[k * C:(k + 1) * C] for k in range(3)]

    u = rast[..., 0]
    v = rast[..., 1]
    w2 = 1.0 - u - v
    m = mask.astype(u.dtype)
    out = jnp.stack([
        (u * a_corner[0][c] + v * a_corner[1][c] + w2 * a_corner[2][c]) * m
        for c in range(C)], axis=-1)

    if diff_attrs is None:
        return out, None

    assert rast_db is not None
    dudx, dudy = rast_db[..., 0], rast_db[..., 1]
    dvdx, dvdy = rast_db[..., 2], rast_db[..., 3]
    dadx = [(dudx * (a_corner[0][c] - a_corner[2][c])
             + dvdx * (a_corner[1][c] - a_corner[2][c])) * m for c in range(C)]
    dady = [(dudy * (a_corner[0][c] - a_corner[2][c])
             + dvdy * (a_corner[1][c] - a_corner[2][c])) * m for c in range(C)]
    da = jnp.stack(dadx + dady, axis=-1)               # (B, H, W, 2C)
    return out, da

"""Pallas per-tile face-plane gather: the per-pixel attribute lookup.

The training render resolves ~38 per-face channels per pixel (barycentric
plane coefficients, corner normals/uvs, AA planes — vhap_tpu/ops/render.py)
with one big XLA gather whose backward is a 4.2M-index scatter-add; the
pair costs ~82 ms of a ~382 ms step at bs=16, 512^2 (docs/PERF.md). This is
the per-pixel attribute stage of nvdiffrast's fused CUDA interpolation
(vhap/util/render_nvdiffrast.py:354-399), re-designed for the MXU.

TPU design — tile-local one-hot matmuls over the rasterizer's face lists:

  The visibility pass already bins faces into per-tile lists (B, T, K)
  (vhap_tpu/ops/rasterize.py bin_faces), and every pixel's winning face id
  is in its tile's list by construction. A compact coefficient table
  ctab[b, t] = packed[b, :, lists[b, t]] (one SMALL gather: B*T*K indices
  instead of B*H*W) is resolved per pixel inside the kernel:

      planes[c, p] = sum_k ctab[c, k] * (list_id[k] == fid[p])

  as (2*CH, 128) @ (128, npx) MXU matmuls per 128-slot list chunk, with the
  f32 table split hi/lo into bf16 (one-hot operands are exact in bf16, so
  the product is f32-exact up to the lo half's rounding — the texture-kernel
  scheme, texture_grad_pallas.py). The backward contracts the pixel axis
  instead — d_ctab[c, k] = sum_p g[c, p] * onehot[k, p] — turning the 4.2M
  per-pixel scatter into a B*T*K one.

  A constant ones-row rides the hi block, so row C of the output is the
  per-pixel match count (exactly 0 or 1 — list ids are distinct): pixels
  whose face id is not listed (possible only for background pixels when
  face 0 overlaps nowhere, or for true list overflow) are fixed up OUTSIDE
  the custom_vjp with a plain jnp.where against packed[:, :, 0] — exactly
  the XLA gather's clamped-index semantics — and foreground misses are
  surfaced as an overflow count (the rast_overflow pattern).

Layouts (tile = the rasterizer's (tile_h, tile_w), npx = tile_h*tile_w):
  packed2  (B, 2*CH, F) bf16   rows [hi(C), ones, 0-pad | lo(C), 0-pad]
  ctab     (B, T, 2*CH, K)     gathered outside (B*T*K indices)
  fid      (B, T, 1, npx) i32  winning face ids, tiled
  lbc      (B, T, 128, K/128)  list ids, sublane-major for chunked one-hots
  out fwd  (B, T, CH, npx) f32 rows [planes(C), match, 0-pad]
  out bwd  (B, T, CH, K) f32   d_ctab rows [d_planes(C), d_match, 0-pad]
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _round_up(a: int, b: int) -> int:
    return _cdiv(a, b) * b


def _split_hi_lo(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """f32 -> (hi, lo) bf16 with hi built by mantissa masking (XLA's
    algebraic simplifier cancels `x - f32(bf16(x))` — docs/PERF.md)."""
    bits = jax.lax.bitcast_convert_type(x, jnp.int32)
    hi_f = jax.lax.bitcast_convert_type(bits & jnp.int32(-65536), jnp.float32)
    return hi_f.astype(jnp.bfloat16), (x - hi_f).astype(jnp.bfloat16)


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------

def _fwd_kernel(ctab_ref, fid_ref, lbc_ref, out_ref, *, ch: int,
                k_chunks: int, npx: int):
    fid = fid_ref[0, 0]                                   # (1, npx) i32
    fid_b = jnp.broadcast_to(fid, (128, npx))
    acc = jnp.zeros((2 * ch, npx), jnp.float32)
    for c in range(k_chunks):
        ids = lbc_ref[0, 0][:, c:c + 1]                   # (128, 1) i32
        oh = (jnp.broadcast_to(ids, (128, npx)) == fid_b).astype(jnp.bfloat16)
        ct = ctab_ref[0, 0][:, c * 128:(c + 1) * 128]     # (2*CH, 128) bf16
        acc = acc + jax.lax.dot_general(
            ct, oh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    out_ref[0, 0] = acc[:ch] + acc[ch:]                   # hi + lo halves


def _bwd_kernel(g_ref, fid_ref, lbc_ref, out_ref, *, ch: int,
                k_chunks: int, npx: int):
    g = g_ref[0, 0]                                       # (CH, npx) f32
    bits = jax.lax.bitcast_convert_type(g, jnp.int32)
    g_hi = jax.lax.bitcast_convert_type(bits & jnp.int32(-65536), jnp.float32)
    g2 = jnp.concatenate([g_hi.astype(jnp.bfloat16),
                          (g - g_hi).astype(jnp.bfloat16)], axis=0)
    fid = fid_ref[0, 0]
    fid_b = jnp.broadcast_to(fid, (128, npx))
    for c in range(k_chunks):
        ids = lbc_ref[0, 0][:, c:c + 1]
        oh = (jnp.broadcast_to(ids, (128, npx)) == fid_b).astype(jnp.bfloat16)
        r = jax.lax.dot_general(                          # contract pixels
            g2, oh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)           # (2*CH, 128)
        out_ref[0, 0, :, c * 128:(c + 1) * 128] = r[:ch] + r[ch:]


# ---------------------------------------------------------------------------
# Tiling helpers (plain JAX, outside the kernels)
# ---------------------------------------------------------------------------

def _tile_image(x: jnp.ndarray, th: int, tw: int) -> jnp.ndarray:
    """(B, H, W) -> (B, T, th*tw), T in row-major (ty, tx) order."""
    B, H, W = x.shape
    ty, tx = H // th, W // tw
    x = x.reshape(B, ty, th, tx, tw).transpose(0, 1, 3, 2, 4)
    return x.reshape(B, ty * tx, th * tw)


def _untile_image(x: jnp.ndarray, H: int, W: int, th: int, tw: int):
    """(B, T, C, th*tw) -> (B, C, H, W)."""
    B, T, C, _ = x.shape
    ty, tx = H // th, W // tw
    x = x.reshape(B, ty, tx, C, th, tw).transpose(0, 3, 1, 4, 2, 5)
    return x.reshape(B, C, H, W)


def _prep_tables(packed: jnp.ndarray, ch: int) -> jnp.ndarray:
    """(B, C, F) f32 -> (B, 2*CH, F) bf16 [hi(C), ones, pad | lo(C), pad]."""
    B, C, F = packed.shape
    hi, lo = _split_hi_lo(packed)
    ones = jnp.ones((B, 1, F), jnp.bfloat16)
    zpad_hi = jnp.zeros((B, ch - C - 1, F), jnp.bfloat16)
    zpad_lo = jnp.zeros((B, ch - C, F), jnp.bfloat16)
    return jnp.concatenate([hi, ones, zpad_hi, lo, zpad_lo], axis=1)


def _prep_lists(lists: jnp.ndarray, k_pad: int):
    """(B, T, K) -> (clamped gather ids (B, T, K_pad),
    sublane-major compare ids (B, T, 128, K_pad/128); pads get id -1
    (matches no pixel — face ids are >= 0)."""
    B, T, K = lists.shape
    lists_p = jnp.pad(lists, ((0, 0), (0, 0), (0, k_pad - K)),
                      constant_values=-1)
    lbc = lists_p.reshape(B, T, k_pad // 128, 128).transpose(0, 1, 3, 2)
    return jnp.maximum(lists_p, 0), lbc


# ---------------------------------------------------------------------------
# custom_vjp core: raw tiled output (planes rows + match row)
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _plane_core(packed, fid_t, lists_g, lbc, n_faces, n_ch, ch, interpret):
    out, _ = _plane_core_fwd(packed, fid_t, lists_g, lbc, n_faces, n_ch, ch,
                             interpret)
    return out


def _pallas_fwd(ctab, fid_t, lbc, ch, interpret):
    B, T, _, K = ctab.shape
    npx = fid_t.shape[-1]
    grid_spec = pl.GridSpec(
        grid=(B, T),
        in_specs=[
            pl.BlockSpec((1, 1, 2 * ch, K), lambda b, t: (b, t, 0, 0)),
            pl.BlockSpec((1, 1, 1, npx), lambda b, t: (b, t, 0, 0)),
            pl.BlockSpec((1, 1, 128, K // 128), lambda b, t: (b, t, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, ch, npx), lambda b, t: (b, t, 0, 0)),
    )
    return pl.pallas_call(
        functools.partial(_fwd_kernel, ch=ch, k_chunks=K // 128, npx=npx),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, T, ch, npx), jnp.float32),
        interpret=interpret or jax.default_backend() != "tpu",
    )(ctab, fid_t, lbc)


def _plane_core_fwd(packed, fid_t, lists_g, lbc, n_faces, n_ch, ch,
                    interpret):
    B, T, K = lists_g.shape
    packed2 = _prep_tables(packed, ch)                       # (B, 2CH, F)
    ctab = jnp.take_along_axis(
        packed2, lists_g.reshape(B, 1, T * K), axis=2)       # (B, 2CH, T*K)
    ctab = ctab.reshape(B, 2 * ch, T, K).transpose(0, 2, 1, 3)
    out = _pallas_fwd(ctab, fid_t, lbc, ch, interpret)
    return out, (fid_t, lists_g, lbc)


def _plane_core_bwd(n_faces, n_ch, ch, interpret, res, g):
    fid_t, lists_g, lbc = res
    B, T, K = lists_g.shape
    C, F = n_ch, n_faces
    npx = fid_t.shape[-1]

    grid_spec = pl.GridSpec(
        grid=(B, T),
        in_specs=[
            pl.BlockSpec((1, 1, ch, npx), lambda b, t: (b, t, 0, 0)),
            pl.BlockSpec((1, 1, 1, npx), lambda b, t: (b, t, 0, 0)),
            pl.BlockSpec((1, 1, 128, K // 128), lambda b, t: (b, t, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, ch, K), lambda b, t: (b, t, 0, 0)),
    )
    d_ctab = pl.pallas_call(
        functools.partial(_bwd_kernel, ch=ch, k_chunks=K // 128, npx=npx),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, T, ch, K), jnp.float32),
        interpret=interpret or jax.default_backend() != "tpu",
    )(g, fid_t, lbc)

    # pad-slot columns (id -1) matched nothing -> zero rows; scatter-add is
    # safe with their clamped index 0. Row C (match) and pad rows dropped.
    upd = d_ctab[:, :, :C].transpose(0, 1, 3, 2).reshape(B, T * K, C)
    bidx = jnp.arange(B, dtype=jnp.int32)[:, None]
    d_packed = jnp.zeros((B, F, C), jnp.float32).at[
        bidx, lists_g.reshape(B, T * K)].add(upd)
    return (jnp.moveaxis(d_packed, -1, 1), None, None, None)


_plane_core.defvjp(_plane_core_fwd, _plane_core_bwd)


# ---------------------------------------------------------------------------
# Public entry
# ---------------------------------------------------------------------------

def plane_gather_tiled(packed: jnp.ndarray, tri_id: jnp.ndarray,
                       lists: jnp.ndarray, tile_h: int, tile_w: int,
                       max_list: int = 0, interpret: bool = False):
    """Per-pixel face-channel lookup through per-tile face lists.

    packed (B|eq, C, F) f32, tri_id (B, H, W) i32 (0 = background),
    lists (B, T, K) from the rasterizer's bin_faces at the SAME
    (tile_h, tile_w) tiling. max_list caps the list slots consulted per
    tile (kernel cost and the outside gather/scatter are linear in it;
    0 = consult the full list, exact by construction); winners beyond the
    cap surface in the overflow count.

    Returns (planes (B, C, H, W) — exact XLA-gather semantics including the
    background/face-0 clamp — and overflow, the int32 count of FOREGROUND
    pixels whose face missed the capped list: nonzero means corrupted pixels,
    callers surface it like rast_overflow).
    """
    B, H, W = tri_id.shape
    C = packed.shape[1]
    ch = _round_up(C + 1, 8)
    K = min(lists.shape[-1], max_list) if max_list > 0 else lists.shape[-1]
    k_pad = _round_up(K, 128)

    fid = jnp.maximum(tri_id - 1, 0)
    fid_t = _tile_image(fid, tile_h, tile_w)[:, :, None, :]  # (B,T,1,npx)
    lists_g, lbc = _prep_lists(lists[..., :K], k_pad)

    raw = _plane_core(packed, fid_t, lists_g, lbc, packed.shape[-1], C, ch,
                      interpret)
    planes_t = raw[:, :, :C]
    match_t = jax.lax.stop_gradient(raw[:, :, C:C + 1]) > 0.5

    # unmatched pixels read face 0 — the XLA gather's fid=max(id-1, 0)
    # clamp semantics (gradients route to packed[:, :, 0] via the where)
    planes_t = jnp.where(match_t, planes_t,
                         packed[:, :, 0][:, None, :, None])
    planes = _untile_image(planes_t, H, W, tile_h, tile_w)

    fg_t = _tile_image(tri_id, tile_h, tile_w)[:, :, None, :] > 0
    overflow = jnp.sum(fg_t & jnp.logical_not(match_t)).astype(jnp.int32)
    return planes, overflow

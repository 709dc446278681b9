"""Exact texel-gradient accumulation as a Pallas TPU kernel.

The backward of mip-mapped texture sampling is a scatter-add of
(pixels x taps) bilinear contributions into the flat mip pyramid — the
single most expensive op of a photometric tracking step when lowered to
XLA's sorted scatter (~2 s for 33 M taps at bs=16, 512^2; docs/PERF.md).
nvdiffrast pays the same sum with CUDA atomics
(vhap/util/render_nvdiffrast.py:399 uses 'linear-mipmap-linear' whose
backward is an 8-tap atomic scatter); TPU has no atomics, so the sum is
reorganized around the MXU instead:

  plan (XLA):  pixels are grouped into blocks of NPIX consecutive
     raster-order pixels. All 4 taps of one pixel within a tap-group land
     in ONE mip level, so per (block, level) the flat tap indices form a
     tight interval. Each (block, tap-group) becomes a work item; its
     per-level intervals are binned onto texture tiles of TILE_T texels
     (argsort compaction, the bin_faces pattern) giving per-tile work
     lists. Background blocks (all tap weights zero) bin nowhere and cost
     nothing.

  kernel (Pallas): one program per texture tile; loops over the tile's
     work items (dynamic count — cold tiles cost nothing), DMAs each
     block's packed tap rows from HBM, masks them to the tile's index
     range and accumulates via one-hot matmuls on the MXU:
         acc[c*128 + r, q] += sum_i  [q_i == q] * [r_i == r] * v_ic
     with q = local >> 7, r = local & 127. Values ride as a bf16 hi+lo
     split so products are exact and the f32 accumulation matches the
     XLA scatter to float rounding (no bf16 quality loss).

Layout notes (Mosaic): per-item data is packed ROW-major as
(R, 4 + 4*C, NPIX) int32 (tap rows + bitcast value rows) so a single
aligned DMA fetches one item; all kernel operands are built from
(1, NPIX) row vectors broadcast over sublane iotas — (NPIX, 1) columns
and sub-128 minor dims would tile-pad catastrophically. The per-tile
work list is DMA'd into SMEM because only scalar memory supports
dynamically indexed reads.

Work items dropped when a tile's list overflows its static capacity are
counted and surfaced (same contract as the rasterizer's bin overflow).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NPIX = 256          # pixels per work block (=> 4*NPIX taps per group item)
TILE_T = 16384      # texels per texture tile (128 q-rows x 128 lanes)
TQ = TILE_T // 128  # q-rows per tile
K_CAP = 8192        # max work items per tile before overflow


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


# ---------------------------------------------------------------------------
# Plan (XLA): block the tap streams and bin work items onto texture tiles
# ---------------------------------------------------------------------------

def plan_tap_scatter(idx: jnp.ndarray, vals: jnp.ndarray,
                     level_offsets: Tuple[int, ...], n_texels: int):
    """idx (B, K, P) int32 flat-pyramid taps, vals (B, K, C, P) f32
    premultiplied contributions (weight * cotangent). K must be a multiple
    of 4 with taps [4g:4g+4] the bilinear corners of one mip level.

    Returns (stream (R, 4+4C, NPIX) int32 packed rows,
    lists (n_tiles, 8, Kpad/8), counts (n_tiles,), overflow, n_tiles).
    """
    B, K, P = idx.shape
    C = vals.shape[2]
    G = K // 4
    assert G * 4 == K, f"tap count {K} not a multiple of 4"
    assert P % NPIX == 0, f"P={P} not a multiple of NPIX={NPIX}"
    NB = B * P // NPIX
    R = G * NB
    n_tiles = _cdiv(n_texels, TILE_T)
    L = len(level_offsets)

    # ---- packed row-major stream ------------------------------------------
    # stream[g*NB + nb, row, j]: rows 0..3 = tap indices, 4..4+4C = values
    def to_rows(x, ch):  # (B, G, ch, P) -> (R, ch, NPIX)
        x = x.reshape(B, G, ch, P // NPIX, NPIX)
        x = x.transpose(1, 0, 3, 2, 4)              # (G, B, P/NPIX, ch, NPIX)
        return x.reshape(R, ch, NPIX)

    idx_r = to_rows(idx.reshape(B, G, 4, P), 4)                    # (R,4,NPIX)
    val_r = to_rows(vals.reshape(B, G, 4 * C, P), 4 * C)           # (R,4C,NPIX)
    stream = jnp.concatenate(
        [idx_r, jax.lax.bitcast_convert_type(val_r, jnp.int32)], axis=1)

    # ---- per-(item, level) tap-index intervals ----------------------------
    # all 4 taps of a pixel's group share one level; level from the first
    # corner's flat offset
    offs = jnp.asarray(level_offsets, jnp.int32)
    lvl = jnp.searchsorted(offs, idx_r[:, 0], side="right") - 1    # (R, NPIX)
    nz = jnp.any(val_r != 0.0, axis=1)                             # (R, NPIX)
    IMAX = jnp.iinfo(jnp.int32).max

    tile_iota = jnp.arange(n_tiles, dtype=jnp.int32)[:, None]      # (T, 1)
    ov = jnp.zeros((n_tiles, R), bool)
    for l in range(L):
        m = (nz & (lvl == l))[:, None]                             # (R,1,NPIX)
        mn = jnp.min(jnp.where(m, idx_r, IMAX), axis=(1, 2))
        mx = jnp.max(jnp.where(m, idx_r, -1), axis=(1, 2))
        t0 = mn // TILE_T
        t1 = mx // TILE_T
        ov = ov | ((tile_iota >= t0[None]) & (tile_iota <= t1[None])
                   & (mn <= mx)[None])

    K_lim = min(R, K_CAP)
    order = jnp.argsort(jnp.logical_not(ov), axis=-1, stable=True)
    lists = order[:, :K_lim].astype(jnp.int32)
    # (n_tiles, 8, K/8): leading-dim slices of tiled memrefs must cover
    # whole (8, 128) tiles, so the per-tile list is laid out as 8 sublanes
    K_pad = _cdiv(K_lim, 1024) * 1024
    lists = jnp.pad(lists, ((0, 0), (0, K_pad - K_lim)))
    lists = lists.reshape(n_tiles, 8, K_pad // 8)
    ov_sum = ov.sum(-1)
    counts = jnp.minimum(ov_sum, K_lim).astype(jnp.int32)
    overflow = jnp.maximum(ov_sum - K_lim, 0).sum().astype(jnp.int32)
    return stream, lists, counts, overflow, n_tiles


# ---------------------------------------------------------------------------
# Kernel: one program per texture tile
# ---------------------------------------------------------------------------

def _tile_kernel(counts_ref, lists_hbm, stream_hbm, out_ref,
                 list_smem, buf, sem_l, sem_s, *, n_ch: int):
    t = pl.program_id(0)
    n = counts_ref[t]
    base = t * TILE_T

    # the tile's work list: HBM -> SMEM so item ids support dynamic reads
    cp_l = pltpu.make_async_copy(lists_hbm.at[t], list_smem, sem_l)
    cp_l.start()
    cp_l.wait()

    sub128 = jax.lax.broadcasted_iota(jnp.int32, (128, NPIX), 0)
    acc0 = jnp.zeros((128 * n_ch, 128), jnp.float32)   # [(c, r), q]
    kd = list_smem.shape[1]

    def body(k, acc):
        r_item = list_smem[k // kd, k % kd]
        cp = pltpu.make_async_copy(stream_hbm.at[r_item], buf, sem_s)
        cp.start()
        cp.wait()
        for tap in range(4):
            ii = buf[tap:tap + 1, :]                     # (1, NPIX) i32
            local = ii - base
            inb = ((local >= 0) & (local < TILE_T)).astype(jnp.float32)
            lc = jnp.clip(local, 0, TILE_T - 1)
            qi = jnp.broadcast_to(lc >> 7, (128, NPIX))
            ri = jnp.broadcast_to(lc & 127, (128, NPIX))
            h_q = (sub128 == qi).astype(jnp.bfloat16)    # (128q, NPIX)
            r_oh = (sub128 == ri).astype(jnp.float32)    # (128r, NPIX)
            ut_hi = []
            ut_lo = []
            for c in range(n_ch):
                row = 4 + (tap * n_ch + c)
                v = pltpu.bitcast(buf[row:row + 1, :], jnp.float32) * inb
                vb = jnp.broadcast_to(v, (128, NPIX)) * r_oh
                hi = vb.astype(jnp.bfloat16)
                lo = (vb - hi.astype(jnp.float32)).astype(jnp.bfloat16)
                ut_hi.append(hi)
                ut_lo.append(lo)
            ut_hi = jnp.concatenate(ut_hi, axis=0)       # (128*C, NPIX)
            ut_lo = jnp.concatenate(ut_lo, axis=0)
            dn = (((1,), (1,)), ((), ()))                # contract pixels
            acc = acc + jax.lax.dot_general(
                ut_hi, h_q, dn, preferred_element_type=jnp.float32)
            acc = acc + jax.lax.dot_general(
                ut_lo, h_q, dn, preferred_element_type=jnp.float32)
        return acc

    out_ref[0] = jax.lax.fori_loop(0, n, body, acc0)


@functools.partial(jax.jit, static_argnames=("level_offsets", "n_texels",
                                              "interpret"))
def scatter_taps(idx: jnp.ndarray, vals: jnp.ndarray,
                 level_offsets: Tuple[int, ...], n_texels: int,
                 interpret: bool = False):
    """Sum vals into a flat texel buffer: out[t, c] = sum over taps with
    idx == t. Returns (dflat (n_texels, C) f32, overflow int32)."""
    B, K, C, P = vals.shape
    interpret = interpret or jax.default_backend() != "tpu"
    stream, lists, counts, overflow, n_tiles = plan_tap_scatter(
        idx, vals, level_offsets, n_texels)
    K_rows, K_cols = lists.shape[1:]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),   # lists: row-sliced by DMA
            pl.BlockSpec(memory_space=pltpu.HBM),   # packed tap stream
        ],
        out_specs=pl.BlockSpec((1, 128 * C, 128), lambda t, _c: (t, 0, 0)),
        scratch_shapes=[
            pltpu.SMEM((K_rows, K_cols), jnp.int32),
            pltpu.VMEM((4 + 4 * C, NPIX), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_tile_kernel, n_ch=C),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles, 128 * C, 128), jnp.float32),
        interpret=interpret,
    )(counts, lists, stream)

    # out[t, c*128 + r, q] -> flat[t*TILE_T + q*128 + r, c]
    dflat = out.reshape(n_tiles, C, 128, 128).transpose(0, 3, 2, 1)
    dflat = dflat.reshape(n_tiles * TILE_T, C)[:n_texels]
    return dflat, overflow


# ---------------------------------------------------------------------------
# custom_vjp wrapper used by texture_sample's exact-gradient path
# ---------------------------------------------------------------------------

def _fetch_fwd_math(flat1, idx, wgt):
    """flat1 (N, C); idx, wgt (B, K, P) -> out (B, P, C), texels (B,K,P,C)."""
    texels = flat1[idx]                                    # (B, K, P, C)
    out = jnp.einsum("bkpc,bkp->bpc", texels, wgt)
    return out, texels


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def weighted_fetch_exact(flat1, idx, wgt, level_offsets, impl="pallas",
                         interpret=False):
    """Trilinear weighted texel fetch with a kernel-accumulated backward.

    flat1 (N, C) shared flat mip pyramid; idx (B, K, P) int32 taps;
    wgt (B, K, P). Forward equals the plain einsum fetch; backward
    produces the exact scatter-add texel gradient (Pallas kernel on TPU,
    XLA scatter otherwise) and the exact uv-path weight gradient.
    """
    out, _ = _fetch_fwd_math(flat1, idx, wgt)
    return out


def _wfe_fwd(flat1, idx, wgt, level_offsets, impl, interpret):
    out, texels = _fetch_fwd_math(flat1, idx, wgt)
    return out, (flat1.shape, idx, wgt, texels)


def _wfe_bwd(level_offsets, impl, interpret, res, g):
    (N, C), idx, wgt, texels = res
    # d_wgt: gradient through the bilinear/lod weights (uv path)
    d_wgt = jnp.einsum("bkpc,bpc->bkp", texels, g)
    vals = wgt[:, :, None, :] * jnp.moveaxis(g, -1, 1)[:, None]  # (B,K,C,P)
    if impl == "pallas":
        dflat, _overflow = scatter_taps(idx, vals, level_offsets, N,
                                        interpret=interpret)
    else:
        B, K, _, P = vals.shape
        upd = vals.transpose(0, 1, 3, 2).reshape(-1, C)
        dflat = jnp.zeros((N, C), jnp.float32).at[idx.reshape(-1)].add(upd)
    return dflat.astype(texels.dtype), None, d_wgt


weighted_fetch_exact.defvjp(_wfe_fwd, _wfe_bwd)

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

Capacity contract: a tile's work list holds min(R, K_CAP) entries where R
is the total item count, so configs with R <= K_CAP can NEVER overflow
(counts == exact visit counts). Oversized configs are rejected up front —
`fits_kernel` gates the dispatch in texture.py so they fall back to the
XLA implementation instead of silently dropping taps (a dropped
first-visit entry would additionally let a surviving revisit RMW
uninitialized HBM into the forward fetch).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NPIX = 1024         # pixels per work block (=> 4*NPIX taps per group item)
TILE_T = 16384      # texels per texture tile (128 q-rows x 128 lanes)
TQ = TILE_T // 128  # q-rows per tile
K_CAP = 8192        # max work items per tile before overflow


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def fits_kernel(B: int, K: int, P: int, C: int, npix: int = None) -> bool:
    """True when (B, K, P, C) taps can run the Pallas kernels without any
    possibility of work-list overflow (R <= K_CAP guarantees every tile's
    list capacity min(R, K_CAP) == R >= its visit count) and satisfy the
    kernels' static layout constraints."""
    npix = npix or NPIX
    if K % 4 != 0 or P % npix != 0 or 4 * C > 16:
        return False
    R = (K // 4) * B * (P // npix)
    return R <= K_CAP


# ---------------------------------------------------------------------------
# Plan (XLA): block the tap streams and bin work items onto texture tiles
# ---------------------------------------------------------------------------

def _pack_rows(idx: jnp.ndarray, vals: jnp.ndarray, npix: int = None):
    """Pack (B, K, P) taps + (B, K, C, P) values into item rows.

    Returns (stream (R, 4+4C, npix) int32, idx_r (R, 4, npix), val_r)
    with item r = g * (B * P/npix) + b * (P/npix) + pb.
    """
    npix = npix or NPIX
    B, K, P = idx.shape
    C = vals.shape[2]
    G = K // 4
    assert G * 4 == K, f"tap count {K} not a multiple of 4"
    assert P % npix == 0, f"P={P} not a multiple of npix={npix}"
    R = G * B * P // npix

    # stream[g*NB + nb, row, j]: rows 0..3 = tap indices, 4..4+4C = values
    def to_rows(x, ch):  # (B, G, ch, P) -> (R, ch, npix)
        x = x.reshape(B, G, ch, P // npix, npix)
        x = x.transpose(1, 0, 3, 2, 4)              # (G, B, P/npix, ch, npix)
        return x.reshape(R, ch, npix)

    idx_r = to_rows(idx.reshape(B, G, 4, P), 4)                    # (R,4,NPIX)
    val_r = to_rows(vals.reshape(B, G, 4 * C, P), 4 * C)           # (R,4C,NPIX)
    stream = jnp.concatenate(
        [idx_r, jax.lax.bitcast_convert_type(val_r, jnp.int32)], axis=1)
    return stream, idx_r, val_r


def _bin_items(idx_r: jnp.ndarray, nz: jnp.ndarray,
               level_offsets: Tuple[int, ...], n_texels: int):
    """Bin item tap-index intervals onto texture tiles.

    idx_r (R, 4, NPIX) packed taps, nz (R, NPIX) active-pixel mask.
    Returns (lists (n_tiles, 8, Kpad/8) SIGN-ENCODED entries, counts,
    overflow, n_tiles). Entry e encodes item |e| - 1; e > 0 marks the
    item's FIRST visiting tile (gather kernel: plain write, no RMW read).
    """
    R = idx_r.shape[0]
    n_tiles = _cdiv(n_texels, TILE_T)
    L = len(level_offsets)

    # all 4 taps of a pixel's group share one level; level from the first
    # corner's flat offset
    offs = jnp.asarray(level_offsets, jnp.int32)
    lvl = jnp.searchsorted(offs, idx_r[:, 0], side="right") - 1    # (R, NPIX)
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

    first = ov & (jnp.cumsum(ov.astype(jnp.int32), axis=0) == 1)

    K_lim = min(R, K_CAP)
    # one 3-operand sort compacts ids AND first-flags by the bin key
    # (argsort + take_along_axis pays an extra ~30 ms gather at this size)
    iota = jnp.broadcast_to(jnp.arange(R, dtype=jnp.int32)[None],
                            ov.shape)
    _, first_s, ids = jax.lax.sort(
        (jnp.logical_not(ov), first, iota), dimension=-1, num_keys=1,
        is_stable=True)
    ids = ids[:, :K_lim]
    first_s = first_s[:, :K_lim]
    lists = jnp.where(first_s, ids + 1, -(ids + 1))
    # (n_tiles, 8, K/8): leading-dim slices of tiled memrefs must cover
    # whole (8, 128) tiles, so the per-tile list is laid out as 8 sublanes
    K_pad = _cdiv(K_lim, 1024) * 1024
    lists = jnp.pad(lists, ((0, 0), (0, K_pad - K_lim)))
    lists = lists.reshape(n_tiles, 8, K_pad // 8)
    ov_sum = ov.sum(-1)
    counts = jnp.minimum(ov_sum, K_lim).astype(jnp.int32)
    overflow = jnp.maximum(ov_sum - K_lim, 0).sum().astype(jnp.int32)
    return lists, counts, overflow, n_tiles


def _pack_g_rows(g: jnp.ndarray, npix: int = None) -> jnp.ndarray:
    """Cotangent rows for the wgt*g scatter kernel.

    g (B, P, C) -> (B * P/npix, 8, npix) f32, channel rows first, rows
    C..8 zero (sublane dim padded to 8 so per-block HBM row slices cover
    whole (8, 128) tiles)."""
    npix = npix or NPIX
    B, P, C = g.shape
    PB = P // npix
    rows = g.reshape(B, PB, npix, C).transpose(0, 1, 3, 2)   # (B,PB,C,npix)
    rows = rows.reshape(B * PB, C, npix)
    return jnp.pad(rows, ((0, 0), (0, 8 - C), (0, 0)))


def plan_tap_scatter(idx: jnp.ndarray, vals: jnp.ndarray,
                     level_offsets: Tuple[int, ...], n_texels: int,
                     npix: int = None):
    """idx (B, K, P) int32 flat-pyramid taps, vals (B, K, C, P) f32
    premultiplied contributions (weight * cotangent). K must be a multiple
    of 4 with taps [4g:4g+4] the bilinear corners of one mip level.

    Returns (stream (R, 4+4C, NPIX) int32 packed rows,
    lists (n_tiles, 8, Kpad/8) sign-encoded, counts (n_tiles,), overflow,
    n_tiles).
    """
    stream, idx_r, val_r = _pack_rows(idx, vals, npix)
    nz = jnp.any(val_r != 0.0, axis=1)                             # (R, npix)
    lists, counts, overflow, n_tiles = _bin_items(idx_r, nz, level_offsets,
                                                  n_texels)
    return stream, lists, counts, overflow, n_tiles


# ---------------------------------------------------------------------------
# Kernel: one program per texture tile
# ---------------------------------------------------------------------------

def _tile_kernel(counts_ref, lists_hbm, stream_hbm, out_ref,
                 list_smem, buf, sem_l, sem_s, *, n_ch: int, npix: int,
                 hi_lo: bool = True):
    t = pl.program_id(0)
    n = counts_ref[t]
    base = t * TILE_T

    # the tile's work list: HBM -> SMEM so item ids support dynamic reads
    cp_l = pltpu.make_async_copy(lists_hbm.at[t], list_smem, sem_l)
    cp_l.start()
    cp_l.wait()

    sub128 = jax.lax.broadcasted_iota(jnp.int32, (128, npix), 0)
    acc0 = jnp.zeros((128 * n_ch, 128), jnp.float32)   # [(c, r), q]
    kd = list_smem.shape[1]

    def item_dma(k, slot):
        r_item = jnp.abs(list_smem[k // kd, k % kd]) - 1  # sign = first-visit
        return pltpu.make_async_copy(stream_hbm.at[r_item], buf.at[slot],
                                     sem_s.at[slot])

    # double-buffered item stream: item k+1's 64 KB DMA flies while item k
    # runs its matmuls
    @pl.when(n > 0)
    def _():
        item_dma(0, 0).start()

    def body(k, acc):
        slot = k % 2

        @pl.when(k + 1 < n)
        def _():
            item_dma(k + 1, (k + 1) % 2).start()

        item_dma(k, slot).wait()
        for tap in range(4):
            ii = buf[slot, tap:tap + 1, :]               # (1, npix) i32
            local = ii - base
            inb = ((local >= 0) & (local < TILE_T)).astype(jnp.float32)
            lc = jnp.clip(local, 0, TILE_T - 1)
            qi = jnp.broadcast_to(lc >> 7, (128, npix))
            ri = jnp.broadcast_to(lc & 127, (128, npix))
            h_q = (sub128 == qi).astype(jnp.bfloat16)    # (128q, npix)
            r_oh = (sub128 == ri).astype(jnp.float32)    # (128r, npix)
            ut_hi = []
            ut_lo = []
            for c in range(n_ch):
                row = 4 + (tap * n_ch + c)
                v = pltpu.bitcast(buf[slot, row:row + 1, :], jnp.float32) * inb
                vb = jnp.broadcast_to(v, (128, npix)) * r_oh
                hi = vb.astype(jnp.bfloat16)
                ut_hi.append(hi)
                if hi_lo:
                    lo = (vb - hi.astype(jnp.float32)).astype(jnp.bfloat16)
                    ut_lo.append(lo)
            ut_hi = jnp.concatenate(ut_hi, axis=0)       # (128*C, npix)
            dn = (((1,), (1,)), ((), ()))                # contract pixels
            acc = acc + jax.lax.dot_general(
                ut_hi, h_q, dn, preferred_element_type=jnp.float32)
            if hi_lo:
                ut_lo = jnp.concatenate(ut_lo, axis=0)
                acc = acc + jax.lax.dot_general(
                    ut_lo, h_q, dn, preferred_element_type=jnp.float32)
        return acc

    out_ref[0] = jax.lax.fori_loop(0, n, body, acc0)


@functools.partial(jax.jit, static_argnames=("level_offsets", "n_texels",
                                              "interpret", "npix",
                                              "precision"))
def scatter_taps(idx: jnp.ndarray, vals: jnp.ndarray,
                 level_offsets: Tuple[int, ...], n_texels: int,
                 interpret: bool = False, plan=None, npix: int = None,
                 precision: str = "f32"):
    """Sum vals into a flat texel buffer: out[t, c] = sum over taps with
    idx == t. Returns (dflat (n_texels, C) f32, overflow int32).

    plan = (lists, counts) reuses bins from a matching gather_taps call
    (valid whenever its nz mask was a superset of vals' nonzeros — extra
    visits contribute exact zeros)."""
    B, K, C, P = vals.shape
    npix = npix or NPIX
    assert fits_kernel(B, K, P, C, npix), \
        f"tap config (B={B}, K={K}, P={P}, C={C}) exceeds kernel capacity"
    interpret = interpret or jax.default_backend() != "tpu"
    if plan is None:
        stream, lists, counts, overflow, n_tiles = plan_tap_scatter(
            idx, vals, level_offsets, n_texels, npix)
    else:
        stream, _, _ = _pack_rows(idx, vals, npix)
        lists, counts = plan[:2]
        # fits_kernel (asserted above) makes overflow structurally zero:
        # every tile's list capacity >= its visit count
        overflow = jnp.zeros((), jnp.int32)
        n_tiles = _cdiv(n_texels, TILE_T)
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
            pltpu.VMEM((2, 4 + 4 * C, npix), jnp.int32),  # double-buffered
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_tile_kernel, n_ch=C, npix=npix,
                          hi_lo=precision == "f32"),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles, 128 * C, 128), jnp.float32),
        interpret=interpret,
    )(counts, lists, stream)

    # out[t, c*128 + r, q] -> flat[t*TILE_T + q*128 + r, c]
    dflat = out.reshape(n_tiles, C, 128, 128).transpose(0, 3, 2, 1)
    dflat = dflat.reshape(n_tiles * TILE_T, C)[:n_texels]
    return dflat, overflow


# ---------------------------------------------------------------------------
# wgt*g variant: the backward scatter without materializing vals
# ---------------------------------------------------------------------------
#
# The custom-vjp backward owns wgt (saved) and the cotangent g; forming
# vals = wgt * g as a (B, K, C, P) tensor costs a 400 MB materialization
# plus its row-layout shuffle at the bench config. This variant REUSES the
# forward gather's packed (idx, wgt) stream (saved as a residual) plus a
# compact per-pixel-block g-row table, and multiplies wgt * g inside the
# kernel (one VPU multiply per tap-channel).

def _tile_kernel_wg(counts_ref, lists_hbm, stream_hbm, g_hbm, out_ref,
                    list_smem, buf, gbuf, sem_l, sem_s, sem_g, *,
                    n_ch: int, npix: int, hi_lo: bool, n_gblocks: int):
    t = pl.program_id(0)
    n = counts_ref[t]
    base = t * TILE_T

    cp_l = pltpu.make_async_copy(lists_hbm.at[t], list_smem, sem_l)
    cp_l.start()
    cp_l.wait()

    sub128 = jax.lax.broadcasted_iota(jnp.int32, (128, npix), 0)
    acc0 = jnp.zeros((128 * n_ch, 128), jnp.float32)   # [(c, r), q]
    kd = list_smem.shape[1]

    def dmas(k, slot):
        r_item = jnp.abs(list_smem[k // kd, k % kd]) - 1
        m = r_item % n_gblocks                   # g-block shared across G
        return (pltpu.make_async_copy(stream_hbm.at[r_item], buf.at[slot],
                                      sem_s.at[slot]),
                pltpu.make_async_copy(g_hbm.at[m], gbuf.at[slot],
                                      sem_g.at[slot]))

    @pl.when(n > 0)
    def _():
        for d in dmas(0, 0):
            d.start()

    def body(k, acc):
        slot = k % 2

        @pl.when(k + 1 < n)
        def _():
            for d in dmas(k + 1, (k + 1) % 2):
                d.start()

        cp_s, cp_g = dmas(k, slot)
        cp_s.wait()
        cp_g.wait()
        for tap in range(4):
            ii = buf[slot, tap:tap + 1, :]               # (1, npix) i32
            local = ii - base
            inb = ((local >= 0) & (local < TILE_T)).astype(jnp.float32)
            w = pltpu.bitcast(buf[slot, 4 + tap:5 + tap, :],
                              jnp.float32) * inb
            lc = jnp.clip(local, 0, TILE_T - 1)
            qi = jnp.broadcast_to(lc >> 7, (128, npix))
            ri = jnp.broadcast_to(lc & 127, (128, npix))
            h_q = (sub128 == qi).astype(jnp.bfloat16)    # (128q, npix)
            r_oh = (sub128 == ri).astype(jnp.float32)    # (128r, npix)
            ut_hi = []
            ut_lo = []
            for c in range(n_ch):
                v = w * gbuf[slot, c:c + 1, :]           # wgt * g in-kernel
                vb = jnp.broadcast_to(v, (128, npix)) * r_oh
                hi = vb.astype(jnp.bfloat16)
                ut_hi.append(hi)
                if hi_lo:
                    lo = (vb - hi.astype(jnp.float32)).astype(jnp.bfloat16)
                    ut_lo.append(lo)
            ut_hi = jnp.concatenate(ut_hi, axis=0)       # (128*C, npix)
            dn = (((1,), (1,)), ((), ()))                # contract pixels
            acc = acc + jax.lax.dot_general(
                ut_hi, h_q, dn, preferred_element_type=jnp.float32)
            if hi_lo:
                ut_lo = jnp.concatenate(ut_lo, axis=0)
                acc = acc + jax.lax.dot_general(
                    ut_lo, h_q, dn, preferred_element_type=jnp.float32)
        return acc

    out_ref[0] = jax.lax.fori_loop(0, n, body, acc0)


@functools.partial(jax.jit, static_argnames=("n_texels", "interpret", "npix",
                                              "precision"))
def scatter_taps_wg(stream: jnp.ndarray, g: jnp.ndarray, plan,
                    n_texels: int, interpret: bool = False,
                    npix: int = None, precision: str = "f32"):
    """Backward scatter from the gather's packed (idx, wgt) stream and the
    cotangent g (B, P, C): dflat[t, c] = sum over taps with idx == t of
    wgt * g. plan = (lists, counts) from gather_taps (always a superset of
    the nonzeros — capacity is structurally sufficient per fits_kernel).
    Returns (n_texels, C) f32."""
    B, P, C = g.shape
    npix = npix or NPIX
    interpret = interpret or jax.default_backend() != "tpu"
    lists, counts = plan
    n_tiles = _cdiv(n_texels, TILE_T)
    K_rows, K_cols = lists.shape[1:]
    g_rows = _pack_g_rows(g, npix)
    n_gblocks = g_rows.shape[0]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),   # lists: row-sliced by DMA
            pl.BlockSpec(memory_space=pltpu.HBM),   # packed (idx, wgt) stream
            pl.BlockSpec(memory_space=pltpu.HBM),   # g rows
        ],
        out_specs=pl.BlockSpec((1, 128 * C, 128), lambda t, _c: (t, 0, 0)),
        scratch_shapes=[
            pltpu.SMEM((K_rows, K_cols), jnp.int32),
            pltpu.VMEM((2, 8, npix), jnp.int32),      # stream, double-buffered
            pltpu.VMEM((2, 8, npix), jnp.float32),    # g rows, double-buffered
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_tile_kernel_wg, n_ch=C, npix=npix,
                          hi_lo=precision == "f32", n_gblocks=n_gblocks),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles, 128 * C, 128), jnp.float32),
        interpret=interpret,
    )(counts, lists, stream, g_rows)

    dflat = out.reshape(n_tiles, C, 128, 128).transpose(0, 3, 2, 1)
    return dflat.reshape(n_tiles * TILE_T, C)[:n_texels]


# ---------------------------------------------------------------------------
# Forward tap-gather kernel: the trilinear texel FETCH through the same bins
# ---------------------------------------------------------------------------
#
# XLA lowers the 33M-tap forward fetch to a random-access HBM gather at
# ~6 ns/tap (~200 ms/step at bs=16, 512^2 — the top op of the profiled
# step). This kernel reuses the scatter plan: per texture tile, the
# (bf16 hi+lo split) tile sits in VMEM in [(c, r), q] layout and each work
# item's taps are fetched with one one-hot MXU matmul per tap
#     P1[(c, r), j] = sum_q Tt[(c, r), q] * [q_j == q]
# followed by a VPU row-select (mask by [r_j == r], reduce sublanes).
# Items are streamed to a per-item (16, NPIX) HBM texel buffer; an item
# visited by several tiles (taps straddling a tile edge) accumulates via
# DMA read-add-write, with the first visit (sign bit in the work list)
# writing directly — so untouched buffer garbage never leaks in.

def _gather_tile_kernel(counts_ref, lists_hbm, stream_hbm, tsplit_ref,
                        out_hbm, list_smem, sbuf, vout, rbuf,
                        sem_l, sem_s, sem_r, sem_w, *, n_ch: int, npix: int,
                        hi_lo: bool = True):
    t = pl.program_id(0)
    n = counts_ref[t]
    base = t * TILE_T

    cp_l = pltpu.make_async_copy(lists_hbm.at[t], list_smem, sem_l)
    cp_l.start()
    cp_l.wait()

    sub128 = jax.lax.broadcasted_iota(jnp.int32, (128, npix), 0)
    # hi_lo: hi and lo halves of the f32 tile ride ONE stacked bf16 operand
    # and a single matmul; summing two separate dot(hi)+dot(lo) calls
    # invites the compiler to refactor into dot(hi+lo) in bf16, which drops
    # lo entirely (observed on TPU: texel error jumped to 2^-8 relative).
    # precision='bf16' skips the lo half: half the MXU work for a 2^-8
    # relative texel error (under the sensor/jpeg noise floor; the tap
    # kernels are MXU-bound, docs/PERF.md).
    tsp = tsplit_ref[0]                      # ((1+hi_lo)*128*C, 128) bf16
    kd = list_smem.shape[1]
    CH = 128 * n_ch

    def entry(k):
        e = list_smem[k // kd, k % kd]
        return jnp.abs(e) - 1, e < 0                 # (item row, revisit?)

    def in_dma(k, slot):
        r_item, _ = entry(k)
        return pltpu.make_async_copy(stream_hbm.at[r_item], sbuf.at[slot],
                                     sem_s.at[slot])

    def rd_dma(k, slot):
        r_item, _ = entry(k)
        return pltpu.make_async_copy(out_hbm.at[r_item], rbuf.at[slot],
                                     sem_r.at[slot])

    def wr_dma(k, slot):
        r_item, _ = entry(k)
        return pltpu.make_async_copy(vout.at[slot], out_hbm.at[r_item],
                                     sem_w.at[slot])

    def start_in(k):
        slot = k % 2
        in_dma(k, slot).start()
        _, rmw = entry(k)

        @pl.when(rmw)
        def _():
            rd_dma(k, slot).start()

    # Double-buffered item pipeline: item k+1's input DMA (and revisit
    # read) fly while item k computes; the result write is waited only when
    # its vout slot is reused two items later. An item is never listed
    # twice in one tile, and cross-tile revisits are ordered by the
    # residual waits at the end of the grid step, so deferred writes cannot
    # race a revisit read.
    @pl.when(n > 0)
    def _():
        start_in(0)

    def body(k, carry):
        slot = k % 2

        @pl.when(k + 1 < n)
        def _():
            start_in(k + 1)

        in_dma(k, slot).wait()

        @pl.when(k >= 2)
        def _():                                     # free this vout slot
            wr_dma(k - 2, slot).wait()

        _, rmw = entry(k)
        for tap in range(4):
            ii = sbuf[slot, tap:tap + 1, :]          # (1, npix) i32
            local = ii - base
            inb = ((local >= 0) & (local < TILE_T)).astype(jnp.float32)
            lc = jnp.clip(local, 0, TILE_T - 1)
            qi = jnp.broadcast_to(lc >> 7, (128, npix))
            ri = jnp.broadcast_to(lc & 127, (128, npix))
            h_q = (sub128 == qi).astype(jnp.bfloat16)
            r_sel = (sub128 == ri).astype(jnp.float32) * inb
            dn = (((1,), (0,)), ((), ()))
            p2 = jax.lax.dot_general(tsp, h_q, dn,
                                     preferred_element_type=jnp.float32)
            p1 = (p2[:CH] + p2[CH:]) if hi_lo else p2    # hi + lo, f32
            for c in range(n_ch):
                row = tap * n_ch + c
                vc = jnp.sum(p1[c * 128:(c + 1) * 128] * r_sel,
                             axis=0, keepdims=True)
                vout[slot, row:row + 1, :] = vc
        if 4 * n_ch < 16:  # C=4 fills all 16 rows; avoid a zero-row store
            vout[slot, 4 * n_ch:, :] = jnp.zeros((16 - 4 * n_ch, npix),
                                                 jnp.float32)

        @pl.when(rmw)
        def _():
            rd_dma(k, slot).wait()
            vout[slot, :, :] = vout[slot, :, :] + rbuf[slot, :, :]

        wr_dma(k, slot).start()
        return carry

    jax.lax.fori_loop(0, n, body, 0)

    # drain the (up to two) outstanding result writes before the grid step
    # ends: the next tile may revisit these items and RMW-read their rows
    @pl.when(n >= 2)
    def _():
        wr_dma(n - 2, (n - 2) % 2).wait()

    @pl.when(n >= 1)
    def _():
        wr_dma(n - 1, (n - 1) % 2).wait()


@functools.partial(jax.jit, static_argnames=("level_offsets", "interpret",
                                              "npix", "precision"))
def gather_taps(flat1: jnp.ndarray, idx: jnp.ndarray, wgt: jnp.ndarray,
                level_offsets: Tuple[int, ...], interpret: bool = False,
                npix: int = None, precision: str = "f32"):
    """Fetch texels for every tap through the tile bins.

    flat1 (N, C) flat mip pyramid; idx, wgt (B, K, P). Returns
    (texels_r (R, 16, NPIX) f32 — rows tap*C+c, zero where wgt == 0 —
    plan (lists, counts) for reuse by scatter_taps, overflow int32).
    """
    N, C = flat1.shape
    npix = npix or NPIX
    B, K, P = idx.shape
    assert fits_kernel(B, K, P, C, npix), \
        f"tap config (B={B}, K={K}, P={P}, C={C}) exceeds kernel capacity"
    interpret = interpret or jax.default_backend() != "tpu"
    stream, idx_r, wgt_r = _pack_rows(idx, wgt[:, :, None, :], npix)
    nz = jnp.any(wgt_r != 0.0, axis=1)                             # (R, npix)
    lists, counts, overflow, n_tiles = _bin_items(idx_r, nz, level_offsets, N)
    R = stream.shape[0]
    K_rows, K_cols = lists.shape[1:]

    # texture tiles in [(c, r), q] layout with an exact-product bf16 split
    hi_lo = precision == "f32"
    pad = n_tiles * TILE_T - N
    tiles = jnp.pad(flat1, ((0, pad), (0, 0)))
    tiles = tiles.reshape(n_tiles, 128, 128, C).transpose(0, 3, 2, 1)
    tiles = tiles.reshape(n_tiles, C * 128, 128)
    if hi_lo:
        # hi = tiles with the low 16 mantissa bits zeroed (exactly a bf16),
        # via integer masking: the straightforward `tiles - f32(bf16(tiles))`
        # is algebraically simplified away by XLA (convert-pair
        # cancellation), which silently zeroes the lo half and costs 2^-8
        # relative accuracy
        bits = jax.lax.bitcast_convert_type(tiles, jnp.int32)
        hi_f = jax.lax.bitcast_convert_type(bits & jnp.int32(-65536),
                                            jnp.float32)
        thi = hi_f.astype(jnp.bfloat16)             # exact: low bits are zero
        tlo = (tiles - hi_f).astype(jnp.bfloat16)   # exact f32 residual
        tsplit = jnp.concatenate([thi, tlo], axis=1)  # (T, 2*C*128, 128)
    else:
        tsplit = tiles.astype(jnp.bfloat16)           # (T, C*128, 128)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),   # lists: row-sliced by DMA
            pl.BlockSpec(memory_space=pltpu.HBM),   # packed tap stream
            pl.BlockSpec((1, (1 + hi_lo) * C * 128, 128),
                         lambda t, _c: (t, 0, 0)),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[
            pltpu.SMEM((K_rows, K_cols), jnp.int32),
            pltpu.VMEM((2, 8, npix), jnp.int32),      # double-buffered in
            pltpu.VMEM((2, 16, npix), jnp.float32),   # double-buffered out
            pltpu.VMEM((2, 16, npix), jnp.float32),   # double-buffered rmw
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    texels_r = pl.pallas_call(
        functools.partial(_gather_tile_kernel, n_ch=C, npix=npix,
                          hi_lo=hi_lo),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((R, 16, npix), jnp.float32),
        interpret=interpret,
    )(counts, lists, stream, tsplit)

    # rows of items no tile ever visited are uninitialized memory; their
    # weights are all zero, so mask rather than risk 0 * NaN downstream
    texels_r = jnp.where(nz[:, None, :], texels_r, 0.0)
    # the packed (idx, wgt) stream rides along so the backward scatter
    # (scatter_taps_wg) can reuse it without re-packing or forming vals
    return texels_r, (lists, counts, stream), overflow


def _texels_rows_out(texels_r, wgt, C, npix=None):
    """out[b, p, c] = sum_k wgt * texels, read in the packed-row layout."""
    npix = npix or NPIX
    B, K, P = wgt.shape
    G, PB = K // 4, P // npix
    tex_r = texels_r.reshape(G, B, PB, 16, npix)[:, :, :, :4 * C]
    tex_r = tex_r.reshape(G, B, PB, 4, C, npix)
    wgt_r = wgt.reshape(B, G, 4, PB, npix)
    out = jnp.einsum("gbptcj,bgtpj->bpjc", tex_r, wgt_r)   # (B, PB, npix, C)
    return out.reshape(B, P, C)


def _texels_rows_d_wgt(texels_r, g, B, K, P, C, npix=None):
    """d_wgt[b, k, p] = sum_c texels * g, read in the packed-row layout."""
    npix = npix or NPIX
    G, PB = K // 4, P // npix
    tex_r = texels_r.reshape(G, B, PB, 16, npix)[:, :, :, :4 * C]
    tex_r = tex_r.reshape(G, B, PB, 4, C, npix)
    g_r = g.reshape(B, PB, npix, C)
    d = jnp.einsum("gbptcj,bpjc->bgtpj", tex_r, g_r)       # (B, G, 4, PB, npix)
    return d.reshape(B, K, P)


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
    """Trilinear weighted texel fetch with kernel forward AND backward.

    flat1 (N, C) shared flat mip pyramid; idx (B, K, P) int32 taps;
    wgt (B, K, P). impl='pallas' fetches the taps with the tile-binned
    gather kernel (exact to the bf16 hi+lo product split, ~2e-5 relative)
    and scatters texel gradients with its MXU twin; impl='pallas_bf16'
    skips the hi/lo split in both kernels — half the MXU work for a 2^-8
    relative texel/texel-grad error (the kernels are MXU-bound;
    docs/PERF.md has the convergence A/B); impl='xla' uses the plain
    gather forward and a sorted-scatter backward. All produce the exact
    uv-path weight gradient.
    """
    prec = "bf16" if impl == "pallas_bf16" else "f32"
    if impl in ("pallas", "pallas_bf16"):
        texels_r, _plan, _ovf = gather_taps(flat1, idx, wgt, level_offsets,
                                            interpret, precision=prec)
        return _texels_rows_out(texels_r, wgt, flat1.shape[1])
    out, _ = _fetch_fwd_math(flat1, idx, wgt)
    return out


def _wfe_fwd(flat1, idx, wgt, level_offsets, impl, interpret):
    if impl in ("pallas", "pallas_bf16"):
        prec = "bf16" if impl == "pallas_bf16" else "f32"
        texels_r, plan, _ovf = gather_taps(flat1, idx, wgt, level_offsets,
                                           interpret, precision=prec)
        out = _texels_rows_out(texels_r, wgt, flat1.shape[1])
        dt = jnp.zeros((0,), flat1.dtype)  # dtype witness for the cotangent
        return out, (flat1.shape, dt, idx, wgt, texels_r, plan)
    out, texels = _fetch_fwd_math(flat1, idx, wgt)
    return out, (flat1.shape, jnp.zeros((0,), flat1.dtype), idx, wgt, texels,
                 None)


def _wfe_bwd(level_offsets, impl, interpret, res, g):
    (N, C), dt, idx, wgt, texels, plan = res
    dtype = dt.dtype
    B, K, P = idx.shape
    if impl in ("pallas", "pallas_bf16"):
        # texels are in packed-row form; bins AND the packed (idx, wgt)
        # stream are reused from the forward; wgt * g happens in-kernel
        # (forming vals as a (B, K, C, P) tensor cost a 400 MB
        # materialization + row shuffle at the bench config)
        d_wgt = _texels_rows_d_wgt(texels, g, B, K, P, C)
        lists, counts, stream = plan
        dflat = scatter_taps_wg(
            stream, g, (lists, counts), N, interpret=interpret,
            precision="bf16" if impl == "pallas_bf16" else "f32")
    else:
        # d_wgt: gradient through the bilinear/lod weights (uv path)
        d_wgt = jnp.einsum("bkpc,bpc->bkp", texels, g)
        vals = wgt[:, :, None, :] * jnp.moveaxis(g, -1, 1)[:, None]
        upd = vals.transpose(0, 1, 3, 2).reshape(-1, C)
        dflat = jnp.zeros((N, C), jnp.float32).at[idx.reshape(-1)].add(upd)
    return dflat.astype(dtype), None, d_wgt


weighted_fetch_exact.defvjp(_wfe_fwd, _wfe_bwd)

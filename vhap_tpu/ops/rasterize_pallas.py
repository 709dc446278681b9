"""Tile-binned Pallas TPU kernel for rasterization visibility.

The production visibility backend behind vhap_tpu.ops.rasterize.rasterize:

  phase 1 (XLA):  per-face screen setup + bbox binning into per-tile face
                  lists (vhap_tpu/ops/rasterize.py: face_setup / bin_faces);
                  per-tile setup rows are pre-gathered to (B, T, K, 16) so the
                  kernel streams one contiguous block per tile.
  phase 2 (Pallas): one program per (batch, tile); loops over the tile's
                  face count (a *dynamic* bound — empty tiles cost nothing),
                  evaluating three edge planes + the depth plane on the whole
                  (TILE_H, TILE_W) pixel block in vector registers and
                  keeping a (z, id) winner.

Only the integer winner buffer leaves the kernel; barycentrics are
recomputed differentiably outside (rasterize_attributes), which keeps the
kernel gradient-free and tiny.

Setup row layout (16 f32, padded for lane alignment):
  [a0x, a0y, a0c, a1x, a1y, a1c, zx, zy, zc, fid+1, 0...]
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vhap_tpu.ops.rasterize import bin_faces, face_setup

SETUP_WIDTH = 16
# faces per loop iteration in the visibility kernel (experiment knob;
# full-step A/B on v5e: 2-wide 261.6 / 4-wide 258.0 / 8-wide 256.3 ms —
# docs/PERF.md)
def _env_unroll(default: int = 8) -> int:
    try:
        return max(1, int(os.environ.get("VHAP_VIS_UNROLL", default)))
    except (TypeError, ValueError):
        return default


DEFAULT_UNROLL = _env_unroll()


def _pack_setup(setup: dict) -> jnp.ndarray:
    """(B, F, 16) packed face setup rows."""
    abc, zpln = setup["abc"], setup["zpln"]
    B, F = abc.shape[:2]
    fid1 = jnp.broadcast_to(
        (jnp.arange(F, dtype=jnp.float32) + 1.0)[None, :], (B, F))
    rows = jnp.concatenate([
        abc.reshape(B, F, 6), zpln, fid1[..., None],
        jnp.zeros((B, F, SETUP_WIDTH - 10), jnp.float32),
    ], axis=-1)
    return rows


def _visibility_kernel(counts_ref, tile_setup_ref, out_ref, *,
                       tiles_x: int, tile_h: int, tile_w: int,
                       img_h: int, img_w: int, unroll: int = 2):
    b = pl.program_id(0)
    t = pl.program_id(1)
    n_t = pl.num_programs(1)
    count = counts_ref[b * n_t + t]

    ty = t // tiles_x
    tx = t % tiles_x

    row = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 0).astype(jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 1).astype(jnp.float32)
    px = (tx.astype(jnp.float32) * tile_w + col + 0.5) * (2.0 / img_w) - 1.0
    py = (ty.astype(jnp.float32) * tile_h + row + 0.5) * (2.0 / img_h) - 1.0

    def face(k):
        """Coverage + depth of face k over the tile (no z-buffer test)."""
        a0x = tile_setup_ref[0, 0, k, 0]
        a0y = tile_setup_ref[0, 0, k, 1]
        a0c = tile_setup_ref[0, 0, k, 2]
        a1x = tile_setup_ref[0, 0, k, 3]
        a1y = tile_setup_ref[0, 0, k, 4]
        a1c = tile_setup_ref[0, 0, k, 5]
        zx = tile_setup_ref[0, 0, k, 6]
        zy = tile_setup_ref[0, 0, k, 7]
        zc = tile_setup_ref[0, 0, k, 8]
        fid1 = tile_setup_ref[0, 0, k, 9]

        b0 = a0x * px + a0y * py + a0c
        b1 = a1x * px + a1y * py + a1c
        b2 = 1.0 - b0 - b1
        z = zx * px + zy * py + zc
        inside = (b0 >= 0.0) & (b1 >= 0.0) & (b2 >= 0.0) \
            & (z >= -1.0) & (z <= 1.0)
        return inside, z, fid1

    k_max = tile_setup_ref.shape[2] - 1

    def body(i, carry):
        # `unroll` faces per iteration: the per-face vector chain is short
        # and the winner update is a serial dependency, so batching faces
        # gives the VPU independent chains to overlap (2-wide measured
        # ~7.5 ms/step saved; see docs/PERF.md)
        zbuf, idbuf = carry
        k = unroll * i
        inw, zw, fw = face(k)
        for j in range(1, unroll):
            kj = jnp.minimum(k + j, k_max)        # stay in-bounds
            inj, zj, fj = face(kj)
            inj = inj & (k + j < count)           # tail: face k+j is a pad row
            take = inj & (jnp.logical_not(inw) | (zj < zw))
            zw = jnp.where(take, zj, zw)
            fw = jnp.where(take, fj, fw)
            inw = inw | inj
        upd = inw & (zw < zbuf)
        zbuf = jnp.where(upd, zw, zbuf)
        idbuf = jnp.where(upd, fw, idbuf)
        return zbuf, idbuf

    z0 = jnp.full((tile_h, tile_w), jnp.inf, jnp.float32)
    id0 = jnp.zeros((tile_h, tile_w), jnp.float32)
    _, idbuf = jax.lax.fori_loop(0, (count + unroll - 1) // unroll, body,
                                 (z0, id0))
    out_ref[0] = idbuf.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=(
    "img_h", "img_w", "cull_backfaces", "tile_h", "tile_w",
    "max_faces_per_tile", "interpret", "return_lists", "unroll", "ndc"))
def visibility_pallas(
    verts_clip: jnp.ndarray,
    faces: jnp.ndarray,
    img_h: int,
    img_w: int,
    cull_backfaces: bool = True,
    tile_h: int = 16,
    tile_w: int = 128,
    max_faces_per_tile: int = 0,
    interpret: bool = False,
    return_lists: bool = False,
    unroll: int = DEFAULT_UNROLL,
    ndc=None,
):
    """Per-pixel winning face id (+1; 0 = background), (B, H, W) int32,
    plus the int32 count of (face, tile) pairs dropped by bin overflow —
    nonzero means holes/corrupted gradients and must be surfaced by callers.

    max_faces_per_tile=0 sizes the per-tile face-list capacity adaptively
    (rasterize.adaptive_bin_K); undersizing silently drops faces (holes).

    return_lists=True additionally returns the per-tile face lists
    (B, T, K) — every pixel's winner is in its tile's list by construction,
    which the plane-gather kernel exploits (vhap_tpu/ops/plane_pallas.py).
    """
    assert img_h % tile_h == 0 and img_w % tile_w == 0, \
        f"image {img_h}x{img_w} must tile by {tile_h}x{tile_w}"
    B = verts_clip.shape[0]
    F = faces.shape[0]
    if max_faces_per_tile <= 0:
        from vhap_tpu.ops.rasterize import adaptive_bin_K
        K = adaptive_bin_K(F, (img_h // tile_h) * (img_w // tile_w))
    else:
        K = min(F, max_faces_per_tile)

    setup = face_setup(verts_clip, faces, cull_backfaces)
    lists, counts, (ty, tx), overflow = bin_faces(
        setup, img_h, img_w, tile_h, tile_w, K, ndc=ndc)
    T = ty * tx
    ndc_h, ndc_w = ndc if ndc is not None else (img_h, img_w)

    rows = _pack_setup(setup)                                  # (B, F, 16)
    tile_setup = jnp.take_along_axis(
        rows[:, None], lists[..., None].astype(jnp.int32), axis=2
    )                                                          # (B, T, K, 16)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, T),
        in_specs=[
            # index maps receive the scalar-prefetch ref as a trailing arg
            pl.BlockSpec((1, 1, K, SETUP_WIDTH), lambda b, t, _c: (b, t, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tile_h, tile_w),
                               lambda b, t, _c: (b, t // tx, t % tx)),
    )

    kernel = functools.partial(
        _visibility_kernel, tiles_x=tx, tile_h=tile_h, tile_w=tile_w,
        img_h=ndc_h, img_w=ndc_w, unroll=unroll)

    tri_id = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, img_h, img_w), jnp.int32),
        interpret=interpret or jax.default_backend() != "tpu",
    )(counts.reshape(-1), tile_setup)
    if return_lists:
        return tri_id, overflow, lists
    return tri_id, overflow


# ---------------------------------------------------------------------------
# Flat-binned variant: globally-budgeted work list instead of dense (T, K)
# ---------------------------------------------------------------------------

def _visibility_kernel_flat(ctile_ref, ccnt_ref, setup_ref, out_ref, zb_ref,
                            idb_ref, *, pc: int, tiles_x: int, tile_h: int,
                            tile_w: int, img_h: int, img_w: int,
                            unroll: int = 2):
    """One program per 128-slot chunk; chunks of a tile are consecutive, so
    the (z, id) winner accumulates in scratch across revisits of the same
    output tile and is written once at the tile's last chunk."""
    b = pl.program_id(0)
    c = pl.program_id(1)
    i = b * pc + c
    t = ctile_ref[i]
    count = ccnt_ref[i]
    first = jnp.logical_or(c == 0, ctile_ref[jnp.maximum(i - 1, 0)] != t)
    last = jnp.logical_or(c == pc - 1,
                          ctile_ref[jnp.minimum(i + 1, b * pc + pc - 1)] != t)

    ty = t // tiles_x
    tx = t % tiles_x
    row = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 0).astype(jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 1).astype(jnp.float32)
    px = (tx.astype(jnp.float32) * tile_w + col + 0.5) * (2.0 / img_w) - 1.0
    py = (ty.astype(jnp.float32) * tile_h + row + 0.5) * (2.0 / img_h) - 1.0

    @pl.when(first)
    def _():
        zb_ref[...] = jnp.full((tile_h, tile_w), jnp.inf, jnp.float32)
        idb_ref[...] = jnp.zeros((tile_h, tile_w), jnp.float32)

    def face(k):
        a0x = setup_ref[0, k, 0]
        a0y = setup_ref[0, k, 1]
        a0c = setup_ref[0, k, 2]
        a1x = setup_ref[0, k, 3]
        a1y = setup_ref[0, k, 4]
        a1c = setup_ref[0, k, 5]
        zx = setup_ref[0, k, 6]
        zy = setup_ref[0, k, 7]
        zc = setup_ref[0, k, 8]
        fid1 = setup_ref[0, k, 9]
        b0 = a0x * px + a0y * py + a0c
        b1 = a1x * px + a1y * py + a1c
        b2 = 1.0 - b0 - b1
        z = zx * px + zy * py + zc
        inside = (b0 >= 0.0) & (b1 >= 0.0) & (b2 >= 0.0) \
            & (z >= -1.0) & (z <= 1.0)
        return inside, z, fid1

    k_max = 127

    def body(idx, carry):
        zbuf, idbuf = carry
        k = unroll * idx
        inw, zw, fw = face(k)
        for j in range(1, unroll):
            kj = jnp.minimum(k + j, k_max)
            inj, zj, fj = face(kj)
            inj = inj & (k + j < count)
            take = inj & (jnp.logical_not(inw) | (zj < zw))
            zw = jnp.where(take, zj, zw)
            fw = jnp.where(take, fj, fw)
            inw = inw | inj
        upd = inw & (zw < zbuf)
        zbuf = jnp.where(upd, zw, zbuf)
        idbuf = jnp.where(upd, fw, idbuf)
        return zbuf, idbuf

    zbuf, idbuf = jax.lax.fori_loop(
        0, (count + unroll - 1) // unroll, body, (zb_ref[...], idb_ref[...]))
    zb_ref[...] = zbuf
    idb_ref[...] = idbuf

    @pl.when(last)
    def _():
        out_ref[0] = idb_ref[...].astype(jnp.int32)


def visibility_pallas_flat(
    verts_clip,
    faces,
    img_h: int,
    img_w: int,
    cull_backfaces: bool = True,
    tile_h: int = 16,
    tile_w: int = 128,
    budget_chunks: int = 0,
    interpret: bool = False,
    unroll: int = DEFAULT_UNROLL,
    ndc=None,
):
    """Flat-binned visibility: same winner semantics as visibility_pallas,
    but the per-tile face lists live in one globally-budgeted flat array
    (rasterize.bin_faces_flat) — ~4x less table gather/scatter traffic at
    bench shapes, and dense tiles are no longer capped at a fixed per-tile
    K (docs/PERF.md round 4). Returns (tri_id, bins dict); bins["overflow"]
    is the dropped-pair count and bins feed the flat fused-interp kernel.

    NOT jit-wrapped: bins carries static ints (PC, tiles) that a jit
    boundary would turn into traced arrays — call from inside jit.
    """
    assert img_h % tile_h == 0 and img_w % tile_w == 0, \
        f"image {img_h}x{img_w} must tile by {tile_h}x{tile_w}"
    from vhap_tpu.ops.rasterize import bin_faces_flat

    B = verts_clip.shape[0]
    F = faces.shape[0]
    setup = face_setup(verts_clip, faces, cull_backfaces)
    bins = bin_faces_flat(setup, img_h, img_w, tile_h, tile_w, budget_chunks,
                          ndc=ndc)
    PC = bins["PC"]
    ty, tx = bins["tiles"]
    T = ty * tx

    # setup rows + sentinel row (pad slots, id -1 -> row F): a0c = -1 makes
    # b0 < 0 everywhere, so sentinel faces cover nothing
    rows = _pack_setup(setup)                                  # (B, F, 16)
    sent = jnp.zeros((B, 1, SETUP_WIDTH), jnp.float32).at[:, :, 2].set(-1.0)
    rows_s = jnp.concatenate([rows, sent], axis=1)             # (B, F+1, 16)
    gidx = jnp.where(bins["fids"] >= 0, bins["fids"], F)
    setup_flat = jnp.take_along_axis(
        rows_s, gidx[..., None], axis=1)                       # (B, PC*128, 16)

    # per-chunk valid-row counts
    cstart = jnp.take_along_axis(bins["start128"], bins["ctile"], axis=1)
    ccnt = jnp.clip(
        jnp.take_along_axis(bins["counts"], bins["ctile"], axis=1)
        - (jnp.arange(PC, dtype=jnp.int32)[None] - cstart) * 128, 0, 128)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, PC),
        in_specs=[
            pl.BlockSpec((1, 128, SETUP_WIDTH),
                         lambda b, c, _ct, _cc: (b, c, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_h, tile_w),
            lambda b, c, ct, _cc: (b, ct[b * PC + c] // tx,
                                   ct[b * PC + c] % tx)),
        scratch_shapes=[pltpu.VMEM((tile_h, tile_w), jnp.float32),
                        pltpu.VMEM((tile_h, tile_w), jnp.float32)],
    )

    ndc_h, ndc_w = ndc if ndc is not None else (img_h, img_w)
    kernel = functools.partial(
        _visibility_kernel_flat, pc=PC, tiles_x=tx, tile_h=tile_h,
        tile_w=tile_w, img_h=ndc_h, img_w=ndc_w, unroll=unroll)

    tri_id = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, img_h, img_w), jnp.int32),
        interpret=interpret or jax.default_backend() != "tpu",
    )(bins["ctile"].reshape(-1), ccnt.reshape(-1), setup_flat)
    return tri_id, bins

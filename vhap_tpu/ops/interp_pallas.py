"""Fused deferred-interp Pallas kernel: per-pixel attributes DONE in-kernel.

The plane-gather kernel (vhap_tpu/ops/plane_pallas.py) resolves ~38 raw
per-face channels per pixel and leaves the barycentric/perspective math and
attribute interpolation to XLA — a 39-channel untile plus a flat ~80 ms
tail of elementwise fusions (docs/PERF.md). This kernel goes one step
further (the descoped "deferred shading" of the roadmap): after resolving
the per-face rows with the same tile-local one-hot MXU matmuls, it computes
the whole per-pixel chain of vhap_tpu/ops/rasterize.py:fused_rast_and_planes
and the interpolation stage of ops/render.py:render_rgba IN-KERNEL —
barycentrics, perspective division, uv screen derivatives, normal
interpolation + normalization, texture-coordinate interpolation — and emits
only the 20+nf processed channels the rest of the render consumes.

Reference behavior covered: nvdiffrast's rasterize/interpolate attribute
stage (vhap/util/render_nvdiffrast.py:354-399).

Key design points:

  * The per-pixel math is written ONCE as a pure-jnp function
    (`_pixel_math`); the backward kernel obtains the exact adjoint with
    `jax.vjp` INSIDE the kernel (Pallas kernel bodies are ordinary
    JAX-traceable programs), so no hand-written transpose can drift from
    the forward. The forward saves the resolved rows as a residual, so
    the backward skips both the ctab re-gather (~17 ms) and the MXU
    re-resolve for ~3 ms of HBM traffic.
  * No face-0 clamp fixup: every downstream consumer masks background
    pixels (u/v/zw/texd are mask-multiplied exactly like the XLA path;
    vids/flags/aa of background pixels are provably never read — see
    ops/render.py / ops/antialias.py), so unmatched pixels may carry
    zeros. Foreground misses still surface via the ones-row match count
    (the rast_overflow contract).
  * Gradients flow to the per-face TABLES (d_ctab -> B*T*K scatter, as in
    plane_pallas); the tables themselves (barycentric planes from
    verts_clip, corner normals/uvs, boundary-detached AA planes) are built
    differentiably outside, so vertex/normal/uv gradients — including the
    align_boundary detach logic — are unchanged.

Input row layout (packed, (B, C, F), C = 36 + nf):
  [0:12)  PLANE_KEYS: a0x a0y a0c a1x a1y a1c iw0 iw1 iw2 z0 z1 z2
  [12:21) corner normals n0.xyz n1.xyz n2.xyz (corner-major)
  [21:27) corner uvs uv0.uv uv1.uv uv2.uv
  [27:30) corner vertex ids (as f32)
  [30:30+nf) per-face flag rows (texture-grad mask, cluster id)
  [30+nf:36+nf) AA edge planes (AA_PLANE_KEYS order)

Output row layout ((B, CO, H, W), CO = 20 + nf):
  [0]     zw (masked)           [1:3]   texc.uv
  [3:7]   texd dudx' dvdx' dudy' dvdy' (uv screen derivatives, masked)
  [7:10]  unit normal           [10:13] corner vertex ids
  [13:13+nf) flags              [13+nf:19+nf) AA planes
  [19+nf] match (1 = pixel's face was in the tile list)
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vhap_tpu.ops.plane_pallas import (_prep_lists, _prep_tables, _round_up,
                                       _tile_image, _untile_image)

N_FIXED_IN = 36    # input rows besides the nf flag rows
N_FIXED_OUT = 20   # output rows besides the nf flag rows (incl. match)


def _pixel_math(s_all: jnp.ndarray, px: jnp.ndarray, py: jnp.ndarray,
                m: jnp.ndarray, *, n_flags: int, img_h: int, img_w: int):
    """(CH_in, npx) resolved rows -> (20 + nf, npx) processed channels.

    Mirrors rasterize.fused_rast_and_planes + the interpolation stage of
    render.render_rgba exactly (including mask multiplications), on row
    vectors. `m` is the foreground mask (1, npx) f32.
    """
    nf = n_flags
    a0x, a0y, a0c = s_all[0:1], s_all[1:2], s_all[2:3]
    a1x, a1y, a1c = s_all[3:4], s_all[4:5], s_all[5:6]
    iw0, iw1, iw2 = s_all[6:7], s_all[7:8], s_all[8:9]
    z0, z1, z2 = s_all[9:10], s_all[10:11], s_all[11:12]
    nrm = s_all[12:21]
    uvp = s_all[21:27]
    vids = s_all[27:30]
    flags = s_all[30:30 + nf]
    aa = s_all[30 + nf:36 + nf]
    match = s_all[36 + nf:37 + nf]

    b0 = a0x * px + a0y * py + a0c
    b1 = a1x * px + a1y * py + a1c
    b2 = 1.0 - b0 - b1

    zw = (b0 * z0 + b1 * z1 + b2 * z2) * m

    n0, n1, n2 = b0 * iw0, b1 * iw1, b2 * iw2
    S = n0 + n1 + n2
    S = jnp.where(jnp.abs(S) > 1e-12, S, 1e-12)
    u = (n0 / S) * m
    v = (n1 / S) * m
    w2 = (1.0 - u - v) * m

    a2x, a2y = -(a0x + a1x), -(a0y + a1y)
    n0x, n0y = a0x * iw0, a0y * iw0
    n1x, n1y = a1x * iw1, a1y * iw1
    n2x, n2y = a2x * iw2, a2y * iw2
    Sx, Sy = n0x + n1x + n2x, n0y + n1y + n2y
    inv_S2 = 1.0 / (S * S)
    dudx = (n0x * S - n0 * Sx) * inv_S2 * (2.0 / img_w) * m
    dudy = (n0y * S - n0 * Sy) * inv_S2 * (2.0 / img_h) * m
    dvdx = (n1x * S - n1 * Sx) * inv_S2 * (2.0 / img_w) * m
    dvdy = (n1y * S - n1 * Sy) * inv_S2 * (2.0 / img_h) * m

    def interp3(c0, c1, c2):
        return u * c0 + v * c1 + w2 * c2

    nx = interp3(nrm[0:1], nrm[3:4], nrm[6:7])
    ny = interp3(nrm[1:2], nrm[4:5], nrm[7:8])
    nz = interp3(nrm[2:3], nrm[5:6], nrm[8:9])
    # safe_normalize (ops/shading.py): eps-clamped length
    nlen = jnp.sqrt(jnp.clip(nx * nx + ny * ny + nz * nz, 1e-20, None))
    nx, ny, nz = nx / nlen, ny / nlen, nz / nlen

    tcu = interp3(uvp[0:1], uvp[2:3], uvp[4:5])
    tcv = interp3(uvp[1:2], uvp[3:4], uvp[5:6])

    du_u, du_v = uvp[0:1] - uvp[4:5], uvp[1:2] - uvp[5:6]
    dv_u, dv_v = uvp[2:3] - uvp[4:5], uvp[3:4] - uvp[5:6]
    texd0 = dudx * du_u + dvdx * dv_u
    texd1 = dudx * du_v + dvdx * dv_v
    texd2 = dudy * du_u + dvdy * dv_u
    texd3 = dudy * du_v + dvdy * dv_v

    return jnp.concatenate(
        [zw, tcu, tcv, texd0, texd1, texd2, texd3, nx, ny, nz, vids]
        + ([flags] if nf else []) + [aa, match], axis=0)


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------

def _tile_pxy(t, npx, tile_h, tile_w, tiles_x, img_h, img_w):
    """NDC pixel-center coordinates of this tile's npx pixels, (1, npx)."""
    ty = (t // tiles_x).astype(jnp.float32)
    tx = (t % tiles_x).astype(jnp.float32)
    p = jax.lax.broadcasted_iota(jnp.int32, (1, npx), 1)
    col = (p % tile_w).astype(jnp.float32)
    row = (p // tile_w).astype(jnp.float32)
    px = (tx * tile_w + col + 0.5) * (2.0 / img_w) - 1.0
    py = (ty * tile_h + row + 0.5) * (2.0 / img_h) - 1.0
    return px, py


def _resolve_rows(ctab_ref, tid_ref, lbc_ref, ch, k_chunks, npx):
    """One-hot MXU resolve: (2*CH, K) tables -> per-pixel rows (CH, npx)."""
    fid = jnp.maximum(tid_ref[0, 0] - 1, 0)               # (1, npx) i32
    fid_b = jnp.broadcast_to(fid, (128, npx))
    acc = jnp.zeros((2 * ch, npx), jnp.float32)
    for c in range(k_chunks):
        ids = lbc_ref[0, 0][:, c:c + 1]                   # (128, 1) i32
        oh = (jnp.broadcast_to(ids, (128, npx)) == fid_b).astype(jnp.bfloat16)
        ct = ctab_ref[0, 0][:, c * 128:(c + 1) * 128]     # (2*CH, 128) bf16
        acc = acc + jax.lax.dot_general(
            ct, oh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    return acc[:ch] + acc[ch:]                            # hi + lo halves


def _fwd_kernel(ctab_ref, tid_ref, lbc_ref, out_ref, s_ref, *, n_ch, ch,
                ch_out, k_chunks, npx, n_flags, tile_h, tile_w, tiles_x,
                img_h, img_w):
    t = pl.program_id(1)
    s_all = _resolve_rows(ctab_ref, tid_ref, lbc_ref, ch, k_chunks, npx)
    s_ref[0, 0] = s_all       # residual: backward skips re-gather + resolve
    px, py = _tile_pxy(t, npx, tile_h, tile_w, tiles_x, img_h, img_w)
    m = (tid_ref[0, 0] > 0).astype(jnp.float32)
    out = _pixel_math(s_all, px, py, m, n_flags=n_flags,
                      img_h=img_h, img_w=img_w)
    pad = ch_out - out.shape[0]
    if pad:
        out = jnp.concatenate(
            [out, jnp.zeros((pad, npx), jnp.float32)], axis=0)
    out_ref[0, 0] = out


def _bwd_kernel(s_res_ref, tid_ref, lbc_ref, g_ref, out_ref, *, n_ch, ch,
                ch_out, k_chunks, npx, n_flags, tile_h, tile_w, tiles_x,
                img_h, img_w):
    t = pl.program_id(1)
    s_all = s_res_ref[0, 0]
    px, py = _tile_pxy(t, npx, tile_h, tile_w, tiles_x, img_h, img_w)
    m = (tid_ref[0, 0] > 0).astype(jnp.float32)

    n_out = N_FIXED_OUT + n_flags
    _, pull = jax.vjp(
        lambda s: _pixel_math(s, px, py, m, n_flags=n_flags,
                              img_h=img_h, img_w=img_w), s_all)
    (ds,) = pull(g_ref[0, 0][:n_out])                     # (CH_in, npx) f32

    # hi/lo split of the per-pixel adjoint, then contract the pixel axis
    # per 128-slot chunk (exactly plane_pallas._bwd_kernel on ds)
    bits = jax.lax.bitcast_convert_type(ds, jnp.int32)
    ds_hi = jax.lax.bitcast_convert_type(bits & jnp.int32(-65536), jnp.float32)
    ds2 = jnp.concatenate([ds_hi.astype(jnp.bfloat16),
                           (ds - ds_hi).astype(jnp.bfloat16)], axis=0)
    fid = jnp.maximum(tid_ref[0, 0] - 1, 0)
    fid_b = jnp.broadcast_to(fid, (128, npx))
    for c in range(k_chunks):
        ids = lbc_ref[0, 0][:, c:c + 1]
        oh = (jnp.broadcast_to(ids, (128, npx)) == fid_b).astype(jnp.bfloat16)
        r = jax.lax.dot_general(
            ds2, oh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)           # (2*CH, 128)
        out_ref[0, 0, :, c * 128:(c + 1) * 128] = r[:ch] + r[ch:]


# ---------------------------------------------------------------------------
# custom_vjp core
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=tuple(range(4, 15)))
def _interp_core(packed, tid_t, lists_g, lbc, n_faces, n_ch, ch, ch_out,
                 n_flags, tile_h, tile_w, tiles_x, img_h, img_w, interpret):
    out, _ = _interp_core_fwd(packed, tid_t, lists_g, lbc, n_faces, n_ch, ch,
                              ch_out, n_flags, tile_h, tile_w, tiles_x,
                              img_h, img_w, interpret)
    return out


def _build_ctab(packed, lists_g, ch):
    B, T, K = lists_g.shape
    packed2 = _prep_tables(packed, ch)                    # (B, 2CH, F) bf16
    ctab = jnp.take_along_axis(
        packed2, lists_g.reshape(B, 1, T * K), axis=2)
    return ctab.reshape(B, 2 * ch, T, K).transpose(0, 2, 1, 3)


def _interp_core_fwd(packed, tid_t, lists_g, lbc, n_faces, n_ch, ch, ch_out,
                     n_flags, tile_h, tile_w, tiles_x, img_h, img_w,
                     interpret):
    B, T, K = lists_g.shape
    npx = tid_t.shape[-1]
    ctab = _build_ctab(packed, lists_g, ch)
    grid_spec = pl.GridSpec(
        grid=(B, T),
        in_specs=[
            pl.BlockSpec((1, 1, 2 * ch, K), lambda b, t: (b, t, 0, 0)),
            pl.BlockSpec((1, 1, 1, npx), lambda b, t: (b, t, 0, 0)),
            pl.BlockSpec((1, 1, 128, K // 128), lambda b, t: (b, t, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, ch_out, npx), lambda b, t: (b, t, 0, 0)),
            pl.BlockSpec((1, 1, ch, npx), lambda b, t: (b, t, 0, 0)),
        ],
    )
    out, s_res = pl.pallas_call(
        functools.partial(_fwd_kernel, n_ch=n_ch, ch=ch, ch_out=ch_out,
                          k_chunks=K // 128, npx=npx, n_flags=n_flags,
                          tile_h=tile_h, tile_w=tile_w, tiles_x=tiles_x,
                          img_h=img_h, img_w=img_w),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, T, ch_out, npx), jnp.float32),
            jax.ShapeDtypeStruct((B, T, ch, npx), jnp.float32),
        ],
        interpret=interpret or jax.default_backend() != "tpu",
    )(ctab, tid_t, lbc)
    return out, (s_res, tid_t, lists_g, lbc)


def _interp_core_bwd(n_faces, n_ch, ch, ch_out, n_flags, tile_h, tile_w,
                     tiles_x, img_h, img_w, interpret, res, g):
    s_res, tid_t, lists_g, lbc = res
    B, T, K = lists_g.shape
    C, F = n_ch, n_faces
    npx = tid_t.shape[-1]

    grid_spec = pl.GridSpec(
        grid=(B, T),
        in_specs=[
            pl.BlockSpec((1, 1, ch, npx), lambda b, t: (b, t, 0, 0)),
            pl.BlockSpec((1, 1, 1, npx), lambda b, t: (b, t, 0, 0)),
            pl.BlockSpec((1, 1, 128, K // 128), lambda b, t: (b, t, 0, 0)),
            pl.BlockSpec((1, 1, ch_out, npx), lambda b, t: (b, t, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, ch, K), lambda b, t: (b, t, 0, 0)),
    )
    d_ctab = pl.pallas_call(
        functools.partial(_bwd_kernel, n_ch=n_ch, ch=ch, ch_out=ch_out,
                          k_chunks=K // 128, npx=npx, n_flags=n_flags,
                          tile_h=tile_h, tile_w=tile_w, tiles_x=tiles_x,
                          img_h=img_h, img_w=img_w),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, T, ch, K), jnp.float32),
        interpret=interpret or jax.default_backend() != "tpu",
    )(s_res, tid_t, lbc, g)

    # pad/remapped slots (id -1 -> clamped 0) matched no pixel -> zero rows
    upd = d_ctab[:, :, :C].transpose(0, 1, 3, 2).reshape(B, T * K, C)
    bidx = jnp.arange(B, dtype=jnp.int32)[:, None]
    d_packed = jnp.zeros((B, F, C), jnp.float32).at[
        bidx, lists_g.reshape(B, T * K)].add(upd)
    return (jnp.moveaxis(d_packed, -1, 1), None, None, None)


_interp_core.defvjp(_interp_core_fwd, _interp_core_bwd)


# ---------------------------------------------------------------------------
# Public entry
# ---------------------------------------------------------------------------

def fused_interp_tiled(packed: jnp.ndarray, tri_id: jnp.ndarray,
                       lists: jnp.ndarray, n_flags: int,
                       tile_h: int, tile_w: int,
                       max_list: int = 0, interpret: bool = False,
                       layout: str = "image", ndc=None
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """packed (B, 36+nf, F) face tables + tri_id (B, H, W) + per-tile lists
    -> ((B, 20+nf, H, W) processed channels, overflow).

    layout="tiled" skips the untile and returns the raw (B, T, 20+nf, npx)
    tile-layout channels instead (the tiled render path consumes these
    directly — docs/PERF.md round 5).

    See the module docstring for both layouts. Background/unmatched pixels
    carry zeros in every channel (all consumers mask); foreground pixels
    whose face misses the (optionally capped) list surface in `overflow`.
    """
    B, H, W = tri_id.shape
    C = packed.shape[1]
    assert C == N_FIXED_IN + n_flags, (C, n_flags)
    ch = _round_up(C + 1, 8)
    n_out = N_FIXED_OUT + n_flags
    ch_out = _round_up(n_out, 8)
    K = min(lists.shape[-1], max_list) if max_list > 0 else lists.shape[-1]
    k_pad = _round_up(K, 128)

    tid_t = _tile_image(tri_id, tile_h, tile_w)[:, :, None, :]
    lists_g, lbc = _prep_lists(lists[..., :K], k_pad)

    # ndc=(h0, w0) decouples the pixel->NDC scale from the canvas for tile
    # padding (rasterize.pixel_grid): img_h/img_w below are NDC-only
    ndc_h, ndc_w = ndc if ndc is not None else (H, W)
    raw = _interp_core(packed, tid_t, lists_g, lbc, packed.shape[-1], C, ch,
                       ch_out, n_flags, tile_h, tile_w, W // tile_w,
                       ndc_h, ndc_w, interpret)
    match_t = jax.lax.stop_gradient(raw[:, :, n_out - 1:n_out]) > 0.5
    overflow = jnp.sum((tid_t > 0) & jnp.logical_not(match_t)
                       ).astype(jnp.int32)
    if layout == "tiled":
        return raw[:, :, :n_out], overflow
    out = _untile_image(raw[:, :, :n_out], H, W, tile_h, tile_w)
    return out, overflow


# ---------------------------------------------------------------------------
# Flat-binned variant: one program per 128-slot chunk of the global work
# list (rasterize.bin_faces_flat) instead of per dense (tile, K) block —
# the ctab gather, d_packed scatter and kernel MXU work all shrink by the
# padding factor (~4x at bench shapes, docs/PERF.md round 4).
# ---------------------------------------------------------------------------

def _chunk_ids(lbc_ref, c):
    """Select chunk c's 128 slot ids from the full (128, PC) lbc block.

    The whole table is ~128*PC*4 B (~150 KB at bench shapes) and rides in
    VMEM once per batch image (constant index map -> revisit-skip); a
    lane-mask + sum extracts the column (Mosaic rejects lane-dim blocks
    narrower than 128, so no (128, 1) slicing)."""
    pc = lbc_ref.shape[-1]
    sel = jax.lax.broadcasted_iota(jnp.int32, (128, pc), 1) == c
    return jnp.sum(jnp.where(sel, lbc_ref[0], 0), axis=1, keepdims=True)


def _fwd_kernel_flat(ctile_ref, ctab_ref, lbc_ref, tid_ref, out_ref, s_ref,
                     sacc_ref, *, pc, ch, ch_out, npx, n_flags, tile_h,
                     tile_w, tiles_x, img_h, img_w):
    b = pl.program_id(0)
    c = pl.program_id(1)
    i = b * pc + c
    t = ctile_ref[i]
    first = jnp.logical_or(c == 0, ctile_ref[jnp.maximum(i - 1, 0)] != t)
    last = jnp.logical_or(c == pc - 1,
                          ctile_ref[jnp.minimum(i + 1, b * pc + pc - 1)] != t)

    fid = jnp.maximum(tid_ref[0, 0] - 1, 0)               # (1, npx) i32
    fid_b = jnp.broadcast_to(fid, (128, npx))
    ids = _chunk_ids(lbc_ref, c)                          # (128, 1) i32
    oh = (jnp.broadcast_to(ids, (128, npx)) == fid_b).astype(jnp.bfloat16)
    contrib = jax.lax.dot_general(
        ctab_ref[0], oh, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)               # (2*ch, npx)

    @pl.when(first)
    def _():
        sacc_ref[...] = contrib

    @pl.when(jnp.logical_not(first))
    def _():
        sacc_ref[...] = sacc_ref[...] + contrib

    @pl.when(last)
    def _():
        s_all = sacc_ref[:ch] + sacc_ref[ch:]
        px, py = _tile_pxy(t, npx, tile_h, tile_w, tiles_x, img_h, img_w)
        m = (tid_ref[0, 0] > 0).astype(jnp.float32)
        out = _pixel_math(s_all, px, py, m, n_flags=n_flags,
                          img_h=img_h, img_w=img_w)
        pad = ch_out - out.shape[0]
        if pad:
            out = jnp.concatenate(
                [out, jnp.zeros((pad, npx), jnp.float32)], axis=0)
        out_ref[0, 0] = out
        s_ref[0, 0] = s_all


def _bwd_kernel_flat(ctile_ref, s_res_ref, tid_ref, lbc_ref, g_ref, out_ref,
                     ds2_ref, *, pc, ch, ch_out, npx, n_flags, tile_h,
                     tile_w, tiles_x, img_h, img_w):
    b = pl.program_id(0)
    c = pl.program_id(1)
    i = b * pc + c
    t = ctile_ref[i]
    first = jnp.logical_or(c == 0, ctile_ref[jnp.maximum(i - 1, 0)] != t)

    @pl.when(first)
    def _():
        px, py = _tile_pxy(t, npx, tile_h, tile_w, tiles_x, img_h, img_w)
        m = (tid_ref[0, 0] > 0).astype(jnp.float32)
        n_out = N_FIXED_OUT + n_flags
        _, pull = jax.vjp(
            lambda s: _pixel_math(s, px, py, m, n_flags=n_flags,
                                  img_h=img_h, img_w=img_w), s_res_ref[0, 0])
        (ds,) = pull(g_ref[0, 0][:n_out])                 # (CH_in, npx) f32
        bits = jax.lax.bitcast_convert_type(ds, jnp.int32)
        ds_hi = jax.lax.bitcast_convert_type(bits & jnp.int32(-65536),
                                             jnp.float32)
        ds2_ref[...] = jnp.concatenate(
            [ds_hi.astype(jnp.bfloat16), (ds - ds_hi).astype(jnp.bfloat16)],
            axis=0)

    fid = jnp.maximum(tid_ref[0, 0] - 1, 0)
    fid_b = jnp.broadcast_to(fid, (128, npx))
    ids = _chunk_ids(lbc_ref, c)
    oh = (jnp.broadcast_to(ids, (128, npx)) == fid_b).astype(jnp.bfloat16)
    r = jax.lax.dot_general(
        ds2_ref[...], oh, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)               # (2*ch, 128)
    out_ref[0] = r[:ch] + r[ch:]


@functools.partial(jax.custom_vjp, nondiff_argnums=tuple(range(5, 16)))
def _interp_core_flat(packed, tid_t, fids, ctile, lbc, n_faces, n_ch, ch,
                      ch_out, n_flags, tile_h, tile_w, tiles_x, img_h, img_w,
                      interpret):
    out, _ = _interp_core_flat_fwd(packed, tid_t, fids, ctile, lbc, n_faces,
                                   n_ch, ch, ch_out, n_flags, tile_h, tile_w,
                                   tiles_x, img_h, img_w, interpret)
    return out


def _interp_core_flat_fwd(packed, tid_t, fids, ctile, lbc, n_faces, n_ch, ch,
                          ch_out, n_flags, tile_h, tile_w, tiles_x, img_h,
                          img_w, interpret):
    B, PC = ctile.shape
    T = tid_t.shape[1]
    npx = tid_t.shape[-1]
    packed2 = _prep_tables(packed, ch)                    # (B, 2CH, F) bf16
    gidx = jnp.maximum(fids, 0)
    ctab = jnp.take_along_axis(packed2, gidx[:, None, :], axis=2)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, PC),
        in_specs=[
            pl.BlockSpec((1, 2 * ch, 128), lambda b, c, _ct: (b, 0, c)),
            pl.BlockSpec((1, 128, lbc.shape[-1]),
                         lambda b, c, _ct: (b, 0, 0)),
            pl.BlockSpec((1, 1, 1, npx),
                         lambda b, c, ct: (b, ct[b * PC + c], 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, ch_out, npx),
                         lambda b, c, ct: (b, ct[b * PC + c], 0, 0)),
            pl.BlockSpec((1, 1, ch, npx),
                         lambda b, c, ct: (b, ct[b * PC + c], 0, 0)),
        ],
        scratch_shapes=[pltpu.VMEM((2 * ch, npx), jnp.float32)],
    )
    out, s_res = pl.pallas_call(
        functools.partial(_fwd_kernel_flat, pc=PC, ch=ch, ch_out=ch_out,
                          npx=npx, n_flags=n_flags, tile_h=tile_h,
                          tile_w=tile_w, tiles_x=tiles_x, img_h=img_h,
                          img_w=img_w),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, T, ch_out, npx), jnp.float32),
            jax.ShapeDtypeStruct((B, T, ch, npx), jnp.float32),
        ],
        interpret=interpret or jax.default_backend() != "tpu",
    )(ctile.reshape(-1), ctab, lbc, tid_t)
    return out, (s_res, tid_t, fids, ctile, lbc)


def _interp_core_flat_bwd(n_faces, n_ch, ch, ch_out, n_flags, tile_h, tile_w,
                          tiles_x, img_h, img_w, interpret, res, g):
    s_res, tid_t, fids, ctile, lbc = res
    B, PC = ctile.shape
    C, F = n_ch, n_faces
    npx = tid_t.shape[-1]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, PC),
        in_specs=[
            pl.BlockSpec((1, 1, ch, npx),
                         lambda b, c, ct: (b, ct[b * PC + c], 0, 0)),
            pl.BlockSpec((1, 1, 1, npx),
                         lambda b, c, ct: (b, ct[b * PC + c], 0, 0)),
            pl.BlockSpec((1, 128, lbc.shape[-1]),
                         lambda b, c, _ct: (b, 0, 0)),
            pl.BlockSpec((1, 1, ch_out, npx),
                         lambda b, c, ct: (b, ct[b * PC + c], 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, ch, 128), lambda b, c, _ct: (b, 0, c)),
        scratch_shapes=[pltpu.VMEM((2 * ch, npx), jnp.bfloat16)],
    )
    d_ctab = pl.pallas_call(
        functools.partial(_bwd_kernel_flat, pc=PC, ch=ch, ch_out=ch_out,
                          npx=npx, n_flags=n_flags, tile_h=tile_h,
                          tile_w=tile_w, tiles_x=tiles_x, img_h=img_h,
                          img_w=img_w),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, ch, PC * 128), jnp.float32),
        interpret=interpret or jax.default_backend() != "tpu",
    )(ctile.reshape(-1), s_res, tid_t, lbc, g)

    # pad slots (id -1 -> clamped 0) matched no pixel -> zero columns
    upd = d_ctab[:, :C].transpose(0, 2, 1)                # (B, P, C)
    bidx = jnp.arange(B, dtype=jnp.int32)[:, None]
    d_packed = jnp.zeros((B, F, C), jnp.float32).at[
        bidx, jnp.maximum(fids, 0)].add(upd)
    return (jnp.moveaxis(d_packed, -1, 1), None, None, None, None)


_interp_core_flat.defvjp(_interp_core_flat_fwd, _interp_core_flat_bwd)


def fused_interp_flat(packed: jnp.ndarray, tri_id: jnp.ndarray, bins: dict,
                      n_flags: int, tile_h: int, tile_w: int,
                      interpret: bool = False, layout: str = "image",
                      ndc=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Flat-binned fused deferred-interp: same contract as
    fused_interp_tiled (incl. layout="tiled"), but driven by
    rasterize.bin_faces_flat's global work list (bins dict from
    visibility_pallas_flat)."""
    B, H, W = tri_id.shape
    C = packed.shape[1]
    assert C == N_FIXED_IN + n_flags, (C, n_flags)
    ch = _round_up(C + 1, 8)
    n_out = N_FIXED_OUT + n_flags
    ch_out = _round_up(n_out, 8)

    fids, ctile = bins["fids"], bins["ctile"]
    PC = bins["PC"]
    pc8 = _round_up(PC, 8)
    # lane-grouped compare ids: lbc[b, j, c] = fids[b, c*128 + j]
    lbc = jnp.pad(fids.reshape(B, PC, 128), ((0, 0), (0, pc8 - PC), (0, 0)),
                  constant_values=-1).transpose(0, 2, 1)

    tid_t = _tile_image(tri_id, tile_h, tile_w)[:, :, None, :]
    # ndc: see fused_interp_tiled — img_h/img_w are NDC-only downstream
    ndc_h, ndc_w = ndc if ndc is not None else (H, W)
    raw = _interp_core_flat(packed, tid_t, fids, ctile, lbc,
                            packed.shape[-1], C, ch, ch_out, n_flags,
                            tile_h, tile_w, W // tile_w, ndc_h, ndc_w,
                            interpret)
    match_t = jax.lax.stop_gradient(raw[:, :, n_out - 1:n_out]) > 0.5
    overflow = jnp.sum((tid_t > 0) & jnp.logical_not(match_t)
                       ).astype(jnp.int32)
    if layout == "tiled":
        return raw[:, :, :n_out], overflow
    out = _untile_image(raw[:, :, :n_out], H, W, tile_h, tile_w)
    return out, overflow

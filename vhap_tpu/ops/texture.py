"""Mip-mapped texture sampling, differentiable w.r.t. texels and uvs.

Replaces nvdiffrast's `dr.texture(..., filter_mode='linear-mipmap-linear')`
(vhap/util/render_nvdiffrast.py:399). The pyramid is flattened into one
buffer with static level offsets so per-pixel trilinear sampling is a single
batched gather; everything is expressed as plain JAX ops, so texel gradients
(scatter-add of bilinear weights) and uv/lod gradients come from autodiff —
the same gradient set nvdiffrast implements by hand.

Boundary mode 'wrap' (nvdiffrast's default); uv origin bottom-left with v
increasing upward is the caller's concern (the render pipeline flips v as
the reference does at vhap/model/tracker.py:315-316).
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp


def build_mip_pyramid(tex: jnp.ndarray, max_levels: Optional[int] = None):
    """tex (B, H, W, C) -> (flat (B, N, C), offsets, sizes) with 2x2-mean mips.

    Level 0 is full resolution; level i has shape (H >> i, W >> i).
    """
    B, H, W, C = tex.shape
    levels: List[jnp.ndarray] = [tex]
    h, w = H, W
    while h > 1 and w > 1 and (max_levels is None or len(levels) < max_levels):
        t = levels[-1]
        # 2x2 average pool via reduce_window. The 6-D reshape+mean form
        # pays a ~9 ms relayout per step against the layouts the sampling
        # consumers pin (+ ~12 ms in its backward); four stride-2 slices
        # + adds measured ~250 ms (tiny-minor-dim trap, docs/PERF.md).
        t = jax.lax.reduce_window(
            t, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID") * 0.25
        levels.append(t)
        h, w = h // 2, w // 2

    offsets, sizes = [], []
    off = 0
    for t in levels:
        offsets.append(off)
        sizes.append((t.shape[1], t.shape[2]))
        off += t.shape[1] * t.shape[2]
    flat = jnp.concatenate([t.reshape(B, -1, C) for t in levels], axis=1)
    return flat, tuple(offsets), tuple(sizes)


def _weighted_fetch_from(flat, idx, wgt, B, P, C):
    """idx (B, K, P) int, wgt (B, K, P) -> (B, P, C) weighted texel sum.

    One packed gather; the einsum keeps the (B, K, P, C) intermediate fused
    on TPU. K == 1 uses the elementwise form whose gather transpose XLA
    lowers ~25x faster than the einsum form (profiled: 253 -> ~10 ms at
    4M pixels).
    """
    K = idx.shape[1]
    if K == 1:
        idx2d = idx[:, 0]
        if flat.shape[0] == 1 and B > 1:
            texels = flat[0][idx2d]                      # (B, P, C)
        else:
            texels = jnp.take_along_axis(flat, idx2d[..., None], axis=1)
        return texels * wgt[:, 0, :, None]
    flat_idx = idx.reshape(B, K * P)
    if flat.shape[0] == 1 and B > 1:
        texels = flat[0][flat_idx]
    else:
        texels = jnp.take_along_axis(flat, flat_idx[..., None], axis=1)
    return jnp.einsum("bkpc,bkp->bpc", texels.reshape(B, K, P, C), wgt)


def _bilinear_gather(flat, off, h, w, u, v):
    """Sample one mip level bilinearly with wrap addressing.

    flat (B, N, C); u, v (B, P) in [0, 1]; returns (B, P, C).
    """
    x = u * w - 0.5
    y = v * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0i = jnp.mod(x0.astype(jnp.int32), w)
    y0i = jnp.mod(y0.astype(jnp.int32), h)
    x1i = jnp.mod(x0i + 1, w)
    y1i = jnp.mod(y0i + 1, h)

    def at(yi, xi):
        idx = off + yi * w + xi
        if flat.shape[0] == 1 and idx.shape[0] > 1:
            return flat[0][idx]  # shared texture: plain gather
        return jnp.take_along_axis(flat, idx[..., None], axis=1)

    t00 = at(y0i, x0i)
    t01 = at(y0i, x1i)
    t10 = at(y1i, x0i)
    t11 = at(y1i, x1i)
    fx = fx[..., None]
    fy = fy[..., None]
    return ((t00 * (1 - fx) + t01 * fx) * (1 - fy)
            + (t10 * (1 - fx) + t11 * fx) * fy)


@partial(jax.jit, static_argnames=("filter_mode", "max_mip_level", "grad_mode",
                                   "grad_impl", "mesh"))
def texture_sample(
    tex: jnp.ndarray,          # (B|1, H, W, C)
    uv: jnp.ndarray,           # (B, Hi, Wi, 2)
    uv_da: Optional[jnp.ndarray] = None,  # (B, Hi, Wi, 4): du/dx,du/dy,dv/dx,dv/dy
    filter_mode: str = "linear-mipmap-linear",
    max_mip_level: Optional[int] = None,
    grad_mode: str = "trilinear",
    grad_impl: str = "auto",
    mask: Optional[jnp.ndarray] = None,  # (B, Hi, Wi) bool coverage
    mesh=None,                 # jax.sharding.Mesh: shard_map the kernels
) -> jnp.ndarray:
    """nvdiffrast-compatible texture lookup. Returns (B, Hi, Wi, C).

    A shared texture (tex batch dim 1) stays unbroadcast: the mip pyramid is
    built once and every batch element gathers from the same flat buffer.

    mask marks pixels whose sample matters (rasterizer coverage); masked-out
    pixels return 0 and carry no gradients. The Pallas tap kernels skip
    masked-out work blocks entirely, so passing coverage cuts the dominant
    fetch/scatter cost to the foreground fraction of the image.

    grad_mode controls the BACKWARD tap count (forward is always exact):
      'trilinear' — exact 8-tap gradients (nvdiffrast parity),
      'bilinear'  — straight-through gradients via the 4 taps of the nearer
                    mip level; the texel-gradient scatter-add is the single
                    most expensive op of a tracking step on TPU (XLA lowers
                    the 8-tap transpose to a ~2s sorted scatter at bs=16,
                    512^2), and halving the taps halves it with negligible
                    effect on the optimization (the dropped taps differ only
                    by a one-mip blur of the same gradient signal).
    """
    B = uv.shape[0]
    shared_tex = tex.shape[0] == 1 and B > 1
    Ht, Wt, C = tex.shape[1:]
    Hi, Wi = uv.shape[1:3]
    P = Hi * Wi
    u = uv[..., 0].reshape(B, P)
    v = uv[..., 1].reshape(B, P)

    if filter_mode == "linear" or uv_da is None:
        flat = tex.reshape(B, -1, C)
        out = _bilinear_gather(flat, 0, Ht, Wt, u, v)
        return out.reshape(B, Hi, Wi, C)

    flat, offsets, sizes = build_mip_pyramid(tex, max_mip_level)
    L = len(offsets)

    # lod from the uv footprint in texel units (nvdiffrast convention)
    da = uv_da.reshape(B, P, 4)
    fx2 = (da[..., 0] * Wt) ** 2 + (da[..., 2] * Ht) ** 2
    fy2 = (da[..., 1] * Wt) ** 2 + (da[..., 3] * Ht) ** 2
    lod = 0.5 * jnp.log2(jnp.maximum(jnp.maximum(fx2, fy2), 1e-20))
    lod = jnp.clip(lod, 0.0, L - 1)

    l0 = jnp.floor(lod)
    frac = (lod - l0)[..., None]
    l0i = l0.astype(jnp.int32)
    l1i = jnp.minimum(l0i + 1, L - 1)

    # flat addressing with per-pixel level params. Per-pixel gathers into
    # the tiny offsets/sizes tables cost ~30 ms EACH at 4M pixels on TPU
    # (profiled), so power-of-two pyramids compute them with shifts instead.
    pow2 = (Ht & (Ht - 1)) == 0 and (Wt & (Wt - 1)) == 0
    A = Ht * Wt
    if pow2:
        # off(l) = sum_{k<l} (A >> 2k) = (4A - 4*(A >> 2l)) / 3, exact while
        # 2l <= trailing zeros of A (holds for every generated level)
        assert all(o == (4 * A - ((A >> (2 * l)) << 2)) // 3
                   for l, o in enumerate(offsets)), "pyramid layout changed"

    offs_t = jnp.asarray(offsets, jnp.int32)
    hs_t = jnp.asarray([s[0] for s in sizes], jnp.int32)
    ws_t = jnp.asarray([s[1] for s in sizes], jnp.int32)

    def level_params(li):
        if pow2:
            wi = jnp.right_shift(Wt, li)
            hi = jnp.right_shift(Ht, li)
            off = (4 * A - jnp.left_shift(jnp.right_shift(A, 2 * li), 2)) // 3
            return off, hi, wi
        return offs_t[li], hs_t[li], ws_t[li]

    def corner_setup(li):
        off, hi, wi = level_params(li)
        x = u * wi.astype(jnp.float32) - 0.5
        y = v * hi.astype(jnp.float32) - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        return off, hi, wi, x0, y0, x - x0, y - y0

    def corner_indices_weights(li):
        off, hi, wi, x0, y0, fx, fy = corner_setup(li)
        x0i = jnp.mod(x0.astype(jnp.int32), wi)
        y0i = jnp.mod(y0.astype(jnp.int32), hi)
        x1i = jnp.mod(x0i + 1, wi)
        y1i = jnp.mod(y0i + 1, hi)
        idx = jnp.stack([off + y0i * wi + x0i, off + y0i * wi + x1i,
                         off + y1i * wi + x0i, off + y1i * wi + x1i], axis=1)
        wgt = jnp.stack([(1 - fx) * (1 - fy), fx * (1 - fy),
                         (1 - fx) * fy, fx * fy], axis=1)
        return idx, wgt                          # (B, 4, P) each

    def nearest_index_weight(li):
        """Single nearest texel of level li + its bilinear weight."""
        off, hi, wi, x0, y0, fx, fy = corner_setup(li)
        xn = jnp.mod((x0 + jnp.where(fx > 0.5, 1.0, 0.0)).astype(jnp.int32), wi)
        yn = jnp.mod((y0 + jnp.where(fy > 0.5, 1.0, 0.0)).astype(jnp.int32), hi)
        idx = (off + yn * wi + xn)[:, None]
        wgt = (jnp.maximum(fx, 1 - fx) * jnp.maximum(fy, 1 - fy))[:, None]
        return idx, wgt                          # (B, 1, P) each

    def weighted_fetch(idx, wgt):
        return _weighted_fetch_from(flat, idx, wgt, B, P, C)

    # coverage mask: where(...) (not *) so masked-out lanes stay NaN-free
    # even when the tap buffers hold uninitialized values
    mask_b = None if mask is None else mask.reshape(B, 1, P)

    def apply_mask(wgt):
        return wgt if mask_b is None else jnp.where(mask_b, wgt, 0.0)

    f = frac[..., 0][:, None]

    if grad_mode == "trilinear":
        i0, w0 = corner_indices_weights(l0i)
        i1, w1 = corner_indices_weights(l1i)
        idx = jnp.concatenate([i0, i1], axis=1)
        wgt = apply_mask(jnp.concatenate([w0 * (1 - f), w1 * f], axis=1))
        from vhap_tpu.ops import texture_grad_pallas as _tgp
        impl = grad_impl
        if impl == "auto":
            # Pallas on TPU; with a mesh the kernels run under shard_map
            # over the batch axis (they are batch-local), without one a
            # multi-device GSPMD jit falls back to XLA (the partitioner
            # cannot split the custom calls — vhap_tpu/parallel/sharding.py).
            # bf16 mode (no hi/lo split) is the default: half the MXU work
            # at 2^-8 relative texel error with measured convergence parity
            # on the full synthetic pipeline (docs/PERF.md A/B).
            on_tpu = jax.default_backend() == "tpu"
            if mesh is not None:
                impl = "pallas_bf16" if on_tpu else "xla_fetch"
            else:
                impl = ("pallas_bf16" if on_tpu and jax.device_count() == 1
                        else "xla_fetch")
        sharded = mesh is not None and impl in ("pallas", "pallas_bf16")
        if sharded and B % mesh.size != 0:
            sharded, impl = False, "xla"
        B_loc = B // mesh.size if sharded else B
        if impl in ("pallas", "pallas_bf16") and not _tgp.fits_kernel(
                B_loc, idx.shape[1], P, C):
            # oversized tap configs would overflow the per-tile work lists
            # (silently dropping taps); use the exact XLA twin instead
            sharded, impl = False, "xla"
        if impl != "xla_fetch" and flat.shape[0] == 1 and P % _tgp.NPIX == 0:
            # exact texel gradients via the Pallas tap-scatter kernel
            # (or its XLA scatter twin) instead of autodiff's sorted
            # scatter — see ops/texture_grad_pallas.py
            from vhap_tpu.ops.texture_grad_pallas import weighted_fetch_exact
            if sharded:
                from jax.sharding import PartitionSpec as PS
                axis = mesh.axis_names[0]

                def _fetch(f1, i_, w_):
                    return weighted_fetch_exact(f1, i_, w_, offsets, impl,
                                                False)

                # flat replicated (its cotangent is psum-reduced by the
                # shard_map transpose), taps/weights batch-sharded
                out = jax.shard_map(
                    _fetch, mesh=mesh, in_specs=(PS(), PS(axis), PS(axis)),
                    out_specs=PS(axis), check_vma=False)(flat[0], idx, wgt)
            else:
                out = weighted_fetch_exact(flat[0], idx, wgt, offsets, impl,
                                           False)
        else:
            out = weighted_fetch(idx, wgt)
    elif grad_mode in ("bilinear", "nearest"):
        # straight-through: exact trilinear forward value, gradients flow
        # through a cheaper tap set (4 taps of the nearer level, or the
        # single nearest texel)
        l_near = jnp.where(frac[..., 0] <= 0.5, l0i, l1i)
        if grad_mode == "nearest":
            idx_n, wgt_n = nearest_index_weight(l_near)
        else:
            idx_n, wgt_n = corner_indices_weights(l_near)
        near = weighted_fetch(idx_n, apply_mask(wgt_n))
        i0, w0 = corner_indices_weights(l0i)
        i1, w1 = corner_indices_weights(l1i)
        idx_all = jax.lax.stop_gradient(jnp.concatenate([i0, i1], axis=1))
        wgt_all = jax.lax.stop_gradient(
            apply_mask(jnp.concatenate([w0 * (1 - f), w1 * f], axis=1)))
        # the straight-through exact value is gradient-free; fetching it in
        # bf16 halves the dominant gather traffic at ~1e-3 value error
        # (well under the sensor/jpeg noise floor)
        flat_sg = jax.lax.stop_gradient(flat).astype(jnp.bfloat16)
        exact = _weighted_fetch_from(flat_sg, idx_all,
                                     wgt_all.astype(jnp.bfloat16), B, P, C)
        exact = jax.lax.stop_gradient(exact.astype(near.dtype))
        out = exact + near - jax.lax.stop_gradient(near)
    else:
        raise ValueError(f"unknown grad_mode: {grad_mode}")
    return out.reshape(B, Hi, Wi, C)

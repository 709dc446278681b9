"""High-level differentiable render pipeline (NVDiffRenderer equivalent).

Functional port of vhap/util/render_nvdiffrast.py:56-567 on top of the
TPU-native ops: rasterize -> normals -> uv interpolation (with per-region
texture-gradient masking) -> mip-mapped texture -> SH shading -> background
compositing -> adaptive-appearance-prior disturbance -> antialiasing (with
per-region boundary-gradient detach).

All stage-dependent behavior is passed as static boolean masks / flags so a
single jitted train step per stage is possible; randomness is explicit via
JAX PRNG keys.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from vhap_tpu.ops import camera as cam
from vhap_tpu.ops.antialias import AA_PLANE_KEYS, antialias
from vhap_tpu.ops.rasterize import (face_attribute_planes,
                                    fused_rast_and_planes, interpolate,
                                    rasterize)
from vhap_tpu.ops.shading import compute_v_normals, safe_normalize, shade
from vhap_tpu.ops.texture import texture_sample


@dataclass(frozen=True)
class RenderSettings:
    """Static configuration mirroring RenderConfig (vhap/config/base.py:93-110)."""
    lighting_type: str = "SH"
    lighting_space: str = "world"
    disturb_rate_fg: Optional[float] = 0.5
    disturb_rate_bg: Optional[float] = 0.5
    backend: str = "auto"            # rasterizer visibility backend
    cull_backfaces: bool = True
    disturb_pool_stride: int = 1     # subsample the cluster pixel pool (perf)
    # disturbance sampling machinery: 'sample' = literal pool sort +
    # per-pixel randint gather; 'pairswap' = two dense sorts, no random
    # HBM gather — measured SLOWER on hardware (209.0 vs 205.8 ms/step:
    # the 3-operand 4.2M sort outweighs the 30 ms gather it deletes,
    # docs/PERF.md round 5). 'auto' = sample.
    disturb_impl: str = "auto"       # auto | sample | pairswap
    texture_grad_mode: str = "trilinear"  # exact texel grads (default)
    texture_grad_impl: str = "auto"  # pallas | pallas_bf16 | xla | xla_fetch
    # multi-chip: the Pallas kernels are batch-local; with a mesh they run
    # under shard_map over the batch axis (vhap_tpu/parallel/sharding.py)
    mesh: Optional[object] = None    # jax.sharding.Mesh (hashable)
    # per-tile face-list capacity for the Pallas visibility kernel
    # (0 = adaptive; overflow is surfaced as rast_overflow)
    max_faces_per_tile: int = 0
    # per-pixel face-plane lookup backend (vhap_tpu/ops/plane_pallas.py):
    # 'auto' = tile-local Pallas kernel on single-chip/meshed TPU, XLA
    # gather elsewhere; 'pallas_interpret' for CPU tests
    plane_impl: str = "auto"
    # list slots consulted per tile by the plane kernel (cost is linear in
    # it; 0 = full list, exact; foreground misses beyond a smaller cap
    # surface as rast_overflow)
    plane_max_list: int = 0
    # dtype of the COLOR chain (albedo -> shading -> compositing ->
    # disturbance -> antialias blending -> photometric residual); geometry
    # (barycentrics, uv, normals, AA edge planes) always stays f32.
    # 'auto' = bf16 on TPU (HBM-bound elementwise mass at half traffic;
    # ~0.4% value quantization, the same envelope as the reference's uint8
    # inputs), f32 elsewhere. 'f32' forces exact.
    color_dtype: str = "auto"
    # per-pixel attribute stage: 'fused' runs the deferred-interp Pallas
    # kernel (vhap_tpu/ops/interp_pallas.py — barycentrics, perspective
    # division, uv derivatives, normal/uv interpolation ALL in-kernel);
    # 'planes' resolves raw per-face channels (plane_impl) and leaves the
    # math to XLA. 'auto' = fused on TPU when the tiled lists exist
    # (hardware-verified: 281.5 -> 261.6 ms/step on the bench workload,
    # docs/PERF.md).
    interp_impl: str = "auto"       # auto | fused | fused_interpret | planes
    # face-list structure feeding the fused-interp kernel: 'flat' = the
    # globally-budgeted flat work list (rasterize.bin_faces_flat — ~4x less
    # table traffic, no per-tile capacity cap; docs/PERF.md round 4),
    # 'dense' = the per-tile (T, K) lists. 'auto' = flat.
    bin_mode: str = "auto"          # auto | flat | dense
    # silhouette antialiasing (ops/antialias.py). True = nvdiffrast-parity
    # edge blending with vertex-position gradients (the boundary-alignment
    # signal). False skips the pass entirely — for perf bounding and for
    # workloads that align boundaries with landmarks only.
    antialias: bool = True
    # per-pixel buffer layout of the post-interp render chain: 'tiled'
    # keeps texture coords, shading, compositing, disturbance, antialias
    # AND the photometric residual on the rasterizer's (B, T, C, npx)
    # tile layout — channel-last (B, H, W, C) tensors pay T(4, 128)
    # relayouts on every op (docs/PERF.md round 5). 'image' restores
    # (B, H, W, C) buffers everywhere (the eval/media path). 'auto' =
    # tiled whenever the fused-interp kernel runs. Image-layout outputs
    # (rgba, albedo, ...) are still emitted in tiled mode (untiled on
    # demand; dead-code-eliminated in the train step).
    layout: str = "auto"
    # when set to the ORIGINAL (H, W), the raster canvas is padded up to
    # tile multiples (16, 128) so the Pallas kernels run on non-divisible
    # recipes (the documented 802x550 NeRSemble config,
    # /root/reference/doc/nersemble.md:35-38): padded pixels are dead —
    # masked out of coverage, disturbance, antialias pairs and the
    # photometric residual — and cropped from image-layout outputs.
    # Pixel-unit intrinsics make the padded projection exact (the extra
    # canvas extends past the image's right edge / buffer top). None = no
    # padding.
    crop_size: Optional[Tuple[int, int]] = None


def _resolve_interp_impl(settings: RenderSettings, lists, H: int, W: int,
                         tile_h: int = 16, tile_w: int = 128):
    """None = raw-planes path (plane_impl decides); 'pallas'/'pallas_interpret'
    = the fused deferred-interp kernel (requires the rasterizer's tiled
    face lists — dense (B, T, K) or the flat bins dict)."""
    impl = settings.interp_impl
    if impl == "planes" or lists is None \
            or H % tile_h != 0 or W % tile_w != 0:
        return None
    if impl == "fused":
        return "pallas"
    if impl == "fused_interpret":
        return "pallas_interpret"
    on_tpu = jax.default_backend() == "tpu"
    return "pallas" if on_tpu and (settings.mesh is not None
                                   or jax.device_count() == 1) else None


def _fused_wants_flat(settings: RenderSettings, H: int, W: int,
                      tile_h: int = 16, tile_w: int = 128) -> bool:
    """Would render_rgba run the fused-interp kernel, and on flat bins?"""
    if settings.bin_mode == "dense":
        return False
    if settings.interp_impl == "planes" or H % tile_h or W % tile_w:
        return False
    if settings.interp_impl in ("fused", "fused_interpret"):
        return True
    on_tpu = jax.default_backend() == "tpu"
    return on_tpu and (settings.mesh is not None or jax.device_count() == 1)


def rasterize_mesh(verts, faces, RT, K, image_size, settings: RenderSettings,
                   grad_enabled: bool = True, with_attrs: bool = True) -> Dict:
    """World-space mesh -> fragment buffers (vhap/util/render_nvdiffrast.py:216-245).

    with_attrs=False skips the per-pixel attribute recompute — render_rgba
    fuses it with its own interpolations into one gather.
    """
    verts_camera = cam.world_to_camera(verts, RT)
    # tile padding (crop_size): project with the ORIGINAL image's size and
    # keep every pixel's NDC mapping at the original scale (ndc= below) —
    # live pixels are then BIT-EXACT vs the unpadded render; padded pixels
    # sample NDC past +1 and are zeroed dead
    verts_clip = cam.camera_to_clip(verts_camera, K,
                                    settings.crop_size or image_size)
    out = dict(verts=verts, verts_camera=verts_camera[..., :3],
               verts_clip=verts_clip)
    if with_attrs:
        assert settings.crop_size is None, \
            "crop_size (tile padding) is a train-path feature; the " \
            "with_attrs rasterize path renders at the original size"
        rast, rast_db, tri_id, overflow = rasterize(
            verts_clip, faces, tuple(image_size), backend=settings.backend,
            cull_backfaces=settings.cull_backfaces, grad_enabled=grad_enabled,
            with_overflow=True, mesh=settings.mesh,
            max_faces_per_tile=settings.max_faces_per_tile)
        out.update(rast=rast, rast_db=rast_db, tri_id=tri_id,
                   overflow=overflow)
    else:
        from vhap_tpu.ops.rasterize import visibility_dispatch
        H, W = image_size
        # the train path consumes the per-tile face lists in the Pallas
        # plane-gather / fused-interp kernels (free on the Pallas
        # visibility backend); the fused kernel prefers the flat bins
        if _fused_wants_flat(settings, H, W):
            want_lists = "flat"
        else:
            want_lists = (settings.plane_impl != "xla"
                          or settings.interp_impl != "planes")
        res = visibility_dispatch(
            verts_clip, faces, H, W, settings.backend,
            settings.cull_backfaces,
            max_faces_per_tile=settings.max_faces_per_tile,
            mesh=settings.mesh, return_lists=want_lists,
            ndc=settings.crop_size)
        if want_lists == "flat":
            tri_id, overflow, bins = res
            out.update(bins=bins)
        elif want_lists:
            tri_id, overflow, lists = res
            out.update(lists=lists)
        else:
            tri_id, overflow = res
        if settings.crop_size is not None:
            # padded canvas: pixels past the original right/top edge are
            # dead — zeroing their winner id here makes every downstream
            # stage treat them as background
            tri_id = jnp.where(_live_mask(settings.crop_size, H, W),
                               tri_id, 0)
        out.update(tri_id=tri_id, overflow=overflow)
    return out


def _live_mask(crop_size, H: int, W: int) -> jnp.ndarray:
    """(1, H, W) bool: True on the original image, False on tile padding
    (buffer coords: live rows/cols are the low indices)."""
    h0, w0 = crop_size
    row = jax.lax.broadcasted_iota(jnp.int32, (1, H, W), 1) < h0
    col = jax.lax.broadcasted_iota(jnp.int32, (1, H, W), 2) < w0
    return row & col


def _pack_rgb_u8(r, g, b):
    """Three (N,) color planes -> ONE int32: r<<16 | g<<8 | b.

    Swap-SOURCE colors quantize to 8 bits over [0, 2) (step 1/127.5 — the
    same order as the reference's own uint8 input frames; the 2.0 headroom
    covers SH-brightened pixels); the swap targets (rendered pixels kept
    with probability 1-rate) are untouched."""
    def q(x):
        return jnp.round(jnp.clip(x.astype(jnp.float32), 0.0, 2.0)
                         * 127.5).astype(jnp.int32)
    return (q(r) << 16) | (q(g) << 8) | q(b)


def _pack_cid_rgb_u8(cid, r, g, b):
    """(N,) cluster id + three (N,) color planes -> ONE self-keyed sortable
    int32: cid<<24 | r<<16 | g<<8 | b.

    The whole disturbance pool rides a SINGLE sort operand (was 3) and the
    sample gather reads one channel (was 2): ~17 ms at bench shapes. Key
    order within a cluster is by color, which is irrelevant: sampling
    draws a uniform index into the cluster's range. cid must stay < 128
    (sign bit)."""
    return (cid.astype(jnp.int32) << 24) | _pack_rgb_u8(r, g, b)


def _unpack_rgb_u8(key, dtype=jnp.float32):
    """Packed key -> [r, g, b] channel planes."""
    s = jnp.asarray(1.0 / 127.5, dtype)
    return [((key >> 16) & 255).astype(dtype) * s,
            ((key >> 8) & 255).astype(dtype) * s,
            (key & 255).astype(dtype) * s]


def _disturbance_swap_mask(key, cid, rate_fg, rate_bg, swap_ok=None,
                           extra=None):
    """(N,) bool: which pixels receive a swapped-in value this step
    (Bernoulli per pixel at its cluster's rate; cluster 1 untouched)."""
    N = cid.shape[0]
    k_fg, k_bg = jax.random.split(key)
    if rate_fg is not None:
        w_fg = jax.random.uniform(k_fg, (N,)) < rate_fg
    else:
        w_fg = jnp.zeros((N,), bool)
    if rate_bg is not None:
        w_bg = jax.random.uniform(k_bg, (N,)) < rate_bg
    else:
        w_bg = jnp.zeros((N,), bool)
    w_bool = jnp.where(cid == 0, w_bg, w_fg)
    w_bool &= cid != 1               # cluster 1 untouched
    if extra is not None:
        w_bool &= extra
    if swap_ok is not None:
        w_bool &= swap_ok
    return w_bool


def _cluster_disturbance_planes(rgb_planes, bg_planes, cid, key, rate_fg,
                                rate_bg, num_clusters: int,
                                pool_stride: int = 1, valid=None,
                                swap_ok=None, impl: str = "sample"):
    """Channel-plane core of the cluster disturbance (see the image-layout
    wrapper below for semantics). rgb_planes/bg_planes: three flat (N,)
    color planes in ANY fixed pixel order (the pool is order-free);
    cid (N,) int32; valid (N,) bool excludes padded frames from the pool;
    swap_ok (N,) bool additionally forbids swapping those pixels (dead
    tile-padding pixels must keep their exact value).
    Returns three mixed (N,) planes; alpha is the caller's unchanged.

    Two implementations, identical semantics up to the sampling law:

    - 'pairswap' (default): sort all pixels by (cid, random) carrying the
      detached packed color + pixel index, exchange values within adjacent
      same-cluster pairs of the random order, and restore pixel order with
      a second sort keyed on the carried index. Each swapped pixel gets a
      uniformly random OTHER same-cluster pixel (its neighbor in a uniform
      random permutation) — the reference's randint sampling
      (render_nvdiffrast.py:455) is uniform WITH replacement, a
      distinction with no effect on this stochastic regularizer. Cost:
      two dense sorts (~9 ms each at 4.2M), replacing the 'sample' path's
      pool sort + 30 ms random HBM gather (7.49 ns/index hardware floor,
      docs/PERF.md round 5).
    - 'sample': literal port — sort a (subsampled) pool by cluster,
      searchsorted cluster ranges, per-pixel uniform randint into the
      range, one (N,) random gather.
    """
    N = cid.shape[0]
    assert num_clusters + 1 < 128, num_clusters
    key, k_src = jax.random.split(key)
    pool_cid = jnp.where(valid, cid, num_clusters) if valid is not None \
        else cid

    mixed = [jax.lax.stop_gradient(   # NOTE: detach, render_nvdiffrast.py:451
        jnp.where(cid == 0, b, p)) for p, b in zip(rgb_planes, bg_planes)]

    if impl == "pairswap":
        assert N % 2 == 0, N
        rnd = jax.random.randint(k_src, (N,), 0, 1 << 24, dtype=jnp.int32)
        skey = (pool_cid.astype(jnp.int32) << 24) | rnd
        val = _pack_rgb_u8(*mixed)
        iota = jax.lax.iota(jnp.int32, N)
        skey_s, val_s, idx_s = jax.lax.sort((skey, val, iota), num_keys=1)
        cid2 = (skey_s >> 24).reshape(-1, 2)
        val2 = val_s.reshape(-1, 2)
        # adjacent elements of the random same-cluster order exchange
        # values; a pair straddling two clusters keeps its own (matches
        # the reference's 1-pixel-cluster self-sample, detached)
        same = cid2[:, :1] == cid2[:, 1:]
        sw = jnp.where(same, val2[:, ::-1], val2).reshape(-1)
        _, sval = jax.lax.sort((idx_s, sw), num_keys=1)   # restore order
        src = _unpack_rgb_u8(sval, dtype=rgb_planes[0].dtype)
        w_bool = _disturbance_swap_mask(key, cid, rate_fg, rate_bg, swap_ok)
    else:
        keys = _pack_cid_rgb_u8(pool_cid, *mixed)
        if pool_stride > 1:
            # block-contiguous subsample (first 128-lane group of every
            # stride*128 flat pixels): a layout-friendly slice where an
            # arange gather pays per-index cost. The pool only needs to be
            # a representative same-cluster subset.
            g = N // (128 * pool_stride)
            keys = keys[:g * 128 * pool_stride].reshape(
                g, pool_stride, 128)[:, 0].reshape(-1)
        sorted_keys = jax.lax.sort(keys, dimension=-1)
        # cluster ranges from the sorted pool (bincount costs ~37 ms at 4M
        # on TPU; log-depth searchsorted on the packed keys is ~free —
        # every key of cluster c lies in [c<<24, (c+1)<<24))
        bounds = jnp.arange(num_clusters + 1, dtype=jnp.int32) << 24
        edges = jnp.searchsorted(sorted_keys, bounds)
        offsets, counts = edges[:-1], edges[1:] - edges[:-1]

        # Bernoulli swap decision FIRST, so unswapped pixels can point
        # their sample index at slot 0; cnt > 0 guards pool_stride
        # dropping a tiny cluster entirely (keep own pixel).
        cnt = counts[cid]
        w_bool = _disturbance_swap_mask(key, cid, rate_fg, rate_bg,
                                        swap_ok, extra=cnt > 0)

        # per output pixel: uniform sample within its own cluster's range
        r = jax.random.randint(k_src, (N,), 0, jnp.iinfo(jnp.int32).max) \
            % jnp.maximum(cnt, 1)
        idx = jnp.where(w_bool, offsets[cid] + r, 0)
        sm = sorted_keys[idx]                             # (N,) one gather
        src = _unpack_rgb_u8(sm, dtype=rgb_planes[0].dtype)

    w = w_bool.astype(rgb_planes[0].dtype)
    return [s * w + p * (1.0 - w) for s, p in zip(src, rgb_planes)]


def _cluster_disturbance(rgba, rgba_bg, cid, key, rate_fg, rate_bg,
                         num_clusters: int, pool_stride: int = 1,
                         sample_weight=None, impl: str = "sample"):
    """Adaptive appearance prior: swap pixels within semantic clusters.

    Port of the disturbance loop at vhap/util/render_nvdiffrast.py:424-460:
    every pixel is, with probability `rate`, replaced by a random (detached)
    pixel of the same cluster sampled across the whole batch. Cluster 0 is
    background, cluster 1 (unclustered foreground) is never disturbed.

    Static-shape implementation: sort pixel indices by cluster id once,
    giving contiguous per-cluster ranges to sample from. `pool_stride > 1`
    subsamples the candidate pool to cut the sort cost (statistically
    equivalent sampling).

    Only RGB rides the sort: a same-cluster sample's alpha always equals
    the destination's (clusters are all-foreground or all-background), so
    the output alpha is the input alpha untouched, and cluster id + the
    three 8-bit-quantized RGB channels travel packed in ONE self-keyed
    int32 — a 1-operand 4M-element sort (was 5 operands in round 2, then
    3; docs/PERF.md) whose sample gather reads a single channel.

    `sample_weight` (B,) excludes weight-0 padded frames from the swap
    pool: they replicate the last real frame and would over-weight it.
    Their pixels get a sentinel cluster id that sorts past every real
    cluster range, so no pixel ever samples from them.
    """
    B, H, W, C = rgba.shape
    rgb_planes = [rgba[..., c].reshape(-1) for c in range(3)]
    bg_planes = [rgba_bg[..., c].reshape(-1) for c in range(3)]
    valid = None
    if sample_weight is not None:
        valid = jnp.broadcast_to(
            (sample_weight > 0)[:, None, None], (B, H, W)).reshape(-1)
    out_rgb = _cluster_disturbance_planes(
        rgb_planes, bg_planes, cid.reshape(-1), key, rate_fg, rate_bg,
        num_clusters, pool_stride, valid, impl=impl)
    out = jnp.concatenate(
        [jnp.stack(out_rgb, axis=-1).reshape(B, H, W, 3), rgba[..., 3:]],
        axis=-1)
    return out


def _untile_planes_img(planes, H: int, W: int, th: int = 16, tw: int = 128):
    """[(B, T, npx) channel planes] -> (B, H, W, C) image-oriented
    (row 0 = top, like the reference's final .flip(1))."""
    from vhap_tpu.ops.plane_pallas import _untile_image
    x = jnp.stack(list(planes), axis=2)                # (B, T, C, npx)
    img = _untile_image(x, H, W, th, tw)               # (B, C, H, W)
    return jnp.moveaxis(img, 1, -1)[:, ::-1]


def _render_tail_tiled(out, chans_t, tri_id, faces, tex, lights, settings,
                       background_color, align_texture_face_mask,
                       enable_disturbance, fid2cid, num_clusters, key,
                       sample_weight, n_flags: int, H: int, W: int,
                       th: int = 16, tw: int = 128):
    """Texture -> shading -> compositing -> disturbance -> antialias on the
    TILED (B, T, C, npx) channel layout (docs/PERF.md round 5).

    Same math as the image-layout tail of render_rgba — shared helpers
    (_pair_weights via antialias_tiled, shade_planes,
    _cluster_disturbance_planes) keep the two in lockstep; a parity test
    pins energies equal (tests/test_tiled_layout.py). The payoff: every
    per-pixel op runs on perfect (16, 128) hardware tiles instead of
    channel-last (B, H, W, C) tensors whose minor dim 4 pays T(4, 128)
    relayouts, and the 20+ch untile disappears from the train step
    (image-layout outputs are still emitted for aux consumers and
    dead-code-eliminated when unused).

    Reference behavior covered: vhap/util/render_nvdiffrast.py:354-484.
    """
    from vhap_tpu.ops.antialias_tiled import antialias_tiled
    from vhap_tpu.ops.plane_pallas import _tile_image
    from vhap_tpu.ops.shading import shade_planes

    B = tri_id.shape[0]
    npx = th * tw
    tri_t = _tile_image(tri_id, th, tw)                  # (B, T, npx)
    T = tri_t.shape[1]
    fg_t = tri_t > 0
    live_t = None                                        # (1, T, npx) bool
    if settings.crop_size is not None:
        live_t = _tile_image(_live_mask(settings.crop_size, H, W), th, tw)

    def crop_img(img):
        """Strip tile padding from an image-layout output (post row-flip:
        pad rows sit at the TOP of the image)."""
        if settings.crop_size is None:
            return img
        h0, w0 = settings.crop_size
        return img[:, H - h0:, :w0]

    zw_t = chans_t[:, :, 0]
    nx, ny, nz = (chans_t[:, :, 7 + i] for i in range(3))
    vid_planes = [chans_t[:, :, 10 + i].astype(jnp.int32) for i in range(3)]
    flag_planes = [chans_t[:, :, 13 + i] for i in range(n_flags)]
    aa_planes = [chans_t[:, :, 13 + n_flags + i] for i in range(6)]

    # ---- texture: tile layout rides as a fake (B, T*th, tw) image — the
    # sampler's tap binning is pixel-order-agnostic and the uv derivatives
    # are data (render_nvdiffrast.py:389-399 role)
    texc_im = jnp.moveaxis(chans_t[:, :, 1:3], 2, -1).reshape(
        B, T * th, tw, 2)
    texd_im = jnp.moveaxis(chans_t[:, :, 3:7], 2, -1).reshape(
        B, T * th, tw, 4)
    fg_im = fg_t.reshape(B, T * th, tw)
    if align_texture_face_mask is not None:
        pm = (flag_planes[0] > 0.5) & fg_t
        flag_planes = flag_planes[1:]
        texc_im = jnp.where(pm.reshape(B, T * th, tw)[..., None],
                            jax.lax.stop_gradient(texc_im), texc_im)
    tex_hwc = jnp.transpose(tex, (0, 2, 3, 1))
    albedo_im = texture_sample(tex_hwc, texc_im, texd_im,
                               filter_mode="linear-mipmap-linear",
                               grad_mode=settings.texture_grad_mode,
                               grad_impl=settings.texture_grad_impl,
                               mask=fg_im, mesh=settings.mesh)
    albedo_p = [albedo_im[..., c].reshape(B, T, npx) for c in range(3)]

    # ---- shading ----
    diffuse_p = shade_planes(nx, ny, nz, settings.lighting_type, lights)
    sg = jax.lax.stop_gradient
    diffuse_detach_p = shade_planes(sg(nx), sg(ny), sg(nz),
                                    settings.lighting_type, lights)

    cdt = (jnp.bfloat16
           if settings.color_dtype == "bf16"
           or (settings.color_dtype == "auto"
               and jax.default_backend() == "tpu")
           else jnp.float32)
    rgb_p = [a.astype(cdt) * d.astype(cdt)
             for a, d in zip(albedo_p, diffuse_p)]
    alpha_t = fg_t.astype(cdt)

    # ---- background (render_nvdiffrast.py:409-421) ----
    if isinstance(background_color, (list, tuple)):
        bg_p = [jnp.broadcast_to(jnp.asarray(v, cdt), rgb_p[0].shape)
                for v in list(background_color)[:3]]
    else:
        # image background (e.g. "target"): flip to buffer orientation
        # (gl buffers are bottom-up), pad to the (possibly tile-padded)
        # canvas — dead pixels are masked everywhere so the value is
        # free — and tile
        bg = jnp.asarray(background_color, cdt)[:, ::-1]
        bh, bw = bg.shape[1:3]
        if (bh, bw) != (H, W):
            bg = jnp.pad(bg, ((0, 0), (0, H - bh), (0, W - bw), (0, 0)))
        bg_p = [_tile_image(bg[..., c], th, tw) for c in range(3)]
    rgba_p = [jnp.where(fg_t, c, b) for c, b in zip(rgb_p, bg_p)]

    # ---- adaptive appearance prior (render_nvdiffrast.py:424-460) ----
    if enable_disturbance:
        assert fid2cid is not None and key is not None
        cid_t = jnp.where(fg_t, flag_planes[0].astype(jnp.int32), 0)
        valid = None
        if sample_weight is not None:
            valid = jnp.broadcast_to(
                (sample_weight > 0)[:, None, None], (B, T, npx)).reshape(-1)
        swap_ok = None
        if live_t is not None:
            # dead padded pixels neither donate to the pool nor swap
            live_flat = jnp.broadcast_to(live_t, (B, T, npx)).reshape(-1)
            valid = live_flat if valid is None else (valid & live_flat)
            swap_ok = live_flat
        mixed = _cluster_disturbance_planes(
            [p.reshape(-1) for p in rgba_p],
            [jnp.broadcast_to(b, rgba_p[0].shape).reshape(-1)
             for b in bg_p],
            cid_t.reshape(-1), key,
            settings.disturb_rate_fg, settings.disturb_rate_bg,
            num_clusters, settings.disturb_pool_stride, valid,
            swap_ok=swap_ok,
            impl="pairswap" if settings.disturb_impl == "pairswap"
            else "sample")
        rgba_p = [m.reshape(B, T, npx) for m in mixed]
        out["cid"] = crop_img(_untile_planes_img(
            [cid_t.astype(jnp.float32)], H, W, th, tw))

    # ---- antialias (render_nvdiffrast.py:463-466; boundary-detach is in
    # the aa_planes tables already) ----
    pre_aa = rgba_p + [alpha_t]
    if settings.antialias:
        rgba_aa_p = antialias_tiled(pre_aa, tri_t, zw_t, vid_planes,
                                    aa_planes, W // tw, th, tw, H, W,
                                    live=live_t, ndc=settings.crop_size)
    else:
        rgba_aa_p = pre_aa

    out.update({
        # tiled outputs: the photometric energy consumes these directly
        "rgba_planes": tuple(rgba_aa_p),
        "diffuse_detach_planes": tuple(diffuse_detach_p),
        "tile_meta": dict(tile_h=th, tile_w=tw, H=H, W=W,
                          crop=settings.crop_size),
        # image-layout outputs for aux/media consumers (DCE'd in train)
        "albedo": crop_img(_untile_planes_img(albedo_p, H, W, th, tw)),
        "normal": crop_img(_untile_planes_img([nx, ny, nz], H, W, th, tw)),
        "diffuse": crop_img(_untile_planes_img(diffuse_p, H, W, th, tw)),
        "diffuse_detach_normal": crop_img(_untile_planes_img(
            diffuse_detach_p, H, W, th, tw)),
        "rgba": crop_img(_untile_planes_img(rgba_aa_p, H, W, th, tw)),
    })
    aa_t = jnp.zeros_like(pre_aa[0])
    for a, b in zip(pre_aa, rgba_aa_p):
        aa_t = jnp.where(a != b, jnp.asarray(1.0, aa_t.dtype), aa_t)
    out["aa"] = crop_img(_untile_planes_img([aa_t] * 3, H, W, th, tw))
    return out


def render_rgba(
    rast_dict: Dict,
    faces: jnp.ndarray,
    verts_uv: jnp.ndarray,           # (Vt, 2), v already flipped by caller
    faces_uv: jnp.ndarray,           # (F, 3)
    tex: jnp.ndarray,                # (B|1, C, T, T) channel-first like ref
    lights: Optional[jnp.ndarray],   # (B|1, 9, 3)
    settings: RenderSettings,
    background_color: Union[Sequence[float], jnp.ndarray] = (1.0, 1.0, 1.0),
    align_texture_face_mask: Optional[np.ndarray] = None,   # (F+1,) bool
    align_boundary_vert_mask: Optional[np.ndarray] = None,  # (V,) bool
    enable_disturbance: bool = False,
    fid2cid: Optional[jnp.ndarray] = None,                  # (F+1,) int32
    num_clusters: int = 0,
    key: Optional[jnp.ndarray] = None,
    sample_weight: Optional[jnp.ndarray] = None,            # (B,) 0 = padded
) -> Dict[str, jnp.ndarray]:
    """Training render path (vhap/util/render_nvdiffrast.py:354-484).

    Returns dict of (B, H, W, C) buffers, all flipped to image orientation
    (row 0 = top) like the reference's final `.flip(1)` outputs.
    """
    tri_id = rast_dict["tri_id"]
    verts, verts_camera = rast_dict["verts"], rast_dict["verts_camera"]
    verts_clip = rast_dict["verts_clip"]
    B, H, W = tri_id.shape
    F = faces.shape[0]
    fg_mask = (tri_id > 0)[..., None]
    mask_f = fg_mask.astype(verts_clip.dtype)

    out = {}

    # ---- one fused per-pixel gather for attrs + normal/uv corners + vids ----
    space_verts = verts if settings.lighting_space == "world" else verts_camera
    v_normal = compute_v_normals(space_verts, faces)
    # corner tables (B|1, C, F): normals 9ch, uv 6ch, corner vertex ids 3ch
    nrm_tab = jnp.moveaxis(v_normal[:, faces], (1, 2, 3), (3, 1, 2)
                           ).reshape(B, 9, F)
    uv_tab = jnp.moveaxis(verts_uv[faces_uv], (0, 1, 2), (2, 0, 1)
                          ).reshape(1, 6, F)
    vid_tab = faces.T[None].astype(jnp.float32)               # (1, 3, F)
    # small per-face lookups also ride the fused gather (each separate
    # 4M-pixel lookup costs ~30 ms): texture-grad mask + cluster ids
    flag_rows = []
    if align_texture_face_mask is not None:
        flag_rows.append(jnp.asarray(
            align_texture_face_mask[1:], jnp.float32)[None, None])  # (1,1,F)
    if enable_disturbance:
        flag_rows.append(jnp.asarray(fid2cid)[1:].astype(jnp.float32)[None, None])
    # antialias needs the barycentric-plane coefficients of the (possibly
    # boundary-detached) clip verts per pixel — ride the same fused gather
    # (a separate gather costs ~30 ms + a ~60 ms backward scatter)
    verts_clip_aa = verts_clip
    if align_boundary_vert_mask is not None:
        m = jnp.asarray(align_boundary_vert_mask)[None, :, None]
        verts_clip_aa = jnp.where(m, jax.lax.stop_gradient(verts_clip), verts_clip)
    p_aa = face_attribute_planes(verts_clip_aa, faces)
    aa_tab = jnp.stack([p_aa[k] for k in AA_PLANE_KEYS], axis=1)   # (B, 6, F)
    extra = jnp.concatenate([
        nrm_tab,
        jnp.broadcast_to(uv_tab, (B, 6, F)),
        jnp.broadcast_to(vid_tab, (B, 3, F)),
    ] + [jnp.broadcast_to(r, (B, 1, F)) for r in flag_rows]
      + [aa_tab], axis=1)

    n_flags = len(flag_rows)
    bins = rast_dict.get("bins")
    fi = _resolve_interp_impl(
        settings, bins if bins is not None else rast_dict.get("lists"), H, W)
    use_tiled = fi is not None and settings.layout in ("auto", "tiled")
    if settings.crop_size is not None and not use_tiled:
        raise ValueError(
            "crop_size (tile padding) requires the tiled fused-interp "
            f"path, but it did not engage (interp_impl="
            f"{settings.interp_impl!r}, layout={settings.layout!r}, "
            f"backend={jax.default_backend()!r}) — render at the original "
            "size instead of padding, or force interp_impl='fused'.")
    if fi is not None:
        # deferred-interp Pallas kernel: barycentrics + perspective +
        # interpolation in-kernel, 20+nf processed channels out
        # (vhap_tpu/ops/interp_pallas.py); flat bins when the rasterizer
        # produced them (the default — docs/PERF.md round 4)
        p_geo = face_attribute_planes(verts_clip, faces)
        from vhap_tpu.ops.rasterize import PLANE_KEYS
        packed = jnp.concatenate(
            [jnp.stack([p_geo[k] for k in PLANE_KEYS], axis=1), extra],
            axis=1)
        interp = fi == "pallas_interpret"
        lay = "tiled" if use_tiled else "image"
        use_mesh = settings.mesh is not None and B % settings.mesh.size == 0
        if bins is not None:
            from vhap_tpu.ops.interp_pallas import fused_interp_flat
            if use_mesh:
                from jax.sharding import PartitionSpec as PS
                axis = settings.mesh.axis_names[0]
                pc_static = bins["PC"]

                def _fit(pk, ti, fids_, ctile_):
                    o, ov = fused_interp_flat(
                        pk, ti, {"fids": fids_, "ctile": ctile_,
                                 "PC": pc_static},
                        n_flags, 16, 128, interp, layout=lay,
                        ndc=settings.crop_size)
                    return o, jax.lax.psum(ov, axis)

                chans, plane_overflow = jax.shard_map(
                    _fit, mesh=settings.mesh,
                    in_specs=(PS(axis), PS(axis), PS(axis), PS(axis)),
                    out_specs=(PS(axis), PS()), check_vma=False)(
                        packed, tri_id, bins["fids"], bins["ctile"])
            else:
                chans, plane_overflow = fused_interp_flat(
                    packed, tri_id, bins, n_flags, 16, 128, interp,
                    layout=lay, ndc=settings.crop_size)
        else:
            from vhap_tpu.ops.interp_pallas import fused_interp_tiled
            lists = rast_dict["lists"]
            if use_mesh:
                from jax.sharding import PartitionSpec as PS
                axis = settings.mesh.axis_names[0]

                def _fit(pk, ti, ls):
                    o, ov = fused_interp_tiled(pk, ti, ls, n_flags, 16, 128,
                                               settings.plane_max_list,
                                               interp, layout=lay,
                                               ndc=settings.crop_size)
                    return o, jax.lax.psum(ov, axis)

                chans, plane_overflow = jax.shard_map(
                    _fit, mesh=settings.mesh,
                    in_specs=(PS(axis), PS(axis), PS(axis)),
                    out_specs=(PS(axis), PS()), check_vma=False)(
                        packed, tri_id, lists)
            else:
                chans, plane_overflow = fused_interp_tiled(
                    packed, tri_id, lists, n_flags, 16, 128,
                    settings.plane_max_list, interp, layout=lay,
                    ndc=settings.crop_size)
        if use_tiled:
            out["plane_overflow"] = plane_overflow
            _render_tail_tiled(
                out, chans, tri_id, faces, tex, lights, settings,
                background_color, align_texture_face_mask,
                enable_disturbance, fid2cid, num_clusters, key,
                sample_weight, n_flags, H, W)
            return out
        zw = chans[:, 0]
        texc = jnp.moveaxis(chans[:, 1:3], 1, -1)
        texd = jnp.moveaxis(chans[:, 3:7], 1, -1)
        normal = jnp.moveaxis(chans[:, 7:10], 1, -1)
        vid_planes = [chans[:, 10 + i].astype(jnp.int32) for i in range(3)]
        flag_planes = [chans[:, 13 + i] for i in range(n_flags)]
        aa_planes = [chans[:, 13 + n_flags + i] for i in range(6)]
        # antialias consumes only zw + tri_id from rast
        zero = jnp.zeros_like(zw)
        rast = jnp.stack([zero, zero, zw, tri_id.astype(zw.dtype)], axis=-1)
    else:
        rast, rast_db, planes, plane_overflow = fused_rast_and_planes(
            verts_clip, faces, tri_id, extra, lists=rast_dict.get("lists"),
            plane_impl=settings.plane_impl,
            plane_max_list=settings.plane_max_list, mesh=settings.mesh)
        u = rast[..., 0]
        v = rast[..., 1]
        w2 = (1.0 - u - v) * mask_f[..., 0]

        def interp3(c0, c1, c2):
            return u * c0 + v * c1 + w2 * c2

        nrm = planes[0:9]    # corner-major: [n0.xyz, n1.xyz, n2.xyz]
        normal = jnp.stack([interp3(nrm[c], nrm[3 + c], nrm[6 + c])
                            for c in range(3)], axis=-1)
        normal = safe_normalize(normal)

        uvp = planes[9:15]   # [uv0.uv, uv1.uv, uv2.uv]
        texc = jnp.stack([interp3(uvp[c], uvp[2 + c], uvp[4 + c])
                          for c in range(2)], axis=-1)
        dudx, dudy = rast_db[..., 0], rast_db[..., 1]
        dvdx, dvdy = rast_db[..., 2], rast_db[..., 3]
        texd = jnp.stack(
            [dudx * (uvp[c] - uvp[4 + c]) + dvdx * (uvp[2 + c] - uvp[4 + c])
             for c in range(2)]
            + [dudy * (uvp[c] - uvp[4 + c]) + dvdy * (uvp[2 + c] - uvp[4 + c])
               for c in range(2)], axis=-1)
        vid_planes = [p.astype(jnp.int32) for p in planes[15:18]]
        aa_planes = planes[-6:]
        flag_planes = planes[18:-6]
    out["plane_overflow"] = plane_overflow

    # ---- texture (region-masked gradient, render_nvdiffrast.py:389-399) ----
    if align_texture_face_mask is not None:
        pix_mask = ((flag_planes[0] > 0.5) & fg_mask[..., 0])[..., None]
        flag_planes = flag_planes[1:]
        texc = jnp.where(pix_mask, jax.lax.stop_gradient(texc), texc)

    tex_hwc = jnp.transpose(tex, (0, 2, 3, 1))
    # coverage-masked sampling: background pixels fetch nothing (their
    # albedo is discarded by the fg_mask composite below anyway), which
    # lets the Pallas tap kernels skip ~all background work blocks
    albedo = texture_sample(tex_hwc, texc, texd,
                            filter_mode="linear-mipmap-linear",
                            grad_mode=settings.texture_grad_mode,
                            grad_impl=settings.texture_grad_impl,
                            mask=fg_mask[..., 0], mesh=settings.mesh)

    # ---- shading ----
    diffuse = shade(normal, settings.lighting_type, lights)
    diffuse_detach_normal = shade(jax.lax.stop_gradient(normal),
                                  settings.lighting_type, lights)

    # the color chain runs at color_dtype (bf16 on TPU by default): the
    # compositing/disturbance/AA elementwise mass is HBM-bound, and color
    # values tolerate 2^-8 (the reference consumes uint8 frames). Geometry
    # (rast, texc/texd, AA planes) stays f32 above.
    cdt = (jnp.bfloat16
           if settings.color_dtype == "bf16"
           or (settings.color_dtype == "auto"
               and jax.default_backend() == "tpu")
           else jnp.float32)
    rgb = albedo.astype(cdt) * diffuse.astype(cdt)
    alpha = fg_mask.astype(cdt)
    rgba = jnp.concatenate([rgb, alpha], axis=-1)

    # ---- background (render_nvdiffrast.py:409-421) ----
    if isinstance(background_color, (list, tuple)):
        rgba_bg = jnp.asarray(list(background_color) + [0.0], rgba.dtype)
        rgba_bg = jnp.broadcast_to(rgba_bg, rgba.shape)
    else:
        bg = jnp.asarray(background_color, cdt)
        rgba_bg = jnp.concatenate([bg, jnp.zeros_like(bg[..., :1])], axis=-1)
        rgba_bg = jnp.broadcast_to(rgba_bg, rgba.shape)
    rgba_bg = rgba_bg[:, ::-1]  # gl buffers are bottom-up; flip bg to match

    rgba = jnp.where(fg_mask, rgba, rgba_bg)

    # ---- adaptive appearance prior (render_nvdiffrast.py:424-460) ----
    if enable_disturbance:
        assert fid2cid is not None and key is not None
        cid = jnp.where(fg_mask[..., 0],
                        flag_planes[0].astype(jnp.int32), 0)
        out["cid"] = cid[:, ::-1][..., None].astype(jnp.float32)
        rgba = _cluster_disturbance(
            rgba, rgba_bg, cid, key,
            settings.disturb_rate_fg, settings.disturb_rate_bg,
            num_clusters, settings.disturb_pool_stride,
            sample_weight=sample_weight,
            impl="pairswap" if settings.disturb_impl == "pairswap"
            else "sample")

    # ---- antialias with boundary-gradient control (render_nvdiffrast.py:463-466) ----
    if settings.antialias:
        rgba_aa = antialias(rgba, rast, verts_clip_aa, faces,
                            vid_planes=vid_planes, a_planes=aa_planes)
    else:
        rgba_aa = rgba
    aa = jnp.any(rgba != rgba_aa, axis=-1, keepdims=True).astype(rgba.dtype)

    out.update({
        "albedo": albedo[:, ::-1],
        "normal": normal[:, ::-1],
        "diffuse": diffuse[:, ::-1],
        "diffuse_detach_normal": diffuse_detach_normal[:, ::-1],
        "rgba": rgba_aa[:, ::-1],
        "aa": jnp.broadcast_to(aa, aa.shape[:3] + (3,))[:, ::-1],
    })
    return out


def render_rgba_vis(
    verts, faces, RT, K, image_size,
    settings: RenderSettings,
    background_color=(1.0, 1.0, 1.0),
    v_color: Optional[jnp.ndarray] = None,
    verts_uv: Optional[jnp.ndarray] = None,
    faces_uv: Optional[jnp.ndarray] = None,
    tex: Optional[jnp.ndarray] = None,
    lights: Optional[jnp.ndarray] = None,
    shade_smooth: bool = True,
) -> Dict[str, jnp.ndarray]:
    """Visualization render path (vhap/util/render_nvdiffrast.py:486-567)."""
    rd = rasterize_mesh(verts, faces, RT, K, image_size, settings,
                        grad_enabled=False)
    rast, rast_db, tri_id = rd["rast"], rd["rast_db"], rd["tri_id"]
    fg_mask = (tri_id > 0)[..., None]

    space_verts = verts if settings.lighting_space == "world" else rd["verts_camera"]
    if shade_smooth:
        v_normal = compute_v_normals(space_verts, faces)
        normal, _ = interpolate(v_normal, rast, faces)
        normal = safe_normalize(normal)
    else:
        from vhap_tpu.ops.shading import compute_face_normals
        fn = compute_face_normals(rd["verts_camera"], faces)
        fid = jnp.maximum(tri_id - 1, 0)
        normal = jnp.take_along_axis(
            fn, fid.reshape(fn.shape[0], -1)[..., None], axis=1
        ).reshape(tri_id.shape + (3,))

    if verts_uv is not None and faces_uv is not None and tex is not None:
        texc, texd = interpolate(verts_uv[None], rast, faces_uv,
                                 rast_db=rast_db, diff_attrs="all")
        tex_hwc = jnp.transpose(tex, (0, 2, 3, 1))
        albedo = texture_sample(tex_hwc, texc, texd)
    elif v_color is not None:
        if v_color.ndim == 2:
            v_color = v_color[None]
        albedo, _ = interpolate(v_color, rast, faces)
    else:
        albedo = jnp.ones_like(normal)

    lighting_type = "SH" if lights is not None else settings.lighting_type
    diffuse = shade(normal, lighting_type, lights)

    rgb = albedo * diffuse
    alpha = fg_mask.astype(rgb.dtype)
    rgba = jnp.concatenate([rgb, alpha], axis=-1)

    rgba_bg = jnp.asarray(list(background_color) + [0.0], rgba.dtype)
    rgba_bg = jnp.broadcast_to(rgba_bg, rgba.shape)
    normal = jnp.where(fg_mask, normal, rgba_bg[..., :3])
    diffuse_out = jnp.where(fg_mask, diffuse, rgba_bg[..., :3])
    rgba = jnp.where(fg_mask, rgba, rgba_bg)

    if settings.antialias:
        rgba_aa = antialias(rgba, rast, rd["verts_clip"], faces)
    else:
        rgba_aa = rgba
    return {
        "albedo": albedo[:, ::-1],
        "normal": normal[:, ::-1],
        "diffuse": diffuse_out[:, ::-1],
        "rgba": rgba_aa[:, ::-1],
        "verts_clip": rd["verts_clip"],
    }

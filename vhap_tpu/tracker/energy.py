"""Energy terms: landmark, photometric, and regularization.

Functional port of FlameTracker's energy stack
(vhap/model/tracker.py:213-750) designed for jit: one energy function is
built *per stage* (make_energy_fn), closing over all static stage
configuration (optimizable-parameter gates, region masks, loss switches),
so the hot loop is a single compiled step per stage.

Batch convention (channel-last, TPU friendly):
  rgb (B, H, W, 3) in [0,1] — already background-composited by the dataset
  lmk2d (B, L, 3) pixel coords + confidence
  intrinsic (B, 4) [fx, fy, cx, cy] or (B, 3, 3)
  extrinsic (B, 3|4, 4) world->camera
  timestep_index (B,) int32
  weight (B,) float — 0 for padded samples (the reference instead runs a
  smaller last batch; padding keeps shapes static for XLA)
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vhap_tpu.config.base import BaseTrackingConfig, PhotometricStageConfig
from vhap_tpu.model.flame import (FlameHead, laplacian_apply,
                                  laplacian_blur_apply)
from vhap_tpu.model.lbs import batch_rodrigues
from vhap_tpu.ops import camera as cam
from vhap_tpu.ops.render import RenderSettings, rasterize_mesh, render_rgba
from vhap_tpu.tracker import params as P


def normalize_image_points(u, v, resolution):
    """[0, size] pixels -> [-1, 1] (vhap/util/mesh.py:41-51)."""
    h, w = resolution
    return 2 * (u - w / 2.0) / w, 2 * (v - h / 2.0) / h


def _wmean(x, w, axis_batch=0):
    """Weighted mean over all elements with per-sample weights w (B,)."""
    bshape = [1] * x.ndim
    bshape[axis_batch] = -1
    wx = x * w.reshape(bshape)
    denom = w.sum() * (x.size / x.shape[axis_batch])
    return wx.sum() / jnp.maximum(denom, 1e-12)


def fill_cam_params(batch: Dict, params: P.Params, calibrated: bool,
                    image_size) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Intrinsics/extrinsics for the batch (vhap/model/tracker.py:141-157)."""
    if calibrated:
        return batch["intrinsic"], batch["extrinsic"]
    B = batch["rgb"].shape[0]
    h, w = image_size
    f = params["focal_length"] * max(h, w)           # (1,)
    f = jnp.broadcast_to(f, (B,))
    K = jnp.stack([f, f, jnp.full((B,), 0.5 * w), jnp.full((B,), 0.5 * h)], axis=1)
    RT = jnp.broadcast_to(jnp.eye(3, 4).at[2, 3].set(-1.0), (B, 3, 4))
    return K, RT


def landmark_energy(batch, pred_lmks, K, RT, image_size,
                    disable_jawline: bool, always_jawline: bool):
    """Confidence-weighted L1 landmark loss (vhap/model/tracker.py:347-389)."""
    h, w = image_size
    lmk2d = batch["lmk2d"]
    gt_xy = jnp.stack(normalize_image_points(
        lmk2d[..., 0], lmk2d[..., 1], (h, w)), axis=-1)
    conf = lmk2d[..., 2]

    pred_ndc = cam.world_to_ndc(pred_lmks, RT, K, (h, w), flip_y=True)
    pred_xy = pred_ndc[..., :2]

    if not always_jawline and disable_jawline:
        diff = gt_xy[:, 17:68] - pred_xy[:, 17:68]
        conf = conf[:, 17:68]
    else:
        diff = gt_xy[:, :68] - pred_xy[:, :68]
        conf = conf[:, :68]
        # nose landmarks are robust -> 10x confidence (tracker.py:377-379)
        scale = jnp.ones_like(conf).at[:, 27:36].set(10.0)
        conf = conf * scale

    loss = jnp.sum(jnp.abs(diff), axis=2) * conf          # (B, L)
    e = _wmean(loss, batch["weight"])
    return e, {"gt_lmk2d": gt_xy, "pred_lmk2d": pred_xy,
               "lmk_per_sample": loss.mean(axis=1)}


def _photometric_energy_tiled(batch, render_out):
    """photometric_energy on the tiled render layout (ops/render.py
    _render_tail_tiled): the residual + reductions run on (B, T, npx)
    channel planes; image-layout aux entries are derived on demand and
    dead-code-eliminated in the train step."""
    from vhap_tpu.ops.plane_pallas import _tile_image
    from vhap_tpu.ops.render import _untile_planes_img

    meta = render_out["tile_meta"]
    th, tw = meta["tile_h"], meta["tile_w"]
    Hr, Wr = meta["H"], meta["W"]
    pred = render_out["rgba_planes"]                      # buffer-oriented
    gt = batch["rgb"]                                     # (B, H0, W0, 3)
    # gt to buffer orientation (gl buffers are bottom-up), then padded to
    # the (possibly tile-padded) raster canvas and tiled. Padded pixels
    # are masked out of the residual below, so the pad value is free.
    gt_buf = gt[:, ::-1]
    B, H0, W0 = gt_buf.shape[:3]
    if (H0, W0) != (Hr, Wr):
        gt_buf = jnp.pad(gt_buf,
                         ((0, 0), (0, Hr - H0), (0, Wr - W0), (0, 0)))
    gt_p = [_tile_image(gt_buf[..., c], th, tw).astype(pred[0].dtype)
            for c in range(3)]
    alpha = pred[3]
    pred_mask = (jax.lax.stop_gradient(alpha) > 0).astype(jnp.float32)
    w = batch["weight"]

    live = None
    if meta.get("crop") is not None:
        from vhap_tpu.ops.render import _live_mask
        live = _tile_image(_live_mask(meta["crop"], Hr, Wr), th, tw
                           ).astype(pred[0].dtype)        # (1, T, npx)

    def resid(g, p):
        r = jnp.abs(g - p)
        return jnp.sum(r if live is None else r * live,
                       axis=(1, 2), dtype=jnp.float32)

    s = sum(resid(g, p) for g, p in zip(gt_p, pred[:3]))  # (B,)
    area = pred_mask.sum(axis=(1, 2)) * 3
    denom = (area * w).sum()
    color_loss = (s * w).sum() / jnp.maximum(denom, 1.0)
    per = s / jnp.maximum(area, 1.0)
    pred_img = render_out["rgba"][..., :3]
    alpha_img = _untile_planes_img([alpha], Hr, Wr, th, tw)
    if meta.get("crop") is not None:
        h0, w0 = meta["crop"]
        alpha_img = alpha_img[:, Hr - h0:, :w0]
    aux = {"gt_rgb": gt.astype(pred_img.dtype), "pred_rgb": pred_img,
           "error_rgb": gt.astype(pred_img.dtype) - pred_img,
           "pred_alpha": alpha_img,
           "photo_per_sample": per}
    return color_loss, aux


def photometric_energy(batch, render_out):
    """|gt - pred| normalized by foreground area
    (vhap/model/tracker.py:391-478)."""
    if "rgba_planes" in render_out:
        return _photometric_energy_tiled(batch, render_out)
    gt = batch["rgb"]                                     # (B, H, W, 3)
    pred = render_out["rgba"][..., :3]
    alpha = render_out["rgba"][..., 3:]
    # the residual runs in the render's color dtype (bf16 on TPU — the
    # same envelope as the reference's uint8 frames); every reduction
    # accumulates in f32
    gt = gt.astype(pred.dtype)
    pred_mask = (jax.lax.stop_gradient(alpha) > 0).astype(jnp.float32)
    w = batch["weight"]                                   # (B,) 0/1 padding

    # ONE per-sample reduction serves both the weighted total (w is a
    # per-sample scalar, so sum(|err|*w) == sum_b w_b * s_b) and the
    # per-timestep eval losses (tracker.py:1078-1117)
    s = jnp.sum(jnp.abs(gt - pred), axis=(1, 2, 3), dtype=jnp.float32)
    area = pred_mask.sum(axis=(1, 2, 3)) * 3  # mask expanded to 3ch in ref
    denom = (area * w).sum()
    color_loss = (s * w).sum() / jnp.maximum(denom, 1.0)
    per = s / jnp.maximum(area, 1.0)
    aux = {"gt_rgb": gt, "pred_rgb": pred, "error_rgb": gt - pred,
           "pred_alpha": alpha, "photo_per_sample": per}
    return color_loss, aux


@dataclass(frozen=True)
class RegPrecomputed:
    """Static tensors for the regularizers (built once per config)."""
    offset_relax_w: Optional[np.ndarray]        # (V, 1)
    offset_lap_relax_w: Optional[np.ndarray]    # (V, 1)
    rigid_vids: Tuple[np.ndarray, ...]          # per-region vertex ids
    tex_res_cluster_mask: Optional[np.ndarray]  # (1, Hm, Wm)


def build_reg_precomputed(head: FlameHead, cfg: BaseTrackingConfig) -> RegPrecomputed:
    V = head.num_verts
    w_cfg = cfg.w

    def region_weights(regions, coef):
        w = np.ones((V, 1), np.float32)
        ids = head.masks.get_vid_by_region([r for r in regions if r in head.masks.v])
        w[ids] *= coef
        wj = jnp.asarray(w)[None]
        for _ in range(w_cfg.blur_iter):
            wj = laplacian_blur_apply(head.lap_nbr_idx, head.lap_nbr_w, wj)
        return np.asarray(wj[0])

    offset_relax_w = (region_weights(w_cfg.reg_offset_relax_for,
                                     w_cfg.reg_offset_relax_coef)
                      if len(w_cfg.reg_offset_relax_for) else None)
    offset_lap_relax_w = (region_weights(w_cfg.reg_offset_lap_relax_for,
                                         w_cfg.reg_offset_lap_relax_coef)
                          if len(w_cfg.reg_offset_lap_relax_for) else None)
    # a region needs >= 2 vertices for an unbiased variance (ddof=1);
    # degenerate regions (possible with synthetic masks) would yield NaN
    rigid_vids = tuple(
        vids for vids in (
            np.asarray(head.masks.get_vid_by_region([r]))
            for r in w_cfg.reg_offset_rigid_for if r in head.masks.v)
        if len(vids) >= 2)
    tex_mask = head.uv_masks.get_uvmask_by_region(w_cfg.reg_tex_res_for)
    tex_res_cluster_mask = None if tex_mask is None else tex_mask[None].astype(np.float32)
    return RegPrecomputed(offset_relax_w, offset_lap_relax_w, rigid_vids,
                          tex_res_cluster_mask)


def regularization_energy(
    params: P.Params, batch, verts, verts_cano, albedo, render_out,
    head: FlameHead, cfg: BaseTrackingConfig, stage_name: str,
    opt: Dict[str, bool], pre: RegPrecomputed, n_timesteps: int,
) -> Dict[str, jnp.ndarray]:
    """All regularizers (vhap/model/tracker.py:480-690), stage-gated."""
    w_cfg = cfg.w
    log = {}
    ts = batch["timestep_index"]
    ts_prev = jnp.clip(ts - 1, 0, n_timesteps - 1)
    bw = batch["weight"]
    tracking = "tracking" in stage_name

    def smooth(cur, prev, weight):
        return _wmean((cur - jax.lax.stop_gradient(prev)) ** 2, bw) * weight

    if opt["pose"] and tracking:
        log["smooth_pose"] = (
            smooth(params["translation"][ts], params["translation"][ts_prev],
                   w_cfg.smooth_trans)
            + smooth(params["rotation"][ts], params["rotation"][ts_prev],
                     w_cfg.smooth_rot))

    if opt["joints"]:
        log["reg_joint"] = _joint_l2(params, ts, bw, w_cfg)
        if tracking:
            log["smooth_joint"] = (
                smooth(params["neck_pose"][ts], params["neck_pose"][ts_prev], w_cfg.smooth_neck)
                + smooth(params["jaw_pose"][ts], params["jaw_pose"][ts_prev], w_cfg.smooth_jaw)
                + smooth(params["eyes_pose"][ts], params["eyes_pose"][ts_prev], w_cfg.smooth_eyes))

    if opt["expr"]:
        log["reg_expr"] = w_cfg.reg_expr * _wmean(params["expr"][ts] ** 2, bw)
        if tracking:
            log["smooth_expr"] = smooth(params["expr"][ts], params["expr"][ts_prev],
                                        w_cfg.smooth_expr)

    if opt["shape"]:
        log["reg_shape"] = w_cfg.reg_shape * jnp.mean(params["shape"] ** 2)

    if opt["texture"]:
        if not cfg.model.tex_painted and "tex_pca" in params:
            log["reg_tex_pca"] = w_cfg.reg_tex_pca * jnp.mean(params["tex_pca"] ** 2)
        if cfg.model.tex_extra and cfg.model.residual_tex and "tex_extra" in params:
            if w_cfg.reg_tex_tv is not None:
                # the reference sums the flattened y/x squared diffs
                # element-wise before averaging (tracker.py:526-534)
                tex = albedo[0]                          # (3, H, W)
                tv_y = (tex[:, :-1, :] - tex[:, 1:, :]) ** 2
                tv_x = (tex[:, :, :-1] - tex[:, :, 1:]) ** 2
                tv = (tv_y.reshape(3, -1) + tv_x.reshape(3, -1)).mean()
                w_tv = w_cfg.reg_tex_tv * cfg.data.scale_factor ** 2
                if cfg.data.n_downsample_rgb is not None:
                    w_tv /= cfg.data.n_downsample_rgb ** 2
                log["reg_tex_tv"] = w_tv * tv
            if (w_cfg.reg_tex_res_clusters is not None
                    and pre.tex_res_cluster_mask is not None):
                m = jnp.asarray(pre.tex_res_cluster_mask)
                if m.shape[-2:] != params["tex_extra"].shape[-2:]:
                    m = jax.image.resize(m, (1,) + params["tex_extra"].shape[-2:],
                                         method="nearest")
                log["reg_tex_res_clusters"] = (
                    w_cfg.reg_tex_res_clusters
                    * jnp.mean(params["tex_extra"] ** 2 * m))

    if opt["lights"] and "lights" in params:
        if w_cfg.reg_light is not None:
            from vhap_tpu.ops.shading import uniform_sh_lights
            log["reg_light"] = w_cfg.reg_light * jnp.mean(
                (params["lights"] - jnp.asarray(uniform_sh_lights())) ** 2)
        if w_cfg.reg_diffuse is not None and render_out is not None:
            if "diffuse_detach_planes" in render_out:
                # tiled layout: max + channel variance from the 3 planes
                # (same values as the image form; ddof=1 over C=3 -> /2)
                r_, g_, b_ = render_out["diffuse_detach_planes"]
                m = (r_ + g_ + b_) * (1.0 / 3.0)
                var = ((r_ - m) ** 2 + (g_ - m) ** 2 + (b_ - m) ** 2) * 0.5
                dmax = jnp.maximum(jnp.maximum(r_.max(), g_.max()), b_.max())
                reg = jax.nn.relu(dmax - 1.0) + var.mean()
            else:
                d = render_out["diffuse_detach_normal"]  # (B, H, W, 3)
                reg = (jax.nn.relu(d.max() - 1.0)
                       + jnp.var(d, axis=-1, ddof=1).mean())
            log["reg_diffuse"] = w_cfg.reg_diffuse * reg

    if opt["static_offset"] or opt["dynamic_offset"]:
        offset = None
        if "static_offset" in params:
            offset = params["static_offset"]
        if "dynamic_offset" in params:
            dyn = params["dynamic_offset"][ts]
            offset = dyn if offset is None else offset + dyn
        if offset is not None:
            offset = jnp.broadcast_to(offset, verts_cano.shape)
            if w_cfg.reg_offset_lap is not None:
                base = jax.lax.stop_gradient(verts_cano - offset)
                lap_base = jax.lax.stop_gradient(
                    laplacian_apply(head.lap_nbr_idx, head.lap_nbr_w, base))
                lap_off = laplacian_apply(head.lap_nbr_idx, head.lap_nbr_w,
                                          base + offset)
                diff = ((lap_off - lap_base) ** 2).sum(-1, keepdims=True)
                if pre.offset_lap_relax_w is not None:
                    diff = diff * jnp.asarray(pre.offset_lap_relax_w)[None]
                log["reg_offset_lap"] = w_cfg.reg_offset_lap * _wmean(diff, bw)
            if w_cfg.reg_offset is not None:
                reg = jnp.abs(offset)
                if pre.offset_relax_w is not None:
                    reg = reg * jnp.asarray(pre.offset_relax_w)[None]
                log["reg_offset"] = w_cfg.reg_offset * _wmean(reg, bw)
            if w_cfg.reg_offset_rigid is not None and pre.rigid_vids:
                rig = 0.0
                for vids in pre.rigid_vids:
                    rig += jnp.var(offset[:, jnp.asarray(vids)], axis=-2, ddof=1).mean()
                log["reg_offset_rigid"] = w_cfg.reg_offset_rigid * rig
            if (w_cfg.reg_offset_dynamic is not None
                    and "dynamic_offset" in params and opt["dynamic_offset"]):
                d_prev = params["dynamic_offset"][ts_prev]
                d_cur = params["dynamic_offset"][ts]
                log["reg_offset_dynamic"] = (
                    w_cfg.reg_offset_dynamic * _wmean((d_cur - d_prev) ** 2, bw))

    return log


def _joint_l2(params, ts, bw, w_cfg):
    """Joint priors in rotation-matrix space (vhap/model/tracker.py:650-680).

    Replicates the reference's mean over a (2B-1)-row stack where B-1 rows
    are zero (identity-vs-identity), i.e. an effective B/(2B-1) scaling.
    """
    B = ts.shape[0]
    poses = [
        ("neck", params["neck_pose"][ts], w_cfg.reg_neck),
        ("jaw", params["jaw_pose"][ts], w_cfg.reg_jaw),
        ("eyes", params["eyes_pose"][ts, :3], w_cfg.reg_eyes),
        ("eyes", params["eyes_pose"][ts, 3:], w_cfg.reg_eyes),
    ]
    sum_w = jnp.maximum(bw.sum(), 1.0)
    E = 0.0
    for name, pose, weight in poses:
        R = batch_rodrigues(pose)                           # (B, 3, 3)
        I = jnp.eye(3, dtype=R.dtype)
        sq = ((I - R) ** 2).sum(axis=(1, 2)) / 9.0          # per-sample mean
        diff = (sq * bw).sum() / (2 * sum_w - 1)
        if name == "jaw":
            diff += _wmean(jax.nn.relu(-pose[:, 0]), bw) * 10
            diff += _wmean(pose[:, 1:] ** 2, bw) * 3
        elif name == "eyes":
            diff += _wmean((params["eyes_pose"][ts, :3]
                            - params["eyes_pose"][ts, 3:]) ** 2, bw)
        E += diff * weight
    return E


# ---------------------------------------------------------------------------
# Albedo assembly (vhap/model/tracker.py:237-258)
# ---------------------------------------------------------------------------

def make_albedo_fn(cfg: BaseTrackingConfig, tex_painted_model, tex_pca_model):
    def get_albedo(params: P.Params) -> jnp.ndarray:
        if cfg.model.tex_extra and not cfg.model.residual_tex:
            base = params["tex_extra"][None]
        elif cfg.model.tex_painted:
            base = tex_painted_model()
        else:
            base = tex_pca_model(params["tex_pca"][None])
        if cfg.model.tex_extra and cfg.model.residual_tex:
            res = params["tex_extra"][None]
            if base.shape[-2:] != res.shape[-2:]:
                base = jax.image.resize(base, base.shape[:2] + res.shape[-2:],
                                        method="bilinear")
            return base + res
        return base
    return get_albedo


# ---------------------------------------------------------------------------
# Full energy factory
# ---------------------------------------------------------------------------

def make_energy_fn(
    head: FlameHead,
    cfg: BaseTrackingConfig,
    get_albedo: Callable,
    image_size: Tuple[int, int],
    n_timesteps: int,
    stage_name: Optional[str],
    with_aux: bool = False,
    mesh=None,
) -> Callable:
    """Build energy(params, batch, key) for one stage (or eval when
    stage_name is None). Mirrors compute_energy (vhap/model/tracker.py:692-750).

    mesh: an active jax.sharding.Mesh makes the Pallas render kernels run
    under shard_map over the batch axis (vhap_tpu/parallel/sharding.py).
    """
    calibrated = cfg.data.calibrated
    # pad the raster canvas to kernel-tile multiples for non-divisible
    # recipes (e.g. the documented 802x550 NeRSemble config): the Pallas
    # train path keeps kernel speed; dead pixels are masked everywhere
    # (RenderSettings.crop_size). Landmarks and eval/media stay at the
    # original size.
    H0, W0 = image_size
    _th, _tw = 16, 128
    # mirror _resolve_interp_impl's engage condition (minus divisibility):
    # padding only helps when the fused tiled path actually runs — on CPU
    # with interp_impl='auto' it does not, and padding there would raise
    _fused_engages = (
        cfg.render.interp_impl in ("fused", "fused_interpret")
        or (cfg.render.interp_impl == "auto"
            and jax.default_backend() == "tpu"
            and (mesh is not None or jax.device_count() == 1)))
    pad_render = (cfg.render.pad_to_tiles and not with_aux
                  and bool(H0 % _th or W0 % _tw)
                  and cfg.render.layout in ("auto", "tiled")
                  and _fused_engages)
    render_size = ((-(-H0 // _th) * _th, -(-W0 // _tw) * _tw)
                   if pad_render else tuple(image_size))
    settings = RenderSettings(
        crop_size=tuple(image_size) if pad_render else None,
        lighting_type=cfg.render.lighting_type,
        lighting_space=cfg.render.lighting_space,
        disturb_rate_fg=cfg.render.disturb_rate_fg,
        disturb_rate_bg=cfg.render.disturb_rate_bg,
        backend=cfg.render.backend,
        disturb_pool_stride=cfg.render.disturb_pool_stride,
        disturb_impl=cfg.render.disturb_impl,
        texture_grad_mode=cfg.render.texture_grad_mode,
        texture_grad_impl=cfg.render.texture_grad_impl,
        mesh=mesh,
        max_faces_per_tile=cfg.render.max_faces_per_tile,
        plane_impl=cfg.render.plane_impl,
        plane_max_list=cfg.render.plane_max_list,
        color_dtype=cfg.render.color_dtype,
        interp_impl=cfg.render.interp_impl,
        bin_mode=cfg.render.bin_mode,
        antialias=cfg.render.antialias,
        # aux consumers (media grids, eval dumps) want image buffers; the
        # train step runs the tiled layout (docs/PERF.md round 5)
        layout="image" if with_aux else cfg.render.layout,
    )

    if stage_name is not None:
        stage_cfg = cfg.pipeline[stage_name]
        is_photo_stage = isinstance(stage_cfg, PhotometricStageConfig)
        opt = {k: False for k in ("cam", "pose", "shape", "joints", "expr",
                                  "texture", "lights", "static_offset",
                                  "dynamic_offset")}
        for p in stage_cfg.optimizable_params:
            opt[p] = True
        disable_jawline = stage_cfg.disable_jawline_landmarks
        background = cfg.render.background_train
        if is_photo_stage:
            tex_mask = head.masks.face_mask_padded(stage_cfg.align_texture_except)
            bnd_mask = head.masks.vertex_mask(stage_cfg.align_boundary_except)
        else:
            tex_mask = bnd_mask = None
    else:
        stage_cfg, is_photo_stage = None, True
        opt = None
        disable_jawline = False
        background = cfg.render.background_eval
        tex_mask = bnd_mask = None

    enable_photo = cfg.w.photo is not None and is_photo_stage
    enable_disturbance = stage_name is not None and is_photo_stage
    pre = build_reg_precomputed(head, cfg) if stage_name is not None else None

    uv = np.asarray(head.verts_uvs)
    verts_uv = jnp.asarray(np.stack([uv[:, 0], 1.0 - uv[:, 1]], -1))  # tracker.py:315-316
    fid2cid = jnp.asarray(head.masks.fid2cid)
    num_clusters = head.masks.num_clusters

    def energy(params: P.Params, batch: Dict, key) -> Tuple[jnp.ndarray, Tuple]:
        log: Dict[str, jnp.ndarray] = {}
        aux: Dict[str, jnp.ndarray] = {"gt_rgb": batch["rgb"]} if "rgb" in batch else {}
        ts = batch["timestep_index"]

        sliced = P.slice_batch(params, ts)
        B = ts.shape[0]
        verts, verts_cano, lmks = head(
            shape=jnp.broadcast_to(params["shape"][None], (B,) + params["shape"].shape),
            expr=sliced["expr"],
            rotation=sliced["rotation"],
            neck=sliced["neck_pose"],
            jaw=sliced["jaw_pose"],
            eyes=sliced["eyes_pose"],
            translation=sliced["translation"],
            return_verts_cano=True,
            static_offset=params.get("static_offset"),
            dynamic_offset=sliced.get("dynamic_offset"),
        )
        albedo = get_albedo(params)

        K, RT = fill_cam_params(batch, params, calibrated, image_size)

        if cfg.w.landmark is not None:
            e_lmk, lmk_aux = landmark_energy(
                batch, lmks, K, RT, image_size, disable_jawline,
                cfg.w.always_enable_jawline_landmarks)
            log["lmk"] = cfg.w.landmark * e_lmk
            aux.update(lmk_aux)

        render_out = None
        if enable_photo:
            rast_dict = rasterize_mesh(verts, head.faces, RT, K, render_size,
                                       settings, grad_enabled=True,
                                       with_attrs=False)
            if background == "target":
                bg = batch["rgb"]  # top-down; renderer flips to buffer space
            elif background == "white":
                bg = (1.0, 1.0, 1.0)
            else:
                bg = (0.0, 0.0, 0.0)
            render_out = render_rgba(
                rast_dict, head.faces, verts_uv, head.textures_idx,
                albedo,  # (1, C, T, T): shared across the batch (one mip pyramid)
                params["lights"][None] if "lights" in params else None,
                settings, bg, tex_mask, bnd_mask,
                enable_disturbance=enable_disturbance,
                fid2cid=fid2cid, num_clusters=num_clusters, key=key,
                sample_weight=batch["weight"])
            e_photo, photo_aux = photometric_energy(batch, render_out)
            log["photo"] = cfg.w.photo * e_photo
            aux.update(photo_aux)
            if with_aux:
                aux.update({k: v for k, v in render_out.items()})

        if stage_name is not None:
            log.update(regularization_energy(
                params, batch, verts, verts_cano, albedo, render_out,
                head, cfg, stage_name, opt, pre, n_timesteps))

        E_total = jnp.sum(jnp.stack([v for v in log.values()]))
        log["total"] = E_total
        if enable_photo:
            # monitor only (added after the total): dropped faces from
            # rasterizer tile-bin overflow plus foreground pixels beyond the
            # plane kernel's list cap — nonzero means holes/corrupted pixels
            # in the render; the tracker warns on it (nvdiffrast is exact)
            log["rast_overflow"] = (
                rast_dict["overflow"]
                + render_out.get("plane_overflow", 0)).astype(jnp.float32)
        if with_aux:
            aux.update({"verts": verts, "lmks": lmks, "albedo_map": albedo})
        return E_total, (log, aux)

    return energy

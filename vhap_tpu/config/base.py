"""Tracking configuration: nested dataclasses with reference-parity fields.

Mirrors the configuration surface of vhap/config/base.py (field names,
defaults, stage table and __post_init__ cross-field logic) so reference
recipes translate 1:1; CLI parsing is provided by vhap_tpu.config.cli
(tyro-equivalent flags like ``--model.n_shape 300`` or
``--model.no-use-static-offset``).
"""

from __future__ import annotations

import importlib
from dataclasses import dataclass, field, fields
from pathlib import Path
from typing import Literal, Optional, Tuple

from vhap_tpu.util.log import get_logger

logger = get_logger(__name__)


def import_module(module_name: str):
    """'pkg.mod.Class' -> Class (vhap/config/base.py:19-22)."""
    module_name, class_name = module_name.rsplit(".", 1)
    return getattr(importlib.import_module(module_name), class_name)


class Config:
    def __getitem__(self, name: str):
        if hasattr(self, name):
            return getattr(self, name)
        raise AttributeError(f"{self.__class__.__name__} has no attribute '{name}'")


@dataclass
class DataConfig(Config):
    root_folder: Path = Path(".")
    sequence: str = ""
    _target: str = "vhap_tpu.data.video_dataset.VideoDataset"
    division: Optional[str] = None
    subset: Optional[str] = None
    calibrated: bool = False
    align_cameras_to_axes: bool = True
    camera_convention_conversion: str = "opencv->opengl"
    target_extrinsic_type: Literal["w2c", "c2w"] = "w2c"
    n_downsample_rgb: Optional[int] = None
    scale_factor: float = 1.0
    background_color: Optional[Literal["white", "black"]] = "white"
    use_alpha_map: bool = False
    use_landmark: bool = True
    landmark_source: Optional[
        Literal["face-alignment", "star", "fan-jax", "star-jax"]] = "star"
    landmark_detector_njobs: int = 8


@dataclass
class ModelConfig(Config):
    n_shape: int = 300
    n_expr: int = 100
    n_tex: int = 100
    use_static_offset: bool = True
    use_dynamic_offset: bool = False
    add_teeth: bool = True
    remove_lip_inside: bool = False
    tex_resolution: int = 2048
    tex_painted: bool = True
    tex_extra: bool = True
    tex_clusters: Tuple[str, ...] = ("skin", "hair", "boundary", "lips_tight",
                                     "teeth", "sclerae", "irises")
    residual_tex: bool = True
    occluded: Tuple[str, ...] = ()
    flame_params_path: Optional[Path] = None
    asset_dir: Optional[Path] = None
    """Directory holding the FLAME asset files (vhap_tpu extension)."""


@dataclass
class RenderConfig(Config):
    backend: Literal["auto", "pallas", "xla"] = "auto"
    background_train: Literal["white", "black", "target"] = "target"
    disturb_rate_fg: Optional[float] = 0.5
    disturb_rate_bg: Optional[float] = 0.5
    background_eval: Literal["white", "black", "target"] = "target"
    lighting_type: Literal["constant", "front", "front-range", "SH"] = "SH"
    lighting_space: Literal["world", "camera"] = "world"
    # disturbance swap-pool subsample (1 = the reference's full pool).
    # Sampling a uniform candidate from a 1/4 block-contiguous subset is
    # statistically equivalent (the pool only seeds same-cluster swaps)
    # and quarters the 4M-pixel pool sort (-2.4 ms/step at bench shapes;
    # GT-recovery validated, docs/PERF.md round 5)
    disturb_pool_stride: int = 4
    # disturbance sampling machinery: 'pairswap' exchanges values within
    # adjacent pairs of a random same-cluster ordering (two dense sorts,
    # no 30 ms random HBM gather — docs/PERF.md round 5); 'sample' is the
    # literal reference port (uniform randint with replacement,
    # render_nvdiffrast.py:455). Statistically equivalent for this
    # regularizer; 'auto' = pairswap.
    disturb_impl: Literal["auto", "pairswap", "sample"] = "auto"
    # exact 8-tap texel gradients (nvdiffrast parity); the Pallas tap
    # kernel makes this FASTER than the straight-through approximations
    # (706 vs 884 ms/step at bs=16, 512^2 — docs/PERF.md)
    texture_grad_mode: Literal["trilinear", "bilinear", "nearest"] = "trilinear"
    # backward impl for exact trilinear texel grads: 'pallas' = MXU tap
    # scatter kernel (ops/texture_grad_pallas.py), 'xla' = scatter-add,
    # 'xla_fetch' = plain autodiff through the gather
    texture_grad_impl: Literal["auto", "pallas", "pallas_bf16", "xla",
                               "xla_fetch"] = "auto"
    # per-tile face-list capacity of the Pallas visibility kernel
    # (0 = adaptive; bin overflow is surfaced as rast_overflow)
    max_faces_per_tile: int = 0
    # per-pixel face-plane lookup backend: 'auto' = tile-local Pallas
    # kernel on TPU (vhap_tpu/ops/plane_pallas.py), XLA gather elsewhere
    plane_impl: Literal["auto", "pallas", "pallas_interpret", "xla"] = "auto"
    # list slots the plane kernel consults per tile (cost is linear in it;
    # 0 = the full face list, exact; foreground misses beyond a smaller cap
    # surface as rast_overflow)
    plane_max_list: int = 0
    # dtype of the render's color chain (shading/compositing/disturbance/
    # AA blending/photometric residual); geometry stays f32. 'auto' = bf16
    # on TPU, f32 elsewhere (see ops/render.py RenderSettings.color_dtype)
    color_dtype: Literal["auto", "bf16", "f32"] = "auto"
    # per-pixel attribute stage: 'fused' = deferred-interp Pallas kernel
    # (barycentrics + interpolation in-kernel, ops/interp_pallas.py),
    # 'planes' = raw-plane resolve + XLA math. 'auto' = fused on TPU
    # (hardware-verified: 281.5 -> 261.6 ms/step on the bench workload,
    # docs/PERF.md).
    interp_impl: Literal["auto", "fused", "fused_interpret",
                         "planes"] = "auto"
    # face-list structure for the fused-interp path: 'flat' = globally
    # budgeted flat work list (~4x less table traffic, no per-tile cap;
    # ops/rasterize.py bin_faces_flat), 'dense' = per-tile (T, K) lists.
    bin_mode: Literal["auto", "flat", "dense"] = "auto"
    # silhouette antialiasing (nvdiffrast-parity boundary gradients).
    # False skips the edge-blend pass (perf bounding / landmark-only
    # boundary alignment).
    antialias: bool = True
    # pad the raster canvas up to kernel-tile multiples (16, 128) when the
    # recipe's resolution is not divisible (e.g. the documented 802x550
    # NeRSemble config) so the train path keeps Pallas-kernel speed instead
    # of the ~3x slower XLA fallback; padded pixels are masked everywhere
    # and cropped from outputs (ops/render.py RenderSettings.crop_size)
    pad_to_tiles: bool = True
    # per-pixel buffer layout of the train render chain: 'tiled' keeps
    # texture coords, shading, compositing, disturbance, antialias and the
    # photometric residual on the rasterizer's (B, T, C, npx) tile layout
    # (no channel-last relayouts, no 20+ch untile — docs/PERF.md round 5);
    # 'image' restores (B, H, W, C) buffers. 'auto' = tiled whenever the
    # fused-interp kernel runs; eval/media always uses image layout.
    layout: Literal["auto", "tiled", "image"] = "auto"


@dataclass
class LearningRateConfig(Config):
    base: float = 5e-3
    translation: float = 1e-3
    expr: float = 5e-2
    static_offset: float = 5e-4
    dynamic_offset: float = 5e-4
    camera: float = 5e-3
    light: float = 5e-3


@dataclass
class LossWeightConfig(Config):
    landmark: Optional[float] = 10.0
    always_enable_jawline_landmarks: bool = True
    photo: Optional[float] = 30.0

    reg_shape: float = 3e-1
    reg_neck: float = 3e-1
    reg_jaw: float = 3e-1
    reg_eyes: float = 3e-2
    reg_expr: float = 3e-2

    reg_tex_res_clusters: Optional[float] = 1e1
    reg_tex_res_for: Tuple[str, ...] = ("sclerae", "teeth")
    reg_tex_tv: Optional[float] = 1e4
    reg_tex_pca: float = 1e-4

    reg_light: Optional[float] = None
    reg_diffuse: Optional[float] = 1e2

    reg_offset: Optional[float] = 3e2
    reg_offset_relax_coef: float = 1.0
    reg_offset_relax_for: Tuple[str, ...] = ("hair", "ears")

    reg_offset_lap: Optional[float] = 1e6
    reg_offset_lap_relax_coef: float = 0.1
    reg_offset_lap_relax_for: Tuple[str, ...] = ("hair", "ears")

    reg_offset_rigid: Optional[float] = 3e2
    reg_offset_rigid_for: Tuple[str, ...] = ("left_ear", "right_ear", "neck",
                                             "left_eye", "right_eye", "lips_tight")

    reg_offset_dynamic: Optional[float] = 3e5
    blur_iter: int = 0

    smooth_trans: float = 3e2
    smooth_rot: float = 3e1
    smooth_neck: float = 3e1
    smooth_jaw: float = 1e-1
    smooth_eyes: float = 0.0
    smooth_expr: float = 1e0


@dataclass
class LogConfig(Config):
    interval_scalar: Optional[int] = 100
    interval_media: Optional[int] = 500
    image_format: Literal["jpg", "png"] = "jpg"
    view_indices: Tuple[int, ...] = ()
    max_num_views: int = 3
    stack_views_in_rows: bool = True


@dataclass
class ExperimentConfig(Config):
    output_folder: Path = Path("output/track")
    reuse_landmarks: bool = True
    keyframes: Tuple[int, ...] = ()
    photometric: bool = True
    resume_run_state: Optional[Path] = None
    """Resume mid-run from a run_state.npz of a previous (interrupted) run
    (vhap_tpu extension: the reference only supports param warm-starts)."""
    num_devices: int = 0
    """Devices to shard the batch (frame/camera) axis over. 0 = all
    available; 1 = force single-device. The reference is single-GPU
    (vhap/config/base.py:329); this is the TPU-native scaling axis
    (SURVEY.md §7): batches partition on axis 0, parameters replicate,
    XLA inserts the gradient psum over ICI."""


@dataclass
class StageConfig(Config):
    disable_jawline_landmarks: bool = False


@dataclass
class StageLmkInitRigidConfig(StageConfig):
    num_steps: int = 500
    optimizable_params: Tuple[str, ...] = ("cam", "pose")


@dataclass
class StageLmkInitAllConfig(StageConfig):
    num_steps: int = 500
    optimizable_params: Tuple[str, ...] = ("cam", "pose", "shape", "joints", "expr")


@dataclass
class StageLmkSequentialTrackingConfig(StageConfig):
    num_steps: int = 50
    optimizable_params: Tuple[str, ...] = ("pose", "joints", "expr")


@dataclass
class StageLmkGlobalTrackingConfig(StageConfig):
    num_epochs: int = 30
    optimizable_params: Tuple[str, ...] = ("cam", "pose", "shape", "joints", "expr")


@dataclass
class PhotometricStageConfig(StageConfig):
    align_texture_except: Tuple[str, ...] = ()
    align_boundary_except: Tuple[str, ...] = ("bottomline",)


@dataclass
class StageRgbInitTextureConfig(PhotometricStageConfig):
    num_steps: int = 500
    optimizable_params: Tuple[str, ...] = ("cam", "shape", "texture", "lights")
    align_texture_except: Tuple[str, ...] = ("hair", "boundary", "neck")
    align_boundary_except: Tuple[str, ...] = ("hair", "boundary")


@dataclass
class StageRgbInitAllConfig(PhotometricStageConfig):
    num_steps: int = 500
    optimizable_params: Tuple[str, ...] = ("cam", "pose", "shape", "joints",
                                           "expr", "texture", "lights")
    disable_jawline_landmarks: bool = True
    align_texture_except: Tuple[str, ...] = ("hair", "boundary", "neck")
    align_boundary_except: Tuple[str, ...] = ("hair", "bottomline")


@dataclass
class StageRgbInitOffsetConfig(PhotometricStageConfig):
    num_steps: int = 500
    optimizable_params: Tuple[str, ...] = ("cam", "pose", "shape", "joints",
                                           "expr", "texture", "lights",
                                           "static_offset")
    disable_jawline_landmarks: bool = True
    align_texture_except: Tuple[str, ...] = ("hair", "boundary", "neck")


@dataclass
class StageRgbSequentialTrackingConfig(PhotometricStageConfig):
    num_steps: int = 50
    optimizable_params: Tuple[str, ...] = ("pose", "joints", "expr", "texture",
                                           "dynamic_offset")
    disable_jawline_landmarks: bool = True


@dataclass
class StageRgbGlobalTrackingConfig(PhotometricStageConfig):
    num_epochs: int = 30
    optimizable_params: Tuple[str, ...] = ("cam", "pose", "shape", "joints",
                                           "expr", "texture", "lights",
                                           "static_offset", "dynamic_offset")
    disable_jawline_landmarks: bool = True


@dataclass
class PipelineConfig(Config):
    lmk_init_rigid: StageLmkInitRigidConfig = field(default_factory=StageLmkInitRigidConfig)
    lmk_init_all: StageLmkInitAllConfig = field(default_factory=StageLmkInitAllConfig)
    lmk_sequential_tracking: StageLmkSequentialTrackingConfig = field(
        default_factory=StageLmkSequentialTrackingConfig)
    lmk_global_tracking: StageLmkGlobalTrackingConfig = field(
        default_factory=StageLmkGlobalTrackingConfig)
    rgb_init_texture: StageRgbInitTextureConfig = field(default_factory=StageRgbInitTextureConfig)
    rgb_init_all: StageRgbInitAllConfig = field(default_factory=StageRgbInitAllConfig)
    rgb_init_offset: StageRgbInitOffsetConfig = field(default_factory=StageRgbInitOffsetConfig)
    rgb_sequential_tracking: StageRgbSequentialTrackingConfig = field(
        default_factory=StageRgbSequentialTrackingConfig)
    rgb_global_tracking: StageRgbGlobalTrackingConfig = field(
        default_factory=StageRgbGlobalTrackingConfig)


@dataclass
class BaseTrackingConfig(Config):
    data: DataConfig = field(default_factory=DataConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    render: RenderConfig = field(default_factory=RenderConfig)
    log: LogConfig = field(default_factory=LogConfig)
    exp: ExperimentConfig = field(default_factory=ExperimentConfig)
    lr: LearningRateConfig = field(default_factory=LearningRateConfig)
    w: LossWeightConfig = field(default_factory=LossWeightConfig)
    pipeline: PipelineConfig = field(default_factory=PipelineConfig)

    begin_stage: Optional[str] = None
    begin_timestep: int = 0
    batch_size: Optional[int] = 16
    async_func: bool = True
    device: str = "tpu"

    def get_occluded(self):
        occluded_table = {}
        if self.data.sequence in occluded_table:
            logger.info(f"Automatically setting cfg.model.occluded to "
                        f"{occluded_table[self.data.sequence]}")
            self.model.occluded = occluded_table[self.data.sequence]

    def __post_init__(self):
        self.get_occluded()

        if not self.model.use_static_offset and not self.model.use_dynamic_offset:
            # without offsets, boundary alignment of hair is hopeless
            # (vhap/config/base.py:341-342)
            self.model.occluded = tuple(list(self.model.occluded) + ["hair"])

        for cfg_stage in self.pipeline.__dict__.values():
            if isinstance(cfg_stage, PhotometricStageConfig):
                cfg_stage.align_texture_except = tuple(
                    list(cfg_stage.align_texture_except) + list(self.model.occluded))
                cfg_stage.align_boundary_except = tuple(
                    list(cfg_stage.align_boundary_except) + list(self.model.occluded))

        if self.begin_stage is not None:
            assert self.begin_stage in self.pipeline.__dict__, (
                f"begin_stage {self.begin_stage} not found in pipeline")
            for stage, cfg_stage in self.pipeline.__dict__.items():
                if stage != self.begin_stage:
                    cfg_stage.num_steps = 0
                    logger.info(f"Skipping stage: {stage}")
                else:
                    logger.info(f"Starting stage: {stage}")
                    break

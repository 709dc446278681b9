"""Tracked FLAME parameters as a flat dict pytree.

The per-sequence parameter store of the reference tracker
(vhap/model/tracker.py:1279-1341) re-designed for JAX: one dict of arrays
whose per-frame leaves are (T, ...) tensors indexed by batch timesteps
inside the jitted step. Saved/loaded in the *reference npz schema*
(tracked_flame_params_*.npz, vhap/model/tracker.py:1152-1218) so archives
are interchangeable with the original pipeline and its GaussianAvatars
consumers.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from vhap_tpu.ops.shading import uniform_sh_lights
from vhap_tpu.util.log import get_logger

logger = get_logger(__name__)

Params = Dict[str, jnp.ndarray]

# per-frame leaves (first axis = timestep)
PER_FRAME = ("expr", "neck_pose", "jaw_pose", "eyes_pose",
             "translation", "rotation", "dynamic_offset")


def init_params(
    n_timesteps: int,
    n_shape: int,
    n_expr: int,
    n_tex: int,
    num_verts: int,
    tex_resolution: int,
    tex_painted: bool,
    tex_extra: bool,
    lighting_sh: bool,
    use_static_offset: bool,
    use_dynamic_offset: bool,
    calibrated: bool,
) -> Params:
    """Zero-initialized parameter dict (vhap/model/tracker.py:1279-1341)."""
    T = n_timesteps
    p: Params = {
        "shape": jnp.zeros((n_shape,), jnp.float32),
        "expr": jnp.zeros((T, n_expr), jnp.float32),
        "neck_pose": jnp.zeros((T, 3), jnp.float32),
        "jaw_pose": jnp.zeros((T, 3), jnp.float32),
        "eyes_pose": jnp.zeros((T, 6), jnp.float32),
        "translation": jnp.zeros((T, 3), jnp.float32),
        "rotation": jnp.zeros((T, 3), jnp.float32),
    }
    if not tex_painted:
        p["tex_pca"] = jnp.zeros((n_tex,), jnp.float32)
    if tex_extra:
        R = tex_resolution
        p["tex_extra"] = jnp.zeros((3, R, R), jnp.float32)
    if lighting_sh:
        p["lights"] = jnp.asarray(uniform_sh_lights())
    if use_static_offset:
        p["static_offset"] = jnp.zeros((1, num_verts, 3), jnp.float32)
    if use_dynamic_offset:
        p["dynamic_offset"] = jnp.zeros((T, num_verts, 3), jnp.float32)
    if not calibrated:
        # normalized focal length; denormalized by max(h, w) at use site
        # (vhap/model/tracker.py:1335, :153)
        p["focal_length"] = jnp.asarray([1.5], jnp.float32)
    return p


def slice_batch(params: Params, timesteps: jnp.ndarray) -> Params:
    """Gather per-frame leaves at `timesteps`; shared leaves pass through."""
    out = {}
    for k, v in params.items():
        out[k] = v[timesteps] if k in PER_FRAME else v
    return out


def copy_forward(params: Params, t_src: int, t_targets: jnp.ndarray) -> Params:
    """Warm-start: copy frame t_src's params into t_targets
    (initialize_next_timtestep, vhap/model/tracker.py:1515-1529)."""
    out = dict(params)
    for k in PER_FRAME:
        if k in out:
            src = out[k][t_src]
            out[k] = out[k].at[t_targets].set(src)
    return out


# ---------------------------------------------------------------------------
# Reference-schema npz checkpointing
# ---------------------------------------------------------------------------

def save_result(params: Params, out_path: Path, timestep_ids, n_processed,
                image_size, calibrated: bool, tex_painted: bool) -> Path:
    """Write tracked_flame_params npz (vhap/model/tracker.py:1152-1218)."""
    export = {
        "rotation": np.asarray(params["rotation"]),
        "translation": np.asarray(params["translation"]),
        "neck_pose": np.asarray(params["neck_pose"]),
        "jaw_pose": np.asarray(params["jaw_pose"]),
        "eyes_pose": np.asarray(params["eyes_pose"]),
        "shape": np.asarray(params["shape"]),
        "expr": np.asarray(params["expr"]),
        "timestep_id": np.asarray(timestep_ids),
        "n_processed_frames": np.asarray(n_processed),
        "image_size": np.asarray(image_size),
    }
    if not calibrated and "focal_length" in params:
        export["focal_length"] = np.asarray(params["focal_length"])
    if not tex_painted and "tex_pca" in params:
        export["tex"] = np.asarray(params["tex_pca"])
    if "tex_extra" in params:
        export["tex_extra"] = np.asarray(params["tex_extra"])
    if "lights" in params:
        export["lights"] = np.asarray(params["lights"])
    if "static_offset" in params:
        export["static_offset"] = np.asarray(params["static_offset"])
    if "dynamic_offset" in params:
        export["dynamic_offset"] = np.asarray(params["dynamic_offset"])
    out_path = Path(out_path)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    np.savez(out_path, **export)
    return out_path


def load_from_tracked_flame_params(params: Params, fp: Path) -> Params:
    """Warm-start from a reference-schema npz
    (vhap/model/tracker.py:79-129). Leaves missing from the archive keep
    their current values; per-frame arrays are loaded up to min length."""
    report = np.load(fp)
    out = dict(params)

    def load_full(key, npz_key):
        if key in out and npz_key in report:
            arr = np.asarray(report[npz_key], np.float32)
            if out[key].shape == arr.shape:
                out[key] = jnp.asarray(arr)
            else:
                logger.warning(f"shape mismatch for {key}: {out[key].shape} vs {arr.shape}")

    def load_per_frame(key, npz_key):
        if key in out and npz_key in report:
            arr = np.asarray(report[npz_key], np.float32)
            n = min(out[key].shape[0], arr.shape[0])
            out[key] = out[key].at[:n].set(jnp.asarray(arr[:n]))

    for k in ("rotation", "translation", "neck_pose", "jaw_pose", "eyes_pose", "expr"):
        load_per_frame(k, k)
    load_full("shape", "shape")
    load_full("lights", "lights")
    load_full("focal_length", "focal_length")
    load_full("tex_pca", "tex")
    load_full("tex_extra", "tex_extra")
    load_full("static_offset", "static_offset")
    load_per_frame("dynamic_offset", "dynamic_offset")
    missing = [k for k in ("tex_extra", "static_offset")
               if k in out and k not in report]
    for k in missing:
        logger.warning(f"No {k} found in flame_params!")
    return out

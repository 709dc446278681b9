"""Per-leaf Adam with stage-dependent optimizable subsets.

Replaces torch param groups (vhap/model/tracker.py:159-211) with a leaf ->
learning-rate map applied after optax's scale_by_adam; the per-epoch
ExponentialLR of the global stage (tracker.py:1408) becomes a traced
`lr_factor` argument so one compiled step serves all epochs.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Dict, FrozenSet, Tuple

import jax
import jax.numpy as jnp
import optax

from vhap_tpu.config.base import BaseTrackingConfig
from vhap_tpu.tracker import params as P


def leaf_learning_rates(cfg: BaseTrackingConfig) -> Dict[str, float]:
    """Leaf name -> lr (group table at vhap/model/tracker.py:171-202)."""
    lr = cfg.lr
    return {
        "shape": lr.base,
        "rotation": lr.base,
        "neck_pose": lr.base,
        "jaw_pose": lr.base,
        "eyes_pose": lr.base,
        "tex_pca": lr.base,
        "tex_extra": lr.base,
        "translation": lr.translation,
        "expr": lr.expr,
        "lights": lr.light,
        "focal_length": lr.camera,
        "static_offset": lr.static_offset,
        "dynamic_offset": lr.dynamic_offset,
    }


def stage_optimizable_leaves(cfg: BaseTrackingConfig, stage_name: str,
                             params: P.Params) -> FrozenSet[str]:
    """optimizable_params groups -> parameter leaves
    (get_train_parameters, vhap/model/tracker.py:1465-1513)."""
    opt = set(cfg.pipeline[stage_name].optimizable_params)
    leaves = set()
    if "cam" in opt and not cfg.data.calibrated and "focal_length" in params:
        leaves.add("focal_length")
    if "shape" in opt:
        leaves.add("shape")
    if "texture" in opt:
        if not cfg.model.tex_painted and "tex_pca" in params:
            leaves.add("tex_pca")
        if cfg.model.tex_extra and "tex_extra" in params:
            leaves.add("tex_extra")
    if "static_offset" in opt and "static_offset" in params:
        leaves.add("static_offset")
    if "lights" in opt and "lights" in params:
        leaves.add("lights")
    if "pose" in opt:
        leaves.update(("translation", "rotation"))
    if "joints" in opt:
        leaves.update(("eyes_pose", "neck_pose", "jaw_pose"))
    if "expr" in opt:
        leaves.add("expr")
    if "dynamic_offset" in opt and "dynamic_offset" in params:
        leaves.add("dynamic_offset")
    return frozenset(leaves)


def make_train_step(
    energy_fn: Callable,
    opt_leaves: FrozenSet[str],
    lr_map: Dict[str, float],
    lr_scale: float = 1.0,
) -> Tuple[Callable, Callable]:
    """Returns (init_opt_state(params), step(params, opt_state, batch, key,
    lr_factor)). The step is jitted with donated params/opt_state.

    Adam matches torch defaults: betas (0.9, 0.999), eps 1e-8
    (torch.optim.Adam at vhap/model/tracker.py:210).
    """
    adam = optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8)
    opt_keys = tuple(sorted(opt_leaves))

    def init_opt_state(params: P.Params):
        return adam.init({k: params[k] for k in opt_keys})

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, batch, key, lr_factor):
        opt_params = {k: params[k] for k in opt_keys}
        frozen = {k: v for k, v in params.items() if k not in opt_leaves}

        def loss_fn(op):
            E, (log, _aux) = energy_fn({**frozen, **op}, batch, key)
            return E, log

        (E, log), grads = jax.value_and_grad(loss_fn, has_aux=True)(opt_params)
        updates, opt_state = adam.update(grads, opt_state, opt_params)
        new = {k: opt_params[k] + (-lr_map[k] * lr_scale) * lr_factor * updates[k]
               for k in opt_keys}
        params = {**frozen, **new}
        return params, opt_state, E, log

    return init_opt_state, step

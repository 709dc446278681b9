"""The photometric gradient chain must pull pose toward the ground truth.

This validates the full differentiable-render path (rasterize -> attrs ->
interpolate -> texture -> shade -> antialias -> loss) end-to-end as an
alignment signal, not just per-op finite differences.
"""

from pathlib import Path

import numpy as np
import pytest
import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def photo_setup(tmp_path_factory):
    from vhap_tpu.config.base import BaseTrackingConfig
    from vhap_tpu.tools.make_synthetic_sequence import generate
    from vhap_tpu.tracker.tracker import GlobalTracker

    root = tmp_path_factory.mktemp("pg")
    gt = generate(root / "seq", n_frames=2, size=128, n_shape=20, n_expr=10)

    cfg = BaseTrackingConfig()
    cfg.data.root_folder = root
    cfg.data.sequence = "seq"
    cfg.data.background_color = None
    cfg.model.n_shape, cfg.model.n_expr = 20, 10
    cfg.model.add_teeth = False
    cfg.model.use_static_offset = False
    cfg.model.tex_resolution = 128
    cfg.exp.output_folder = root / "out"
    cfg.batch_size = 2
    cfg.render.backend = "xla"
    cfg.log.interval_scalar = 10 ** 9
    cfg.log.interval_media = 10 ** 9
    cfg.__post_init__()
    tr = GlobalTracker(cfg)
    # start from ground truth
    tr.params["shape"] = jnp.asarray(gt["shape"])
    for k in ("expr", "rotation", "neck_pose", "jaw_pose", "eyes_pose",
              "translation"):
        tr.params[k] = jnp.asarray(gt[k])
    tr.params["focal_length"] = jnp.asarray([1.5])
    return tr, gt


def _photo_loss_fn(tr, batch):
    from vhap_tpu.tracker.energy import make_energy_fn
    energy = make_energy_fn(tr.head, tr.cfg, tr.get_albedo, tr.image_size,
                            tr.n_timesteps, None)

    def loss(translation):
        p = dict(tr.params)
        p["translation"] = translation
        E, (log, _aux) = energy(p, batch, jax.random.PRNGKey(0))
        return log["photo"]

    return loss


@pytest.mark.parametrize("axis,delta", [(0, 0.004), (1, -0.004), (2, 0.01)])
def test_photometric_gradient_points_home(photo_setup, axis, delta):
    tr, gt = photo_setup
    batch = tr._make_batch([0, 1])
    loss = _photo_loss_fn(tr, batch)

    t_gt = jnp.asarray(gt["translation"])
    t_off = t_gt.at[:, axis].add(delta)

    # loss increases away from GT, and the gradient points back
    l_gt = float(loss(t_gt))
    l_off = float(loss(t_off))
    assert l_off > l_gt, (l_gt, l_off)

    g = jax.grad(lambda t: loss(t))(t_off)
    # descending along -g must reduce the offset: g on the perturbed axis
    # has the same sign as the perturbation
    assert float(g[0, axis]) * np.sign(delta) > 0


def test_bf16_color_chain_matches_f32(photo_setup):
    """color_dtype='bf16' (the TPU default) must keep the photometric
    loss within the bf16 envelope of the f32 chain and preserve the
    gradient direction (geometry stays f32 — only colors quantize)."""
    import copy
    from vhap_tpu.tracker.energy import make_energy_fn

    tr, gt = photo_setup
    batch = tr._make_batch([0, 1])
    key = jax.random.PRNGKey(0)

    def build(color_dtype):
        cfg = copy.deepcopy(tr.cfg)
        cfg.render.color_dtype = color_dtype
        energy = make_energy_fn(tr.head, cfg, tr.get_albedo, tr.image_size,
                                tr.n_timesteps, None)

        def loss(translation):
            p = dict(tr.params)
            p["translation"] = translation
            E, (log, _aux) = energy(p, batch, key)
            return log["photo"]

        return loss

    t_off = jnp.asarray(gt["translation"]).at[:, 0].add(0.004)
    l32, g32 = jax.value_and_grad(build("f32"))(t_off)
    l16, g16 = jax.value_and_grad(build("bf16"))(t_off)
    assert np.isfinite(float(l16)) and np.isfinite(np.asarray(g16)).all()
    # loss parity within the bf16 rounding envelope of a 0..1 residual
    assert abs(float(l16) - float(l32)) < 0.02 * max(float(l32), 1e-3)
    # translation gradient agrees in direction and rough magnitude
    c = float(jnp.sum(g16 * g32) /
              jnp.maximum(jnp.linalg.norm(g16) * jnp.linalg.norm(g32), 1e-12))
    assert c > 0.98, c

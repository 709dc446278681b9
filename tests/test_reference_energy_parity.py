"""Energy-term golden tests against the ACTUAL reference implementation.

Runs the reference's energy methods (vhap/model/tracker.py, torch CPU,
via tests/ref_compat.py stubs for absent pip deps) next to vhap_tpu's
functional energy stack on shared random inputs and asserts per-term
numeric agreement:

  * landmark loss incl. nose x10 / jawline gating (tracker.py:347-389)
  * photometric normalization |err|.sum()/mask.sum() (tracker.py:438-439)
  * every regularizer (tracker.py:480-690): pose/joint/expr smoothness,
    joint L2 prior in rotmat space with the (2B-1)-mean quirk + jaw/eyes
    physical priors, shape/expr/tex-PCA L2, texture TV with
    scale-compensated weight, per-cluster residual-tex L2, SH-light and
    diffuse regs, offset norm/Laplacian/rigid/dynamic with per-region
    relaxation and the vertex-weight blur (tracker.py:607-614)

The stubbed pieces (pytorch3d Laplacian uses the same uniform-Laplacian
math both sides, nvdiffrast is never reached) are not what these tests
measure — the reference FORMULAS run unmodified.
"""

import dataclasses
import functools
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ref_compat import (add_ref_path, install_all_stubs,
                        uniform_laplacian_dense)

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def refE():
    undo = install_all_stubs()
    yield
    undo()


@pytest.fixture(scope="module")
def shared(refE):
    """Shared head + config + random params/batch for both frameworks."""
    from vhap_tpu.config.base import (BaseTrackingConfig, DataConfig,
                                      LossWeightConfig, ModelConfig,
                                      RenderConfig)
    from vhap_tpu.model.assets import load_flame_assets
    from vhap_tpu.model.flame import FlameHead

    rng = np.random.default_rng(1234)
    R = 64  # texture/uvmask resolution (kept equal: the reference never resizes)
    assets = load_flame_assets(asset_dir="/nonexistent_force_synth",
                               allow_synthetic=True, seed=0)
    assets = dataclasses.replace(
        assets,
        uv_masks={"sclerae": rng.uniform(size=(R, R)) > 0.7,
                  "teeth": rng.uniform(size=(R, R)) > 0.9})
    head = FlameHead.build(n_shape=20, n_expr=10, assets=assets,
                           add_teeth=False)
    V = head.num_verts

    # regions must exist in the synthetic masks with >= 2 verts so the
    # rigid/relax terms are nonzero and NaN-free on both sides
    present = [r for r in ("hair", "ears", "left_ear", "right_ear", "neck",
                           "left_eye", "right_eye", "lips_tight")
               if r in head.masks.v
               and len(head.masks.get_vid_by_region([r])) >= 2]
    assert len(present) >= 2, "synthetic masks too sparse for this test"

    cfg = BaseTrackingConfig(
        data=DataConfig(calibrated=False, scale_factor=0.5, n_downsample_rgb=2),
        model=ModelConfig(n_shape=20, n_expr=10, tex_resolution=R,
                          tex_painted=False, tex_extra=True, residual_tex=True,
                          use_static_offset=True, use_dynamic_offset=True),
        render=RenderConfig(lighting_type="SH"),
        w=LossWeightConfig(
            # blur_iter stays 0 here: with B > 1 the REFERENCE blur path
            # crashes (M (1,V,V) bmm weights (B,V,1), tracker.py:611-613);
            # the B=1 blur test below exercises it
            reg_light=2.0, blur_iter=0,
            reg_offset_relax_for=tuple(present[:2]),
            reg_offset_lap_relax_for=tuple(present[:2]),
            reg_offset_rigid_for=tuple(present)),
    )

    T, B = 5, 3
    ts = np.array([0, 2, 4])
    params = {
        "shape": rng.standard_normal(20).astype(np.float32) * 0.5,
        "expr": rng.standard_normal((T, 10)).astype(np.float32) * 0.5,
        "neck_pose": rng.standard_normal((T, 3)).astype(np.float32) * 0.2,
        "jaw_pose": rng.standard_normal((T, 3)).astype(np.float32) * 0.2,
        "eyes_pose": rng.standard_normal((T, 6)).astype(np.float32) * 0.2,
        "translation": rng.standard_normal((T, 3)).astype(np.float32) * 0.1,
        "rotation": rng.standard_normal((T, 3)).astype(np.float32) * 0.3,
        "tex_pca": rng.standard_normal(100).astype(np.float32),
        "tex_extra": rng.standard_normal((3, R, R)).astype(np.float32) * 0.1,
        "lights": rng.standard_normal((9, 3)).astype(np.float32) * 0.3,
        "static_offset": rng.standard_normal((1, V, 3)).astype(np.float32) * 0.002,
        "dynamic_offset": rng.standard_normal((T, V, 3)).astype(np.float32) * 0.001,
    }
    H, W = 24, 20
    batch = {
        "rgb": rng.uniform(size=(B, H, W, 3)).astype(np.float32),
        "timestep_index": ts,
        "weight": np.ones(B, np.float32),
    }
    verts = rng.standard_normal((B, V, 3)).astype(np.float32) * 0.1
    verts_cano = rng.standard_normal((B, V, 3)).astype(np.float32) * 0.1
    albedo = rng.uniform(size=(1, 3, R, R)).astype(np.float32)
    diffuse = rng.uniform(0.0, 1.3, size=(B, H, W, 3)).astype(np.float32)
    return dict(head=head, cfg=cfg, params=params, batch=batch, ts=ts,
                verts=verts, verts_cano=verts_cano, albedo=albedo,
                diffuse=diffuse, T=T, B=B, V=V, R=R, rng=rng)


# ---------------------------------------------------------------------------
# landmark energy (tracker.py:347-389)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("always,disable,kfmt", [
    (True, False, "3x3"), (False, True, "3x3"), (False, False, "3x3"),
    (True, False, "flat"),  # (1, 4) [fx,fy,cx,cy]: the monocular K path
])
def test_lmk_energy_parity(refE, always, disable, kfmt):
    from vhap.model.tracker import FlameTracker
    from vhap.util.render_nvdiffrast import NVDiffRenderer

    from vhap_tpu.tracker.energy import landmark_energy

    rng = np.random.default_rng(5)
    # the reference's (N, 4) intrinsics path only broadcasts for N == 1
    # (render_nvdiffrast.py:148-153), matching its monocular usage
    B, L, H, W = (1 if kfmt == "flat" else 3), 70, 128, 96
    lmk2d = np.concatenate([
        rng.uniform(0, W, (B, L, 1)), rng.uniform(0, H, (B, L, 1)),
        rng.uniform(0.3, 1.0, (B, L, 1))], -1).astype(np.float32)
    pred = rng.standard_normal((B, L, 3)).astype(np.float32) * 0.2
    pred[..., 2] -= 1.0  # in front of the camera
    if kfmt == "flat":
        K = np.array([[400.0, 410.0, W / 2, H / 2]], np.float32)
    else:
        K = np.zeros((B, 3, 3), np.float32)
        K[:, 0, 0], K[:, 1, 1] = 400.0, 410.0
        K[:, 0, 2], K[:, 1, 2] = W / 2 + 3.0, H / 2 - 2.0
        K[:, 2, 2] = 1.0
    RT = np.broadcast_to(np.eye(3, 4, dtype=np.float32), (B, 3, 4)).copy()
    RT[:, 2, 3] = -1.0

    stub = types.SimpleNamespace(
        cfg=types.SimpleNamespace(w=types.SimpleNamespace(
            always_enable_jawline_landmarks=always)),
        device="cpu",
        render=object.__new__(NVDiffRenderer),
    )
    sample = {"rgb": torch.zeros(B, 3, H, W),
              "lmk2d": torch.as_tensor(lmk2d),
              "intrinsic": torch.as_tensor(K),
              "extrinsic": torch.as_tensor(RT)}
    e_ref, aux_ref = FlameTracker.compute_lmk_energy(
        stub, sample, torch.as_tensor(pred), disable)

    batch = {"lmk2d": jnp.asarray(lmk2d),
             "weight": jnp.ones(B, jnp.float32)}
    e_jax, aux_jax = landmark_energy(
        batch, jnp.asarray(pred), jnp.asarray(K), jnp.asarray(RT), (H, W),
        disable, always)

    np.testing.assert_allclose(float(e_jax), float(e_ref), rtol=2e-6)
    np.testing.assert_allclose(np.asarray(aux_jax["pred_lmk2d"]),
                               aux_ref["pred_lmk2d"].numpy(), atol=1e-5)


# ---------------------------------------------------------------------------
# photometric normalization (tracker.py:438-439)
# ---------------------------------------------------------------------------

def test_photometric_normalization_parity(refE):
    from vhap.model.tracker import FlameTracker

    from vhap_tpu.tracker.energy import photometric_energy

    rng = np.random.default_rng(6)
    B, H, W = 2, 24, 20
    gt = rng.uniform(size=(B, 3, H, W)).astype(np.float32)
    pred_rgb = rng.uniform(size=(B, 3, H, W)).astype(np.float32)
    alpha = (rng.uniform(size=(B, 1, H, W)) > 0.4).astype(np.float32)
    rgba = np.concatenate([pred_rgb, alpha], axis=1)

    stub = types.SimpleNamespace(
        cfg=types.SimpleNamespace(render=types.SimpleNamespace(
            background_eval="white", background_train="white")),
        lights=None,
        flame=types.SimpleNamespace(mask=None),
        render_rgba=lambda *a, **k: {"rgba": torch.as_tensor(rgba)},
    )
    stub.get_background_color = functools.partial(
        FlameTracker.get_background_color, stub)
    sample = {"rgb": torch.as_tensor(gt)}
    e_ref, _ = FlameTracker.compute_photometric_energy(
        stub, sample, torch.zeros(1), None, None, None, stage=None)

    batch = {"rgb": jnp.asarray(np.moveaxis(gt, 1, -1)),
             "weight": jnp.ones(B, jnp.float32)}
    render_out = {"rgba": jnp.asarray(np.moveaxis(rgba, 1, -1))}
    e_jax, _ = photometric_energy(batch, render_out)

    np.testing.assert_allclose(float(e_jax), float(e_ref), rtol=2e-6)


# ---------------------------------------------------------------------------
# full regularizer stack (tracker.py:480-690)
# ---------------------------------------------------------------------------

def _ref_reg_stub(shared):
    """Duck-typed `self` for FlameTracker.compute_regularization_energy."""
    from vhap.model.tracker import FlameTracker

    from vhap_tpu.ops.shading import uniform_sh_lights

    head, cfg, p = shared["head"], shared["cfg"], shared["params"]
    V = shared["V"]
    L = uniform_laplacian_dense(V, np.asarray(head.faces))
    Lt = torch.as_tensor(L)
    negate = Lt - 2.0 * torch.diag(torch.diag(Lt))
    masks = head.masks

    def get_vid(regions):
        if isinstance(regions, str):
            regions = [regions]
        return masks.get_vid_by_region([r for r in regions if r in masks.v])

    def get_uvmask(regions):
        return torch.as_tensor(
            np.asarray(head.uv_masks.get_uvmask_by_region(regions), bool))

    stub = types.SimpleNamespace(
        opt_dict={k: True for k in ("cam", "pose", "shape", "joints", "expr",
                                    "texture", "lights", "static_offset",
                                    "dynamic_offset")},
        cfg=cfg,
        n_timesteps=shared["T"],
        device="cpu",
        shape=torch.as_tensor(p["shape"]),
        expr=torch.as_tensor(p["expr"]),
        neck_pose=torch.as_tensor(p["neck_pose"]),
        jaw_pose=torch.as_tensor(p["jaw_pose"]),
        eyes_pose=torch.as_tensor(p["eyes_pose"]),
        translation=torch.as_tensor(p["translation"]),
        rotation=torch.as_tensor(p["rotation"]),
        tex_pca=torch.as_tensor(p["tex_pca"]),
        tex_extra=torch.as_tensor(p["tex_extra"]),
        lights=torch.as_tensor(p["lights"]),
        lights_uniform=torch.as_tensor(uniform_sh_lights()),
        static_offset=torch.as_tensor(p["static_offset"]),
        dynamic_offset=torch.as_tensor(p["dynamic_offset"]),
        get_albedo=lambda: torch.as_tensor(shared["albedo"]),
        flame=types.SimpleNamespace(
            mask=types.SimpleNamespace(get_vid_by_region=get_vid),
            laplacian_matrix=Lt,
            laplacian_matrix_negate_diag=negate,
        ),
        flame_uvmask=types.SimpleNamespace(get_uvmask_by_region=get_uvmask),
    )
    for m in ("compute_pose_smooth_energy", "compute_joint_smooth_energy",
              "compute_expr_smooth_energy", "compute_joint_L2_energy",
              "compute_laplacian_smoothing_loss",
              "scale_vertex_weights_by_region"):
        setattr(stub, m, functools.partial(getattr(FlameTracker, m), stub))
    return stub


@pytest.mark.parametrize("offsets", ["static", "dynamic"])
def test_regularization_energy_parity(refE, shared, offsets):
    """All regularizer terms vs the reference, static- and dynamic-offset
    variants. (Both offsets at once crash the REFERENCE itself: an
    in-place broadcast at vhap/model/tracker.py:557-559 — `offset` is the
    (1,V,3) static tensor, `offset += dynamic[ts]` can't expand it to
    (B,V,3). vhap_tpu supports the combination; divergence noted in
    docs/PARITY.md.)"""
    from vhap.model.tracker import FlameTracker

    from vhap_tpu.tracker.energy import (build_reg_precomputed,
                                         regularization_energy)

    head, cfg = shared["head"], shared["cfg"]
    batch, ts = shared["batch"], shared["ts"]
    p = dict(shared["params"])
    del p["static_offset" if offsets == "dynamic" else "dynamic_offset"]
    diffuse = shared["diffuse"]

    # ---- reference side (channel-first tensors) ----
    stub = _ref_reg_stub(shared)
    if offsets == "static":
        stub.dynamic_offset = None
    else:
        stub.static_offset = None
    result_dict = {
        "diffuse_detach_normal": torch.as_tensor(np.moveaxis(diffuse, -1, 1)),
    }
    ref_log = FlameTracker.compute_regularization_energy(
        stub, result_dict,
        torch.as_tensor(shared["verts"]), torch.as_tensor(shared["verts_cano"]),
        None, torch.as_tensor(shared["albedo"]), ts,
        stage="rgb_sequential_tracking")
    ref_log = {k: float(v) for k, v in ref_log.items()}

    # ---- vhap_tpu side ----
    opt = {k: True for k in ("cam", "pose", "shape", "joints", "expr",
                             "texture", "lights", "static_offset",
                             "dynamic_offset")}
    pre = build_reg_precomputed(head, cfg)
    jparams = {k: jnp.asarray(v) for k, v in p.items()}
    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
    render_out = {"diffuse_detach_normal": jnp.asarray(diffuse)}
    jax_log = regularization_energy(
        jparams, jbatch, jnp.asarray(shared["verts"]),
        jnp.asarray(shared["verts_cano"]), jnp.asarray(shared["albedo"]),
        render_out, head, cfg, "rgb_sequential_tracking", opt, pre,
        shared["T"])
    jax_log = {k: float(v) for k, v in jax_log.items()}

    assert set(jax_log) == set(ref_log), (
        f"term keys diverge: only_jax={set(jax_log) - set(ref_log)}, "
        f"only_ref={set(ref_log) - set(jax_log)}")
    for k in sorted(ref_log):
        np.testing.assert_allclose(
            jax_log[k], ref_log[k], rtol=3e-5, atol=1e-7,
            err_msg=f"regularizer term '{k}' diverges from the reference")


def test_vertex_weight_blur_parity(refE, shared):
    """The region-relaxation weight blur (tracker.py:607-614) at B=1 (the
    only batch size where the reference's (1,V,V) bmm works)."""
    from vhap.model.tracker import FlameTracker

    from vhap_tpu.tracker.energy import build_reg_precomputed

    head, cfg = shared["head"], shared["cfg"]
    cfg2 = dataclasses.replace(cfg, w=dataclasses.replace(cfg.w, blur_iter=2))

    stub = _ref_reg_stub(shared)
    stub.cfg = cfg2
    w0 = torch.ones(1, shared["V"], 1)
    w_ref = stub.scale_vertex_weights_by_region(
        weights=w0, scale_factor=cfg2.w.reg_offset_lap_relax_coef,
        region=list(cfg2.w.reg_offset_lap_relax_for))

    pre = build_reg_precomputed(head, cfg2)
    np.testing.assert_allclose(pre.offset_lap_relax_w[None],
                               w_ref.numpy(), atol=1e-6)


def test_regularization_energy_parity_lmk_stage(refE, shared):
    """Landmark-stage gating: no texture/lights/offset terms, smooth terms
    present only in 'tracking' stages."""
    from vhap.model.tracker import FlameTracker

    from vhap_tpu.tracker.energy import (build_reg_precomputed,
                                         regularization_energy)

    head, cfg = shared["head"], shared["cfg"]
    p, batch, ts = shared["params"], shared["batch"], shared["ts"]

    on = ("pose", "joints", "expr")
    stub = _ref_reg_stub(shared)
    stub.opt_dict = {k: k in on for k in (
        "cam", "pose", "shape", "joints", "expr", "texture", "lights",
        "static_offset", "dynamic_offset")}
    for stage in ("lmk_init_rigid", "lmk_sequential_tracking"):
        ref_log = FlameTracker.compute_regularization_energy(
            stub, {}, torch.as_tensor(shared["verts"]),
            torch.as_tensor(shared["verts_cano"]), None,
            torch.as_tensor(shared["albedo"]), ts, stage=stage)
        ref_log = {k: float(v) for k, v in ref_log.items()}

        opt = dict(stub.opt_dict)
        pre = build_reg_precomputed(head, cfg)
        jax_log = regularization_energy(
            {k: jnp.asarray(v) for k, v in p.items()},
            {k: jnp.asarray(v) for k, v in batch.items()},
            jnp.asarray(shared["verts"]), jnp.asarray(shared["verts_cano"]),
            jnp.asarray(shared["albedo"]), None, head, cfg, stage, opt, pre,
            shared["T"])
        jax_log = {k: float(v) for k, v in jax_log.items()}

        assert set(jax_log) == set(ref_log), (stage, set(jax_log),
                                              set(ref_log))
        for k in sorted(ref_log):
            np.testing.assert_allclose(jax_log[k], ref_log[k], rtol=3e-5,
                                       atol=1e-7, err_msg=f"{stage}/{k}")

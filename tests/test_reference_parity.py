"""Direct numeric parity against the reference implementation.

Runs the ACTUAL reference code from /root/reference (torch CPU) next to
vhap_tpu on shared synthetic FLAME weights and asserts agreement:

  * batch_rodrigues / blend_shapes / lbs / vertices2landmarks
    (vhap/model/lbs.py:25-304 vs vhap_tpu/model/lbs.py)
  * FlameHead.forward incl. static/dynamic offsets
    (vhap/model/flame.py:571-646 vs vhap_tpu/model/flame.py)
  * camera convention math (vhap/util/camera.py vs vhap_tpu/util/camera_np.py)

The license-gated FLAME pickle is absent in this image, so the shared
weights are vhap_tpu's synthetic stand-ins serialized into the reference's
file formats; pytorch3d (absent) is stubbed with a minimal load_obj /
Meshes shim — the stubbed pieces (OBJ parsing, Laplacian) are not what
these tests measure.
"""

import pickle
import sys
import types
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REF = "/root/reference"


def _install_pytorch3d_stub():
    if "pytorch3d" in sys.modules:
        return
    import torch

    from vhap_tpu.model.assets import parse_obj

    def load_obj(path, load_textures=False):
        v, f, uv, ft = parse_obj(Path(path))
        faces = types.SimpleNamespace(
            verts_idx=torch.as_tensor(np.asarray(f, np.int64)),
            textures_idx=torch.as_tensor(np.asarray(ft, np.int64)))
        aux = types.SimpleNamespace(
            verts_uvs=torch.as_tensor(np.asarray(uv, np.float32)))
        return torch.as_tensor(np.asarray(v, np.float32)), faces, aux

    class Meshes:
        def __init__(self, verts, faces):
            self._V = verts[0].shape[0]

        def laplacian_packed(self):
            import torch as t
            # forward parity does not touch the Laplacian buffers; an empty
            # sparse matrix keeps construction cheap
            i = t.zeros((2, 0), dtype=t.long)
            v = t.zeros((0,), dtype=t.float32)
            return t.sparse_coo_tensor(i, v, (self._V, self._V))

    root = types.ModuleType("pytorch3d")
    io_mod = types.ModuleType("pytorch3d.io")
    io_mod.load_obj = load_obj
    st_mod = types.ModuleType("pytorch3d.structures")
    me_mod = types.ModuleType("pytorch3d.structures.meshes")
    me_mod.Meshes = Meshes
    st_mod.meshes = me_mod
    st_mod.Meshes = Meshes
    root.io = io_mod
    root.structures = st_mod
    sys.modules.update({
        "pytorch3d": root, "pytorch3d.io": io_mod,
        "pytorch3d.structures": st_mod, "pytorch3d.structures.meshes": me_mod,
    })


@pytest.fixture(scope="module")
def ref_env(tmp_path_factory):
    """Reference modules + shared assets serialized in reference formats."""
    if REF not in sys.path:
        sys.path.insert(0, REF)
    _install_pytorch3d_stub()

    from vhap_tpu.model.assets import load_flame_assets
    assets = load_flame_assets(allow_synthetic=True, seed=0)

    tmp = tmp_path_factory.mktemp("ref_assets")
    V = assets.num_verts
    # reference pickle schema (vhap/model/flame.py:95-125); posedirs stored
    # (V, 3, P) exactly as FLAME pickles do
    model = dict(
        v_template=np.asarray(assets.v_template, np.float64),
        shapedirs=np.asarray(assets.shapedirs, np.float64),
        posedirs=np.asarray(assets.posedirs, np.float64),
        J_regressor=np.asarray(assets.J_regressor, np.float64),
        kintree_table=np.stack([
            np.where(assets.parents < 0, 4294967295, assets.parents),
            np.arange(len(assets.parents))]).astype(np.int64),
        weights=np.asarray(assets.lbs_weights, np.float64),
    )
    model_path = tmp / "flame_model.pkl"
    with open(model_path, "wb") as f:
        pickle.dump(model, f)

    lmk_path = tmp / "landmark_embedding.npy"
    np.save(lmk_path, {
        "full_lmk_faces_idx": np.asarray(assets.lmk_faces_idx, np.int64),
        "full_lmk_bary_coords": np.asarray(assets.lmk_bary_coords, np.float64),
    })

    # write the template mesh as OBJ (the real template when present)
    obj_path = tmp / "template.obj"
    with open(obj_path, "w") as f:
        for v in np.asarray(assets.v_template):
            f.write(f"v {v[0]} {v[1]} {v[2]}\n")
        for vt in np.asarray(assets.verts_uvs):
            f.write(f"vt {vt[0]} {vt[1]}\n")
        for tri, trit in zip(np.asarray(assets.faces) + 1,
                             np.asarray(assets.textures_idx) + 1):
            f.write(f"f {tri[0]}/{trit[0]} {tri[1]}/{trit[1]} {tri[2]}/{trit[2]}\n")

    # FlameMask binds its default parts path ("asset/flame/FLAME_masks.pkl",
    # relative) at class-definition time — provide it under a chdir root
    parts_path = tmp / "asset" / "flame" / "FLAME_masks.pkl"
    parts_path.parent.mkdir(parents=True)
    with open(parts_path, "wb") as f:
        pickle.dump({k: np.asarray(v, np.int64)
                     for k, v in assets.part_masks.items()}, f)

    return dict(assets=assets, model_path=model_path, lmk_path=lmk_path,
                obj_path=obj_path, parts_path=parts_path, cwd_root=tmp)


def _rand(rng, *shape, scale=1.0):
    return (rng.standard_normal(shape) * scale).astype(np.float32)


def test_batch_rodrigues_parity(ref_env, rng):
    import torch

    from vhap.model.lbs import batch_rodrigues as ref_rodrigues

    from vhap_tpu.model.lbs import batch_rodrigues

    pose = _rand(rng, 32, 3, scale=0.8)
    pose[0] = 0.0  # identity edge case
    R_ref = ref_rodrigues(torch.as_tensor(pose)).numpy()
    R_jax = np.asarray(batch_rodrigues(jnp.asarray(pose)))
    np.testing.assert_allclose(R_jax, R_ref, atol=1e-6)


def test_lbs_parity(ref_env, rng):
    import torch

    from vhap.model.lbs import blend_shapes as ref_blend
    from vhap.model.lbs import lbs as ref_lbs
    from vhap.model.lbs import vertices2landmarks as ref_v2l

    from vhap_tpu.model import lbs as jlbs

    a = ref_env["assets"]
    B = 3
    n_shape, n_expr = 30, 10
    shapedirs = np.concatenate([a.shapedirs[:, :, :n_shape],
                                a.shapedirs[:, :, 300:300 + n_expr]], -1)
    betas = _rand(rng, B, n_shape + n_expr, scale=0.5)
    pose = _rand(rng, B, 15, scale=0.3)   # 5 joints x 3 (global/neck/jaw/eyes)

    # blend shapes
    bs_ref = ref_blend(torch.as_tensor(betas),
                       torch.as_tensor(shapedirs, dtype=torch.float32)).numpy()
    bs_jax = np.asarray(jlbs.blend_shapes(jnp.asarray(betas),
                                          jnp.asarray(shapedirs)))
    np.testing.assert_allclose(bs_jax, bs_ref, atol=1e-6)

    v_shaped = a.v_template[None] + bs_ref

    # reference lbs wants posedirs reshaped (P, V*3) (flame.py:108-110)
    P = a.posedirs.shape[-1]
    posedirs_ref = a.posedirs.reshape(-1, P).T
    verts_ref, J_ref, _ = ref_lbs(
        torch.as_tensor(pose), torch.as_tensor(v_shaped),
        torch.as_tensor(posedirs_ref, dtype=torch.float32),
        torch.as_tensor(a.J_regressor, dtype=torch.float32),
        torch.as_tensor(a.parents),
        torch.as_tensor(a.lbs_weights, dtype=torch.float32))
    verts_jax, J_jax, _ = jlbs.lbs(
        jnp.asarray(pose), jnp.asarray(v_shaped),
        jnp.asarray(a.posedirs),  # repo keeps the (V, 3, P) layout
        jnp.asarray(a.J_regressor),
        jnp.asarray(a.parents), jnp.asarray(a.lbs_weights))

    np.testing.assert_allclose(np.asarray(J_jax), J_ref.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(verts_jax), verts_ref.numpy(),
                               atol=1e-5)

    # landmarks from the same vertices
    lmk_ref = ref_v2l(
        verts_ref, torch.as_tensor(np.asarray(a.faces, np.int64)),
        torch.as_tensor(a.lmk_faces_idx).repeat(B, 1),
        torch.as_tensor(a.lmk_bary_coords, dtype=torch.float32).repeat(B, 1, 1),
    ).numpy()
    lmk_jax = np.asarray(jlbs.vertices2landmarks(
        verts_jax, jnp.asarray(a.faces), jnp.asarray(a.lmk_faces_idx),
        jnp.asarray(a.lmk_bary_coords)))
    np.testing.assert_allclose(lmk_jax, lmk_ref, atol=1e-5)


def test_flame_forward_parity(ref_env, rng):
    """Reference FlameHead.forward vs vhap_tpu FlameHead on shared weights
    (<0.5 mm north-star measured at machine precision here)."""
    import torch

    from vhap.model.flame import FlameHead as RefFlameHead

    from vhap_tpu.model.flame import FlameHead

    a = ref_env["assets"]
    n_shape, n_expr, B = 30, 10, 2
    ref_head = RefFlameHead(
        n_shape, n_expr,
        flame_model_path=str(ref_env["model_path"]),
        flame_lmk_embedding_path=str(ref_env["lmk_path"]),
        flame_template_mesh_path=str(ref_env["obj_path"]),
        include_mask=False, add_teeth=False)
    jax_head = FlameHead.build(n_shape=n_shape, n_expr=n_expr, assets=a,
                               add_teeth=False)

    args = dict(
        shape=_rand(rng, B, n_shape, scale=0.5),
        expr=_rand(rng, B, n_expr, scale=0.5),
        rotation=_rand(rng, B, 3, scale=0.3),
        neck=_rand(rng, B, 3, scale=0.2),
        jaw=np.abs(_rand(rng, B, 3, scale=0.2)),
        eyes=_rand(rng, B, 6, scale=0.2),
        translation=_rand(rng, B, 3, scale=0.1),
    )
    static_offset = _rand(rng, 1, a.num_verts, 3, scale=0.002)
    dynamic_offset = _rand(rng, B, a.num_verts, 3, scale=0.001)

    t_args = {k: torch.as_tensor(v) for k, v in args.items()}
    verts_ref, cano_ref, lmk_ref = ref_head(
        **t_args, return_verts_cano=True,
        static_offset=torch.as_tensor(static_offset),
        dynamic_offset=torch.as_tensor(dynamic_offset))

    j_args = {k: jnp.asarray(v) for k, v in args.items()}
    verts_jax, cano_jax, lmk_jax = jax.jit(
        lambda kw, so, do: jax_head(**kw, return_verts_cano=True,
                                    static_offset=so, dynamic_offset=do)
    )(j_args, jnp.asarray(static_offset), jnp.asarray(dynamic_offset))

    np.testing.assert_allclose(np.asarray(cano_jax), cano_ref.numpy(),
                               atol=1e-5)
    # 1e-5 (m) = 0.01 mm — 50x tighter than the 0.5 mm north star
    np.testing.assert_allclose(np.asarray(verts_jax), verts_ref.numpy(),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(lmk_jax), lmk_ref.numpy(),
                               atol=1e-5)


def test_flame_teeth_surgery_parity(ref_env, rng, monkeypatch):
    """add_teeth mesh surgery (vhap/model/flame.py:206-504) — topology,
    extended blendshapes/LBS binding, and forward verts must all match."""
    import torch

    import vhap.model.flame as ref_flame

    from vhap_tpu.model.flame import FlameHead

    a = ref_env["assets"]
    if "mesh" in a.synthetic_parts:
        pytest.skip("teeth surgery needs the real template topology")

    n_shape, n_expr, B = 20, 10, 2
    monkeypatch.chdir(ref_env["cwd_root"])  # FlameMask default parts path
    ref_head = ref_flame.FlameHead(
        n_shape, n_expr,
        flame_model_path=str(ref_env["model_path"]),
        flame_lmk_embedding_path=str(ref_env["lmk_path"]),
        flame_template_mesh_path=str(ref_env["obj_path"]),
        include_mask=True, add_teeth=True)
    jax_head = FlameHead.build(n_shape=n_shape, n_expr=n_expr, assets=a,
                               add_teeth=True)

    np.testing.assert_array_equal(np.asarray(jax_head.faces),
                                  ref_head.faces.numpy())
    np.testing.assert_array_equal(np.asarray(jax_head.textures_idx),
                                  ref_head.textures_idx.numpy())
    np.testing.assert_allclose(np.asarray(jax_head.verts_uvs),
                               ref_head.verts_uvs.numpy(), atol=1e-6)

    args = dict(
        shape=_rand(rng, B, n_shape, scale=0.5),
        expr=_rand(rng, B, n_expr, scale=0.5),
        rotation=_rand(rng, B, 3, scale=0.3),
        neck=_rand(rng, B, 3, scale=0.2),
        jaw=np.abs(_rand(rng, B, 3, scale=0.3)),  # open jaw moves lower teeth
        eyes=_rand(rng, B, 6, scale=0.2),
        translation=_rand(rng, B, 3, scale=0.1),
    )
    verts_ref, lmk_ref = ref_head(
        **{k: torch.as_tensor(v) for k, v in args.items()})
    verts_jax, lmk_jax = jax_head(**{k: jnp.asarray(v) for k, v in args.items()})
    np.testing.assert_allclose(np.asarray(verts_jax), verts_ref.numpy(),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(lmk_jax), lmk_ref.numpy(), atol=1e-5)


def test_camera_convention_parity(ref_env, rng):
    import torch

    from vhap.util import camera as ref_cam

    from vhap_tpu.util import camera_np as jcam

    # projection matrices across conventions and principal-point offsets
    K = np.array([[800.0, 0, 260.0], [0, 790.0, 250.0], [0, 0, 1]],
                 np.float32)[None]
    for flip_y in (False, True):
        for z_sign in (-1, 1):
            P_ref = ref_cam.projection_from_intrinsics(
                K, (512, 512), near=0.05, far=20, flip_y=flip_y, z_sign=z_sign)
            P_jax = jcam.projection_from_intrinsics(
                K, (512, 512), near=0.05, far=20, flip_y=flip_y, z_sign=z_sign)
            np.testing.assert_allclose(P_jax, P_ref, atol=1e-6,
                                       err_msg=f"flip_y={flip_y} z={z_sign}")

    # axis alignment of a random camera rig
    Rm = np.stack([np.linalg.qr(rng.standard_normal((3, 3)))[0]
                   for _ in range(4)]).astype(np.float32)
    Rm = Rm * np.sign(np.linalg.det(Rm))[:, None, None]
    T = rng.standard_normal((4, 3, 1)).astype(np.float32)
    R_ref, T_ref = ref_cam.align_cameras_to_axes(
        torch.as_tensor(Rm), torch.as_tensor(T))
    R_jax, T_jax = jcam.align_cameras_to_axes(Rm.copy(), T.copy())
    np.testing.assert_allclose(R_jax, R_ref.numpy(), atol=1e-5)
    np.testing.assert_allclose(T_jax, T_ref.numpy(), atol=1e-5)

    # opencv->opengl conversion
    K4 = np.broadcast_to(K, (4, 3, 3)).copy()
    R2_ref, K2_ref = ref_cam.convert_camera_convention(
        "opencv->opengl", torch.as_tensor(Rm.copy()), torch.as_tensor(K4.copy()),
        512, 512)
    R2_jax, K2_jax = jcam.convert_camera_convention(
        "opencv->opengl", Rm.copy(), K4.copy(), 512, 512)
    np.testing.assert_allclose(R2_jax, R2_ref.numpy(), atol=1e-6)
    np.testing.assert_allclose(K2_jax, K2_ref.numpy(), atol=1e-6)

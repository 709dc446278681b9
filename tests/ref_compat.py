"""Shared machinery for running the ACTUAL reference code on CPU.

The reference (/root/reference, torch/CUDA) has pip deps absent in this
image (pytorch3d, nvdiffrast, tyro, torchvision) and hard-codes `.cuda()`
in a few code paths. These helpers stub exactly those seams so the
reference's *math* (energies, FLAME forward, camera transforms, the
GlobalTracker optimization loop) runs unmodified on CPU for parity
testing. The stubbed pieces are never what a test measures.

Used by tests/test_reference_parity.py (FLAME/LBS/camera parity),
tests/test_reference_energy_parity.py (energy-term golden values) and
tools/ref_fit_ab.py (landmark-only fit A/B).
"""

from __future__ import annotations

import sys
import types
from pathlib import Path

import numpy as np

REF = "/root/reference"


def add_ref_path():
    if REF not in sys.path:
        sys.path.insert(0, REF)


def uniform_laplacian_dense(num_verts: int, faces: np.ndarray) -> np.ndarray:
    """pytorch3d `laplacian_packed` semantics (uniform graph Laplacian):
    L[i, j] = 1/deg(i) for mesh edges, L[i, i] = -1."""
    L = np.zeros((num_verts, num_verts), np.float32)
    f = np.asarray(faces)
    edges = set()
    for a, b in ((0, 1), (1, 2), (2, 0)):
        for i, j in zip(f[:, a], f[:, b]):
            if i != j:
                edges.add((min(int(i), int(j)), max(int(i), int(j))))
    deg = np.zeros(num_verts, np.int64)
    for i, j in edges:
        deg[i] += 1
        deg[j] += 1
    for i, j in edges:
        L[i, j] = 1.0 / deg[i]
        L[j, i] = 1.0 / deg[j]
    idx = np.arange(num_verts)
    L[idx, idx] = np.where(deg > 0, -1.0, 0.0)
    return L


def install_pytorch3d_stub(real_laplacian: bool = True):
    """Minimal load_obj / Meshes shim (pytorch3d is a pip dep of the
    reference, absent here). With real_laplacian, Meshes.laplacian_packed
    reproduces pytorch3d's uniform Laplacian so the reference's
    offset-Laplacian energy is exercised for real."""
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
            self._faces = np.asarray(faces[0].cpu().numpy()
                                     if hasattr(faces[0], "cpu") else faces[0])

        def laplacian_packed(self):
            import torch as t
            if not real_laplacian:
                i = t.zeros((2, 0), dtype=t.long)
                v = t.zeros((0,), dtype=t.float32)
                return t.sparse_coo_tensor(i, v, (self._V, self._V))
            return t.as_tensor(
                uniform_laplacian_dense(self._V, self._faces)).to_sparse()

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


def install_nvdiffrast_stub():
    """nvdiffrast module shim: context ctors are no-ops; the rasterize ops
    raise if reached (landmark-only / energy-term paths never call them)."""
    if "nvdiffrast" in sys.modules:
        return

    def _unavailable(*a, **k):
        raise RuntimeError("nvdiffrast CUDA ops are not available on CPU; "
                           "this parity path must not rasterize")

    class _Ctx:
        def __init__(self, *a, **k):
            pass

    tmod = types.ModuleType("nvdiffrast.torch")
    tmod.RasterizeCudaContext = _Ctx
    tmod.RasterizeGLContext = _Ctx
    tmod.rasterize = _unavailable
    tmod.interpolate = _unavailable
    tmod.texture = _unavailable
    tmod.antialias = _unavailable
    root = types.ModuleType("nvdiffrast")
    root.torch = tmod
    sys.modules.update({"nvdiffrast": root, "nvdiffrast.torch": tmod})


def install_tyro_stub():
    """tyro is only used by the reference for CLI parsing / yaml echo."""
    if "tyro" in sys.modules:
        return
    mod = types.ModuleType("tyro")
    mod.cli = lambda cls, **k: cls()
    mod.to_yaml = lambda cfg: repr(cfg)
    mod.MISSING = None
    extras = types.ModuleType("tyro.extras")
    mod.extras = extras
    sys.modules.update({"tyro": mod, "tyro.extras": extras})


def install_torchvision_stub():
    """torchvision (absent) is only touched by the reference's media
    logging (draw_keypoints, make_grid) — never by energy math."""
    if "torchvision" in sys.modules:
        return

    def _unavailable(*a, **k):
        raise RuntimeError("torchvision is stubbed; media logging must be "
                           "disabled in CPU parity runs")

    import torch

    def to_tensor(pic):
        """PIL image / HWC uint8 array -> CHW float tensor in [0, 1]
        (the only torchvision call on the reference's data path)."""
        arr = np.asarray(pic)
        if arr.ndim == 2:
            arr = arr[:, :, None]
        t = torch.from_numpy(np.ascontiguousarray(arr.transpose(2, 0, 1)))
        if t.dtype == torch.uint8:
            t = t.float() / 255.0
        return t

    mod = types.ModuleType("torchvision")
    utils = types.ModuleType("torchvision.utils")
    utils.draw_keypoints = _unavailable
    utils.draw_bounding_boxes = _unavailable
    utils.make_grid = _unavailable
    transforms = types.ModuleType("torchvision.transforms")
    tf = types.ModuleType("torchvision.transforms.functional")
    tf.to_tensor = to_tensor
    transforms.functional = tf
    mod.utils = utils
    mod.transforms = transforms
    sys.modules.update({
        "torchvision": mod, "torchvision.utils": utils,
        "torchvision.transforms": transforms,
        "torchvision.transforms.functional": tf,
    })


def patch_cuda_noop():
    """Make tensor.cuda()/module.cuda() a CPU no-op (the reference
    hard-codes .cuda() inside camera transforms). Returns an undo fn."""
    import torch
    orig_t = torch.Tensor.cuda
    orig_m = torch.nn.Module.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self

    def undo():
        torch.Tensor.cuda = orig_t
        torch.nn.Module.cuda = orig_m

    return undo


def install_all_stubs():
    add_ref_path()
    install_pytorch3d_stub()
    install_nvdiffrast_stub()
    install_tyro_stub()
    install_torchvision_stub()
    return patch_cuda_noop()


def write_ref_asset_tree(root: Path, assets) -> Path:
    """Serialize vhap_tpu FlameAssets into the reference's expected
    asset/flame/* files (vhap/model/flame.py:37-44) under `root`.
    Returns `root` (chdir here before constructing reference models)."""
    import pickle

    from PIL import Image

    d = Path(root) / "asset" / "flame"
    d.mkdir(parents=True, exist_ok=True)

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
    with open(d / "flame2023.pkl", "wb") as f:
        pickle.dump(model, f)

    np.save(d / "landmark_embedding_with_eyes.npy", {
        "full_lmk_faces_idx": np.asarray(assets.lmk_faces_idx, np.int64),
        "full_lmk_bary_coords": np.asarray(assets.lmk_bary_coords, np.float64),
    })

    with open(d / "head_template_mesh.obj", "w") as f:
        for v in np.asarray(assets.v_template):
            f.write(f"v {v[0]} {v[1]} {v[2]}\n")
        for vt in np.asarray(assets.verts_uvs):
            f.write(f"vt {vt[0]} {vt[1]}\n")
        for tri, trit in zip(np.asarray(assets.faces) + 1,
                             np.asarray(assets.textures_idx) + 1):
            f.write(f"f {tri[0]}/{trit[0]} {tri[1]}/{trit[1]} "
                    f"{tri[2]}/{trit[2]}\n")

    with open(d / "FLAME_masks.pkl", "wb") as f:
        pickle.dump({k: np.asarray(v, np.int64)
                     for k, v in assets.part_masks.items()}, f)

    Image.fromarray(np.asarray(assets.tex_painted, np.uint8)).save(
        d / "tex_mean_painted.png")

    if assets.uv_masks:
        np.savez(d / "uv_masks.npz",
                 **{k: np.asarray(v, bool) for k, v in assets.uv_masks.items()})
    else:
        np.savez(d / "uv_masks.npz",
                 sclerae=np.zeros((64, 64), bool),
                 teeth=np.zeros((64, 64), bool))

    return Path(root)

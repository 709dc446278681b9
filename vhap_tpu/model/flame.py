"""FLAME head model as pure-JAX functions over frozen constants.

TPU-first re-design of vhap/model/flame.py: all mesh surgery and mask
construction happens once in numpy at build time (`FlameHead.build`); the
traced forward (`FlameHead.__call__`) is a chain of batched matmuls
(blendshapes + LBS) that XLA maps onto the MXU, with static shapes
throughout. There is no nn.Module state — the head is a frozen constant
container safe to close over in jit.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vhap_tpu.model import lbs as L
from vhap_tpu.model import surgery
from vhap_tpu.model.assets import FlameAssets, load_flame_assets
from vhap_tpu.model.masks import FlameMasks, FlameUvMasks
from vhap_tpu.util.log import get_logger

logger = get_logger(__name__)


def build_uniform_laplacian(num_verts: int, faces: np.ndarray):
    """Uniform graph Laplacian as a padded neighbor table.

    Matches pytorch3d's `laplacian_packed` semantics used at
    vhap/model/flame.py:196-201: L[i,j] = 1/deg(i) for mesh edges,
    L[i,i] = -1. Stored as (V, Dmax) neighbor indices + weights so that
    L @ x becomes a gather + weighted sum (no dense V x V matmul — replaces
    the reference's dense bmm hot spot at vhap/model/tracker.py:682-690).

    Returns (nbr_idx int32 (V, Dmax), nbr_w float32 (V, Dmax)); padding
    entries point at vertex 0 with weight 0.
    """
    edges = set()
    f = np.asarray(faces)
    for a, b in ((0, 1), (1, 2), (2, 0)):
        for i, j in zip(f[:, a], f[:, b]):
            if i != j:
                edges.add((min(i, j), max(i, j)))
    adj: Dict[int, list] = {}
    for i, j in edges:
        adj.setdefault(int(i), []).append(int(j))
        adj.setdefault(int(j), []).append(int(i))
    dmax = max((len(v) for v in adj.values()), default=1)
    nbr_idx = np.zeros((num_verts, dmax), dtype=np.int32)
    nbr_w = np.zeros((num_verts, dmax), dtype=np.float32)
    for i, nbrs in adj.items():
        nbr_idx[i, :len(nbrs)] = nbrs
        nbr_w[i, :len(nbrs)] = 1.0 / len(nbrs)
    return nbr_idx, nbr_w


def laplacian_apply(nbr_idx: jnp.ndarray, nbr_w: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """L @ x for x (..., V, C): neighbor average minus self."""
    gathered = x[..., nbr_idx, :]                 # (..., V, D, C)
    avg = jnp.einsum("...vdc,vd->...vc", gathered, nbr_w)
    return avg - x


def laplacian_blur_apply(nbr_idx: jnp.ndarray, nbr_w: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """(L - 2*diag(L)) @ w / 2 = (w + neighbor-average) / 2.

    The vertex-weight blur from vhap/model/tracker.py:607-614.
    """
    gathered = w[..., nbr_idx, :]
    avg = jnp.einsum("...vdc,vd->...vc", gathered, nbr_w)
    return (w + avg) / 2


@dataclass(frozen=True)
class FlameHead:
    """Frozen FLAME model constants + pure forward.

    Built via `FlameHead.build(...)`; mirrors the configuration surface of
    vhap/model/flame.py:70-204 (n_shape/n_expr truncation, add_teeth,
    remove_lip_inside, face clusters, ...).
    """

    n_shape: int
    n_expr: int
    v_template: jnp.ndarray      # (V, 3)
    shapedirs: jnp.ndarray       # (V, 3, n_shape + n_expr)
    posedirs: jnp.ndarray        # (V, 3, 36)
    J_regressor: jnp.ndarray     # (J, V)
    parents: np.ndarray          # (J,) static
    lbs_weights: jnp.ndarray     # (V, J)
    faces: jnp.ndarray           # (F, 3) int32
    verts_uvs: jnp.ndarray       # (Vt, 2)
    textures_idx: jnp.ndarray    # (F, 3) int32
    lmk_faces_idx: jnp.ndarray   # (L,)
    lmk_bary_coords: jnp.ndarray # (L, 3)
    lap_nbr_idx: jnp.ndarray     # (V, D)
    lap_nbr_w: jnp.ndarray       # (V, D)
    masks: FlameMasks = field(repr=False, compare=False, default=None)
    uv_masks: FlameUvMasks = field(repr=False, compare=False, default=None)
    assets: FlameAssets = field(repr=False, compare=False, default=None)

    # ------------------------------------------------------------------

    @staticmethod
    def build(
        n_shape: int = 300,
        n_expr: int = 100,
        asset_dir=None,
        assets: Optional[FlameAssets] = None,
        add_teeth: bool = True,
        connect_lip_inside: bool = False,
        remove_lip_inside: bool = False,
        remove_torso: bool = False,
        disable_deformation_on_torso: bool = False,
        face_clusters: Sequence[str] = (),
    ) -> "FlameHead":
        a = assets if assets is not None else load_flame_assets(asset_dir)
        # deep-ish copy arrays we will mutate during surgery
        import copy
        a = copy.copy(a)
        for name in ("v_template", "shapedirs", "posedirs", "J_regressor",
                     "lbs_weights", "faces", "verts_uvs", "textures_idx"):
            setattr(a, name, np.array(getattr(a, name)))

        # truncate basis: first n_shape identity dirs + expr dirs starting at
        # column 300 (vhap/model/flame.py:104-109)
        total = a.shapedirs.shape[2]
        expr_start = 300 if total >= 300 + n_expr else total - n_expr
        a.shapedirs = np.concatenate(
            [a.shapedirs[:, :, :n_shape],
             a.shapedirs[:, :, expr_start:expr_start + n_expr]], axis=2)

        masks = FlameMasks(a.part_masks, a.faces, a.textures_idx,
                           a.v_template.shape[0], face_clusters)

        faces_orig = a.faces.copy()  # laplacian uses pre-surgery connectivity

        if add_teeth:
            surgery.add_teeth(a, masks, n_shape)
        if connect_lip_inside:
            surgery.connect_lip_inside(a, masks)
        if remove_lip_inside:
            surgery.remove_lip_inside(a, masks)
        if remove_torso:
            surgery.remove_torso(a, masks)
        if disable_deformation_on_torso:
            surgery.disable_deformation_on_torso(a, masks, n_expr)

        # laplacian over the *original* obj connectivity but the (possibly
        # teeth-extended) vertex count, as in vhap/model/flame.py:196
        nbr_idx, nbr_w = build_uniform_laplacian(a.v_template.shape[0], faces_orig)

        return FlameHead(
            n_shape=n_shape,
            n_expr=n_expr,
            v_template=jnp.asarray(a.v_template, jnp.float32),
            shapedirs=jnp.asarray(a.shapedirs, jnp.float32),
            posedirs=jnp.asarray(a.posedirs, jnp.float32),
            J_regressor=jnp.asarray(a.J_regressor, jnp.float32),
            parents=np.asarray(a.parents, np.int64),
            lbs_weights=jnp.asarray(a.lbs_weights, jnp.float32),
            faces=jnp.asarray(a.faces, jnp.int32),
            verts_uvs=jnp.asarray(a.verts_uvs, jnp.float32),
            textures_idx=jnp.asarray(a.textures_idx, jnp.int32),
            lmk_faces_idx=jnp.asarray(a.lmk_faces_idx, jnp.int32),
            lmk_bary_coords=jnp.asarray(a.lmk_bary_coords, jnp.float32),
            lap_nbr_idx=jnp.asarray(nbr_idx),
            lap_nbr_w=jnp.asarray(nbr_w),
            masks=masks,
            uv_masks=FlameUvMasks(a.uv_masks),
            assets=a,
        )

    # ------------------------------------------------------------------

    @property
    def num_verts(self) -> int:
        return self.v_template.shape[0]

    @property
    def num_faces(self) -> int:
        return self.faces.shape[0]

    def __call__(
        self,
        shape: jnp.ndarray,        # (B, n_shape)
        expr: jnp.ndarray,         # (B, n_expr)
        rotation: jnp.ndarray,     # (B, 3)
        neck: jnp.ndarray,         # (B, 3)
        jaw: jnp.ndarray,          # (B, 3)
        eyes: jnp.ndarray,         # (B, 6)
        translation: jnp.ndarray,  # (B, 3)
        zero_centered_at_root_node: bool = False,
        return_landmarks: bool = True,
        return_verts_cano: bool = False,
        static_offset: Optional[jnp.ndarray] = None,   # (1|B, V, 3)
        dynamic_offset: Optional[jnp.ndarray] = None,  # (B, V, 3)
    ):
        """FLAME forward (vhap/model/flame.py:571-646).

        Returns [verts, (verts_cano), (landmarks)] following the reference's
        return-list convention.
        """
        B = shape.shape[0]
        betas = jnp.concatenate([shape, expr], axis=1)
        full_pose = jnp.concatenate([rotation, neck, jaw, eyes], axis=1)

        v_shaped = self.v_template[None] + L.blend_shapes(betas, self.shapedirs)
        if static_offset is not None:
            v_shaped = v_shaped + static_offset
        if dynamic_offset is not None:
            v_shaped = v_shaped + dynamic_offset

        verts, J, _ = L.lbs(
            full_pose, v_shaped, self.posedirs,
            self.J_regressor, self.parents, self.lbs_weights,
        )

        if zero_centered_at_root_node:
            verts = verts - J[:, :1]
            J = J - J[:, :1]

        verts = verts + translation[:, None, :]

        ret = [verts]
        if return_verts_cano:
            ret.append(v_shaped)
        if return_landmarks:
            lmks = L.vertices2landmarks(
                verts, self.faces, self.lmk_faces_idx, self.lmk_bary_coords)
            ret.append(lmks)
        return ret if len(ret) > 1 else ret[0]


# ---------------------------------------------------------------------------
# Texture models (vhap/model/flame.py:649-687)
# ---------------------------------------------------------------------------

class FlameTexPainted:
    """Fixed painted base texture resized to tex_size (flame.py:649-662).

    Produces (1, 3, T, T) float in [0, 1] to match the reference layout.
    """

    def __init__(self, tex_painted_u8: np.ndarray, tex_size: int = 512):
        tex = tex_painted_u8.astype(np.float32) / 255.0  # (H, W, 3)
        tex = jnp.asarray(tex).transpose(2, 0, 1)[None]  # (1, 3, H, W)
        if tex.shape[-1] != tex_size or tex.shape[-2] != tex_size:
            tex = jax.image.resize(tex, (1, 3, tex_size, tex_size), method="bilinear")
        self.tex_painted = tex
        self.tex_size = tex_size

    def __call__(self) -> jnp.ndarray:
        return self.tex_painted


class FlameTexPCA:
    """PCA texture space: mean + basis @ code, BGR->RGB, /255, clamp
    (flame.py:665-687)."""

    def __init__(self, tex_mean: np.ndarray, tex_basis: np.ndarray,
                 n_tex: int, tex_size: int = 512):
        self.mean = jnp.asarray(tex_mean.reshape(1, -1), jnp.float32)
        self.basis = jnp.asarray(tex_basis[:, :n_tex], jnp.float32)
        self.tex_size = tex_size

    def __call__(self, texcode: jnp.ndarray) -> jnp.ndarray:
        # (B, n_tex) -> (B, 3, T, T)
        tex = self.mean + jnp.einsum("dk,bk->bd", self.basis, texcode)
        B = texcode.shape[0]
        tex = tex.reshape(B, 512, 512, 3).transpose(0, 3, 1, 2)
        if self.tex_size != 512:
            tex = jax.image.resize(tex, (B, 3, self.tex_size, self.tex_size),
                                   method="bilinear")
        tex = tex[:, ::-1]  # BGR -> RGB (flame.py:685)
        return jnp.clip(tex / 255.0, 0.0, 1.0)


def lbs_color(head: FlameHead, palette=None) -> np.ndarray:
    """Vertex colors from LBS weights for joint-influence visualization
    (vhap/model/flame.py:563-569)."""
    w = np.asarray(head.lbs_weights)
    if palette is None:
        palette = np.asarray([[0.89, 0.10, 0.11], [0.22, 0.49, 0.72],
                              [0.30, 0.69, 0.29], [0.60, 0.31, 0.64],
                              [1.00, 0.50, 0.00]], np.float32)
    return (w @ palette[:w.shape[1]]).astype(np.float32)


def face_uvcoords(head: FlameHead) -> np.ndarray:
    """Per-face UV coords in [-1, 1] with flipped v and hom. pad
    (vhap/model/flame.py:154-163)."""
    uv = np.asarray(head.verts_uvs)
    uv3 = np.concatenate([uv, np.ones_like(uv[:, :1])], axis=-1)
    uv3 = uv3 * 2 - 1
    uv3[:, 1] = -uv3[:, 1]
    return uv3[np.asarray(head.textures_idx)]

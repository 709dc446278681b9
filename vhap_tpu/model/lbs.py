"""Pure-JAX linear blend skinning math for FLAME.

Functional re-implementation of the SMPL/FLAME LBS pipeline
(reference: vhap/model/lbs.py). All functions are jit/vmap/grad friendly:
static shapes, no Python control flow on traced values (the 5-joint
kinematic chain is unrolled with a `lax.scan` over a topologically-sorted
parent list).

Conventions match the reference exactly so that fitted parameter archives
are interchangeable:
  * axis-angle -> rotation via Rodrigues with the same eps (vhap/model/lbs.py:40)
  * pose feature excludes the root joint (vhap/model/lbs.py:164)
  * posedirs in (V, 3, P) layout, contracted as (P,) @ (P, V*3)
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def batch_rodrigues(rot_vecs: jnp.ndarray, epsilon: float = 1e-8) -> jnp.ndarray:
    """Axis-angle (..., 3) -> rotation matrices (..., 3, 3).

    Matches vhap/model/lbs.py:25-57 including the `+1e-8` inside the norm
    (which biases the axis slightly but keeps gradients finite at zero).
    """
    shape = rot_vecs.shape[:-1]
    rv = rot_vecs.reshape(-1, 3)
    angle = jnp.linalg.norm(rv + epsilon, axis=1, keepdims=True)
    rot_dir = rv / angle

    cos = jnp.cos(angle)[:, None]  # (N,1,1)
    sin = jnp.sin(angle)[:, None]

    rx, ry, rz = rot_dir[:, 0], rot_dir[:, 1], rot_dir[:, 2]
    zeros = jnp.zeros_like(rx)
    K = jnp.stack(
        [zeros, -rz, ry, rz, zeros, -rx, -ry, rx, zeros], axis=1
    ).reshape(-1, 3, 3)

    ident = jnp.eye(3, dtype=rv.dtype)[None]
    rot_mat = ident + sin * K + (1.0 - cos) * jnp.matmul(K, K)
    return rot_mat.reshape(*shape, 3, 3)


def blend_shapes(betas: jnp.ndarray, shape_disps: jnp.ndarray) -> jnp.ndarray:
    """(B, L) x (V, 3, L) -> (B, V, 3). vhap/model/lbs.py:218-239.

    Contracted on the MXU as a single (B, L) @ (L, V*3) matmul.
    """
    V = shape_disps.shape[0]
    L = shape_disps.shape[2]
    mat = shape_disps.reshape(V * 3, L).T  # (L, V*3)
    out = jnp.matmul(betas, mat, preferred_element_type=jnp.float32)
    return out.reshape(betas.shape[0], V, 3)


def vertices2joints(J_regressor: jnp.ndarray, vertices: jnp.ndarray) -> jnp.ndarray:
    """(J, V) x (B, V, 3) -> (B, J, 3). vhap/model/lbs.py:198-215."""
    return jnp.einsum("bik,ji->bjk", vertices, J_regressor,
                      preferred_element_type=jnp.float32)


def vertices2landmarks(
    vertices: jnp.ndarray,
    faces: jnp.ndarray,
    lmk_faces_idx: jnp.ndarray,
    lmk_bary_coords: jnp.ndarray,
) -> jnp.ndarray:
    """Barycentric landmark extraction. vhap/model/lbs.py:60-98.

    vertices: (B, V, 3); faces: (F, 3); lmk_faces_idx: (L,);
    lmk_bary_coords: (L, 3) -> (B, L, 3).
    """
    lmk_faces = faces[lmk_faces_idx]              # (L, 3)
    lmk_verts = vertices[:, lmk_faces]            # (B, L, 3, 3)
    return jnp.einsum("blfi,lf->bli", lmk_verts, lmk_bary_coords)


def _transform_mat(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) + (..., 3) -> (..., 4, 4) rigid transform."""
    top = jnp.concatenate([R, t[..., None]], axis=-1)          # (...,3,4)
    bottom = jnp.zeros_like(top[..., :1, :]).at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)


def batch_rigid_transform(
    rot_mats: jnp.ndarray,   # (B, J, 3, 3)
    joints: jnp.ndarray,     # (B, J, 3)
    parents: jnp.ndarray,    # (J,) static numpy-like, parents[0] == -1
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Forward kinematics over the joint tree. vhap/model/lbs.py:254-304.

    Returns posed joints (B, J, 3) and relative transforms (B, J, 4, 4).
    The chain walk is a `lax.scan` over joints (assumes parents[i] < i,
    which holds for FLAME's kintree), keeping everything jittable.
    """
    J = joints.shape[1]
    parents = jnp.asarray(parents)
    rel_joints = joints - jnp.where(
        (parents >= 0)[None, :, None], joints[:, jnp.clip(parents, 0)], 0.0
    )
    transforms_mat = _transform_mat(rot_mats, rel_joints)  # (B, J, 4, 4)

    def step(carry, inputs):
        # carry: (B, J, 4, 4) accumulated world transforms (filled progressively)
        chain, = carry
        i, parent = inputs
        parent_tf = jnp.where(
            parent >= 0,
            chain[:, jnp.clip(parent, 0)],
            jnp.broadcast_to(jnp.eye(4, dtype=chain.dtype), chain[:, 0].shape),
        )
        world_i = jnp.matmul(parent_tf, transforms_mat[:, i])
        chain = chain.at[:, i].set(world_i)
        return (chain,), None

    init = jnp.zeros_like(transforms_mat)
    idxs = jnp.arange(J)
    (chain,), _ = jax.lax.scan(step, (init,), (idxs, parents))
    transforms = chain  # (B, J, 4, 4)

    posed_joints = transforms[..., :3, 3]

    # rel_transforms = T - [0 | T @ (joint, 0)]  (removes rest-pose joint offset)
    joints_homo = jnp.concatenate(
        [joints, jnp.zeros_like(joints[..., :1])], axis=-1
    )  # (B, J, 4)
    shifted = jnp.einsum("bjrc,bjc->bjr", transforms, joints_homo)  # (B, J, 4)
    correction = jnp.zeros_like(transforms).at[..., :, 3].set(shifted)
    rel_transforms = transforms - correction
    return posed_joints, rel_transforms


def lbs(
    pose: jnp.ndarray,          # (B, J*3) axis-angle
    v_shaped: jnp.ndarray,      # (B, V, 3)
    posedirs: jnp.ndarray,      # (V, 3, P)
    J_regressor: jnp.ndarray,   # (J, V)
    parents: jnp.ndarray,       # (J,)
    lbs_weights: jnp.ndarray,   # (V, J)
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Linear blend skinning. vhap/model/lbs.py:101-195.

    Returns (verts (B,V,3), posed joints (B,J,3), A[:,1] the neck transform,
    matching the reference's third return value).
    """
    B = pose.shape[0]
    J = J_regressor.shape[0]

    joints = vertices2joints(J_regressor, v_shaped)

    rot_mats = batch_rodrigues(pose.reshape(B, J, 3))  # (B, J, 3, 3)
    ident = jnp.eye(3, dtype=v_shaped.dtype)
    pose_feature = (rot_mats[:, 1:] - ident).reshape(B, -1)  # (B, (J-1)*9)
    pose_offsets = blend_shapes(pose_feature, posedirs)       # (B, V, 3)

    v_posed = v_shaped + pose_offsets

    J_transformed, A = batch_rigid_transform(rot_mats, joints, parents)

    # Skinning: T = W @ A  per batch; (V, J) @ (B, J, 16) -> (B, V, 4, 4)
    T = jnp.einsum("vj,bjrc->bvrc", lbs_weights, A)

    v_homo = jnp.concatenate(
        [v_posed, jnp.ones_like(v_posed[..., :1])], axis=-1
    )  # (B, V, 4)
    verts = jnp.einsum("bvrc,bvc->bvr", T, v_homo)[..., :3]

    return verts, J_transformed, A[:, 1]

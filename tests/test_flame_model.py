"""FlameHead build + forward sanity and structural parity checks."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from vhap_tpu.model.flame import FlameHead, laplacian_apply, laplacian_blur_apply


def _zero_pose_args(head, B=2):
    z = lambda n: jnp.zeros((B, n), jnp.float32)
    return dict(shape=z(head.n_shape), expr=z(head.n_expr), rotation=z(3),
                neck=z(3), jaw=z(3), eyes=z(6), translation=z(3))


class TestTinyHead:
    def test_zero_pose_is_template(self, tiny_head):
        verts, lmks = tiny_head(**_zero_pose_args(tiny_head))
        np.testing.assert_allclose(
            np.asarray(verts[0]), np.asarray(tiny_head.v_template), atol=1e-4)

    def test_translation(self, tiny_head):
        args = _zero_pose_args(tiny_head, B=1)
        args["translation"] = jnp.asarray([[0.1, -0.2, 0.3]])
        verts = tiny_head(**args, return_landmarks=False)
        np.testing.assert_allclose(
            np.asarray(verts[0] - tiny_head.v_template),
            np.tile([[0.1, -0.2, 0.3]], (tiny_head.num_verts, 1)), atol=1e-4)

    def test_jit_and_grad(self, tiny_head):
        args = _zero_pose_args(tiny_head, B=1)

        @jax.jit
        def loss(expr):
            a = dict(args)
            a["expr"] = expr
            verts = tiny_head(**a, return_landmarks=False)
            return jnp.sum(verts ** 2)

        g = jax.grad(loss)(args["expr"])
        assert np.all(np.isfinite(np.asarray(g)))

    def test_landmarks_on_mesh(self, tiny_head):
        verts, lmks = tiny_head(**_zero_pose_args(tiny_head, B=1))
        # landmarks are barycentric combos of verts -> inside bbox
        v = np.asarray(verts[0])
        l = np.asarray(lmks[0])
        assert (l >= v.min(0) - 1e-5).all() and (l <= v.max(0) + 1e-5).all()


class TestFullHead:
    def test_teeth_added(self, full_head):
        # 120 teeth verts + 168 teeth faces on top of the template
        # (vhap/model/flame.py:206-504)
        assert full_head.num_verts == full_head.assets.v_template.shape[0]
        assert "teeth" in full_head.masks.v
        assert len(full_head.masks.v["teeth"]) == 120
        assert full_head.num_faces == full_head.textures_idx.shape[0]

    def test_cluster_lut(self, full_head):
        fid2cid = full_head.masks.fid2cid
        assert fid2cid.shape[0] == full_head.num_faces + 1
        assert fid2cid[0] == 0                    # background
        assert fid2cid[1:].min() >= 1             # all faces foreground
        assert full_head.masks.num_clusters >= 3  # at least some clusters hit

    def test_teeth_lbs_binding(self, full_head):
        w = np.asarray(full_head.lbs_weights)
        up = full_head.masks.v["teeth_upper"]
        lo = full_head.masks.v["teeth_lower"]
        assert np.allclose(w[up, 1], 1.0) and np.allclose(w[up, 2], 0.0)
        assert np.allclose(w[lo, 2], 1.0) and np.allclose(w[lo, 1], 0.0)

    def test_jaw_moves_lower_teeth_only(self, full_head):
        args = _zero_pose_args(full_head, B=1)
        v0 = np.asarray(full_head(**args, return_landmarks=False))
        args["jaw"] = jnp.asarray([[0.3, 0.0, 0.0]])
        v1 = np.asarray(full_head(**args, return_landmarks=False))
        lo = full_head.masks.v["teeth_lower"]
        up = full_head.masks.v["teeth_upper"]
        d_lo = np.abs(v1[0, lo] - v0[0, lo]).max()
        d_up = np.abs(v1[0, up] - v0[0, up]).max()
        assert d_lo > 1e-3
        assert d_up < d_lo * 0.2


def test_laplacian_ops(tiny_head):
    V = tiny_head.num_verts
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, V, 3)).astype(np.float32))
    lap = laplacian_apply(tiny_head.lap_nbr_idx, tiny_head.lap_nbr_w, x)
    assert lap.shape == x.shape
    # constant field -> zero laplacian for connected verts
    c = jnp.ones((1, V, 3))
    lap_c = np.asarray(laplacian_apply(tiny_head.lap_nbr_idx, tiny_head.lap_nbr_w, c))
    deg = np.asarray(tiny_head.lap_nbr_w).sum(1)
    connected = deg > 0.5
    assert np.allclose(lap_c[0, connected], 0.0, atol=1e-5)

    blur = laplacian_blur_apply(tiny_head.lap_nbr_idx, tiny_head.lap_nbr_w, c)
    assert np.allclose(np.asarray(blur)[0, connected], 1.0, atol=1e-5)

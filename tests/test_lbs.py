"""LBS math: golden tests against the reference torch implementation.

The reference's vhap/model/lbs.py is self-contained (torch-only), so we load
it directly from the read-only reference checkout and compare numerics. These
tests are skipped when the reference checkout is absent.
"""

import importlib.util
from pathlib import Path

import numpy as np
import pytest

import jax.numpy as jnp

from vhap_tpu.model import lbs as jlbs

REF_LBS = Path("/root/reference/vhap/model/lbs.py")


def _load_ref_lbs():
    spec = importlib.util.spec_from_file_location("ref_lbs", REF_LBS)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


needs_ref = pytest.mark.skipif(not REF_LBS.exists(), reason="reference checkout absent")


@needs_ref
class TestGoldenVsReference:
    @classmethod
    def setup_class(cls):
        import torch
        cls.torch = torch
        cls.ref = _load_ref_lbs()
        rng = np.random.default_rng(0)
        cls.rng = rng

    def test_batch_rodrigues(self):
        rv = self.rng.normal(scale=0.5, size=(17, 3)).astype(np.float32)
        ref = self.ref.batch_rodrigues(self.torch.tensor(rv)).numpy()
        got = np.asarray(jlbs.batch_rodrigues(jnp.asarray(rv)))
        np.testing.assert_allclose(got, ref, atol=1e-6)

    def test_batch_rodrigues_zero_pose(self):
        rv = np.zeros((4, 3), dtype=np.float32)
        ref = self.ref.batch_rodrigues(self.torch.tensor(rv)).numpy()
        got = np.asarray(jlbs.batch_rodrigues(jnp.asarray(rv)))
        np.testing.assert_allclose(got, ref, atol=1e-6)
        np.testing.assert_allclose(got, np.eye(3)[None].repeat(4, 0), atol=1e-5)

    def test_blend_shapes(self):
        betas = self.rng.normal(size=(3, 12)).astype(np.float32)
        disps = self.rng.normal(size=(50, 3, 12)).astype(np.float32)
        ref = self.ref.blend_shapes(self.torch.tensor(betas), self.torch.tensor(disps)).numpy()
        got = np.asarray(jlbs.blend_shapes(jnp.asarray(betas), jnp.asarray(disps)))
        np.testing.assert_allclose(got, ref, atol=1e-5)

    def test_vertices2landmarks(self):
        verts = self.rng.normal(size=(2, 40, 3)).astype(np.float32)
        faces = self.rng.integers(0, 40, size=(30, 3))
        lmk_f = self.rng.integers(0, 30, size=(7,))
        bary = self.rng.dirichlet(np.ones(3), size=(7,)).astype(np.float32)
        ref = self.ref.vertices2landmarks(
            self.torch.tensor(verts),
            self.torch.tensor(faces, dtype=self.torch.long),
            self.torch.tensor(lmk_f, dtype=self.torch.long).repeat(2, 1),
            self.torch.tensor(bary).repeat(2, 1, 1),
        ).numpy()
        got = np.asarray(jlbs.vertices2landmarks(
            jnp.asarray(verts), jnp.asarray(faces, jnp.int32),
            jnp.asarray(lmk_f, jnp.int32), jnp.asarray(bary)))
        np.testing.assert_allclose(got, ref, atol=1e-6)

    def test_full_lbs(self):
        rng = self.rng
        B, V, J, P = 3, 60, 5, 36
        pose = rng.normal(scale=0.3, size=(B, J * 3)).astype(np.float32)
        v_shaped = rng.normal(size=(B, V, 3)).astype(np.float32)
        posedirs_vcp = rng.normal(scale=0.01, size=(V, 3, P)).astype(np.float32)
        J_reg = rng.dirichlet(np.ones(V), size=(J,)).astype(np.float32)
        parents = np.array([-1, 0, 1, 1, 1])
        w = rng.dirichlet(np.ones(J), size=(V,)).astype(np.float32)

        # reference consumes posedirs as (P, V*3) (vhap/model/flame.py:112-114)
        posedirs_ref = posedirs_vcp.reshape(V * 3, P).T

        tt = self.torch.tensor
        ref_verts, ref_J, ref_A1 = self.ref.lbs(
            tt(pose), tt(v_shaped), tt(posedirs_ref), tt(J_reg),
            tt(parents, dtype=self.torch.long), tt(w),
        )
        got_verts, got_J, got_A1 = jlbs.lbs(
            jnp.asarray(pose), jnp.asarray(v_shaped), jnp.asarray(posedirs_vcp),
            jnp.asarray(J_reg), parents, jnp.asarray(w),
        )
        np.testing.assert_allclose(np.asarray(got_verts), ref_verts.numpy(), atol=2e-5)
        np.testing.assert_allclose(np.asarray(got_J), ref_J.numpy(), atol=2e-5)
        np.testing.assert_allclose(np.asarray(got_A1), ref_A1.numpy(), atol=2e-5)


def test_rigid_transform_identity():
    """Zero pose => joints unmoved, rel transforms translation-free."""
    rng = np.random.default_rng(1)
    joints = jnp.asarray(rng.normal(size=(2, 5, 3)).astype(np.float32))
    rots = jnp.broadcast_to(jnp.eye(3), (2, 5, 3, 3))
    parents = np.array([-1, 0, 1, 1, 1])
    posed, rel = jlbs.batch_rigid_transform(rots, joints, parents)
    np.testing.assert_allclose(np.asarray(posed), np.asarray(joints), atol=1e-6)
    np.testing.assert_allclose(np.asarray(rel[..., :3, 3]), 0.0, atol=1e-6)


def test_lbs_gradients_finite():
    import jax
    rng = np.random.default_rng(2)
    V, J = 30, 5
    v_shaped = jnp.asarray(rng.normal(size=(1, V, 3)).astype(np.float32))
    posedirs = jnp.asarray(rng.normal(scale=0.01, size=(V, 3, 36)).astype(np.float32))
    J_reg = jnp.asarray(rng.dirichlet(np.ones(V), size=(J,)).astype(np.float32))
    w = jnp.asarray(rng.dirichlet(np.ones(J), size=(V,)).astype(np.float32))
    parents = np.array([-1, 0, 1, 1, 1])

    def loss(pose):
        verts, _, _ = jlbs.lbs(pose, v_shaped, posedirs, J_reg, parents, w)
        return jnp.sum(verts ** 2)

    pose0 = jnp.asarray(rng.normal(scale=0.2, size=(1, 15)).astype(np.float32))
    g = jax.grad(loss)(pose0)
    assert np.all(np.isfinite(np.asarray(g)))

    # finite differences on a few coordinates
    eps = 1e-3
    for idx in [0, 4, 9]:
        e = jnp.zeros_like(pose0).at[0, idx].set(eps)
        fd = (loss(pose0 + e) - loss(pose0 - e)) / (2 * eps)
        assert abs(float(fd) - float(g[0, idx])) < 2e-2 * max(1.0, abs(float(fd)))

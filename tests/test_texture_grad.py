"""Parity tests for the Pallas texel-gradient kernel (interpret mode on CPU).

The kernel must reproduce the XLA autodiff scatter exactly (fp32 rounding):
same texel gradients, same uv-path weight gradients, same forward values.
Reference behavior: nvdiffrast's exact 8-tap trilinear texture backward
(vhap/util/render_nvdiffrast.py:399).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture()
def interpret_pallas():
    # scatter_taps self-selects interpret mode off-TPU; the fixture remains
    # as documentation of intent (tests run on the CPU backend)
    from vhap_tpu.ops import texture_grad_pallas as tgp
    return tgp


class TestScatterTaps:
    def test_matches_numpy_scatter(self, interpret_pallas):
        tgp = interpret_pallas
        rng = np.random.default_rng(0)
        B, K, C, P = 2, 8, 3, 512
        n_texels = 40000  # 3 tiles, last partial
        levels = (0, 30000, 38000)  # fake pyramid offsets
        idx = np.concatenate([
            rng.integers(0, 30000, (B, 4, P)),
            rng.integers(30000, 40000, (B, 4, P))], axis=1).astype(np.int32)
        vals = rng.normal(size=(B, K, C, P)).astype(np.float32)
        vals[:, :, :, ::3] = 0.0  # some all-zero pixels

        dflat, overflow = tgp.scatter_taps(
            jnp.asarray(idx), jnp.asarray(vals), levels, n_texels, npix=256)
        assert int(overflow) == 0

        ref = np.zeros((n_texels, C), np.float32)
        np.add.at(ref, idx.reshape(-1),
                  vals.transpose(0, 1, 3, 2).reshape(-1, C))
        # hi/lo bf16 split + accumulation order: ~2 ulp of the split residual
        np.testing.assert_allclose(np.asarray(dflat), ref, rtol=5e-5,
                                   atol=5e-5)

    def test_zero_blocks_bin_nowhere(self, interpret_pallas):
        tgp = interpret_pallas
        B, K, C, P = 1, 4, 3, 512
        idx = jnp.zeros((B, K, P), jnp.int32)
        vals = jnp.zeros((B, K, C, P), jnp.float32)
        _, _, counts, overflow, _ = tgp.plan_tap_scatter(
            idx, vals, (0,), 16384, npix=256)
        assert int(counts.sum()) == 0 and int(overflow) == 0

    def test_overflow_counted(self, interpret_pallas, monkeypatch):
        tgp = interpret_pallas
        monkeypatch.setattr(tgp, "K_CAP", 1)
        rng = np.random.default_rng(1)
        B, K, C, P = 1, 4, 3, 1024  # 4 blocks, all hitting tile 0
        idx = jnp.asarray(rng.integers(0, 100, (B, K, P)), jnp.int32)
        vals = jnp.asarray(rng.normal(size=(B, K, C, P)), jnp.float32)
        _, lists, counts, overflow, _ = tgp.plan_tap_scatter(
            idx, vals, (0,), 16384, npix=256)
        assert int(counts.max()) == 1
        assert int(overflow) == 3  # 4 items, capacity 1


class TestGatherTaps:
    def test_matches_numpy_gather(self, interpret_pallas):
        tgp = interpret_pallas
        rng = np.random.default_rng(2)
        B, K, P = 2, 8, 512
        C = 3
        n_texels = 40000  # 3 tiles; intervals cross tile edges (RMW path)
        levels = (0, 30000, 38000)
        flat = rng.normal(size=(n_texels, C)).astype(np.float32)
        idx = np.concatenate([
            rng.integers(0, 30000, (B, 4, P)),
            rng.integers(30000, 40000, (B, 4, P))], axis=1).astype(np.int32)
        wgt = rng.uniform(size=(B, K, P)).astype(np.float32)
        wgt[:, :, ::5] = 0.0  # masked-out pixels

        texels_r, plan, overflow = tgp.gather_taps(
            jnp.asarray(flat), jnp.asarray(idx), jnp.asarray(wgt), levels,
            npix=256)
        assert int(overflow) == 0
        out = tgp._texels_rows_out(texels_r, jnp.asarray(wgt), C, npix=256)

        ref = np.einsum("bkpc,bkp->bpc", flat[idx], wgt)
        # bf16 hi+lo product split: ~2e-5 relative
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=5e-5)

        # d_wgt read from the same packed rows
        g = rng.normal(size=(B, P, C)).astype(np.float32)
        d_wgt = tgp._texels_rows_d_wgt(texels_r, jnp.asarray(g), B, K, P, C,
                                       npix=256)
        ref_dw = np.einsum("bkpc,bpc->bkp", flat[idx], g)
        ref_dw[wgt == 0.0] = 0.0  # masked lanes carry no gradient
        np.testing.assert_allclose(np.asarray(d_wgt), ref_dw, rtol=1e-4,
                                   atol=5e-5)

    def test_scatter_reuses_gather_plan(self, interpret_pallas):
        tgp = interpret_pallas
        rng = np.random.default_rng(4)
        B, K, C, P = 1, 8, 3, 256
        n_texels = 20000
        levels = (0, 16000)
        idx = np.concatenate([
            rng.integers(0, 16000, (B, 4, P)),
            rng.integers(16000, 20000, (B, 4, P))], axis=1).astype(np.int32)
        wgt = rng.uniform(size=(B, K, P)).astype(np.float32)
        flat = rng.normal(size=(n_texels, C)).astype(np.float32)
        _, plan, _ = tgp.gather_taps(
            jnp.asarray(flat), jnp.asarray(idx), jnp.asarray(wgt), levels,
            npix=256)
        vals = (wgt[:, :, None, :]
                * rng.normal(size=(B, 1, C, P))).astype(np.float32)
        dflat, _ = tgp.scatter_taps(jnp.asarray(idx), jnp.asarray(vals),
                                    levels, n_texels, plan=plan, npix=256)
        ref = np.zeros((n_texels, C), np.float32)
        np.add.at(ref, idx.reshape(-1), vals.transpose(0, 1, 3, 2).reshape(-1, C))
        np.testing.assert_allclose(np.asarray(dflat), ref, rtol=5e-5,
                                   atol=5e-5)


class TestTextureSampleParity:
    def _setup(self, B=2, Hi=8, Wi=128, T=16, C=3, seed=0):
        rng = np.random.default_rng(seed)
        tex = jnp.asarray(rng.uniform(size=(1, T, T, C)), jnp.float32)
        uv = jnp.asarray(rng.uniform(-0.2, 1.2, (B, Hi, Wi, 2)), jnp.float32)
        # footprints spanning several mip levels
        da = jnp.asarray(rng.uniform(0, 0.4, (B, Hi, Wi, 4)) ** 2,
                         jnp.float32)
        return tex, uv, da

    def test_forward_and_grads_match_autodiff(self, interpret_pallas):
        from vhap_tpu.ops.texture import texture_sample
        tex, uv, da = self._setup()
        g_out = jnp.asarray(
            np.random.default_rng(3).normal(size=(2, 8, 128, 3)), jnp.float32)

        def loss(tex, uv, da, impl):
            out = texture_sample(tex, uv, da, grad_mode="trilinear",
                                 grad_impl=impl)
            return jnp.sum(out * g_out), out

        (ref_l, ref_out), ref_g = jax.value_and_grad(
            loss, argnums=(0, 1, 2), has_aux=True)(tex, uv, da, "xla_fetch")
        (pal_l, pal_out), pal_g = jax.value_and_grad(
            loss, argnums=(0, 1, 2), has_aux=True)(tex, uv, da, "pallas")

        # pallas forward fetches through the bf16 hi+lo tile split (~2e-5)
        np.testing.assert_allclose(np.asarray(pal_out), np.asarray(ref_out),
                                   rtol=1e-4, atol=5e-5)
        # tex grads are scatter-exact; uv/da grads pass through the bf16
        # hi+lo texel split, whose ~2e-5 relative noise is amplified by the
        # d(weight)/d(uv) chain to ~1e-4 absolute
        tols = {"tex": dict(rtol=1e-4, atol=1e-5),
                "uv": dict(rtol=1e-3, atol=3e-4),
                "da": dict(rtol=1e-3, atol=3e-4)}
        for a, b, name in zip(pal_g, ref_g, ("tex", "uv", "da")):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), err_msg=f"grad mismatch: {name}",
                **tols[name])

    def test_pallas_bf16_mode_within_bf16_error(self, interpret_pallas):
        """'pallas_bf16' drops the hi/lo split (half the MXU work); values
        and gradients must stay within bf16 error (2^-8 relative) of the
        exact path."""
        from vhap_tpu.ops.texture import texture_sample
        tex, uv, da = self._setup(seed=9)

        def loss(tex, uv, da, impl):
            out = texture_sample(tex, uv, da, grad_mode="trilinear",
                                 grad_impl=impl)
            return jnp.sum(out ** 2), out

        (l_f, out_f), g_f = jax.value_and_grad(
            loss, argnums=(0, 1), has_aux=True)(tex, uv, da, "pallas")
        (l_b, out_b), g_b = jax.value_and_grad(
            loss, argnums=(0, 1), has_aux=True)(tex, uv, da, "pallas_bf16")

        np.testing.assert_allclose(np.asarray(out_b), np.asarray(out_f),
                                   rtol=2e-2, atol=5e-3)
        for a, b, name in zip(g_b, g_f, ("tex", "uv")):
            a, b = np.asarray(a), np.asarray(b)
            scale = max(np.abs(b).max(), 1e-9)
            assert np.abs(a - b).max() <= 2e-2 * scale, \
                f"bf16-mode grad {name} outside bf16 error envelope"

    def test_xla_scatter_impl_matches(self):
        # the kernel's XLA twin (same custom_vjp, .at[].add backward) —
        # runs without pallas, exercising the wrapper on any backend
        from vhap_tpu.ops.texture import texture_sample
        tex, uv, da = self._setup(seed=5)

        def loss(tex, impl):
            out = texture_sample(tex, uv, da, grad_mode="trilinear",
                                 grad_impl=impl)
            return jnp.sum(out ** 2)

        ref = jax.grad(loss)(tex, "xla_fetch")
        got = jax.grad(loss)(tex, "xla")
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-6, atol=1e-6)

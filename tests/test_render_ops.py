"""Texture sampling, shading, and antialias ops."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from vhap_tpu.ops.antialias import antialias
from vhap_tpu.ops.rasterize import rasterize, interpolate
from vhap_tpu.ops.shading import (
    compute_v_normals, safe_normalize, sh_shading, shade, uniform_sh_lights)
from vhap_tpu.ops.texture import build_mip_pyramid, texture_sample

TRI = jnp.asarray([[[-0.5, -0.5, 0.0, 1.0],
                    [0.5, -0.5, 0.0, 1.0],
                    [0.0, 0.5, 0.0, 1.0]]])
FACES = jnp.asarray([[0, 1, 2]], jnp.int32)


class TestTexture:
    def test_pyramid_shapes(self):
        tex = jnp.ones((1, 64, 64, 3))
        flat, offs, sizes = build_mip_pyramid(tex)
        assert sizes[0] == (64, 64) and sizes[-1] == (1, 1)
        assert flat.shape[1] == sum(h * w for h, w in sizes)

    def test_pyramid_mean_preserved(self):
        rng = np.random.default_rng(0)
        tex = jnp.asarray(rng.uniform(size=(1, 32, 32, 3)).astype(np.float32))
        flat, offs, sizes = build_mip_pyramid(tex)
        top = flat[:, offs[-1]:offs[-1] + 1]
        np.testing.assert_allclose(np.asarray(top[0, 0]),
                                   np.asarray(tex.mean((1, 2))[0]), atol=1e-5)

    def test_bilinear_exact_at_texel_centers(self):
        rng = np.random.default_rng(1)
        tex = jnp.asarray(rng.uniform(size=(1, 8, 8, 2)).astype(np.float32))
        # uv at texel centers: u = (j + 0.5)/8
        jj, ii = np.meshgrid(np.arange(8), np.arange(8))
        uv = jnp.asarray(np.stack([(jj + 0.5) / 8, (ii + 0.5) / 8], -1)[None].astype(np.float32))
        out = texture_sample(tex, uv, filter_mode="linear")
        np.testing.assert_allclose(np.asarray(out), np.asarray(tex), atol=1e-5)

    def test_mipmap_lod_selection(self):
        # constant-per-level pyramid distinguishable: level0 = fine checker,
        # large footprint -> sampled value ~ mean (0.5)
        tex = np.indices((64, 64)).sum(0) % 2
        tex = jnp.asarray(tex[None, ..., None].astype(np.float32))
        uv = jnp.full((1, 4, 4, 2), 0.5)
        big = jnp.full((1, 4, 4, 4), 0.25)  # huge footprint -> coarsest mip
        out = texture_sample(tex, uv, big)
        np.testing.assert_allclose(np.asarray(out), 0.5, atol=1e-3)
        tiny = jnp.full((1, 4, 4, 4), 1e-6)  # tiny -> finest mip (sharp)
        out2 = texture_sample(tex, uv, tiny)
        assert abs(float(out2[0, 0, 0, 0]) - 0.5) >= 0.0  # well-defined

    def test_texel_gradients(self):
        tex = jnp.ones((1, 8, 8, 1))
        uv = jnp.full((1, 2, 2, 2), 0.3)
        da = jnp.full((1, 2, 2, 4), 1e-6)

        def f(t):
            return jnp.sum(texture_sample(t, uv, da))

        g = jax.grad(f)(tex)
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).sum()) > 0


class TestShading:
    def test_vertex_normals_sphere(self):
        # icosphere-ish: normals should point outward (dot(n, v) > 0)
        from vhap_tpu.model.assets import _synth_sphere_mesh
        v, f, _, _ = _synth_sphere_mesh(np.random.default_rng(0), 16, 24)
        verts = jnp.asarray(v[None])
        n = compute_v_normals(verts, jnp.asarray(f, jnp.int32))
        center = verts.mean(1, keepdims=True)
        outward = np.asarray(jnp.sum(n * safe_normalize(verts - center), -1))
        assert (outward > 0.5).mean() > 0.95

    def test_sh_uniform_light_is_constant(self):
        lights = jnp.asarray(uniform_sh_lights())[None]
        n = safe_normalize(jnp.asarray(np.random.default_rng(0).normal(size=(1, 4, 4, 3)).astype(np.float32)))
        d = sh_shading(n, lights)
        np.testing.assert_allclose(np.asarray(d), np.asarray(d)[0, 0, 0, 0], atol=1e-5)

    def test_front_shading_matches_reference_semantics(self):
        n = jnp.asarray([[[[0.0, 0.0, 1.0]], [[0.0, 0.0, -1.0]]]])
        d = shade(n, "front")
        np.testing.assert_allclose(np.asarray(d).reshape(-1), [1.0, 0.3], atol=1e-6)


class TestAntialias:
    def _render(self, vc, H=32, W=32):
        rast, db, tid = rasterize(vc, FACES, (H, W), backend="xla")
        color = jnp.where((rast[..., 3:] > 0), 1.0, 0.0)
        color = jnp.broadcast_to(color, color.shape[:3] + (4,))
        return rast, color

    def test_identity_away_from_edges(self):
        rast, color = self._render(TRI)
        out = antialias(color, rast, TRI, FACES)
        # interior & far-background unchanged
        diff = np.abs(np.asarray(out - color)).max(-1)
        tid = np.asarray(rast[..., 3]) > 0
        import scipy.ndimage as ndi
        interior = ndi.binary_erosion(tid[0], iterations=2)
        assert diff[0][interior].max() < 1e-6

    def test_blend_at_silhouette(self):
        rast, color = self._render(TRI)
        out = antialias(color, rast, TRI, FACES)
        assert float(jnp.abs(out - color).sum()) > 0  # edges touched

    def test_boundary_gradient_matches_coverage_change(self):
        # moving the whole triangle right increases sum of the binary image
        # over the right edge; AA gradient must capture coverage change sign
        def f(vc):
            rast, db, tid = rasterize(vc, FACES, (64, 64), backend="xla")
            color = jnp.where(rast[..., 3:] > 0, 1.0, 0.0)
            out = antialias(color, rast, vc, FACES)
            return jnp.sum(out)

        g = jax.grad(f)(TRI)
        g = np.asarray(g)
        assert np.isfinite(g).all() and np.abs(g).sum() > 0
        # enlarging the triangle (moving v2 up) increases coverage:
        # d sum / d y2 > 0
        assert g[0, 2, 1] > 0
        # moving v0 left (more coverage since v0 is bottom-left) -> sum grows
        assert g[0, 0, 0] < 0

    def test_coverage_gradient_magnitude(self):
        # coverage-area derivative: d(area_px)/d(y2) ~ base/2 * (px/ndc)^2
        H = W = 64
        def f(vc):
            rast, db, tid = rasterize(vc, FACES, (H, W), backend="xla")
            color = jnp.where(rast[..., 3:] > 0, 1.0, 0.0)
            return jnp.sum(antialias(color, rast, vc, FACES)[..., 0])

        g = jax.grad(f)(TRI)
        # analytic: area_ndc = 0.5 * base * height; d(area)/dy2 = base/2 = 0.5
        # in pixels: * (W/2)*(H/2) = 1024 -> d(sum)/dy2 ~ 512
        assert 300 < float(g[0, 2, 1]) < 700, float(g[0, 2, 1])


def test_sh_shading_per_batch_lights():
    """Batched distinct lights shade each batch element with ITS OWN
    coefficients (regression: an ellipsis einsum summed over the lights
    batch, so every pixel saw the sum of all batch elements' lights)."""
    import numpy as np
    from vhap_tpu.ops.shading import sh_shading
    rng = np.random.default_rng(0)
    n = rng.normal(size=(3, 4, 5, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    lights = rng.normal(size=(3, 9, 3)).astype(np.float32)
    out = np.asarray(sh_shading(jnp.asarray(n), jnp.asarray(lights)))
    for b in range(3):
        ref = np.asarray(sh_shading(jnp.asarray(n[b:b + 1]),
                                    jnp.asarray(lights[b:b + 1])))[0]
        np.testing.assert_allclose(out[b], ref, rtol=1e-5, atol=1e-6)
    # shared lights broadcast over the batch
    shared = np.asarray(sh_shading(jnp.asarray(n), jnp.asarray(lights[:1])))
    ref0 = np.asarray(sh_shading(jnp.asarray(n[1:2]), jnp.asarray(lights[:1])))
    np.testing.assert_allclose(shared[1], ref0[0], rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("impl", ["sample", "pairswap"])
class TestClusterDisturbance:
    """The adaptive-appearance-prior pixel swap
    (vhap/util/render_nvdiffrast.py:424-460), for BOTH sampling
    machineries (RenderConfig.disturb_impl; 'pairswap' is the default —
    docs/PERF.md round 5)."""

    def _run(self, impl, rate_fg=1.0, rate_bg=1.0, seed=0):
        from vhap_tpu.ops.render import _cluster_disturbance
        rng = np.random.default_rng(seed)
        B, H, W = 2, 16, 16
        cid = jnp.asarray(rng.integers(0, 4, (B, H, W)), jnp.int32)
        fg = cid > 0
        rgb = jnp.asarray(rng.uniform(0.0, 2.0, (B, H, W, 3)), jnp.float32)
        alpha = fg[..., None].astype(jnp.float32)
        rgba = jnp.concatenate([rgb, alpha], -1)
        rgba_bg = jnp.broadcast_to(
            jnp.asarray([1.0, 1.0, 1.0, 0.0]), rgba.shape)
        rgba = jnp.where(fg[..., None], rgba, rgba_bg)
        out = _cluster_disturbance(rgba, rgba_bg, cid,
                                   jax.random.PRNGKey(seed), rate_fg,
                                   rate_bg, num_clusters=4, impl=impl)
        return np.asarray(rgba), np.asarray(out), np.asarray(cid)

    def test_alpha_untouched_and_cluster1_fixed(self, impl):
        rgba, out, cid = self._run(impl)
        np.testing.assert_array_equal(out[..., 3], rgba[..., 3])
        m1 = cid == 1
        np.testing.assert_allclose(out[m1], rgba[m1], atol=1e-6)

    def test_swapped_values_come_from_own_cluster(self, impl):
        rgba, out, cid = self._run(impl)
        # every output pixel's rgb must match SOME pixel of its own
        # cluster (8-bit-over-[0,2) tolerance from the packed sort key)
        for c in (2, 3):
            pool = rgba[cid == c][:, :3]
            got = out[cid == c][:, :3]
            d = np.abs(got[:, None, :] - pool[None, :, :]).max(-1).min(1)
            assert d.max() < 1e-2, d.max()

    def test_swaps_actually_move_pixels(self, impl):
        """At rate 1 a substantial fraction of cluster-2/3 pixels must
        CHANGE value (guards a degenerate identity implementation)."""
        rgba, out, cid = self._run(impl)
        m = cid >= 2
        changed = (np.abs(out[m][:, :3] - rgba[m][:, :3]).max(-1) > 1e-3)
        assert changed.mean() > 0.5, changed.mean()

    def test_rate_none_is_identity(self, impl):
        rgba, out, _ = self._run(impl, rate_fg=None, rate_bg=None)
        np.testing.assert_allclose(out, rgba, atol=1e-6)

    def test_swap_rate_matches_bernoulli(self, impl):
        """At rate 0.5 roughly half the disturbable pixels change."""
        rgba, out, cid = self._run(impl, rate_fg=0.5, rate_bg=0.5, seed=5)
        m = cid >= 2
        changed = (np.abs(out[m][:, :3] - rgba[m][:, :3]).max(-1) > 1e-3)
        # P(change) = rate * P(sample differs from own pixel) ~ rate
        assert 0.3 < changed.mean() < 0.6, changed.mean()

    def test_gradients_scale_with_keep_probability(self, impl):
        """Swapped-in values are detached; the rendered pixel's gradient
        is (1 - w) per pixel, and alpha keeps gradient 1."""
        from vhap_tpu.ops.render import _cluster_disturbance
        rng = np.random.default_rng(3)
        B, H, W = 1, 8, 8
        cid = jnp.asarray(rng.integers(2, 4, (B, H, W)), jnp.int32)
        rgba_bg = jnp.broadcast_to(
            jnp.asarray([1.0, 1.0, 1.0, 0.0]), (B, H, W, 4))

        def f(x):
            out = _cluster_disturbance(x, rgba_bg, cid,
                                       jax.random.PRNGKey(0), 1.0, 1.0,
                                       num_clusters=4, impl=impl)
            return jnp.sum(out)

        x = jnp.asarray(rng.uniform(size=(B, H, W, 4)), jnp.float32)
        g = np.asarray(jax.grad(f)(x))
        # rate 1 -> every pixel swapped: rgb grads 0, alpha grads 1
        np.testing.assert_allclose(g[..., :3], 0.0, atol=1e-6)
        np.testing.assert_allclose(g[..., 3], 1.0, atol=1e-6)

    def test_padded_frames_excluded_from_pool(self, impl):
        """Weight-0 padded frames never donate pixels to the swap pool:
        with rate 1 and a pool containing ONLY frame 0 (frame 1 padded),
        every swapped value must come from frame 0."""
        from vhap_tpu.ops.render import _cluster_disturbance
        rng = np.random.default_rng(7)
        B, H, W = 2, 16, 16
        cid = jnp.asarray(rng.integers(2, 4, (1, H, W)), jnp.int32)
        cid = jnp.broadcast_to(cid, (B, H, W))
        # frame 0 rgb in [0, 1); padded frame 1 rgb in [10, 11) — easily
        # distinguishable from any frame-0 value
        rgb0 = rng.uniform(0.0, 1.0, (1, H, W, 3))
        rgb1 = rgb0 + 10.0
        rgb = jnp.asarray(np.concatenate([rgb0, rgb1]), jnp.float32)
        rgba = jnp.concatenate([rgb, jnp.ones((B, H, W, 1))], -1)
        rgba_bg = jnp.broadcast_to(
            jnp.asarray([1.0, 1.0, 1.0, 0.0]), rgba.shape)
        out = _cluster_disturbance(
            rgba, rgba_bg, cid, jax.random.PRNGKey(0), 1.0, 1.0,
            num_clusters=4,
            sample_weight=jnp.asarray([1.0, 0.0]), impl=impl)
        out = np.asarray(out)
        # frame 0's swapped-in values all originate in frame 0 (< 1; the
        # packed sort key clips swap sources to [0, 2), so leaked frame-1
        # values would read exactly 2.0)
        assert out[0, ..., :3].max() < 1.5, out[0].max()
        # sanity: without the weight, frame-1 values DO leak into frame 0
        leaky = np.asarray(_cluster_disturbance(
            rgba, rgba_bg, cid, jax.random.PRNGKey(0), 1.0, 1.0,
            num_clusters=4, impl=impl))
        assert leaky[0, ..., :3].max() > 1.5

"""Parity of the tiled render layout vs the image layout (round 5).

The tiled path (ops/render.py _render_tail_tiled + ops/antialias_tiled)
re-expresses the post-interp chain on (B, T, C, npx) planes; these tests
pin that its values and gradients match the image-layout chain exactly
(same math, different layout), including the cross-tile antialias pairs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vhap_tpu.ops.render import (RenderSettings, rasterize_mesh, render_rgba)


def _scene(B=2, V=80, Fc=60, seed=0):
    rng = np.random.default_rng(seed)
    verts = jnp.asarray(rng.normal(0, 0.35, (B, V, 3)), jnp.float32)
    verts = verts.at[..., 2].add(-2.5)
    faces = jnp.asarray(rng.integers(0, V, (Fc, 3)), jnp.int32)
    verts_uv = jnp.asarray(rng.uniform(0.05, 0.95, (V, 2)), jnp.float32)
    tex = jnp.asarray(rng.uniform(size=(1, 3, 64, 64)), jnp.float32)
    lights = jnp.asarray(rng.normal(0.1, 0.3, (1, 9, 3)), jnp.float32)
    return verts, faces, verts_uv, tex, lights


def _render(layout, verts, faces, verts_uv, tex, lights, H, W,
            background=(1.0, 1.0, 1.0), antialias=True,
            tex_mask=None, bnd_mask=None):
    B = verts.shape[0]
    RT = jnp.broadcast_to(jnp.eye(4)[None, :3], (B, 3, 4))
    K = jnp.asarray([[80.0, 80.0, W / 2, H / 2]] * B, jnp.float32)
    settings = RenderSettings(
        backend="xla", interp_impl="fused_interpret", color_dtype="f32",
        antialias=antialias, disturb_rate_fg=None, disturb_rate_bg=None,
        layout=layout)
    rd = rasterize_mesh(verts, faces, RT, K, (H, W), settings,
                        with_attrs=False)
    return render_rgba(rd, faces, verts_uv, faces, tex, lights, settings,
                       background_color=background,
                       align_texture_face_mask=tex_mask,
                       align_boundary_vert_mask=bnd_mask)


class TestTiledRenderParity:
    H, W = 32, 256  # 2x2 tiles: exercises cross-tile AA pairs both ways

    def test_values_match_image_layout(self):
        scene = _scene()
        o_t = _render("tiled", *scene, self.H, self.W)
        o_i = _render("image", *scene, self.H, self.W)
        assert "rgba_planes" in o_t and "rgba_planes" not in o_i
        for k in ("rgba", "albedo", "normal", "diffuse",
                  "diffuse_detach_normal", "aa"):
            np.testing.assert_allclose(
                np.asarray(o_t[k]), np.asarray(o_i[k]),
                rtol=2e-5, atol=2e-5, err_msg=k)

    def test_grads_match_image_layout(self):
        verts, faces, verts_uv, tex, lights = _scene(seed=3)

        def loss(layout, v, t, li):
            o = _render(layout, v, faces, verts_uv, t, li, self.H, self.W)
            if "rgba_planes" in o:
                pred = o["rgba_planes"]
                s = sum(jnp.sum(p ** 2) for p in pred)
            else:
                s = jnp.sum(o["rgba"] ** 2)
            return s

        g_t = jax.grad(lambda *a: loss("tiled", *a), argnums=(0, 1, 2))(
            verts, tex, lights)
        g_i = jax.grad(lambda *a: loss("image", *a), argnums=(0, 1, 2))(
            verts, tex, lights)
        # reduction orders differ between layouts (pad-sum vs
        # dynamic-update-slice accumulation) -> pure f32 reassociation noise
        for a, b, name in zip(g_t, g_i, ("verts", "tex", "lights")):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-3, atol=2e-4, err_msg=name)

    def test_region_masks_match(self):
        verts, faces, verts_uv, tex, lights = _scene(seed=5)
        rng = np.random.default_rng(5)
        tex_mask = rng.uniform(size=faces.shape[0] + 1) > 0.5
        bnd_mask = rng.uniform(size=verts.shape[1]) > 0.5
        o_t = _render("tiled", verts, faces, verts_uv, tex, lights,
                      self.H, self.W, tex_mask=tex_mask, bnd_mask=bnd_mask)
        o_i = _render("image", verts, faces, verts_uv, tex, lights,
                      self.H, self.W, tex_mask=tex_mask, bnd_mask=bnd_mask)
        np.testing.assert_allclose(np.asarray(o_t["rgba"]),
                                   np.asarray(o_i["rgba"]),
                                   rtol=2e-5, atol=2e-5)

    def test_antialias_off_matches(self):
        scene = _scene(seed=7)
        o_t = _render("tiled", *scene, self.H, self.W, antialias=False)
        o_i = _render("image", *scene, self.H, self.W, antialias=False)
        np.testing.assert_allclose(np.asarray(o_t["rgba"]),
                                   np.asarray(o_i["rgba"]),
                                   rtol=2e-5, atol=2e-5)
        assert float(np.abs(np.asarray(o_t["aa"])).max()) == 0.0


class TestPaddedTiling:
    """Non-tile-divisible resolutions ride the kernels on a padded canvas
    (RenderSettings.crop_size, VERDICT r4 #3). The projection and every
    per-pixel NDC mapping keep the ORIGINAL image's scale (rasterize
    pixel_grid ndc=), so live pixels are BIT-EXACT vs the unpadded render
    — padding changes only where dead pixels sit, never any live value."""

    H0, W0 = 40, 200   # not divisible by (16, 128); pads to (48, 256)

    @staticmethod
    def _run(H0, W0, size, crop, impl, verts, faces, verts_uv, tex, lights):
        B = verts.shape[0]
        RT = jnp.broadcast_to(jnp.eye(4)[None, :3], (B, 3, 4))
        K = jnp.asarray([[80.0, 80.0, W0 / 2, H0 / 2]] * B, jnp.float32)
        if impl == "planes":
            settings = RenderSettings(
                backend="xla", interp_impl="planes", plane_impl="xla",
                color_dtype="f32", disturb_rate_fg=None,
                disturb_rate_bg=None, layout="image")
        else:
            settings = RenderSettings(
                backend="xla", interp_impl="fused_interpret",
                color_dtype="f32", disturb_rate_fg=None,
                disturb_rate_bg=None, layout="tiled", crop_size=crop)
        rd = rasterize_mesh(verts, faces, RT, K, size, settings,
                            with_attrs=False)
        return render_rgba(rd, faces, verts_uv, faces, tex, lights,
                           settings)

    def test_padded_render_bitexact(self):
        """Same impl, tile-divisible original (32, 256) padded to
        (48, 384): every live pixel is bit-for-bit identical."""
        scene = _scene(seed=11)
        o_p = self._run(32, 256, (48, 384), (32, 256), "fused", *scene)
        o_u = self._run(32, 256, (32, 256), None, "fused", *scene)
        for k in ("rgba", "albedo", "normal", "diffuse", "aa"):
            a, b = np.asarray(o_p[k]), np.asarray(o_u[k])
            assert a.shape == b.shape
            assert float(np.abs(a - b).max()) == 0.0, k

    def test_padded_render_matches_unpadded(self):
        """Non-divisible 40x200 padded to (48, 256) vs the exact XLA
        planes path at the true size: identical coverage and AA sets;
        values differ only by the fused-vs-planes arithmetic (the same
        cross-impl delta seen at divisible sizes)."""
        scene = _scene(seed=11)
        o_p = self._run(self.H0, self.W0, (48, 256),
                        (self.H0, self.W0), "fused", *scene)
        o_u = self._run(self.H0, self.W0, (self.H0, self.W0), None,
                        "planes", *scene)
        B = scene[0].shape[0]
        assert o_p["rgba"].shape == o_u["rgba"].shape == \
            (B, self.H0, self.W0, 4)
        # exact: coverage and the AA edge set
        cov_p = np.asarray(o_p["rgba"])[..., 3] > 0
        cov_u = np.asarray(o_u["rgba"])[..., 3] > 0
        np.testing.assert_array_equal(cov_p, cov_u)
        np.testing.assert_array_equal(np.asarray(o_p["aa"]) > 0,
                                      np.asarray(o_u["aa"]) > 0)
        for k in ("rgba", "albedo", "normal", "diffuse"):
            np.testing.assert_allclose(np.asarray(o_p[k]),
                                       np.asarray(o_u[k]),
                                       rtol=2e-3, atol=2e-3, err_msg=k)

    def test_energy_padded_matches_unpadded(self):
        """The staged energy at 40x200 pads transparently (pad_to_tiles)
        and reproduces the image-layout terms (disturbance off)."""
        from vhap_tpu.config.base import BaseTrackingConfig
        from vhap_tpu.model.flame import FlameHead, FlameTexPainted
        from vhap_tpu.tracker import params as P
        from vhap_tpu.tracker.energy import make_albedo_fn, make_energy_fn

        H, W = self.H0, self.W0
        B, T = 2, 4
        cfg = BaseTrackingConfig()
        cfg.model.tex_resolution = 64
        cfg.render.backend = "xla"
        cfg.render.color_dtype = "f32"
        cfg.render.disturb_rate_fg = None
        cfg.render.disturb_rate_bg = None
        cfg.batch_size = B
        cfg.__post_init__()
        head = FlameHead.build(n_shape=50, n_expr=20,
                               face_clusters=cfg.model.tex_clusters)
        get_albedo = make_albedo_fn(
            cfg, FlameTexPainted(head.assets.tex_painted, 64), None)
        params = P.init_params(T, 50, 20, cfg.model.n_tex, head.num_verts,
                               64, cfg.model.tex_painted,
                               cfg.model.tex_extra, True, False, False,
                               False)
        rng = np.random.default_rng(1)
        batch = {
            "rgb": jnp.asarray(rng.uniform(size=(B, H, W, 3)), jnp.float32),
            "lmk2d": jnp.asarray(np.concatenate(
                [rng.uniform(0, W, (B, 70, 2)), np.ones((B, 70, 1))],
                -1), jnp.float32),
            "timestep_index": jnp.asarray(np.arange(B), jnp.int32),
            "weight": jnp.ones((B,), jnp.float32),
        }
        key = jax.random.PRNGKey(0)
        stage = "rgb_sequential_tracking"

        cfg.render.interp_impl = "fused_interpret"
        cfg.render.pad_to_tiles = True
        E_p, (log_p, _) = make_energy_fn(
            head, cfg, get_albedo, (H, W), T, stage)(params, batch, key)
        cfg.render.interp_impl = "planes"
        cfg.render.plane_impl = "xla"
        cfg.render.layout = "image"
        E_u, (log_u, _) = make_energy_fn(
            head, cfg, get_albedo, (H, W), T, stage)(params, batch, key)
        assert set(log_p) == set(log_u)
        for k in log_u:
            np.testing.assert_allclose(
                np.asarray(log_p[k]), np.asarray(log_u[k]),
                rtol=1e-5, atol=1e-6, err_msg=k)


class TestTiledEnergyParity:
    """End-to-end: the tiled photometric/reg energies equal the image ones
    (disturbance off — its RNG consumption differs by pixel order)."""

    def test_energy_terms_match(self):
        from vhap_tpu.config.base import BaseTrackingConfig
        from vhap_tpu.model.flame import FlameHead, FlameTexPainted
        from vhap_tpu.tracker import params as P
        from vhap_tpu.tracker.energy import make_albedo_fn, make_energy_fn

        H, W = 32, 256
        B, T = 2, 4
        cfg = BaseTrackingConfig()
        cfg.model.tex_resolution = 64
        cfg.render.interp_impl = "fused_interpret"
        cfg.render.backend = "xla"
        cfg.render.color_dtype = "f32"
        cfg.render.disturb_rate_fg = None
        cfg.render.disturb_rate_bg = None
        cfg.batch_size = B
        cfg.__post_init__()
        head = FlameHead.build(n_shape=50, n_expr=20,
                               face_clusters=cfg.model.tex_clusters)
        get_albedo = make_albedo_fn(
            cfg, FlameTexPainted(head.assets.tex_painted, 64), None)
        params = P.init_params(T, 50, 20, cfg.model.n_tex, head.num_verts,
                               64, cfg.model.tex_painted, cfg.model.tex_extra,
                               True, False, False, False)
        rng = np.random.default_rng(0)
        batch = {
            "rgb": jnp.asarray(rng.uniform(size=(B, H, W, 3)), jnp.float32),
            "lmk2d": jnp.asarray(np.concatenate(
                [rng.uniform(0, W, (B, 70, 2)), np.ones((B, 70, 1))],
                -1), jnp.float32),
            "timestep_index": jnp.asarray(np.arange(B), jnp.int32),
            "weight": jnp.ones((B,), jnp.float32),
        }
        key = jax.random.PRNGKey(0)

        stage = "rgb_sequential_tracking"

        def make(layout):
            cfg.render.layout = layout
            return make_energy_fn(head, cfg, get_albedo, (H, W), T, stage)

        E_t, (log_t, _) = make("tiled")(params, batch, key)
        E_i, (log_i, _) = make("image")(params, batch, key)
        assert set(log_t) == set(log_i)
        for k in log_i:
            np.testing.assert_allclose(
                np.asarray(log_t[k]), np.asarray(log_i[k]),
                rtol=1e-5, atol=1e-6, err_msg=k)

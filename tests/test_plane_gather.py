"""Parity tests for the Pallas per-tile face-plane gather (interpret mode).

The kernel must reproduce gather_face_planes_packed exactly up to the
bf16 hi/lo split (~2e-5 relative): same per-pixel plane values, same
table gradients, including the fid = max(tri_id - 1, 0) background clamp.
Reference behavior: the per-pixel attribute stage of nvdiffrast's
interpolation (vhap/util/render_nvdiffrast.py:354-399).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vhap_tpu.ops.plane_pallas import plane_gather_tiled
from vhap_tpu.ops.rasterize import (fused_rast_and_planes,
                                    gather_face_planes_packed,
                                    visibility_dispatch)


def _ref_planes(packed, tri_id):
    fid = jnp.maximum(tri_id - 1, 0)
    return jnp.stack(gather_face_planes_packed(packed, fid), axis=1)


class TestPlaneGatherKernel:
    def _setup(self, B=2, C=13, F=300, H=32, W=256, seed=0):
        rng = np.random.default_rng(seed)
        packed = jnp.asarray(rng.normal(size=(B, C, F)), jnp.float32)
        tri_id = jnp.asarray(rng.integers(0, F + 1, (B, H, W)), jnp.int32)
        T = (H // 16) * (W // 128)
        lists = jnp.broadcast_to(jnp.arange(F, dtype=jnp.int32), (B, T, F))
        return packed, tri_id, lists, rng

    def test_values_and_grads_match_gather(self):
        packed, tri_id, lists, rng = self._setup()
        planes, ovf = plane_gather_tiled(packed, tri_id, lists, 16, 128,
                                         512, True)
        ref = _ref_planes(packed, tri_id)
        assert int(ovf) == 0
        np.testing.assert_allclose(np.asarray(planes), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)

        g = jnp.asarray(rng.normal(size=planes.shape), jnp.float32)
        gp = jax.grad(lambda p: jnp.sum(plane_gather_tiled(
            p, tri_id, lists, 16, 128, 512, True)[0] * g))(packed)
        gr = jax.grad(lambda p: jnp.sum(_ref_planes(p, tri_id) * g))(packed)
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gr),
                                   rtol=1e-4, atol=1e-3)

    def test_unlisted_background_clamps_to_face0(self):
        """Tiles whose lists omit face 0 must still give background pixels
        face 0's values (the XLA gather's clamped-index semantics), with
        gradients routed to face 0 — and report zero overflow (background
        misses are not errors)."""
        packed, tri_id, lists, rng = self._setup(seed=3)
        tri_id = tri_id.at[0, :16, :128].set(0)       # force a bg region
        lists = lists[..., 1:]                        # drop face id 0
        # keep all fg pixels resolvable: remap fid 1 (face 0) to 2
        tri_id = jnp.where(tri_id == 1, 2, tri_id)

        planes, ovf = plane_gather_tiled(packed, tri_id, lists, 16, 128,
                                         512, True)
        ref = _ref_planes(packed, tri_id)
        assert int(ovf) == 0
        np.testing.assert_allclose(np.asarray(planes), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)

        g = jnp.asarray(rng.normal(size=planes.shape), jnp.float32)
        gp = jax.grad(lambda p: jnp.sum(plane_gather_tiled(
            p, tri_id, lists, 16, 128, 512, True)[0] * g))(packed)
        gr = jax.grad(lambda p: jnp.sum(_ref_planes(p, tri_id) * g))(packed)
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gr),
                                   rtol=1e-4, atol=1e-3)

    def test_foreground_miss_surfaces_overflow(self):
        """A foreground pixel whose face is beyond the capped list is
        fixed up to face 0 and COUNTED (the rast_overflow contract)."""
        packed, tri_id, lists, _ = self._setup(seed=4)
        missing = 7
        lists = jnp.where(lists == missing, 0, lists)   # face 7 unlisted
        n_fg7 = int((tri_id == missing + 1).sum())
        assert n_fg7 > 0
        planes, ovf = plane_gather_tiled(packed, tri_id, lists, 16, 128,
                                         512, True)
        assert int(ovf) == n_fg7
        # fixed-up pixels carry face 0's values
        b, i, j = np.argwhere(np.asarray(tri_id) == missing + 1)[0]
        np.testing.assert_allclose(np.asarray(planes)[b, :, i, j],
                                   np.asarray(packed)[b, :, 0],
                                   rtol=1e-4, atol=1e-4)

    def test_list_cap_slices_slots(self):
        """max_list caps the consulted slots; winners within the cap are
        unaffected."""
        packed, tri_id, lists, _ = self._setup(C=5, F=120, seed=5)
        # all winners sit in the first 120 slots; a cap of 128 changes nothing
        planes, ovf = plane_gather_tiled(packed, tri_id, lists, 16, 128,
                                         128, True)
        ref = _ref_planes(packed, tri_id)
        assert int(ovf) == 0
        np.testing.assert_allclose(np.asarray(planes), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)


class TestFusedIntegration:
    def _scene(self, B=2, V=60, Fc=40, H=32, W=128, seed=1):
        rng = np.random.default_rng(seed)
        verts = jnp.asarray(rng.normal(0, 0.4, (B, V, 3)), jnp.float32)
        verts_clip = jnp.concatenate(
            [verts[..., :2], verts[..., 2:] * 0.1,
             jnp.ones((B, V, 1)) + 0.3 * jnp.abs(verts[..., 2:])], -1)
        faces = jnp.asarray(rng.integers(0, V, (Fc, 3)), jnp.int32)
        tri_id, _, lists = visibility_dispatch(
            verts_clip, faces, H, W, "xla", False, return_lists=True)
        assert int((tri_id > 0).sum()) > 100
        extra = jnp.asarray(rng.normal(size=(B, 7, Fc)), jnp.float32)
        return verts_clip, faces, tri_id, lists, extra, rng

    def test_fused_rast_pallas_vs_xla(self):
        verts_clip, faces, tri_id, lists, extra, rng = self._scene()

        def run(impl, vc):
            rast, rast_db, planes, po = fused_rast_and_planes(
                vc, faces, tri_id, extra, lists=lists, plane_impl=impl)
            return rast, rast_db, jnp.stack(planes, 1), po

        r0, db0, p0, _ = run("xla", verts_clip)
        r1, db1, p1, po = run("pallas_interpret", verts_clip)
        assert int(po) == 0
        for name, a, b, tol in (("rast", r0, r1, 2e-3),
                                ("rast_db", db0, db1, 2e-3),
                                ("planes", p0, p1, 2e-4)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-3, atol=tol,
                                       err_msg=f"{name} mismatch")

        g1 = jnp.asarray(rng.normal(size=r0.shape), jnp.float32)
        g2 = jnp.asarray(rng.normal(size=p0.shape), jnp.float32)

        def loss(vc, impl):
            rast, _, planes, _ = run(impl, vc)
            return jnp.sum(rast * g1) + jnp.sum(planes * g2)

        ga = jax.grad(loss)(verts_clip, "xla")
        gb = jax.grad(loss)(verts_clip, "pallas_interpret")
        scale = float(jnp.abs(ga).max())
        assert float(jnp.abs(ga - gb).max()) <= 2e-4 * scale

    def test_auto_resolves_to_xla_off_tpu(self):
        verts_clip, faces, tri_id, lists, extra, _ = self._scene(seed=2)
        rast, _, planes, po = fused_rast_and_planes(
            verts_clip, faces, tri_id, extra, lists=lists, plane_impl="auto")
        r0, _, p0, _ = fused_rast_and_planes(
            verts_clip, faces, tri_id, extra, lists=None, plane_impl="xla")
        np.testing.assert_array_equal(np.asarray(rast), np.asarray(r0))


class TestFusedInterp:
    """The deferred-interp kernel (ops/interp_pallas.py) must reproduce the
    raw-planes + XLA-math path of render_rgba exactly (up to the bf16
    hi/lo table split, ~2e-5 relative), values AND gradients."""

    def _scene(self, B=2, seed=0):
        from vhap_tpu.ops.render import RenderSettings, rasterize_mesh
        rng = np.random.default_rng(seed)
        V, Fc, H, W = 80, 60, 32, 128
        verts = jnp.asarray(rng.normal(0, 0.35, (B, V, 3)), jnp.float32)
        verts = verts.at[..., 2].add(-2.5)             # in front of camera
        faces = jnp.asarray(rng.integers(0, V, (Fc, 3)), jnp.int32)
        verts_uv = jnp.asarray(rng.uniform(0.05, 0.95, (V, 2)), jnp.float32)
        faces_uv = faces
        tex = jnp.asarray(rng.uniform(size=(1, 3, 64, 64)), jnp.float32)
        lights = jnp.asarray(rng.normal(0.1, 0.3, (1, 9, 3)), jnp.float32)
        lights = lights.at[0, 0].set(1.2)
        RT = jnp.broadcast_to(jnp.eye(4)[None, :3], (B, 3, 4))
        K = jnp.asarray([[80.0, 80.0, W / 2, H / 2]] * B, jnp.float32)
        atm = np.zeros(Fc + 1, bool)
        atm[1:Fc // 2] = True                          # texture-grad mask
        f2c = np.zeros(Fc + 1, np.int32)
        f2c[1:] = rng.integers(1, 4, Fc)               # cluster ids
        abm = np.zeros(V, bool)
        abm[: V // 3] = True                           # boundary detach
        return dict(verts=verts, faces=faces, verts_uv=verts_uv,
                    faces_uv=faces_uv, tex=tex, lights=lights, RT=RT, K=K,
                    H=H, W=W, atm=atm, f2c=f2c, abm=abm)

    def _render(self, sc, impl, verts=None, tex=None):
        from vhap_tpu.ops.render import RenderSettings, rasterize_mesh, \
            render_rgba
        settings = RenderSettings(
            backend="xla", interp_impl=impl, color_dtype="f32",
            plane_impl="xla" if impl == "planes" else "auto",
            disturb_rate_fg=None, disturb_rate_bg=None)
        rd = rasterize_mesh(verts if verts is not None else sc["verts"],
                            sc["faces"], sc["RT"], sc["K"],
                            (sc["H"], sc["W"]), settings, with_attrs=False)
        assert int((rd["tri_id"] > 0).sum()) > 200
        return render_rgba(
            rd, sc["faces"], sc["verts_uv"], sc["faces_uv"],
            tex if tex is not None else sc["tex"], sc["lights"], settings,
            align_texture_face_mask=sc["atm"],
            align_boundary_vert_mask=sc["abm"],
            enable_disturbance=True, fid2cid=jnp.asarray(sc["f2c"]),
            num_clusters=4, key=jax.random.PRNGKey(7))

    def test_values_match_planes_path(self):
        sc = self._scene()
        o_ref = self._render(sc, "planes")
        o_fus = self._render(sc, "fused_interpret")
        assert int(o_fus["plane_overflow"]) == 0
        fg = np.asarray(o_ref["rgba"][..., 3]) > 0
        for k in ("rgba", "albedo", "diffuse"):
            a, b = np.asarray(o_ref[k]), np.asarray(o_fus[k])
            d = np.abs(b - a)
            # bulk parity at the hi/lo-split envelope; a handful of
            # antialias edge pixels may flip sides when the ~2e-5 zw
            # rounding breaks a depth tie — bounded, isolated, small
            assert np.quantile(d, 0.995) < 5e-4, (k, np.quantile(d, 0.995))
            assert (d > 1e-3).mean() < 5e-3, (k, (d > 1e-3).mean())
            assert d.max() < 0.05, (k, d.max())
        # normals: fg pixels only (bg normals are 0 on the fused path,
        # face-0 garbage on the planes path — never consumed)
        a, b = np.asarray(o_ref["normal"]), np.asarray(o_fus["normal"])
        np.testing.assert_allclose(b[fg], a[fg], rtol=2e-3, atol=3e-4)

    def test_gradients_match_planes_path(self):
        sc = self._scene(seed=1)
        rng = np.random.default_rng(9)
        g = jnp.asarray(rng.normal(size=(2, sc["H"], sc["W"], 4)),
                        jnp.float32)

        def loss(verts, tex, impl):
            o = self._render(sc, impl, verts=verts, tex=tex)
            return jnp.sum(o["rgba"] * g)

        gv_r, gt_r = jax.grad(loss, argnums=(0, 1))(
            sc["verts"], sc["tex"], "planes")
        gv_f, gt_f = jax.grad(loss, argnums=(0, 1))(
            sc["verts"], sc["tex"], "fused_interpret")

        # hi/lo-split rounding plus a few antialias depth-tie edge flips
        # rule out elementwise equality at knife-edges; assert direction
        # and magnitude agreement instead
        def close(a, b, name):
            a, b = np.asarray(a).ravel(), np.asarray(b).ravel()
            na, nb = np.linalg.norm(a), np.linalg.norm(b)
            cos = float(a @ b / max(na * nb, 1e-20))
            assert cos > 0.9995, (name, cos)
            assert abs(na - nb) < 0.01 * max(na, 1e-20), (name, na, nb)

        close(gv_r, gv_f, "verts")
        close(gt_r, gt_f, "tex")

    def test_no_flag_rows(self):
        """nf=0 (no texture-grad mask, no disturbance): the packed table
        carries only the 36 fixed rows."""
        from vhap_tpu.ops.render import RenderSettings, rasterize_mesh, \
            render_rgba
        sc = self._scene(seed=2)

        def run(impl):
            settings = RenderSettings(
                backend="xla", interp_impl=impl, color_dtype="f32",
                plane_impl="xla" if impl == "planes" else "auto",
                disturb_rate_fg=None, disturb_rate_bg=None)
            rd = rasterize_mesh(sc["verts"], sc["faces"], sc["RT"], sc["K"],
                                (sc["H"], sc["W"]), settings,
                                with_attrs=False)
            return render_rgba(rd, sc["faces"], sc["verts_uv"],
                               sc["faces_uv"], sc["tex"], sc["lights"],
                               settings)

        a = np.asarray(run("planes")["rgba"])
        b = np.asarray(run("fused_interpret")["rgba"])
        d = np.abs(b - a)
        assert np.quantile(d, 0.995) < 5e-4 and d.max() < 0.05

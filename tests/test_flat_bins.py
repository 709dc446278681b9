"""Flat (globally-budgeted) face bins vs the dense per-tile lists.

The flat work list (rasterize.bin_faces_flat) must be a re-packing of the
same binning decision the dense path makes — same per-tile face sets when
nothing overflows — and the flat visibility / fused-interp kernels must
reproduce the dense kernels bit-exactly (docs/PERF.md round 4: the dense
(B, T, K) tables are ~94% padding at bench shapes).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vhap_tpu.ops.rasterize import (bin_faces, bin_faces_flat, face_setup,
                                    flat_bin_budget, _visibility_xla)
from vhap_tpu.ops.rasterize_pallas import (visibility_pallas,
                                           visibility_pallas_flat)


def _random_scene(B=2, V=80, F=120, seed=0):
    rng = np.random.default_rng(seed)
    verts = rng.uniform(-0.9, 0.9, (B, V, 3)).astype(np.float32)
    w = rng.uniform(1.0, 3.0, (B, V, 1)).astype(np.float32)
    verts_clip = np.concatenate([verts * w, w], axis=-1).astype(np.float32)
    faces = rng.integers(0, V, (F, 3)).astype(np.int32)
    return jnp.asarray(verts_clip), jnp.asarray(faces)


class TestBinFacesFlat:
    def test_matches_dense_sets(self):
        verts_clip, faces = _random_scene()
        H, W, th, tw = 64, 256, 16, 128
        setup = face_setup(verts_clip, faces, True)
        lists, counts, (ty, tx), ov_d = bin_faces(
            setup, H, W, th, tw, faces.shape[0])
        bins = bin_faces_flat(setup, H, W, th, tw)
        assert int(bins["overflow"]) == 0 and int(ov_d) == 0
        B, T = counts.shape
        fids = np.asarray(bins["fids"]).reshape(B, -1, 128)
        start = np.asarray(bins["start128"])
        cnts = np.asarray(bins["counts"])
        assert (cnts == np.asarray(counts)).all()
        for b in range(B):
            for t in range(T):
                n = int(counts[b, t])
                dense_set = set(np.asarray(lists[b, t, :n]).tolist())
                s0 = start[b, t]
                nchunk = -(-max(n, 1) // 128)
                seg = fids[b, s0:s0 + nchunk].reshape(-1)[:n]
                assert set(seg.tolist()) == dense_set, (b, t)
                # pad slots of the tile's last chunk are -1
                pad = fids[b, s0:s0 + nchunk].reshape(-1)[n:]
                assert (pad == -1).all()

    def test_ctile_covers_all_tiles(self):
        verts_clip, faces = _random_scene(seed=3)
        setup = face_setup(verts_clip, faces, True)
        bins = bin_faces_flat(setup, 64, 256, 16, 128)
        ct = np.asarray(bins["ctile"])
        T = bins["tiles"][0] * bins["tiles"][1]
        for b in range(ct.shape[0]):
            # every tile owns at least one chunk; chunk runs are contiguous
            # and non-decreasing
            assert set(range(T)) <= set(ct[b].tolist())
            assert (np.diff(ct[b]) >= 0).all()

    def test_budget_overflow_counted(self):
        verts_clip, faces = _random_scene(B=1, F=400, seed=1)
        H, W, th, tw = 32, 128, 16, 128   # 2 tiles -> tiny budget possible
        setup = face_setup(verts_clip, faces, True)
        full = bin_faces_flat(setup, H, W, th, tw)
        assert int(full["overflow"]) == 0
        total = int(np.asarray(full["counts"]).sum())
        if total <= 256:
            pytest.skip("scene too sparse to overflow a 2-chunk budget")
        tight = bin_faces_flat(setup, H, W, th, tw, budget_chunks=2)
        got = int(np.asarray(tight["counts"]).sum())
        assert got <= 256
        assert int(tight["overflow"]) == total - got
        # fids stay within granted counts
        fids = np.asarray(tight["fids"]).reshape(1, -1, 128)
        c = np.asarray(tight["counts"])[0]
        s = np.asarray(tight["start128"])[0]
        for t in range(2):
            seg = fids[0, s[t]:s[t] + 1].reshape(-1)
            assert (seg[:c[t]] >= 0).all()
            assert (seg[c[t]:] == -1).all()

    def test_budget_formula(self):
        assert flat_bin_budget(10144, 128) % 8 == 0
        assert flat_bin_budget(10144, 128) >= 128 + (2 * 10144) // 128


class TestVisibilityFlat:
    @pytest.mark.parametrize("seed", [0, 2])
    def test_matches_dense_and_xla(self, seed):
        verts_clip, faces = _random_scene(seed=seed)
        H, W = 64, 256
        tri_dense, ov, _ = visibility_pallas(
            verts_clip, faces, H, W, interpret=True, return_lists=True)
        tri_flat, bins = visibility_pallas_flat(
            verts_clip, faces, H, W, interpret=True)
        tri_xla = _visibility_xla(verts_clip, faces, H, W)
        assert int(ov) == 0 and int(bins["overflow"]) == 0
        np.testing.assert_array_equal(np.asarray(tri_flat),
                                      np.asarray(tri_dense))
        np.testing.assert_array_equal(np.asarray(tri_flat),
                                      np.asarray(tri_xla))

    def test_empty_tiles_write_background(self):
        # a scene covering almost nothing: all tiles must still be written
        verts_clip, faces = _random_scene(B=1, V=6, F=2, seed=5)
        verts_clip = verts_clip.at[..., :2].mul(0.02)   # shrink to center
        tri_flat, bins = visibility_pallas_flat(
            verts_clip, faces, 64, 256, interpret=True)
        tri_xla = _visibility_xla(verts_clip, faces, 64, 256)
        np.testing.assert_array_equal(np.asarray(tri_flat),
                                      np.asarray(tri_xla))

    def test_interp_flat_matches_dense(self):
        """fused_interp_flat == fused_interp_tiled (values AND the packed
        table gradient) on the same scene."""
        from vhap_tpu.ops.interp_pallas import (N_FIXED_IN,
                                                fused_interp_flat,
                                                fused_interp_tiled)
        from vhap_tpu.ops.rasterize import visibility_dispatch

        verts_clip, faces = _random_scene(B=2, seed=4)
        H, W, nf = 64, 256, 2
        rng = np.random.default_rng(11)
        tri_id, _, lists = visibility_dispatch(
            verts_clip, faces, H, W, "xla", True, return_lists=True)
        _, _, bins = visibility_dispatch(
            verts_clip, faces, H, W, "xla", True, return_lists="flat")
        assert int((tri_id > 0).sum()) > 200
        packed = jnp.asarray(
            rng.normal(size=(2, N_FIXED_IN + nf, faces.shape[0])),
            jnp.float32)

        o_d, ov_d = fused_interp_tiled(packed, tri_id, lists, nf, 16, 128,
                                       0, True)
        o_f, ov_f = fused_interp_flat(packed, tri_id, bins, nf, 16, 128,
                                      True)
        assert int(ov_d) == 0 and int(ov_f) == 0
        # mask-multiplied channels (zw/texc/texd/normal) agree everywhere;
        # vids/flags/aa/match agree on FOREGROUND pixels only — at
        # background pixels the dense lists also carry non-overlapping
        # faces (order[:, :K] with K=F), so clamped fid=0 may resolve face
        # 0 there; those channels of bg pixels are never consumed
        # (ops/interp_pallas.py docstring).
        fg = np.asarray(tri_id > 0)[:, None]
        np.testing.assert_allclose(np.asarray(o_f[:, :10]),
                                   np.asarray(o_d[:, :10]),
                                   rtol=1e-5, atol=1e-5)
        d_rest = np.abs(np.asarray(o_f[:, 10:]) - np.asarray(o_d[:, 10:]))
        assert (d_rest * fg).max() <= 1e-5

        g = jnp.asarray(rng.normal(size=o_d.shape), jnp.float32)
        g = g * jnp.asarray(fg, jnp.float32)   # bg channels unspecified

        def loss_d(p):
            return jnp.sum(fused_interp_tiled(
                p, tri_id, lists, nf, 16, 128, 0, True)[0] * g)

        def loss_f(p):
            return jnp.sum(fused_interp_flat(
                p, tri_id, bins, nf, 16, 128, True)[0] * g)

        gd = np.asarray(jax.grad(loss_d)(packed))
        gf = np.asarray(jax.grad(loss_f)(packed))
        scale = max(np.abs(gd).max(), 1e-6)
        assert np.abs(gf - gd).max() <= 2e-5 * scale

    def test_render_flat_matches_dense_bins(self):
        """Full render_rgba with bin_mode flat vs dense: identical output
        (same kernel math, different list packing)."""
        from vhap_tpu.ops.render import RenderSettings, rasterize_mesh, \
            render_rgba
        rng = np.random.default_rng(2)
        B, V, Fc, H, W = 2, 80, 60, 32, 128
        verts = jnp.asarray(rng.normal(0, 0.35, (B, V, 3)), jnp.float32)
        verts = verts.at[..., 2].add(-2.5)
        faces = jnp.asarray(rng.integers(0, V, (Fc, 3)), jnp.int32)
        verts_uv = jnp.asarray(rng.uniform(0.05, 0.95, (V, 2)), jnp.float32)
        tex = jnp.asarray(rng.uniform(size=(1, 3, 64, 64)), jnp.float32)
        lights = jnp.asarray(rng.normal(0.1, 0.3, (1, 9, 3)), jnp.float32)
        RT = jnp.broadcast_to(jnp.eye(4)[None, :3], (B, 3, 4))
        K = jnp.asarray([[80.0, 80.0, W / 2, H / 2]] * B, jnp.float32)

        def run(bin_mode):
            settings = RenderSettings(
                backend="xla", interp_impl="fused_interpret",
                color_dtype="f32", bin_mode=bin_mode,
                disturb_rate_fg=None, disturb_rate_bg=None)
            rd = rasterize_mesh(verts, faces, RT, K, (H, W), settings,
                                with_attrs=False)
            return render_rgba(rd, faces, verts_uv, faces, tex, lights,
                               settings)

        o_f, o_d = run("flat"), run("dense")
        assert int(o_f["plane_overflow"]) == 0
        for k in ("rgba", "normal", "albedo"):
            np.testing.assert_allclose(np.asarray(o_f[k]),
                                       np.asarray(o_d[k]),
                                       rtol=1e-5, atol=1e-5, err_msg=k)

    def test_tight_budget_truncates_but_runs(self):
        verts_clip, faces = _random_scene(B=1, F=300, seed=7)
        tri_flat, bins = visibility_pallas_flat(
            verts_clip, faces, 64, 256, budget_chunks=8, interpret=True)
        assert tri_flat.shape == (1, 64, 256)
        # overflow surfaced when the budget truncated anything
        full = visibility_pallas_flat(
            verts_clip, faces, 64, 256, interpret=True)[1]
        lost = int(np.asarray(full["counts"]).sum()) \
            - int(np.asarray(bins["counts"]).sum())
        assert int(bins["overflow"]) == int(full["overflow"]) + lost

    def test_antialias_toggle(self):
        """antialias=False skips the edge blend: the 'aa' mask is all zero
        and rgba equals the AA result away from silhouette pixels."""
        from vhap_tpu.ops.render import RenderSettings, rasterize_mesh, \
            render_rgba
        rng = np.random.default_rng(3)
        B, V, Fc, H, W = 1, 60, 40, 32, 128
        verts = jnp.asarray(rng.normal(0, 0.35, (B, V, 3)), jnp.float32)
        verts = verts.at[..., 2].add(-2.5)
        faces = jnp.asarray(rng.integers(0, V, (Fc, 3)), jnp.int32)
        verts_uv = jnp.asarray(rng.uniform(0.05, 0.95, (V, 2)), jnp.float32)
        tex = jnp.asarray(rng.uniform(size=(1, 3, 64, 64)), jnp.float32)
        lights = jnp.asarray(rng.normal(0.1, 0.3, (1, 9, 3)), jnp.float32)
        RT = jnp.broadcast_to(jnp.eye(4)[None, :3], (B, 3, 4))
        K = jnp.asarray([[80.0, 80.0, W / 2, H / 2]] * B, jnp.float32)

        def run(aa):
            settings = RenderSettings(
                backend="xla", interp_impl="fused_interpret",
                color_dtype="f32", antialias=aa,
                disturb_rate_fg=None, disturb_rate_bg=None)
            rd = rasterize_mesh(verts, faces, RT, K, (H, W), settings,
                                with_attrs=False)
            return render_rgba(rd, faces, verts_uv, faces, tex, lights,
                               settings)

        o_off, o_on = run(False), run(True)
        assert float(np.abs(np.asarray(o_off["aa"])).max()) == 0.0
        assert float(np.abs(np.asarray(o_on["aa"])).max()) > 0.0
        diff = np.abs(np.asarray(o_on["rgba"]) - np.asarray(o_off["rgba"]))
        edge = np.asarray(o_on["aa"])[..., 0] > 0
        # AA actually moved color on the edge set, and that set is a thin
        # silhouette band (not the whole image) — compare against an
        # independent bound: edge pixels must be a small fraction of the
        # foreground+background pixel count, and every edge pixel must be
        # 8-adjacent to a coverage transition in the alpha channel.
        assert diff[edge].max() > 1e-4
        assert 0 < edge.mean() < 0.15
        alpha = np.asarray(o_off["rgba"])[..., 3] > 0.5
        trans = np.zeros_like(alpha)
        trans[:, :-1] |= alpha[:, :-1] != alpha[:, 1:]
        trans[:, 1:] |= alpha[:, :-1] != alpha[:, 1:]
        trans[:, :, :-1] |= alpha[:, :, :-1] != alpha[:, :, 1:]
        trans[:, :, 1:] |= alpha[:, :, :-1] != alpha[:, :, 1:]
        # silhouette edges between two foreground faces may not flip alpha;
        # require that a majority of edge pixels sit on the alpha border
        on_border = (edge & trans).sum() / max(edge.sum(), 1)
        assert on_border > 0.5

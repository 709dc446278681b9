"""Matting backends: classical background-difference + JAX U-Net.

Reference behavior being replaced: RobustVideoMatting / BackgroundMattingV2
alpha prediction writing alpha_maps/<frame>.jpg (vhap/preprocess_video.py:
54-134). These tests pin the runnable in-repo backends.
"""

import numpy as np
import jax
import pytest

from vhap_tpu.preprocess import matting


class TestClassical:
    def test_box_filter_matches_naive(self):
        rng = np.random.default_rng(0)
        img = rng.uniform(size=(12, 9)).astype(np.float32)
        r = 2
        got = matting._box(img, r)
        ref = np.empty_like(img)
        for y in range(12):
            for x in range(9):
                y0, y1 = max(0, y - r), min(12, y + r + 1)
                x0, x1 = max(0, x - r), min(9, x + r + 1)
                ref[y, x] = img[y0:y1, x0:x1].mean()
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)

    def test_guided_filter_preserves_flat_regions(self):
        guide = np.zeros((32, 32), np.float32)
        guide[:, 16:] = 1.0
        src = guide + np.random.default_rng(1).normal(
            0, 0.05, (32, 32)).astype(np.float32)
        out = matting.guided_filter(guide, src, r=4, eps=1e-4)
        # the edge survives, the noise is smoothed
        assert abs(out[:, :12].mean() - 0.0) < 0.08
        assert abs(out[:, 20:].mean() - 1.0) < 0.08
        assert out[:, :12].std() < src[:, :12].std()

    def test_alpha_from_background_diff(self):
        rng = np.random.default_rng(2)
        bg = rng.uniform(0.4, 0.6, (64, 64, 3)).astype(np.float32)
        img = bg.copy()
        img[16:48, 20:44] = rng.uniform(0.85, 1.0, (32, 24, 3))
        alpha = matting.alpha_from_background_diff(img, bg)
        assert alpha[24:40, 26:38].mean() > 0.9     # solid foreground
        assert alpha[:8].mean() < 0.1               # clean background
        assert alpha.shape == (64, 64)

    def test_background_diff_matting_contract(self, tmp_path):
        from PIL import Image
        (tmp_path / "images").mkdir()
        (tmp_path / "bg").mkdir()
        rng = np.random.default_rng(3)
        bg = (rng.uniform(100, 130, (48, 40, 3))).astype(np.uint8)
        Image.fromarray(bg).save(tmp_path / "bg" / "cam0.png")
        for t in range(2):
            img = bg.copy()
            img[10 + t:30 + t, 8:32] = 240
            Image.fromarray(img).save(
                tmp_path / "images" / f"cam0_{t:05d}.jpg", quality=95)
        matting.background_diff_matting(tmp_path / "images", tmp_path / "bg")
        outs = sorted((tmp_path / "alpha_maps").glob("*.jpg"))
        assert len(outs) == 2
        a = np.asarray(Image.open(outs[0]), np.float32) / 255.0
        assert a[15:25, 12:28].mean() > 0.8
        assert a[40:].mean() < 0.15


class TestUNet:
    def test_forward_shapes_and_roundtrip(self, tmp_path):
        from vhap_tpu.preprocess.fan import load_fan_params, save_fan_params
        params = matting.init_unet_params(jax.random.PRNGKey(0), base=8,
                                          levels=3)
        x = np.random.default_rng(4).uniform(
            0, 1, (2, 32, 48, 3)).astype(np.float32)
        out = matting.unet_forward(params, x)
        assert out.shape == (2, 32, 48, 1)
        save_fan_params(str(tmp_path / "m.npz"), params)
        params2 = load_fan_params(str(tmp_path / "m.npz"))
        out2 = matting.unet_forward(params2, x)
        np.testing.assert_allclose(np.asarray(out2), np.asarray(out), atol=0)

    def test_predict_pads_odd_sizes(self):
        params = matting.init_unet_params(jax.random.PRNGKey(1), base=8,
                                          levels=3)
        net = matting.MattingUNetJax(params=params)
        img = np.random.default_rng(5).uniform(
            0, 1, (37, 53, 3)).astype(np.float32)
        alpha = net.predict(img)
        assert alpha.shape == (37, 53)
        assert 0.0 <= alpha.min() and alpha.max() <= 1.0

    def test_unet_learns_color_segmentation(self):
        """A few Adam steps separate red foreground from blue background —
        the architecture carries gradient end-to-end."""
        import optax
        import jax.numpy as jnp
        params = matting.init_unet_params(jax.random.PRNGKey(2), base=8,
                                          levels=3)
        meta = params.pop("meta")
        rng = np.random.default_rng(6)

        def make_batch():
            img = np.zeros((4, 32, 32, 3), np.float32)
            img[..., 2] = 0.8  # blue bg
            tgt = np.zeros((4, 32, 32), np.float32)
            for b in range(4):
                y, x = rng.integers(4, 16, 2)
                h, w = rng.integers(8, 14, 2)
                img[b, y:y + h, x:x + w] = [0.9, 0.1, 0.1]
                tgt[b, y:y + h, x:x + w] = 1.0
            return jnp.asarray(img), jnp.asarray(tgt)

        opt = optax.adam(3e-3)
        state = opt.init(params)

        @jax.jit
        def step(params, state, img, tgt):
            def loss(p):
                logit = matting.unet_forward(dict(p, meta=meta), img)[..., 0]
                return jnp.mean(
                    optax.sigmoid_binary_cross_entropy(logit, tgt))
            l, g = jax.value_and_grad(loss)(params)
            up, state = opt.update(g, state)
            return optax.apply_updates(params, up), state, l

        for _ in range(60):
            img, tgt = make_batch()
            params, state, l = step(params, state, img, tgt)
        img, tgt = make_batch()
        pred = jax.nn.sigmoid(matting.unet_forward(
            dict(params, meta=meta), img))[..., 0]
        err = float(jnp.abs(pred - tgt).mean())
        assert err < 0.2, f"U-Net failed to learn trivial segmentation: {err}"

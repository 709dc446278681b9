"""STAR landmark network: JAX forward vs the torch module graph.

Mirrors tests/test_fan.py: the JAX implementation
(vhap_tpu/preprocess/star.py) must load torch checkpoints of the
StackedHGNetV1 graph; this test rebuilds that graph (CoordConv stem,
pre-activation bottleneck residuals, stacked hourglasses, instance-norm+
ReLU heatmap activation, soft-argmax decoder) with random weights under
the converter's naming scheme, converts its state_dict, and requires
numerically matching heatmaps and landmark coordinates.
Reference behavior: vhap/util/landmark_detector_star.py:221-273.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn
import torch.nn.functional as F

from vhap_tpu.preprocess import star as star_jax


class Residual(nn.Module):
    def __init__(self, i, o):
        super().__init__()
        self.bn1 = nn.BatchNorm2d(i)
        self.conv1 = nn.Conv2d(i, o // 2, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(o // 2)
        self.conv2 = nn.Conv2d(o // 2, o // 2, 3, 1, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(o // 2)
        self.conv3 = nn.Conv2d(o // 2, o, 1, bias=False)
        self.skip_conv = nn.Conv2d(i, o, 1, bias=False) if i != o else None

    def forward(self, x):
        out = self.conv1(F.relu(self.bn1(x), True))
        out = self.conv2(F.relu(self.bn2(out), True))
        out = self.conv3(F.relu(self.bn3(out), True))
        skip = x if self.skip_conv is None else self.skip_conv(x)
        return out + skip


class HourGlass(nn.Module):
    def __init__(self, depth, feats):
        super().__init__()
        self.depth = depth
        for level in range(depth, 0, -1):
            self.add_module(f"up1_{level}", Residual(feats, feats))
            self.add_module(f"low1_{level}", Residual(feats, feats))
            if level == 1:
                self.add_module("bottom", Residual(feats, feats))
            self.add_module(f"low3_{level}", Residual(feats, feats))

    def _forward(self, level, x):
        up1 = self._modules[f"up1_{level}"](x)
        low1 = self._modules[f"low1_{level}"](F.max_pool2d(x, 2, 2))
        if level > 1:
            low2 = self._forward(level - 1, low1)
        else:
            low2 = self._modules["bottom"](low1)
        low3 = self._modules[f"low3_{level}"](low2)
        return up1 + F.interpolate(low3, scale_factor=2, mode="nearest")

    def forward(self, x):
        return self._forward(self.depth, x)


class StackedHGNet(nn.Module):
    def __init__(self, nstack, depth, feats, L):
        super().__init__()
        self.nstack = nstack
        f4, f2 = max(feats // 4, 8), max(feats // 2, 8)
        self.pre_conv = nn.Conv2d(3 + 2, f4, 7, 2, 3)   # CoordConv stem
        self.pre_bn = nn.BatchNorm2d(f4)
        self.res1 = Residual(f4, f2)
        self.res2 = Residual(f2, f2)
        self.res3 = Residual(f2, feats)
        for i in range(nstack):
            self.add_module(f"hg{i}", HourGlass(depth, feats))
            self.add_module(f"feat{i}_res", Residual(feats, feats))
            self.add_module(f"feat{i}_conv", nn.Conv2d(feats, feats, 1,
                                                       bias=True))
            self.add_module(f"feat{i}_bn", nn.BatchNorm2d(feats))
            self.add_module(f"out{i}", nn.Conv2d(feats, L, 1))
            self.add_module(f"act{i}_in",
                            nn.InstanceNorm2d(L, affine=True))
            if i < nstack - 1:
                self.add_module(f"merge_f{i}", nn.Conv2d(feats, feats, 1))
                self.add_module(f"merge_h{i}", nn.Conv2d(L, feats, 1))

    def forward(self, x):
        B, _, H, W = x.shape
        ys = torch.linspace(-1, 1, H)
        xs = torch.linspace(-1, 1, W)
        yy = ys[:, None].expand(H, W)
        xx = xs[None, :].expand(H, W)
        coords = torch.stack([xx, yy])[None].expand(B, 2, H, W)
        x = torch.cat([x, coords], dim=1)
        x = F.relu(self.pre_bn(self.pre_conv(x)), True)
        x = F.max_pool2d(self.res1(x), 2, 2)
        x = self.res3(self.res2(x))
        outs = []
        for i in range(self.nstack):
            hg = self._modules[f"hg{i}"](x)
            feat = self._modules[f"feat{i}_res"](hg)
            feat = F.relu(self._modules[f"feat{i}_bn"](
                self._modules[f"feat{i}_conv"](feat)), True)
            hm = self._modules[f"out{i}"](feat)
            hm = F.relu(self._modules[f"act{i}_in"](hm))
            outs.append(hm)
            if i < self.nstack - 1:
                x = (x + self._modules[f"merge_f{i}"](feat)
                     + self._modules[f"merge_h{i}"](hm))
        return outs


def _randomize_bn_stats(model, rng):
    for m in model.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.copy_(torch.tensor(
                rng.normal(0, 0.3, m.running_mean.shape), dtype=torch.float32))
            m.running_var.copy_(torch.tensor(
                rng.uniform(0.5, 2.0, m.running_var.shape), dtype=torch.float32))
            m.weight.data.copy_(torch.tensor(
                rng.normal(1, 0.2, m.weight.shape), dtype=torch.float32))
            m.bias.data.copy_(torch.tensor(
                rng.normal(0, 0.2, m.bias.shape), dtype=torch.float32))


class TestSTARParity:
    @pytest.mark.parametrize("nstack,depth,feats,L", [(2, 2, 16, 9)])
    def test_converted_checkpoint_matches_torch(self, tmp_path, nstack,
                                                depth, feats, L):
        rng = np.random.default_rng(0)
        with torch.no_grad():
            model = StackedHGNet(nstack, depth, feats, L)
            _randomize_bn_stats(model, rng)
            model.eval()
            x = rng.normal(0, 1, (1, 3, 64, 64)).astype(np.float32)
            ref_outs = model(torch.tensor(x))
            ref_hm = ref_outs[-1].numpy()                # (1, L, 16, 16)

        ckpt = tmp_path / "star.pth"
        torch.save({"state_dict": model.state_dict()}, ckpt)
        params = star_jax.convert_torch_checkpoint(str(ckpt), nstack=nstack,
                                                   depth=depth)
        assert int(params["meta"]["num_landmarks"]) == L

        xj = jnp.asarray(x.transpose(0, 2, 3, 1))        # NCHW -> NHWC
        outs, lmks = star_jax.star_forward(params, xj)
        assert len(outs) == nstack
        got = np.asarray(outs[-1]).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(got, ref_hm, rtol=1e-4, atol=1e-4)

        # landmark decode parity: soft-argmax of the torch heatmap
        hm = np.maximum(ref_hm[0], 0)                    # (L, H, W)
        w = hm / np.maximum(hm.sum(axis=(1, 2), keepdims=True), 1e-8)
        gy, gx = np.meshgrid(np.linspace(-1, 1, hm.shape[1]),
                             np.linspace(-1, 1, hm.shape[2]), indexing="ij")
        ref_xy = np.stack([(w * gx).sum(axis=(1, 2)),
                           (w * gy).sum(axis=(1, 2))], axis=-1)
        np.testing.assert_allclose(np.asarray(lmks)[0], ref_xy,
                                   rtol=1e-3, atol=1e-4)

    def test_unmatched_keys_are_loud(self, tmp_path):
        model = StackedHGNet(1, 2, 16, 5)
        sd = model.state_dict()
        sd["mystery.layer.weight"] = torch.zeros(3)
        ckpt = tmp_path / "bad.pth"
        torch.save({"state_dict": sd}, ckpt)
        with pytest.raises(ValueError, match="mystery"):
            star_jax.convert_torch_checkpoint(str(ckpt), nstack=1, depth=2)

    def test_save_load_roundtrip(self, tmp_path):
        params = star_jax.init_star_params(jax.random.PRNGKey(0), nstack=1,
                                           depth=2, feats=16, num_landmarks=7)
        x = jnp.asarray(np.random.default_rng(1).normal(
            0, 1, (2, 32, 32, 3)), jnp.float32)
        ref_hm = star_jax.star_forward(params, x)[0][-1]
        p = tmp_path / "star.npz"
        star_jax.save_star_params(str(p), params)
        params2 = star_jax.load_star_params(str(p))
        got_hm = star_jax.star_forward(params2, x)[0][-1]
        np.testing.assert_allclose(np.asarray(got_hm), np.asarray(ref_hm),
                                   atol=0)
        assert ref_hm.shape == (2, 8, 8, 7)

    def test_crop_decode_roundtrip(self):
        """Soft-argmax peaks at known crop coords map back to image pixels."""
        rng = np.random.default_rng(2)
        center = np.array([180.0, 260.0])
        scale = 1.4
        pts_crop = rng.uniform(-0.8, 0.8, (6, 2))
        img_pts = star_jax.landmarks_to_image(pts_crop, center, scale)
        # invert by hand: image -> crop frame
        h = 200.0 * scale
        back = (img_pts - (center - h / 2.0)) / h * 2.0 - 1.0
        np.testing.assert_allclose(back, pts_crop, atol=1e-5)

    def test_detector_contract_with_random_weights(self):
        """detect_single_image returns the npz contract on any image."""
        from vhap_tpu.preprocess.landmarks import LandmarkDetectorSTARJax
        params = star_jax.init_star_params(jax.random.PRNGKey(3), nstack=1,
                                           depth=2, feats=16,
                                           num_landmarks=68)
        det = LandmarkDetectorSTARJax(params=params)
        img = (np.random.default_rng(4).uniform(
            0, 255, (120, 160, 3))).astype(np.uint8)
        bb, lmks = det.detect_single_image(img)
        assert bb.shape == (5,) and lmks.shape == (68, 3)

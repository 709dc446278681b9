"""FAN landmark network: JAX forward vs the torch module graph.

The JAX implementation (vhap_tpu/preprocess/fan.py) must load official
face_alignment checkpoints; this test rebuilds the exact torch module graph
(face_alignment/models.py naming: ConvBlock bn1/conv1..., HourGlass
b1_<level>..., FAN conv1..conv4, m<i>, top_m_<i>, conv_last<i>, bn_end<i>,
l<i>, bl<i>, al<i>) with random weights, converts its state_dict, and
requires numerically matching heatmaps.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn
import torch.nn.functional as F

from vhap_tpu.preprocess import fan as fan_jax


def conv3x3(i, o):
    return nn.Conv2d(i, o, 3, 1, 1, bias=False)


class ConvBlock(nn.Module):
    def __init__(self, i, o):
        super().__init__()
        self.bn1 = nn.BatchNorm2d(i)
        self.conv1 = conv3x3(i, o // 2)
        self.bn2 = nn.BatchNorm2d(o // 2)
        self.conv2 = conv3x3(o // 2, o // 4)
        self.bn3 = nn.BatchNorm2d(o // 4)
        self.conv3 = conv3x3(o // 4, o // 4)
        if i != o:
            self.downsample = nn.Sequential(
                nn.BatchNorm2d(i), nn.ReLU(True), nn.Conv2d(i, o, 1, bias=False))
        else:
            self.downsample = None

    def forward(self, x):
        residual = x
        out1 = self.conv1(F.relu(self.bn1(x), True))
        out2 = self.conv2(F.relu(self.bn2(out1), True))
        out3 = self.conv3(F.relu(self.bn3(out2), True))
        out = torch.cat((out1, out2, out3), 1)
        if self.downsample is not None:
            residual = self.downsample(residual)
        return out + residual


class HourGlass(nn.Module):
    def __init__(self, depth, feats):
        super().__init__()
        self.depth = depth
        for level in range(depth, 0, -1):
            self.add_module(f"b1_{level}", ConvBlock(feats, feats))
            self.add_module(f"b2_{level}", ConvBlock(feats, feats))
            if level == 1:
                self.add_module(f"b2_plus_{level}", ConvBlock(feats, feats))
            self.add_module(f"b3_{level}", ConvBlock(feats, feats))

    def _forward(self, level, inp):
        up1 = self._modules[f"b1_{level}"](inp)
        low1 = self._modules[f"b2_{level}"](F.avg_pool2d(inp, 2, stride=2))
        if level > 1:
            low2 = self._forward(level - 1, low1)
        else:
            low2 = self._modules[f"b2_plus_{level}"](low1)
        low3 = self._modules[f"b3_{level}"](low2)
        return up1 + F.interpolate(low3, scale_factor=2, mode="nearest")

    def forward(self, x):
        return self._forward(self.depth, x)


class FAN(nn.Module):
    def __init__(self, nm, depth, feats, L):
        super().__init__()
        self.nm = nm
        self.conv1 = nn.Conv2d(3, feats // 4, 7, 2, 3)
        self.bn1 = nn.BatchNorm2d(feats // 4)
        self.conv2 = ConvBlock(feats // 4, feats // 2)
        self.conv3 = ConvBlock(feats // 2, feats // 2)
        self.conv4 = ConvBlock(feats // 2, feats)
        for i in range(nm):
            self.add_module(f"m{i}", HourGlass(depth, feats))
            self.add_module(f"top_m_{i}", ConvBlock(feats, feats))
            self.add_module(f"conv_last{i}", nn.Conv2d(feats, feats, 1))
            self.add_module(f"bn_end{i}", nn.BatchNorm2d(feats))
            self.add_module(f"l{i}", nn.Conv2d(feats, L, 1))
            if i < nm - 1:
                self.add_module(f"bl{i}", nn.Conv2d(feats, feats, 1))
                self.add_module(f"al{i}", nn.Conv2d(L, feats, 1))

    def forward(self, x):
        x = F.relu(self.bn1(self.conv1(x)), True)
        x = F.avg_pool2d(self.conv2(x), 2, stride=2)
        x = self.conv4(self.conv3(x))
        previous, outs = x, []
        for i in range(self.nm):
            hg = self._modules[f"m{i}"](previous)
            ll = self._modules[f"top_m_{i}"](hg)
            ll = F.relu(self._modules[f"bn_end{i}"](
                self._modules[f"conv_last{i}"](ll)), True)
            tmp = self._modules[f"l{i}"](ll)
            outs.append(tmp)
            if i < self.nm - 1:
                previous = (previous + self._modules[f"bl{i}"](ll)
                            + self._modules[f"al{i}"](tmp))
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


class TestFANParity:
    @pytest.mark.parametrize("nm,depth,feats,L", [(2, 2, 32, 12)])
    def test_converted_checkpoint_matches_torch(self, tmp_path, nm, depth,
                                                feats, L):
        rng = np.random.default_rng(0)
        with torch.no_grad():
            model = FAN(nm, depth, feats, L)
            _randomize_bn_stats(model, rng)
            model.eval()
            x = rng.normal(0, 1, (1, 3, 64, 64)).astype(np.float32)
            ref = model(torch.tensor(x))[-1].numpy()    # (1, L, 16, 16)

        ckpt = tmp_path / "fan.pth"
        torch.save({"state_dict": model.state_dict()}, ckpt)
        params = fan_jax.convert_torch_checkpoint(str(ckpt), num_modules=nm,
                                                  depth=depth)
        assert int(params["meta"]["num_landmarks"]) == L

        xj = jnp.asarray(x.transpose(0, 2, 3, 1))       # NCHW -> NHWC
        outs = fan_jax.fan_forward(params, xj)
        assert len(outs) == nm
        got = np.asarray(outs[-1]).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)

    def test_save_load_roundtrip(self, tmp_path):
        params = fan_jax.init_fan_params(jax.random.PRNGKey(0), num_modules=1,
                                         depth=2, feats=16, num_landmarks=7)
        x = jnp.asarray(np.random.default_rng(1).normal(
            0, 1, (2, 32, 32, 3)), jnp.float32)
        ref = fan_jax.fan_forward(params, x)[-1]
        p = tmp_path / "fan.npz"
        fan_jax.save_fan_params(str(p), params)
        params2 = fan_jax.load_fan_params(str(p))
        got = fan_jax.fan_forward(params2, x)[-1]
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=0)
        assert ref.shape == (2, 8, 8, 7)

    def test_heatmap_decode_roundtrip(self):
        """Peaks placed at known crop positions decode to image coords."""
        rng = np.random.default_rng(2)
        L, H = 5, 64
        center = np.array([210.0, 330.0])
        scale = 1.7
        pts_hm = rng.uniform(8, 56, (L, 2))
        hm = np.zeros((L, H, H), np.float32)
        for i, (px, py) in enumerate(pts_hm):
            hm[i, int(round(py)), int(round(px))] = 1.0
        lmks = fan_jax.heatmaps_to_landmarks(hm, center, scale)
        # invert: map decoded image points back into the heatmap frame
        back = np.stack([fan_jax._transform(p, center, scale, H)
                         for p in lmks]) - 1.0
        np.testing.assert_allclose(back, pts_hm, atol=0.76)  # quarter-offset

    def test_detector_contract_with_random_weights(self):
        """detect_single_image returns the npz contract shapes on any image."""
        from vhap_tpu.preprocess.landmarks import LandmarkDetectorFANJax
        params = fan_jax.init_fan_params(jax.random.PRNGKey(3), num_modules=1,
                                         depth=2, feats=16, num_landmarks=70)
        det = LandmarkDetectorFANJax(params=params)
        img = (np.random.default_rng(4).uniform(
            0, 255, (120, 160, 3))).astype(np.uint8)
        bb, lmks = det.detect_single_image(img)
        assert bb.shape == (5,) and lmks.shape[1] == 3
        if bb[0] >= 0:  # face "found": normalized outputs
            assert lmks[:, :2].min() > -2 and lmks[:, :2].max() < 3


class TestBNFinalize:
    def test_single_batch_stats_reproduce_train_output(self):
        """finalize_bn_stats over ONE batch bakes exactly that batch's
        statistics, so stored-stats inference on the same batch must equal
        batch-stats inference — catches any collector/order bug."""
        params = fan_jax.init_fan_params(jax.random.PRNGKey(5), num_modules=1,
                                         depth=2, feats=16, num_landmarks=7)
        assert int(params["meta"]["bn_mode"]) == 1
        x = jnp.asarray(np.random.default_rng(6).normal(
            0, 1, (4, 32, 32, 3)), jnp.float32)
        ref = fan_jax.fan_forward(params, x, train=True)[-1]
        params2 = fan_jax.finalize_bn_stats(params, [x])
        assert int(params2["meta"]["bn_mode"]) == 0
        got = fan_jax.fan_forward(params2, x)[-1]
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)


class TestCropAugment:
    def test_affine_matches_detector_crop_geometry(self):
        """crop_augment's image resample and landmark transform must agree
        with each other AND with fan.crop_for_fan's affine: a bright dot
        rendered at a landmark must land (argmax) where the transformed
        landmark says, and the jitter-free transform must equal
        fan._transform for the same center/scale."""
        from vhap_tpu.tools.train_fan_synthetic import IMG_SIZE, crop_augment

        rng = np.random.default_rng(7)
        B, L = 3, 5
        px = rng.uniform(IMG_SIZE * 0.3, IMG_SIZE * 0.7, (B, L, 2))
        img = np.zeros((B, IMG_SIZE, IMG_SIZE, 3), np.float32)
        for b in range(B):
            x, y = int(px[b, 0, 0]), int(px[b, 0, 1])
            img[b, y - 1:y + 2, x - 1:x + 2] = 1.0  # 3x3 dot at landmark 0
        out, px2 = jax.jit(crop_augment)(jax.random.PRNGKey(11),
                                         jnp.asarray(img), jnp.asarray(px))
        out, px2 = np.asarray(out), np.asarray(px2)
        assert out.shape == img.shape and px2.shape == px.shape
        for b in range(B):
            if not (0 <= px2[b, 0, 0] < IMG_SIZE
                    and 0 <= px2[b, 0, 1] < IMG_SIZE):
                continue
            flat = out[b, ..., 0].argmax()
            ay, ax = divmod(int(flat), IMG_SIZE)
            d = np.hypot(ax - px2[b, 0, 0], ay - px2[b, 0, 1])
            assert d < 3.0, f"sample {b}: dot at ({ax},{ay}) vs lmk {px2[b,0]}"

    def test_transform_equals_fan_transform(self):
        """The affine used in training equals fan._transform (the detector's
        crop frame) for the same center/scale."""
        center, scale = np.array([100.0, 140.0]), 0.9
        pt = np.array([123.0, 87.0])
        ref = fan_jax._transform(pt, center, scale, 256)
        sf = 256.0 / (200.0 * scale)
        got = (pt - center) * sf + 256.0 / 2
        np.testing.assert_allclose(got, ref, atol=1e-9)

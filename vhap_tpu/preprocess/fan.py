"""FAN (Face Alignment Network) 68-point landmark inference in pure JAX.

The reference annotates landmarks with the `face_alignment` package's FAN
(vhap/util/landmark_detector_fa.py:25-74: LandmarksType.TWO_HALF_D, sfd
detector, flip_input). That package is torch + downloaded weights; here the
same stacked-hourglass architecture (Bulat & Tzimiropoulos, ICCV 2017 —
the exact module graph of face_alignment/models.py) is implemented as pure
JAX functions over a parameter pytree, so

  * official face_alignment checkpoints can be converted once with
    `convert_torch_checkpoint` and run on host CPU or TPU with no torch
    dependency in the loop, and
  * a small configuration of the same network (fewer modules/features) can
    be trained in-repo on synthetic FLAME renders
    (vhap_tpu/tools/train_fan_synthetic.py) so the full preprocess →
    track → export pipeline runs end-to-end without external downloads.

Layout is NHWC (TPU-native); convs are lax.conv_general_dilated with HWIO
kernels; BatchNorm runs in inference mode from stored statistics (training
mode computes batch statistics explicitly).

The face detector half of the reference stack (sfd) is NOT ported; bboxes
come from any external detector, or from `coarse_bbox_from_heatmaps` — a
two-pass self-scan where FAN run on the whole (resized) image yields a
heatmap-mass bounding box that seeds the refined crop.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# primitive layers
# ---------------------------------------------------------------------------

_BN_EPS = 1e-5

# trace-time collector for finalize_bn_stats: entries (bn_param_dict,
# batch_mean, batch_var) appended in call order while tracing train=True
_BN_COLLECT: Optional[list] = None


def conv2d(x, w, stride: int = 1, padding: int = 0):
    """x (B, H, W, Cin), w (Kh, Kw, Cin, Cout)."""
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def batch_norm(x, p, train: bool = False):
    """Inference BN from stored statistics; train=True uses batch stats."""
    if train:
        mean = jnp.mean(x, axis=(0, 1, 2))
        var = jnp.var(x, axis=(0, 1, 2))
        if _BN_COLLECT is not None:
            _BN_COLLECT.append((p, mean, var))
    else:
        mean, var = p["mean"], p["var"]
    inv = jax.lax.rsqrt(var + _BN_EPS) * p["scale"]
    return x * inv + (p["bias"] - mean * inv)


def finalize_bn_stats(params: Dict, batches) -> Dict:
    """Estimate BN running statistics over `batches` and bake them in.

    Needed because a net trained with batch statistics (bn_mode=1)
    degrades badly at batch-1 inference: per-image statistics differ from
    the batch statistics it was trained under. The collector records each
    batch_norm call's OWN parameter dict at trace time, so the estimated
    statistics are written back without any order bookkeeping. Returns
    params with stats filled and meta.bn_mode=0 (stored-stats inference).
    """
    refs: list = []

    def fwd(x):
        global _BN_COLLECT
        _BN_COLLECT = []
        fan_forward(params, x, train=True)
        entries = _BN_COLLECT
        _BN_COLLECT = None
        refs.clear()
        refs.extend(p for (p, _, _) in entries)
        return [(m, v) for (_, m, v) in entries]

    jfwd = jax.jit(fwd)
    acc_m, acc_v, n = None, None, 0
    for x in batches:
        vals = jfwd(x)
        ms = [np.asarray(m) for m, _ in vals]
        vs = [np.asarray(v) for _, v in vals]
        if acc_m is None:
            acc_m = [m.copy() for m in ms]
            acc_v = [v + m ** 2 for v, m in zip(vs, ms)]
        else:
            for i in range(len(ms)):
                acc_m[i] += ms[i]
                acc_v[i] += vs[i] + ms[i] ** 2
        n += 1
    for p, m_sum, v_sum in zip(refs, acc_m, acc_v):
        mean = m_sum / n
        p["mean"] = jnp.asarray(mean)
        p["var"] = jnp.asarray(v_sum / n - mean ** 2)  # law of total variance
    meta = dict(params["meta"], bn_mode=0)
    return dict(params, meta=meta)


def avg_pool2(x):
    return jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, 2, 2, 1),
                                 (1, 2, 2, 1), "VALID") * 0.25


def upsample2_nearest(x):
    B, H, W, C = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (B, H, 2, W, 2, C))
    return x.reshape(B, 2 * H, 2 * W, C)


# ---------------------------------------------------------------------------
# parameter initialization (matches the torch module graph for conversion)
# ---------------------------------------------------------------------------

def _init_conv(key, kh, kw, cin, cout):
    fan_in = kh * kw * cin
    return jax.random.normal(key, (kh, kw, cin, cout),
                             jnp.float32) * np.sqrt(2.0 / fan_in)


def _init_bn(c):
    return {"scale": jnp.ones((c,), jnp.float32),
            "bias": jnp.zeros((c,), jnp.float32),
            "mean": jnp.zeros((c,), jnp.float32),
            "var": jnp.ones((c,), jnp.float32)}


def _init_convblock(key, cin, cout):
    k = jax.random.split(key, 4)
    p = {
        "bn1": _init_bn(cin), "conv1": _init_conv(k[0], 3, 3, cin, cout // 2),
        "bn2": _init_bn(cout // 2),
        "conv2": _init_conv(k[1], 3, 3, cout // 2, cout // 4),
        "bn3": _init_bn(cout // 4),
        "conv3": _init_conv(k[2], 3, 3, cout // 4, cout // 4),
    }
    if cin != cout:
        p["down_bn"] = _init_bn(cin)
        p["down_conv"] = _init_conv(k[3], 1, 1, cin, cout)
    return p


def _init_hourglass(key, depth, feats):
    p = {}
    keys = jax.random.split(key, 4 * depth + 1)
    ki = 0
    for level in range(depth, 0, -1):
        p[f"b1_{level}"] = _init_convblock(keys[ki], feats, feats); ki += 1
        p[f"b2_{level}"] = _init_convblock(keys[ki], feats, feats); ki += 1
        if level == 1:
            p[f"b2_plus_{level}"] = _init_convblock(keys[ki], feats, feats)
            ki += 1
        p[f"b3_{level}"] = _init_convblock(keys[ki], feats, feats); ki += 1
    return p


def init_fan_params(key, num_modules: int = 4, depth: int = 4,
                    feats: int = 256, num_landmarks: int = 68,
                    in_ch: int = 3) -> Dict:
    """Random-initialized FAN parameter pytree.

    The default configuration matches face_alignment's FAN(4); small
    configurations (num_modules=1, feats=64, depth=2) train quickly on
    synthetic data.
    """
    keys = jax.random.split(key, 8 + 8 * num_modules)
    f2, f4 = feats // 2, feats // 4
    p = {
        "conv1": _init_conv(keys[0], 7, 7, in_ch, f4),
        "bn1": _init_bn(f4),
        "conv2": _init_convblock(keys[1], f4, f2),
        "conv3": _init_convblock(keys[2], f2, f2),
        "conv4": _init_convblock(keys[3], f2, feats),
        "meta": {"num_modules": num_modules, "depth": depth, "feats": feats,
                 "num_landmarks": num_landmarks, "bn_mode": 1},
    }
    ki = 4
    for i in range(num_modules):
        p[f"m{i}"] = _init_hourglass(keys[ki], depth, feats); ki += 1
        p[f"top_m_{i}"] = _init_convblock(keys[ki], feats, feats); ki += 1
        p[f"conv_last{i}"] = _init_conv(keys[ki], 1, 1, feats, feats); ki += 1
        p[f"bn_end{i}"] = _init_bn(feats)
        p[f"l{i}"] = _init_conv(keys[ki], 1, 1, feats, num_landmarks); ki += 1
        if i < num_modules - 1:
            p[f"bl{i}"] = _init_conv(keys[ki], 1, 1, feats, feats); ki += 1
            p[f"al{i}"] = _init_conv(keys[ki], 1, 1, num_landmarks, feats)
            ki += 1
    return p


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _convblock(x, p, train):
    o1 = conv2d(jax.nn.relu(batch_norm(x, p["bn1"], train)), p["conv1"],
                padding=1)
    o2 = conv2d(jax.nn.relu(batch_norm(o1, p["bn2"], train)), p["conv2"],
                padding=1)
    o3 = conv2d(jax.nn.relu(batch_norm(o2, p["bn3"], train)), p["conv3"],
                padding=1)
    out = jnp.concatenate([o1, o2, o3], axis=-1)
    if "down_conv" in p:
        x = conv2d(jax.nn.relu(batch_norm(x, p["down_bn"], train)),
                   p["down_conv"])
    return out + x


def _hourglass(x, p, level, train):
    up1 = _convblock(x, p[f"b1_{level}"], train)
    low1 = _convblock(avg_pool2(x), p[f"b2_{level}"], train)
    if level > 1:
        low2 = _hourglass(low1, p, level - 1, train)
    else:
        low2 = _convblock(low1, p[f"b2_plus_{level}"], train)
    low3 = _convblock(low2, p[f"b3_{level}"], train)
    return up1 + upsample2_nearest(low3)


def fan_forward(params: Dict, x: jnp.ndarray,
                train: Optional[bool] = None) -> List[jnp.ndarray]:
    """x (B, H, W, 3) in [0, 1] -> list of heatmaps (B, H/4, W/4, L).

    Mirrors face_alignment FAN.forward; the last element is the prediction.
    train=None reads meta['bn_mode']: converted official checkpoints use
    stored BN statistics (0, default); the synthetic-trained nets use batch
    statistics in BOTH training and inference (1) so there is no
    train/test mismatch and no running-stat bookkeeping.
    """
    meta = params["meta"]
    nm, depth = int(meta["num_modules"]), int(meta["depth"])
    if train is None:
        train = bool(meta.get("bn_mode", 0))
    x = jax.nn.relu(batch_norm(conv2d(x, params["conv1"], stride=2,
                                      padding=3), params["bn1"], train))
    x = avg_pool2(_convblock(x, params["conv2"], train))
    x = _convblock(x, params["conv3"], train)
    x = _convblock(x, params["conv4"], train)

    def cv(y, name):
        """1x1 conv with the optional bias official checkpoints carry."""
        y = conv2d(y, params[name])
        b = params.get(name + "_bias")
        return y if b is None else y + b

    outputs = []
    previous = x
    for i in range(nm):
        hg = _hourglass(previous, params[f"m{i}"], depth, train)
        ll = _convblock(hg, params[f"top_m_{i}"], train)
        ll = jax.nn.relu(batch_norm(cv(ll, f"conv_last{i}"),
                                    params[f"bn_end{i}"], train))
        tmp_out = cv(ll, f"l{i}")
        outputs.append(tmp_out)
        if i < nm - 1:
            previous = previous + cv(ll, f"bl{i}") + cv(tmp_out, f"al{i}")
    return outputs


# ---------------------------------------------------------------------------
# crop / decode (face_alignment utils.py transform & get_preds_fromhm)
# ---------------------------------------------------------------------------

def _transform(point, center, scale, resolution, invert=False):
    """Map an image point to/from the FAN crop frame."""
    h = 200.0 * scale
    m = np.eye(3, dtype=np.float64)
    m[0, 0] = resolution / h
    m[1, 1] = resolution / h
    m[0, 2] = resolution * (-center[0] / h + 0.5)
    m[1, 2] = resolution * (-center[1] / h + 0.5)
    if invert:
        m = np.linalg.inv(m)
    pt = np.array([point[0], point[1], 1.0])
    return (m @ pt)[:2]


def bbox_to_center_scale(bbox) -> Tuple[np.ndarray, float]:
    """face_alignment's detector post-processing: center shifted down 12%,
    scale from the box diagonal over the 195-pixel reference."""
    x1, y1, x2, y2 = [float(v) for v in bbox[:4]]
    center = np.array([(x1 + x2) / 2.0, (y1 + y2) / 2.0])
    center[1] -= (y2 - y1) * 0.12
    scale = (x2 - x1 + y2 - y1) / 195.0
    return center, scale


def crop_for_fan(img: np.ndarray, center, scale,
                 resolution: int = 256) -> np.ndarray:
    """Crop + resize the face region to (resolution, resolution), float [0,1]."""
    ul = _transform([1, 1], center, scale, resolution, invert=True).astype(int)
    br = _transform([resolution, resolution], center, scale, resolution,
                    invert=True).astype(int)
    h, w = img.shape[:2]
    crop = np.zeros((br[1] - ul[1], br[0] - ul[0], 3), img.dtype)
    sx0, sx1 = max(0, ul[0]), min(w, br[0])
    sy0, sy1 = max(0, ul[1]), min(h, br[1])
    dx0, dy0 = max(0, -ul[0]), max(0, -ul[1])
    crop[dy0:dy0 + (sy1 - sy0), dx0:dx0 + (sx1 - sx0)] = img[sy0:sy1, sx0:sx1]
    from PIL import Image
    out = np.asarray(Image.fromarray(crop.astype(np.uint8)).resize(
        (resolution, resolution), Image.BILINEAR))
    return out.astype(np.float32) / 255.0


def heatmaps_to_landmarks(hm: np.ndarray, center, scale) -> np.ndarray:
    """hm (L, Hh, Wh) -> (L, 2) image-space landmarks.

    argmax + quarter-pixel neighbor offset, then the inverse crop transform
    (face_alignment get_preds_fromhm).
    """
    L, H, W = hm.shape
    flat = hm.reshape(L, -1)
    idx = flat.argmax(axis=1)
    xs = (idx % W).astype(np.float64)
    ys = (idx // W).astype(np.float64)
    for i in range(L):
        x, y = int(xs[i]), int(ys[i])
        if 0 < x < W - 1:
            xs[i] += 0.25 * np.sign(hm[i, y, x + 1] - hm[i, y, x - 1])
        if 0 < y < H - 1:
            ys[i] += 0.25 * np.sign(hm[i, y + 1, x] - hm[i, y - 1, x])
    pts = np.stack([xs + 1.0, ys + 1.0], axis=1)  # 1-based like the reference
    out = np.stack([_transform(p, center, scale, H, invert=True)
                    for p in pts])
    return out.astype(np.float32)


def coarse_bbox_from_heatmaps(hm: np.ndarray, img_shape,
                              resolution: int = 256) -> Optional[np.ndarray]:
    """Derive a face bbox from a whole-image FAN pass (sfd substitute).

    The image is treated as one big crop; the landmark extent (padded 30%)
    becomes the detection box. Returns None when the peak response is too
    weak to be a face.
    """
    if float(hm.max()) < 0.1:
        return None
    h, w = img_shape[:2]
    center = np.array([w / 2.0, h / 2.0])
    scale = max(h, w) / 195.0
    pts = heatmaps_to_landmarks(hm, center, scale)
    x1, y1 = pts.min(axis=0)
    x2, y2 = pts.max(axis=0)
    pw, ph = (x2 - x1) * 0.15, (y2 - y1) * 0.15
    return np.array([max(0, x1 - pw), max(0, y1 - ph),
                     min(w, x2 + pw), min(h, y2 + ph), 1.0], np.float32)


# ---------------------------------------------------------------------------
# torch checkpoint conversion (official face_alignment weights)
# ---------------------------------------------------------------------------

def _bn_from_torch(sd, prefix):
    return {"scale": jnp.asarray(sd[prefix + ".weight"]),
            "bias": jnp.asarray(sd[prefix + ".bias"]),
            "mean": jnp.asarray(sd[prefix + ".running_mean"]),
            "var": jnp.asarray(sd[prefix + ".running_var"])}


def _conv_from_torch(sd, name):
    w = np.asarray(sd[name + ".weight"])          # (O, I, Kh, Kw)
    return jnp.asarray(w.transpose(2, 3, 1, 0))   # -> (Kh, Kw, I, O)


def _convblock_from_torch(sd, prefix):
    p = {"bn1": _bn_from_torch(sd, prefix + ".bn1"),
         "conv1": _conv_from_torch(sd, prefix + ".conv1"),
         "bn2": _bn_from_torch(sd, prefix + ".bn2"),
         "conv2": _conv_from_torch(sd, prefix + ".conv2"),
         "bn3": _bn_from_torch(sd, prefix + ".bn3"),
         "conv3": _conv_from_torch(sd, prefix + ".conv3")}
    if prefix + ".downsample.0.weight" in sd:
        p["down_bn"] = _bn_from_torch(sd, prefix + ".downsample.0")
        p["down_conv"] = _conv_from_torch(sd, prefix + ".downsample.2")
    return p


def convert_torch_checkpoint(path: str, num_modules: int = 4,
                             depth: int = 4) -> Dict:
    """Convert a face_alignment FAN checkpoint (2DFAN4/3DFAN4 .pth[.tar])
    into this module's parameter pytree. Requires torch only here, once."""
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    sd = {k.removeprefix("module."): v.numpy() if hasattr(v, "numpy") else v
          for k, v in sd.items()}

    p = {"conv1": _conv_from_torch(sd, "conv1"),
         "bn1": _bn_from_torch(sd, "bn1"),
         "conv2": _convblock_from_torch(sd, "conv2"),
         "conv3": _convblock_from_torch(sd, "conv3"),
         "conv4": _convblock_from_torch(sd, "conv4")}
    if "conv1.bias" in sd:
        # face_alignment's conv1 carries a bias; fold it into bn1's mean
        b = jnp.asarray(sd["conv1.bias"])
        p["bn1"] = dict(p["bn1"], mean=p["bn1"]["mean"] - b)
    L = sd["l0.weight"].shape[0]
    feats = sd["conv_last0.weight"].shape[0]
    p["meta"] = {"num_modules": num_modules, "depth": depth, "feats": feats,
                 "num_landmarks": L, "bn_mode": 0}
    for i in range(num_modules):
        hg = {}
        for level in range(depth, 0, -1):
            for b_ in ("b1", "b2", "b3"):
                hg[f"{b_}_{level}"] = _convblock_from_torch(
                    sd, f"m{i}.{b_}_{level}")
            if level == 1:
                hg[f"b2_plus_{level}"] = _convblock_from_torch(
                    sd, f"m{i}.b2_plus_{level}")
        p[f"m{i}"] = hg
        p[f"top_m_{i}"] = _convblock_from_torch(sd, f"top_m_{i}")
        p[f"bn_end{i}"] = _bn_from_torch(sd, f"bn_end{i}")
        heads = [f"conv_last{i}", f"l{i}"]
        if i < num_modules - 1:
            heads += [f"bl{i}", f"al{i}"]
        for name in heads:
            p[name] = _conv_from_torch(sd, name)
            if name + ".bias" in sd:
                p[name + "_bias"] = jnp.asarray(sd[name + ".bias"])
    return p


# ---------------------------------------------------------------------------
# pytree save / load
# ---------------------------------------------------------------------------

def save_fan_params(path: str, params: Dict):
    flat = {}

    def walk(prefix, node):
        for k, v in node.items():
            key = f"{prefix}/{k}" if prefix else k
            if isinstance(v, dict):
                walk(key, v)
            else:
                flat[key] = np.asarray(v)

    walk("", params)
    np.savez(path, **flat)


def load_fan_params(path: str) -> Dict:
    data = np.load(path)
    params: Dict = {}
    for key in data.files:
        parts = key.split("/")
        node = params
        for pkey in parts[:-1]:
            node = node.setdefault(pkey, {})
        v = data[key]
        if parts[0] == "meta":
            node[parts[-1]] = int(v)
        else:
            node[parts[-1]] = jnp.asarray(v)
    return params

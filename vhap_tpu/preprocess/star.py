"""STAR 68-point landmark alignment in pure JAX.

The reference's default (and most accurate) landmark detector is the STAR
alignment network (vhap/util/landmark_detector_star.py:221-273: dlib bbox ->
256x256 crop -> STAR net -> 68 landmarks; package `STAR@git+...`, config
"alignment"). The backbone is a stacked-hourglass ("StackedHGNetV1",
Zhou et al., "STAR Loss: Reducing Semantic Ambiguity in Facial Landmark
Detection", CVPR 2023): a CoordConv stem, four 4-level hourglass stacks at
256 features, per-stack heatmap heads with instance-norm+ReLU activation,
and a soft-argmax decoder that turns each 64x64 heatmap channel into one
landmark coordinate.

This module implements that graph as pure JAX functions over a parameter
pytree (NHWC, lax convs), mirroring vhap_tpu/preprocess/fan.py:

  * `convert_torch_checkpoint` maps a torch state_dict onto the pytree.
    The module-name scheme is validated by a parity test that rebuilds the
    torch graph (tests/test_star.py); for official STAR checkpoints (whose
    package is not redistributable here) `OFFICIAL_KEY_MAP` translates the
    published `pre.* / hgs.* / features.* / out_heatmaps.*` prefixes onto
    the same scheme, and the converter reports every unmatched key instead
    of guessing.
  * the detector wrapper (landmarks.LandmarkDetectorSTARJax) runs the same
    crop convention the reference wrapper feeds STAR (center + scale with
    the 200-pixel reference frame, landmark_detector_star.py:240-273) and
    substitutes dlib with the whole-image self-scan used by the FAN port.

Architecture micro-choices that the unavailable package may make
differently (pool flavor, bottom-level block count) are pinned by the
parity test against the rebuilt graph and documented here rather than
silently assumed: stem pool = max-pool, hourglass pool = max-pool,
upsampling = nearest, residual block = pre-activation bottleneck
(BN-ReLU-1x1-half, BN-ReLU-3x3-half, BN-ReLU-1x1-full, 1x1 skip on
channel change).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vhap_tpu.preprocess.fan import (_init_bn, _init_conv, batch_norm,
                                     conv2d, load_fan_params,
                                     save_fan_params, upsample2_nearest)

_IN_EPS = 1e-5


def max_pool2(x):
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 2, 2, 1),
                                 (1, 2, 2, 1), "VALID")


def instance_norm(x, p):
    """Per-sample, per-channel normalization over H, W with affine params."""
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.var(x, axis=(1, 2), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + _IN_EPS) * p["scale"] + p["bias"]


def coord_channels(B: int, H: int, W: int, dtype=jnp.float32):
    """CoordConv channels: x and y in [-1, 1] (row 0 / col 0 = -1)."""
    ys = jnp.linspace(-1.0, 1.0, H, dtype=dtype)
    xs = jnp.linspace(-1.0, 1.0, W, dtype=dtype)
    yy = jnp.broadcast_to(ys[:, None], (H, W))
    xx = jnp.broadcast_to(xs[None, :], (H, W))
    grid = jnp.stack([xx, yy], axis=-1)[None]
    return jnp.broadcast_to(grid, (B, H, W, 2))


# ---------------------------------------------------------------------------
# parameters
# ---------------------------------------------------------------------------

def _init_residual(key, cin, cout):
    k = jax.random.split(key, 4)
    half = cout // 2
    p = {
        "bn1": _init_bn(cin), "conv1": _init_conv(k[0], 1, 1, cin, half),
        "bn2": _init_bn(half), "conv2": _init_conv(k[1], 3, 3, half, half),
        "bn3": _init_bn(half), "conv3": _init_conv(k[2], 1, 1, half, cout),
    }
    if cin != cout:
        p["skip_conv"] = _init_conv(k[3], 1, 1, cin, cout)
    return p


def _init_hourglass(key, depth, feats):
    p = {}
    keys = jax.random.split(key, 4 * depth + 1)
    ki = 0
    for level in range(depth, 0, -1):
        p[f"up1_{level}"] = _init_residual(keys[ki], feats, feats); ki += 1
        p[f"low1_{level}"] = _init_residual(keys[ki], feats, feats); ki += 1
        if level == 1:
            p["bottom"] = _init_residual(keys[ki], feats, feats); ki += 1
        p[f"low3_{level}"] = _init_residual(keys[ki], feats, feats); ki += 1
    return p


def init_star_params(key, nstack: int = 4, depth: int = 4, feats: int = 256,
                     num_landmarks: int = 68, in_ch: int = 3) -> Dict:
    """Random-initialized StackedHGNetV1 parameter pytree.

    Defaults match the STAR "alignment" config (4 stacks, depth 4, 256
    features, 68 landmarks, 256x256 input -> 64x64 heatmaps)."""
    keys = jax.random.split(key, 8 + 8 * nstack)
    f4 = max(feats // 4, 8)
    f2 = max(feats // 2, 8)
    p = {
        "pre_conv": _init_conv(keys[0], 7, 7, in_ch + 2, f4),  # CoordConv
        "pre_bn": _init_bn(f4),
        "res1": _init_residual(keys[1], f4, f2),
        "res2": _init_residual(keys[2], f2, f2),
        "res3": _init_residual(keys[3], f2, feats),
        "meta": {"nstack": nstack, "depth": depth, "feats": feats,
                 "num_landmarks": num_landmarks, "bn_mode": 0},
    }
    ki = 4
    for i in range(nstack):
        p[f"hg{i}"] = _init_hourglass(keys[ki], depth, feats); ki += 1
        p[f"feat{i}_res"] = _init_residual(keys[ki], feats, feats); ki += 1
        p[f"feat{i}_conv"] = _init_conv(keys[ki], 1, 1, feats, feats); ki += 1
        p[f"feat{i}_bn"] = _init_bn(feats)
        p[f"out{i}"] = _init_conv(keys[ki], 1, 1, feats, num_landmarks)
        ki += 1
        p[f"out{i}_bias"] = jnp.zeros((num_landmarks,), jnp.float32)
        p[f"act{i}_in"] = {"scale": jnp.ones((num_landmarks,), jnp.float32),
                           "bias": jnp.zeros((num_landmarks,), jnp.float32)}
        if i < nstack - 1:
            p[f"merge_f{i}"] = _init_conv(keys[ki], 1, 1, feats, feats)
            ki += 1
            p[f"merge_h{i}"] = _init_conv(keys[ki], 1, 1, num_landmarks,
                                          feats)
            ki += 1
    return p


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _residual(x, p, train):
    o = conv2d(jax.nn.relu(batch_norm(x, p["bn1"], train)), p["conv1"])
    o = conv2d(jax.nn.relu(batch_norm(o, p["bn2"], train)), p["conv2"],
               padding=1)
    o = conv2d(jax.nn.relu(batch_norm(o, p["bn3"], train)), p["conv3"])
    skip = conv2d(x, p["skip_conv"]) if "skip_conv" in p else x
    return o + skip


def _hourglass(x, p, level, train):
    up1 = _residual(x, p[f"up1_{level}"], train)
    low1 = _residual(max_pool2(x), p[f"low1_{level}"], train)
    if level > 1:
        low2 = _hourglass(low1, p, level - 1, train)
    else:
        low2 = _residual(low1, p["bottom"], train)
    low3 = _residual(low2, p[f"low3_{level}"], train)
    return up1 + upsample2_nearest(low3)


def soft_argmax(hm: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, L) activated heatmaps -> (B, L, 2) coords in [-1, 1].

    The STAR default decoder: per-channel expectation of the pixel grid
    under the (non-negative, normalized) heatmap."""
    B, H, W, L = hm.shape
    w = jnp.maximum(hm, 0.0)
    w = w / jnp.maximum(w.sum(axis=(1, 2), keepdims=True), 1e-8)
    ys = jnp.linspace(-1.0, 1.0, H, dtype=hm.dtype)
    xs = jnp.linspace(-1.0, 1.0, W, dtype=hm.dtype)
    cx = (w * xs[None, None, :, None]).sum(axis=(1, 2))        # (B, L)
    cy = (w * ys[None, :, None, None]).sum(axis=(1, 2))
    return jnp.stack([cx, cy], axis=-1)


def star_forward(params: Dict, x: jnp.ndarray,
                 train: Optional[bool] = None
                 ) -> Tuple[List[jnp.ndarray], jnp.ndarray]:
    """x (B, H, W, 3) in [0, 1] -> (list of per-stack activated heatmaps
    (B, H/4, W/4, L), landmarks (B, L, 2) in [-1, 1] crop coords).

    Mirrors StackedHGNetV1.forward: CoordConv stem (stride-2 7x7 -> BN/ReLU
    -> Residual -> maxpool -> Residual x2), nstack hourglasses with
    feature/heatmap heads and merge connections, instance-norm+ReLU heatmap
    activation, soft-argmax decode of the last stack."""
    meta = params["meta"]
    nstack, depth = int(meta["nstack"]), int(meta["depth"])
    if train is None:
        train = bool(meta.get("bn_mode", 0))

    B, H, W, _ = x.shape
    x = jnp.concatenate([x, coord_channels(B, H, W, x.dtype)], axis=-1)
    x = jax.nn.relu(batch_norm(
        conv2d(x, params["pre_conv"], stride=2, padding=3),
        params["pre_bn"], train))
    x = max_pool2(_residual(x, params["res1"], train))
    x = _residual(x, params["res2"], train)
    x = _residual(x, params["res3"], train)

    outputs = []
    landmarks = None
    for i in range(nstack):
        hg = _hourglass(x, params[f"hg{i}"], depth, train)
        feat = _residual(hg, params[f"feat{i}_res"], train)
        feat = jax.nn.relu(batch_norm(conv2d(feat, params[f"feat{i}_conv"]),
                                      params[f"feat{i}_bn"], train))
        hm = conv2d(feat, params[f"out{i}"]) + params[f"out{i}_bias"]
        hm = jax.nn.relu(instance_norm(hm, params[f"act{i}_in"]))
        outputs.append(hm)
        landmarks = soft_argmax(hm)
        if i < nstack - 1:
            x = (x + _merge_bias(params, f"merge_f{i}",
                                 conv2d(feat, params[f"merge_f{i}"]))
                 + _merge_bias(params, f"merge_h{i}",
                               conv2d(hm, params[f"merge_h{i}"])))
    return outputs, landmarks


# ---------------------------------------------------------------------------
# crop / decode (the reference wrapper's 200-pixel scale convention,
# vhap/util/landmark_detector_star.py:240-273)
# ---------------------------------------------------------------------------

def landmarks_to_image(lmks_crop: np.ndarray, center, scale,
                       resolution: int = 256) -> np.ndarray:
    """(L, 2) soft-argmax coords in [-1, 1] -> image-space pixels.

    The crop frame spans 200*scale image pixels centered on `center`."""
    h = 200.0 * scale
    pts = (np.asarray(lmks_crop, np.float64) * 0.5 + 0.5) * h
    pts[:, 0] += center[0] - h / 2.0
    pts[:, 1] += center[1] - h / 2.0
    return pts.astype(np.float32)


def bbox_to_center_scale(bbox) -> Tuple[np.ndarray, float]:
    """The reference wrapper's dlib-box post-processing
    (landmark_detector_star.py:244-248): scale from the smaller box side
    over the 200-pixel reference, padded 5%."""
    x1, y1, x2, y2 = [float(v) for v in bbox[:4]]
    center = np.array([(x1 + x2) / 2.0, (y1 + y2) / 2.0])
    scale = min(x2 - x1, y2 - y1) / 200.0 * 1.05
    return center, scale


def crop_for_star(img: np.ndarray, center, scale,
                  resolution: int = 256) -> np.ndarray:
    """Crop the 200*scale square around center, resized to resolution."""
    h = 200.0 * scale
    ul = np.array([center[0] - h / 2.0, center[1] - h / 2.0]).astype(int)
    br = (ul + int(round(h))).astype(int)
    H, W = img.shape[:2]
    crop = np.zeros((br[1] - ul[1], br[0] - ul[0], 3), img.dtype)
    sx0, sx1 = max(0, ul[0]), min(W, br[0])
    sy0, sy1 = max(0, ul[1]), min(H, br[1])
    dx0, dy0 = max(0, -ul[0]), max(0, -ul[1])
    if sy1 > sy0 and sx1 > sx0:
        crop[dy0:dy0 + (sy1 - sy0), dx0:dx0 + (sx1 - sx0)] = \
            img[sy0:sy1, sx0:sx1]
    from PIL import Image
    out = np.asarray(Image.fromarray(crop.astype(np.uint8)).resize(
        (resolution, resolution), Image.BILINEAR))
    return out.astype(np.float32) / 255.0


# ---------------------------------------------------------------------------
# torch checkpoint conversion
# ---------------------------------------------------------------------------

# Official StackedHGNetV1 checkpoints name their modules through
# nn.Sequential/ModuleList containers; this table translates those prefixes
# onto this module's explicit names. It is best-effort (the package is not
# available to test against); the parity-tested contract is the explicit
# naming scheme below, and convert_torch_checkpoint reports unmatched keys.
OFFICIAL_KEY_MAP = {
    "pre.0.conv": "pre_conv",
    "pre.1": "pre_bn",
    "pre.3": "res1",
    "pre.5": "res2",
    "pre.6": "res3",
}


def _bn_from(sd, prefix):
    return {"scale": jnp.asarray(sd[prefix + ".weight"]),
            "bias": jnp.asarray(sd[prefix + ".bias"]),
            "mean": jnp.asarray(sd[prefix + ".running_mean"]),
            "var": jnp.asarray(sd[prefix + ".running_var"])}


def _conv_from(sd, name):
    w = np.asarray(sd[name + ".weight"])          # (O, I, Kh, Kw)
    return jnp.asarray(w.transpose(2, 3, 1, 0))   # -> (Kh, Kw, I, O)


def _residual_from(sd, prefix, used):
    p = {}
    for bn, cv in (("bn1", "conv1"), ("bn2", "conv2"), ("bn3", "conv3")):
        p[bn] = _bn_from(sd, f"{prefix}.{bn}")
        p[cv] = _conv_from(sd, f"{prefix}.{cv}")
        used.update({f"{prefix}.{bn}.{s}" for s in
                     ("weight", "bias", "running_mean", "running_var")})
        used.add(f"{prefix}.{cv}.weight")
    if f"{prefix}.skip_conv.weight" in sd:
        p["skip_conv"] = _conv_from(sd, f"{prefix}.skip_conv")
        used.add(f"{prefix}.skip_conv.weight")
    return p


def convert_torch_checkpoint(path: str, nstack: int = 4,
                             depth: int = 4) -> Dict:
    """Convert a STAR/StackedHGNetV1 torch checkpoint into the parameter
    pytree. Containers named with OFFICIAL_KEY_MAP prefixes are remapped;
    any state-dict key that matches no known module raises with the full
    unmatched list (so a layout drift is loud, never silent)."""
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("net", ckpt.get("state_dict", ckpt))
    sd = {k.removeprefix("module."): (v.numpy() if hasattr(v, "numpy") else v)
          for k, v in sd.items()}
    # remap official container prefixes onto the explicit scheme
    remapped = {}
    for k, v in sd.items():
        for off, mine in OFFICIAL_KEY_MAP.items():
            if k.startswith(off + "."):
                k = mine + k[len(off):]
                break
        k = (k.replace("hgs.", "hg").replace("features.", "feat")
              .replace("out_heatmaps.", "out").replace(
                  "merge_features.", "merge_f").replace(
                  "merge_heatmaps.", "merge_h"))
        remapped[k] = v
    sd = remapped

    used: set = set()
    p: Dict = {"pre_conv": _conv_from(sd, "pre_conv"),
               "pre_bn": _bn_from(sd, "pre_bn")}
    used.add("pre_conv.weight")
    used.update({f"pre_bn.{s}" for s in ("weight", "bias", "running_mean",
                                         "running_var")})
    if "pre_conv.bias" in sd:
        b = jnp.asarray(sd["pre_conv.bias"])
        p["pre_bn"] = dict(p["pre_bn"], mean=p["pre_bn"]["mean"] - b)
        used.add("pre_conv.bias")
    for name in ("res1", "res2", "res3"):
        p[name] = _residual_from(sd, name, used)

    L = sd["out0.weight"].shape[0]
    feats = sd["feat0_conv.weight"].shape[0]
    p["meta"] = {"nstack": nstack, "depth": depth, "feats": feats,
                 "num_landmarks": L, "bn_mode": 0}
    for i in range(nstack):
        hg = {}
        for level in range(depth, 0, -1):
            for part in ("up1", "low1", "low3"):
                hg[f"{part}_{level}"] = _residual_from(
                    sd, f"hg{i}.{part}_{level}", used)
            if level == 1:
                hg["bottom"] = _residual_from(sd, f"hg{i}.bottom", used)
        p[f"hg{i}"] = hg
        p[f"feat{i}_res"] = _residual_from(sd, f"feat{i}_res", used)
        p[f"feat{i}_conv"] = _conv_from(sd, f"feat{i}_conv")
        used.add(f"feat{i}_conv.weight")
        if f"feat{i}_conv.bias" in sd:
            b = jnp.asarray(sd[f"feat{i}_conv.bias"])
            bn = _bn_from(sd, f"feat{i}_bn")
            p[f"feat{i}_bn"] = dict(bn, mean=bn["mean"] - b)
            used.add(f"feat{i}_conv.bias")
        else:
            p[f"feat{i}_bn"] = _bn_from(sd, f"feat{i}_bn")
        used.update({f"feat{i}_bn.{s}" for s in
                     ("weight", "bias", "running_mean", "running_var")})
        p[f"out{i}"] = _conv_from(sd, f"out{i}")
        used.add(f"out{i}.weight")
        p[f"out{i}_bias"] = (jnp.asarray(sd[f"out{i}.bias"])
                             if f"out{i}.bias" in sd
                             else jnp.zeros((L,), jnp.float32))
        used.add(f"out{i}.bias")
        p[f"act{i}_in"] = ({"scale": jnp.asarray(sd[f"act{i}_in.weight"]),
                            "bias": jnp.asarray(sd[f"act{i}_in.bias"])}
                           if f"act{i}_in.weight" in sd
                           else {"scale": jnp.ones((L,), jnp.float32),
                                 "bias": jnp.zeros((L,), jnp.float32)})
        used.update({f"act{i}_in.weight", f"act{i}_in.bias"})
        if i < nstack - 1:
            for name in (f"merge_f{i}", f"merge_h{i}"):
                p[name] = _conv_from(sd, name)
                used.add(f"{name}.weight")
                if f"{name}.bias" in sd:
                    p[name + "_bias"] = jnp.asarray(sd[f"{name}.bias"])
                    used.add(f"{name}.bias")

    unmatched = sorted(k for k in sd if k not in used
                       and not k.endswith("num_batches_tracked"))
    if unmatched:
        raise ValueError(
            "STAR checkpoint keys with no place in the converted pytree "
            f"(layout drift?): {unmatched[:20]}{'...' if len(unmatched) > 20 else ''}")
    return p


def _merge_bias(params, name, x):
    b = params.get(name + "_bias")
    return x if b is None else x + b


save_star_params = save_fan_params
load_star_params = load_fan_params

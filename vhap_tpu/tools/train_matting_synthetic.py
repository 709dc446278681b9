"""Train the JAX matting U-Net on synthetic FLAME renders.

Companion of train_fan_synthetic.py for the monocular matting slot
(reference: RobustVideoMatting, vhap/preprocess_video.py:54-86): random
FLAME heads are rendered with the repo's own renderer, composited over
augmented backgrounds (solid colors, gradients, noise textures), and a
small U-Net (vhap_tpu/preprocess/matting.py) learns to recover the render
alpha. Weights land in assets/matting_weights.npz, the default of
MattingUNetJax / `preprocess --matting_method matting_jax`.

Usage: python -m vhap_tpu.tools.train_matting_synthetic [--steps 1200]
"""

from __future__ import annotations

import argparse
import time
from pathlib import Path

import numpy as np

IMG_SIZE = 256


def _sample_backgrounds(rng, B):
    """Solid / vertical-gradient / noise-texture backgrounds (B, S, S, 3)."""
    kinds = rng.integers(0, 3, B)
    bgs = np.empty((B, IMG_SIZE, IMG_SIZE, 3), np.float32)
    for b in range(B):
        c0 = rng.uniform(0, 1, 3)
        if kinds[b] == 0:
            bgs[b] = c0
        elif kinds[b] == 1:
            c1 = rng.uniform(0, 1, 3)
            t = np.linspace(0, 1, IMG_SIZE)[:, None, None]
            bgs[b] = c0 * (1 - t) + c1 * t
        else:
            coarse = rng.uniform(0, 1, (8, 8, 3))
            from PIL import Image
            bgs[b] = np.asarray(Image.fromarray(
                (coarse * 255).astype(np.uint8)).resize(
                    (IMG_SIZE, IMG_SIZE), Image.BILINEAR), np.float32) / 255.0
    return bgs


def train(steps: int = 1200, batch: int = 8, seed: int = 0,
          out_path: str = "vhap_tpu/assets/matting_weights.npz",
          lr: float = 4e-4, log_every: int = 100):
    import jax
    import jax.numpy as jnp
    import optax

    from vhap_tpu.model.flame import FlameHead, FlameTexPainted
    from vhap_tpu.preprocess.fan import save_fan_params
    from vhap_tpu.preprocess.matting import init_unet_params, unet_forward
    from vhap_tpu.tools.train_fan_synthetic import (_sample_params,
                                                    make_render_fn)
    from vhap_tpu.util.log import get_logger

    logger = get_logger(__name__)
    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).resolve().parents[2] / ".jax_cache"))

    head = FlameHead.build(n_shape=50, n_expr=30, add_teeth=False)
    tex = FlameTexPainted(head.assets.tex_painted, 256)()
    uv = np.asarray(head.verts_uvs)
    verts_uv = jnp.asarray(np.stack([uv[:, 0], 1.0 - uv[:, 1]], -1))

    # reuse the FAN trainer's renderer, but composite over textured
    # backgrounds and keep the render alpha as the target
    from vhap_tpu.ops import camera as cam  # noqa: F401 (parity of imports)
    from vhap_tpu.ops.render import RenderSettings, render_rgba_vis
    from vhap_tpu.ops.shading import uniform_sh_lights

    settings = RenderSettings(lighting_type="SH", backend="auto")
    base_lights = jnp.asarray(uniform_sh_lights())[None]

    def render(p, bg):
        B = p["shape"].shape[0]
        verts, _ = head(shape=p["shape"], expr=p["expr"],
                        rotation=p["rotation"], neck=p["neck"], jaw=p["jaw"],
                        eyes=p["eyes"], translation=p["translation"])
        RT = jnp.broadcast_to(
            jnp.eye(3, 4, dtype=jnp.float32).at[2, 3].set(-1.0)[None],
            (B, 3, 4))
        lights = (base_lights + p["light_noise"]) * p["light_scale"]
        out = render_rgba_vis(verts, head.faces, RT, p["K"],
                              (IMG_SIZE, IMG_SIZE), settings,
                              verts_uv=verts_uv, faces_uv=head.textures_idx,
                              tex=tex, lights=lights)
        rgba = out["rgba"]
        alpha = jnp.clip(rgba[..., 3:4], 0, 1)
        rgb = jnp.clip(rgba[..., :3] * p["tint"], 0, 1)
        img = rgb * alpha + bg * (1 - alpha)
        return img, alpha[..., 0]

    params = init_unet_params(jax.random.PRNGKey(seed))
    meta = params.pop("meta")
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    def loss_fn(params, img, alpha_t):
        logit = unet_forward(dict(params, meta=meta), img)[..., 0]
        return jnp.mean(
            optax.sigmoid_binary_cross_entropy(logit, alpha_t))

    @jax.jit
    def step(params, opt_state, p, bg):
        img, alpha_t = render(p, bg)
        l, g = jax.value_and_grad(loss_fn)(params, img, alpha_t)
        updates, opt_state = opt.update(g, opt_state)
        params = optax.apply_updates(params, updates)
        return params, opt_state, l

    rng = np.random.default_rng(seed + 1)
    t0 = time.time()
    for i in range(steps):
        p = {k: jnp.asarray(v) for k, v in
             _sample_params(rng, head, batch).items()}
        bg = jnp.asarray(_sample_backgrounds(rng, batch))
        params, opt_state, l = step(params, opt_state, p, bg)
        if i % log_every == 0 or i == steps - 1:
            logger.info(f"step {i}: loss {float(l):.4f} "
                        f"({time.time() - t0:.0f}s)")

    # ---- validation: mean |alpha - gt| on held-out renders ---------------
    params = dict(params, meta=meta)
    fwd = jax.jit(lambda x: jax.nn.sigmoid(unet_forward(params, x))[..., 0])
    errs = []
    for _ in range(4):
        p = {k: jnp.asarray(v) for k, v in
             _sample_params(rng, head, batch).items()}
        bg = jnp.asarray(_sample_backgrounds(rng, batch))
        img, alpha_t = jax.jit(render)(p, bg)
        pred = np.asarray(fwd(img))
        errs.append(np.abs(pred - np.asarray(alpha_t)).mean())
    err = float(np.mean(errs))
    logger.info(f"held-out mean alpha error: {err:.4f}")

    out_path = Path(out_path)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    save_fan_params(str(out_path), params)
    logger.info(f"saved {out_path}")
    return err


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1200)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", type=str,
                    default="vhap_tpu/assets/matting_weights.npz")
    args = ap.parse_args()
    err = train(args.steps, args.batch, args.seed, args.out)
    print(f"RESULT: err={err:.4f}")


if __name__ == "__main__":
    main()

"""Generate a synthetic monocular head sequence in the VideoDataset layout.

Renders a FLAME head with known parameters into images/, alpha_maps/ and
landmark2d/STAR/<cam>.npz so the full tracking pipeline can be exercised
end-to-end (tests, benchmarks, demos) without real footage or the
license-gated FLAME files.

Usage: python -m vhap_tpu.tools.make_synthetic_sequence \
           --out /tmp/seq/obama --frames 8 --size 256
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def generate(out_dir: Path, n_frames: int = 8, size: int = 256,
             n_shape: int = 50, n_expr: int = 20, seed: int = 0,
             head=None, return_params: bool = False):
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from vhap_tpu.model.flame import FlameHead, FlameTexPainted
    from vhap_tpu.ops.render import RenderSettings, render_rgba_vis
    from vhap_tpu.ops import camera as cam
    from vhap_tpu.ops.shading import uniform_sh_lights

    out_dir = Path(out_dir)
    (out_dir / "images").mkdir(parents=True, exist_ok=True)
    (out_dir / "alpha_maps").mkdir(exist_ok=True)
    # monocular layout stores one npz at landmark2d/STAR.npz
    # (vhap/data/video_dataset.py:359-363)
    (out_dir / "landmark2d").mkdir(parents=True, exist_ok=True)

    if head is None:
        head = FlameHead.build(n_shape=n_shape, n_expr=n_expr, add_teeth=False)
    rng = np.random.default_rng(seed)

    # ground-truth trajectory: gentle sinusoidal head motion + expressions
    t = np.arange(n_frames, dtype=np.float32)
    gt = {
        "shape": rng.normal(scale=0.3, size=(head.n_shape,)).astype(np.float32),
        "expr": (0.4 * np.sin(t[:, None] * 0.7 + np.arange(head.n_expr)[None] * 1.3)
                 ).astype(np.float32),
        "rotation": np.stack([0.1 * np.sin(t * 0.5), 0.2 * np.sin(t * 0.3),
                              0.02 * t * 0], -1).astype(np.float32),
        "neck_pose": np.zeros((n_frames, 3), np.float32),
        "jaw_pose": np.stack([0.1 + 0.08 * np.sin(t), 0 * t, 0 * t], -1).astype(np.float32),
        "eyes_pose": np.zeros((n_frames, 6), np.float32),
    }
    # camera: the dataset's guessed convention (z=1 camera, head centered)
    head_center = np.asarray(head.v_template).mean(0)
    gt["translation"] = (
        -head_center[None]
        + np.stack([0.02 * np.sin(t * 0.4), 0.02 * np.cos(t * 0.6), 0 * t], -1)
    ).astype(np.float32)

    RT = jnp.asarray(np.eye(3, 4, dtype=np.float32))[None]
    RT = RT.at[0, 2, 3].set(-1.0)
    f = 1.5 * size
    K = jnp.asarray([[f, f, size / 2, size / 2]], jnp.float32)

    settings = RenderSettings(lighting_type="SH", backend="xla")
    lights = jnp.asarray(uniform_sh_lights())[None]
    tex = FlameTexPainted(head.assets.tex_painted, 256)()

    uv = np.asarray(head.verts_uvs)
    verts_uv = jnp.asarray(np.stack([uv[:, 0], 1.0 - uv[:, 1]], -1))

    lmks_all = []
    for i in range(n_frames):
        verts, lmks = head(
            shape=jnp.asarray(gt["shape"])[None],
            expr=jnp.asarray(gt["expr"][i])[None],
            rotation=jnp.asarray(gt["rotation"][i])[None],
            neck=jnp.asarray(gt["neck_pose"][i])[None],
            jaw=jnp.asarray(gt["jaw_pose"][i])[None],
            eyes=jnp.asarray(gt["eyes_pose"][i])[None],
            translation=jnp.asarray(gt["translation"][i])[None],
        )
        out = render_rgba_vis(verts, head.faces, RT, K, (size, size), settings,
                              verts_uv=verts_uv, faces_uv=head.textures_idx,
                              tex=tex, lights=lights)
        rgba = np.asarray(out["rgba"][0])
        rgb = np.clip(rgba[..., :3], 0, 1)
        alpha = np.clip(rgba[..., 3], 0, 1)
        rgb = rgb * alpha[..., None] + (1 - alpha[..., None])  # white bg

        Image.fromarray((rgb * 255).astype(np.uint8)).save(
            out_dir / "images" / f"{i:05d}.jpg", quality=95)
        Image.fromarray((alpha * 255).astype(np.uint8)).save(
            out_dir / "alpha_maps" / f"{i:05d}.jpg", quality=95)

        # landmarks -> normalized [0,1] pixel coords + confidence
        # (contract of vhap/util/landmark_detector_star.py:370-390)
        ndc = cam.world_to_ndc(lmks, RT, K, (size, size), flip_y=True)
        xy = np.asarray(ndc[0, :, :2]) * 0.5 + 0.5
        conf = np.ones((xy.shape[0], 1), np.float32)
        lmks_all.append(np.concatenate([xy, conf], -1))

    np.savez(out_dir / "landmark2d/STAR.npz",
             face_landmark_2d=np.stack(lmks_all).astype(np.float32))

    np.savez(out_dir / "gt_params.npz", **gt)
    if return_params:
        return gt, head
    return gt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", type=Path, required=True)
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    generate(args.out, args.frames, args.size, seed=args.seed)
    print(f"wrote synthetic sequence to {args.out}")


if __name__ == "__main__":
    main()

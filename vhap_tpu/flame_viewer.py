"""FLAME sequence viewer (vhap/flame_viewer.py equivalent).

Renders a tracked ``tracked_flame_params*.npz`` sequence with the TPU
renderer. Two modes:

  * headless (default): renders every timestep from an orbitable camera to
    PNG frames and optionally assembles an mp4 via ffmpeg — works on any
    machine, including TPU pods without a display;
  * interactive (``--interactive``): dearpygui orbit-camera playback with a
    timestep slider, matching the reference GUI (gated on dearpygui being
    installed).

Usage:
    python -m vhap_tpu.flame_viewer --param_path tracked_flame_params_30.npz \
        --out_dir /tmp/viewer [--video] [--interactive]
"""

from __future__ import annotations

import argparse
import shutil
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

from vhap_tpu.util.camera_np import OrbitCamera
from vhap_tpu.util.log import get_logger

logger = get_logger(__name__)


class FlameViewer:
    def __init__(self, param_path: Path, n_shape=300, n_expr=100,
                 add_teeth=True, asset_dir=None, W=768, H=768, radius=1.0,
                 fovy=30, use_texture=True):
        import jax.numpy as jnp
        from vhap_tpu.model.flame import FlameHead, FlameTexPainted
        from vhap_tpu.ops.render import RenderSettings

        self.W, self.H = W, H
        self.cam = OrbitCamera(W, H, r=radius, fovy=fovy, convention="opengl")

        self.params = dict(np.load(param_path))
        # archives may be truncated relative to n_shape/n_expr
        self.n_timesteps = self.params["expr"].shape[0]
        n_shape = min(n_shape, self.params["shape"].shape[0])
        n_expr = min(n_expr, self.params["expr"].shape[1])

        self.head = FlameHead.build(n_shape=n_shape, n_expr=n_expr,
                                    asset_dir=asset_dir, add_teeth=add_teeth)
        self.settings = RenderSettings(lighting_type="front", backend="auto")
        self.lights = (jnp.asarray(self.params["lights"])[None]
                       if "lights" in self.params else None)
        self.tex = None
        self.verts_uv = None
        if use_texture:
            tex = FlameTexPainted(self.head.assets.tex_painted, 512)()
            if "tex_extra" in self.params:
                import jax
                res = jnp.asarray(self.params["tex_extra"])[None]
                if tex.shape[-2:] != res.shape[-2:]:
                    tex = jax.image.resize(tex, tex.shape[:2] + res.shape[-2:],
                                           method="bilinear")
                tex = tex + res
            self.tex = tex
            uv = np.asarray(self.head.verts_uvs)
            self.verts_uv = jnp.asarray(np.stack([uv[:, 0], 1.0 - uv[:, 1]], -1))

        self._verts_cache = {}

    def flame_verts(self, t: int):
        import jax.numpy as jnp
        if t not in self._verts_cache:
            p = self.params
            verts = self.head(
                shape=jnp.asarray(p["shape"][:self.head.n_shape])[None],
                expr=jnp.asarray(p["expr"][t, :self.head.n_expr])[None],
                rotation=jnp.asarray(p["rotation"][t])[None],
                neck=jnp.asarray(p["neck_pose"][t])[None],
                jaw=jnp.asarray(p["jaw_pose"][t])[None],
                eyes=jnp.asarray(p["eyes_pose"][t])[None],
                translation=jnp.asarray(p["translation"][t])[None],
                zero_centered_at_root_node=False,
                return_landmarks=False,
                static_offset=(jnp.asarray(p["static_offset"])
                               if "static_offset" in p else None),
            )
            self._verts_cache[t] = verts
        return self._verts_cache[t]

    def render_frame(self, t: int) -> np.ndarray:
        import jax.numpy as jnp
        from vhap_tpu.ops.render import render_rgba_vis

        verts = self.flame_verts(t)
        RT = jnp.asarray(self.cam.world_view_transform[None, :3].astype(np.float32))
        K = jnp.asarray(self.cam.intrinsics[None].astype(np.float32))
        out = render_rgba_vis(
            verts, self.head.faces, RT, K, (self.H, self.W), self.settings,
            verts_uv=self.verts_uv, faces_uv=self.head.textures_idx,
            tex=self.tex, lights=self.lights)
        rgba = np.asarray(out["rgba"][0])
        rgb = np.clip(rgba[..., :3] * rgba[..., 3:] + (1 - rgba[..., 3:]), 0, 1)
        return (rgb * 255).astype(np.uint8)

    # -- headless -----------------------------------------------------------

    def render_sequence(self, out_dir: Path, video: bool = False, fps: int = 25):
        from PIL import Image
        out_dir = Path(out_dir)
        frame_dir = out_dir / "frames"
        frame_dir.mkdir(parents=True, exist_ok=True)
        for t in range(self.n_timesteps):
            Image.fromarray(self.render_frame(t)).save(
                frame_dir / f"{t:05d}.png")
        logger.info(f"rendered {self.n_timesteps} frames to {frame_dir}")
        if video and shutil.which("ffmpeg"):
            vid = out_dir / "sequence.mp4"
            subprocess.run([
                "ffmpeg", "-y", "-v", "warning", "-framerate", str(fps),
                "-i", str(frame_dir / "%05d.png"),
                "-c:v", "libx264", "-pix_fmt", "yuv420p", str(vid)],
                check=True)
            logger.info(f"wrote {vid}")

    # -- interactive ----------------------------------------------------------

    def run_gui(self):
        try:
            import dearpygui.dearpygui as dpg
        except ImportError as e:
            raise RuntimeError("interactive mode requires dearpygui; use the "
                               "headless mode instead") from e

        dpg.create_context()
        state = {"t": 0, "playing": False}

        with dpg.texture_registry():
            init = self.render_frame(0).astype(np.float32) / 255.0
            rgba = np.concatenate([init, np.ones_like(init[..., :1])], -1)
            dpg.add_raw_texture(self.W, self.H, rgba.ravel(),
                                format=dpg.mvFormat_Float_rgba, tag="frame")

        def update():
            img = self.render_frame(state["t"]).astype(np.float32) / 255.0
            rgba = np.concatenate([img, np.ones_like(img[..., :1])], -1)
            dpg.set_value("frame", rgba.ravel())

        with dpg.window(tag="main", width=self.W, height=self.H + 60):
            dpg.add_image("frame")
            dpg.add_slider_int(label="timestep", min_value=0,
                               max_value=self.n_timesteps - 1,
                               callback=lambda s, v: (state.update(t=v), update()))

        def on_drag(sender, app_data):
            self.cam.orbit(app_data[1], app_data[2])
            update()

        with dpg.handler_registry():
            dpg.add_mouse_drag_handler(callback=on_drag)
            dpg.add_mouse_wheel_handler(
                callback=lambda s, v: (self.cam.scale(v), update()))

        dpg.create_viewport(title="vhap_tpu viewer", width=self.W,
                            height=self.H + 80)
        dpg.setup_dearpygui()
        dpg.show_viewport()
        dpg.start_dearpygui()
        dpg.destroy_context()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--param_path", type=Path, required=True)
    ap.add_argument("--out_dir", type=Path, default=Path("viewer_out"))
    ap.add_argument("--n_shape", type=int, default=300)
    ap.add_argument("--n_expr", type=int, default=100)
    ap.add_argument("--no-teeth", action="store_true")
    ap.add_argument("--video", action="store_true")
    ap.add_argument("--interactive", action="store_true")
    ap.add_argument("--size", type=int, default=768)
    args = ap.parse_args()
    viewer = FlameViewer(args.param_path, args.n_shape, args.n_expr,
                         add_teeth=not args.no_teeth,
                         W=args.size, H=args.size)
    if args.interactive:
        viewer.run_gui()
    else:
        viewer.render_sequence(args.out_dir, video=args.video)


if __name__ == "__main__":
    main()

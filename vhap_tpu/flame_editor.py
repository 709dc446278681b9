"""Interactive FLAME parameter editor (vhap/flame_editor.py equivalent).

Sliders for neck/jaw/eyes/expression parameters with optional region-mask
highlighting and LBS-weight coloring. Headless mode renders a grid sweep of
a chosen parameter instead (works without a display).

Usage:
    python -m vhap_tpu.flame_editor --out /tmp/editor --param expr0 --sweep -2 2
    python -m vhap_tpu.flame_editor --interactive
"""

from __future__ import annotations

import argparse
from pathlib import Path
from typing import Optional

import numpy as np

from vhap_tpu.util.camera_np import OrbitCamera
from vhap_tpu.util.log import get_logger

logger = get_logger(__name__)

_PARAM_DIMS = {"neck": 3, "jaw": 3, "eyes": 6}


class FlameEditor:
    def __init__(self, n_shape=300, n_expr=100, add_teeth=True, asset_dir=None,
                 W=768, H=768, radius=1.0, fovy=30, highlight_region=None,
                 lbs_color=False):
        import jax.numpy as jnp
        from matplotlib import cm as _cm  # noqa: F401  (optional)
        from vhap_tpu.model.flame import FlameHead
        from vhap_tpu.ops.render import RenderSettings

        self.W, self.H = W, H
        self.cam = OrbitCamera(W, H, r=radius, fovy=fovy, convention="opengl")
        self.head = FlameHead.build(n_shape=n_shape, n_expr=n_expr,
                                    asset_dir=asset_dir, add_teeth=add_teeth)
        self.settings = RenderSettings(lighting_type="front", backend="auto")

        self.state = {
            "shape": np.zeros(n_shape, np.float32),
            "expr": np.zeros(n_expr, np.float32),
            "neck": np.zeros(3, np.float32),
            "jaw": np.zeros(3, np.float32),
            "eyes": np.zeros(6, np.float32),
        }

        # vertex color: region highlight or LBS weights as colors
        # (vhap/flame_editor.py:38-358, add_lbs_color at flame.py:563-569)
        v_color = np.ones((self.head.num_verts, 3), np.float32) * 0.8
        if lbs_color:
            w = np.asarray(self.head.lbs_weights)
            palette = np.asarray([[0.9, 0.1, 0.1], [0.1, 0.9, 0.1],
                                  [0.1, 0.1, 0.9], [0.9, 0.9, 0.1],
                                  [0.9, 0.1, 0.9]], np.float32)
            v_color = w @ palette[:w.shape[1]]
        elif highlight_region:
            ids = self.head.masks.get_vid_by_region([highlight_region])
            v_color[ids] = np.asarray([0.9, 0.2, 0.2], np.float32)
        self.v_color = jnp.asarray(v_color)

    def render(self) -> np.ndarray:
        import jax.numpy as jnp
        from vhap_tpu.ops.render import render_rgba_vis

        s = self.state
        verts = self.head(
            shape=jnp.asarray(s["shape"])[None],
            expr=jnp.asarray(s["expr"])[None],
            rotation=jnp.zeros((1, 3)),
            neck=jnp.asarray(s["neck"])[None],
            jaw=jnp.asarray(s["jaw"])[None],
            eyes=jnp.asarray(s["eyes"])[None],
            translation=jnp.zeros((1, 3)),
            zero_centered_at_root_node=True,
            return_landmarks=False,
        )
        RT = jnp.asarray(self.cam.world_view_transform[None, :3].astype(np.float32))
        K = jnp.asarray(self.cam.intrinsics[None].astype(np.float32))
        out = render_rgba_vis(verts, self.head.faces, RT, K, (self.H, self.W),
                              self.settings, v_color=self.v_color)
        rgba = np.asarray(out["rgba"][0])
        rgb = np.clip(rgba[..., :3] * rgba[..., 3:] + (1 - rgba[..., 3:]), 0, 1)
        return (rgb * 255).astype(np.uint8)

    def set_param(self, name: str, values):
        if name.startswith("expr"):
            idx = int(name[4:] or 0)
            self.state["expr"][idx] = values if np.isscalar(values) else values[0]
        elif name.startswith("shape"):
            idx = int(name[5:] or 0)
            self.state["shape"][idx] = values if np.isscalar(values) else values[0]
        elif name in self.state:
            self.state[name][:len(np.atleast_1d(values))] = values
        else:
            raise KeyError(name)

    def render_sweep(self, out_dir: Path, param: str, lo: float, hi: float,
                     steps: int = 7):
        from PIL import Image
        out_dir = Path(out_dir)
        out_dir.mkdir(parents=True, exist_ok=True)
        frames = []
        for v in np.linspace(lo, hi, steps):
            self.set_param(param, float(v))
            frames.append(self.render())
        grid = np.concatenate(frames, axis=1)
        path = out_dir / f"sweep_{param}.png"
        Image.fromarray(grid).save(path)
        logger.info(f"wrote {path}")
        return grid

    def run_gui(self):
        try:
            import dearpygui.dearpygui as dpg
        except ImportError as e:
            raise RuntimeError("interactive mode requires dearpygui; use "
                               "--param/--sweep headless mode instead") from e

        dpg.create_context()
        with dpg.texture_registry():
            init = self.render().astype(np.float32) / 255.0
            rgba = np.concatenate([init, np.ones_like(init[..., :1])], -1)
            dpg.add_raw_texture(self.W, self.H, rgba.ravel(),
                                format=dpg.mvFormat_Float_rgba, tag="frame")

        def update():
            img = self.render().astype(np.float32) / 255.0
            rgba = np.concatenate([img, np.ones_like(img[..., :1])], -1)
            dpg.set_value("frame", rgba.ravel())

        def slider_cb(param, idx):
            def cb(sender, value):
                self.state[param][idx] = value
                update()
            return cb

        with dpg.window(tag="view", width=self.W, height=self.H):
            dpg.add_image("frame")
        with dpg.window(tag="controls", label="FLAME parameters",
                        pos=(self.W, 0), width=320, height=self.H):
            for name, dim in _PARAM_DIMS.items():
                for i in range(dim):
                    dpg.add_slider_float(label=f"{name}[{i}]", min_value=-0.6,
                                         max_value=0.6,
                                         callback=slider_cb(name, i))
            for i in range(min(10, len(self.state["expr"]))):
                dpg.add_slider_float(label=f"expr[{i}]", min_value=-3.0,
                                     max_value=3.0, callback=slider_cb("expr", i))

        with dpg.handler_registry():
            dpg.add_mouse_drag_handler(
                callback=lambda s, a: (self.cam.orbit(a[1], a[2]), update()))
            dpg.add_mouse_wheel_handler(
                callback=lambda s, v: (self.cam.scale(v), update()))

        dpg.create_viewport(title="vhap_tpu editor", width=self.W + 340,
                            height=self.H + 40)
        dpg.setup_dearpygui()
        dpg.show_viewport()
        dpg.start_dearpygui()
        dpg.destroy_context()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", type=Path, default=Path("editor_out"))
    ap.add_argument("--param", default="jaw")
    ap.add_argument("--sweep", type=float, nargs=2, default=(-0.3, 0.3))
    ap.add_argument("--steps", type=int, default=7)
    ap.add_argument("--n_shape", type=int, default=300)
    ap.add_argument("--n_expr", type=int, default=100)
    ap.add_argument("--highlight_region", default=None)
    ap.add_argument("--lbs_color", action="store_true")
    ap.add_argument("--interactive", action="store_true")
    args = ap.parse_args()
    ed = FlameEditor(args.n_shape, args.n_expr,
                     highlight_region=args.highlight_region,
                     lbs_color=args.lbs_color)
    if args.interactive:
        ed.run_gui()
    else:
        # scalar sweeps set the first component of vector params (e.g. jaw x)
        ed.render_sweep(args.out, args.param, args.sweep[0], args.sweep[1],
                        args.steps)


if __name__ == "__main__":
    main()

"""OBJ/MTL text serialization (vhap/util/mesh.py:13-39)."""

from __future__ import annotations

import numpy as np


def get_mtl_content(tex_fname: str) -> str:
    return f"newmtl Material\nmap_Kd {tex_fname}\n"


def get_obj_content(vertices, faces, uv_coordinates=None, uv_indices=None,
                    mtl_fname=None) -> str:
    lines = ["# Generated with vhap_tpu"]
    if mtl_fname is not None:
        lines.append(f"mtllib {mtl_fname}")
        lines.append("usemtl Material")
    for v in np.asarray(vertices):
        lines.append(f"v {v[0]} {v[1]} {v[2]}")
    if uv_coordinates is not None:
        for uv in np.asarray(uv_coordinates):
            lines.append(f"vt {uv[0]} {uv[1]}")
    if uv_indices is not None:
        for f, t in zip(np.asarray(faces), np.asarray(uv_indices)):
            lines.append(f"f {f[0]+1}/{t[0]+1} {f[1]+1}/{t[1]+1} {f[2]+1}/{t[2]+1}")
    else:
        for f in np.asarray(faces):
            lines.append(f"f {f[0]+1} {f[1]+1} {f[2]+1}")
    return "\n".join(lines) + "\n"


def face_vertices(vertices, faces):
    """Per-face vertex gather: (B, V, C) x (B, F, 3) -> (B, F, 3, C)
    (vhap/util/mesh.py:54-72)."""
    import numpy as np
    vertices = np.asarray(vertices)
    faces = np.asarray(faces)
    return vertices[np.arange(vertices.shape[0])[:, None, None], faces]

"""UV-space rasterization + per-region texel-mask baking.

Covers vhap_tpu/ops/render_uvmap.py and vhap_tpu/generate_flame_uvmask.py
(reference: vhap/util/render_uvmap.py, vhap/generate_flame_uvmask.py).
"""

import numpy as np
import jax.numpy as jnp


def test_render_uvmap_vtex_covers_uv_triangles():
    """A UV triangle painted with vertex alpha 1 covers its own area."""
    from vhap_tpu.ops.render_uvmap import render_uvmap_vtex

    vt = jnp.asarray([[0.1, 0.1], [0.9, 0.1], [0.1, 0.9],
                      [0.9, 0.9]], jnp.float32)
    faces = jnp.asarray([[0, 1, 2], [1, 3, 2]], jnp.int32)
    v_color = jnp.asarray([[1.0], [1.0], [1.0], [0.0]], jnp.float32)

    img = np.asarray(render_uvmap_vtex(vt, faces, v_color, faces, (64, 64)))
    assert img.shape == (1, 64, 64, 1)
    # first triangle's interior is fully painted; the second fades to 0
    # at vertex 3. Sample interior points (uv y-up -> buffer row ~ v*H)
    assert img[0, 16, 16, 0] > 0.9        # inside tri 0
    assert img[0, 56, 56, 0] < 0.5        # near vertex 3 of tri 1
    # coverage: ~the [0.1, 0.9]^2 square is rasterized
    frac = (img[0, :, :, 0] > 0.0).mean()
    assert 0.5 < frac < 0.75, frac


def test_generate_flame_uvmask_roundtrip(tmp_path):
    """The generator writes one PNG per vt-region plus uv_masks.npz whose
    arrays match the returned masks (small resolution for CI)."""
    from vhap_tpu.generate_flame_uvmask import generate
    from vhap_tpu.model.flame import FlameHead

    head = FlameHead.build(n_shape=10, n_expr=5, add_teeth=False)
    regions = sorted(head.masks.vt)[:2]
    assert regions, "no vt regions available"
    masks = generate(tmp_path, resolution=128, head=head, regions=regions)

    z = np.load(tmp_path / "uv_masks.npz")
    assert sorted(z.files) == sorted(masks)
    for name in masks:
        assert z[name].shape == (128, 128)
        np.testing.assert_array_equal(z[name], masks[name])
        assert (tmp_path / "uv_masks" / f"{name}.png").exists()
        assert z[name].any(), f"region {name} baked an empty mask"

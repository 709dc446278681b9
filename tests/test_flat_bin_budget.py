"""Pin the flat-bin global budget at bench shapes (VERDICT r4 #9).

The flat work list (vhap_tpu/ops/rasterize.py:bin_faces_flat) drops
(face, tile) pairs beyond a global budget of ~2 pairs/face. These tests pin
that at the bench workload's shapes (FLAME head, 512x512, monocular camera)
the budget has real margin — overflow == 0 AND wanted chunks <= ~60% of the
budget — so a future mesh/resolution change that starts dropping foreground
fails a test instead of silently degrading quality. The margin rule is
documented in docs/PERF.md ("Flat-bin budget margin").
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import pytest

from vhap_tpu.ops import camera as cam
from vhap_tpu.ops.rasterize import (bin_faces_flat, face_setup,
                                    flat_bin_budget)


def _bench_scene(H, W, B=2, seed=0):
    """The bench.py workload geometry: full FLAME head framed like the
    monocular tracker (energy.fill_cam_params defaults: focal 1.5,
    camera at z=-1)."""
    from vhap_tpu.model.flame import FlameHead

    head = FlameHead.build(n_shape=150, n_expr=100)
    rng = np.random.default_rng(seed)
    zeros = lambda n: jnp.zeros((B, n), jnp.float32)
    expr = jnp.asarray(rng.normal(0, 0.3, (B, 100)).astype(np.float32))
    rot = jnp.asarray(rng.normal(0, 0.1, (B, 3)).astype(np.float32))
    verts = head(zeros(150), expr, rot, zeros(3), zeros(3), zeros(6),
                 zeros(3), return_landmarks=False)

    f = 1.5 * max(H, W)
    K = jnp.asarray([[f, f, 0.5 * W, 0.5 * H]] * B, jnp.float32)
    RT = jnp.broadcast_to(jnp.eye(3, 4).at[2, 3].set(-1.0), (B, 3, 4))
    verts_clip = cam.camera_to_clip(
        cam.world_to_camera(verts, RT), K, (H, W))
    return verts_clip, head.faces


@pytest.mark.parametrize("H,W", [(512, 512), (256, 256)])
def test_bench_shape_budget_margin(H, W):
    verts_clip, faces = _bench_scene(H, W)
    setup = face_setup(verts_clip, faces, cull_backfaces=True)
    bins = bin_faces_flat(setup, H, W, 16, 128)

    assert int(bins["overflow"]) == 0, (
        f"flat-bin budget drops foreground pairs at {H}x{W} — raise "
        "flat_bin_budget or budget_chunks (docs/PERF.md margin rule)")

    # margin: chunks the scene actually wants vs the granted budget.
    # counts is what was granted == wanted when overflow == 0.
    T = (H // 16) * (W // 128)
    want_chunks = int(np.ceil(np.asarray(bins["counts"]) / 128.0).sum(-1)
                      .max())
    budget = flat_bin_budget(faces.shape[0], T)
    margin = want_chunks / budget
    assert margin <= 0.80, (
        f"budget margin eroded: wanted {want_chunks}/{budget} chunks "
        f"({margin:.0%}) — the next mesh/resolution bump may overflow")


def test_overflow_counts_drops_exactly():
    """When the budget IS too small, every dropped pair is counted."""
    H = W = 256
    verts_clip, faces = _bench_scene(H, W, B=1)
    setup = face_setup(verts_clip, faces, cull_backfaces=True)
    full = bin_faces_flat(setup, H, W, 16, 128)
    T = (H // 16) * (W // 128)
    tight = bin_faces_flat(setup, H, W, 16, 128, budget_chunks=T + 8)
    lost = (int(np.asarray(full["counts"]).sum())
            - int(np.asarray(tight["counts"]).sum()))
    assert lost > 0
    assert int(tight["overflow"]) == int(full["overflow"]) + lost

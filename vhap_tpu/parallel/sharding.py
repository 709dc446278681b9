"""Multi-chip scaling: batch-axis sharding over a device mesh.

The reference is single-GPU (vhap/config/base.py:329); its one natural
parallel axis is the batch — 16 NeRSemble cameras of a timestep or 16
monocular frames per batch (SURVEY.md §7). Here that axis is sharded over
a 1-D ``jax.sharding.Mesh``:

  * batch leaves (rgb, lmk2d, per-view cameras) partitioned on axis 0,
  * parameters + optimizer state replicated,
  * the jitted train step then runs SPMD; XLA inserts the psum over ICI
    that reduces photometric/landmark gradients into the replicated
    parameter update (the explicit NCCL allreduce a torch port would need).

Scaling beyond one pod slice (many sequences fitted in parallel) is
embarrassingly parallel — one sequence per host group, no cross-host
traffic — and is handled by launching independent trackers.

Note on the Pallas kernels: the texture tap kernels and the visibility
kernel are batch-local (no cross-batch reductions). XLA's SPMD
partitioner cannot infer that for custom calls, so when a mesh is active
they are wrapped in ``jax.shard_map`` over the batch axis instead
(``ops/rasterize.py:visibility_dispatch``, ``ops/texture.py``
``texture_sample(mesh=...)``): each shard runs the kernel on its local
batch, the visibility overflow is psum-reduced, and the texture
gradient's psum onto the replicated mip pyramid comes from shard_map's
transpose of the replicated input spec. The tracker threads its mesh
through ``make_energy_fn(mesh=...)``; ``dryrun_multichip`` and
``tests/test_sharding.py`` exercise exactly this path on an 8-device
virtual CPU mesh (kernels in interpret mode), and ``render.backend=
"xla"`` + ``texture_grad_impl="xla"`` remain as the GSPMD-partitioned
fallback.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

BATCH_AXIS = "data"


def make_mesh(devices: Optional[Sequence] = None, axis: str = BATCH_AXIS) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.asarray(devices), (axis,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(BATCH_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict[str, jnp.ndarray], mesh: Mesh) -> Dict[str, jnp.ndarray]:
    """Partition every batch leaf on its leading (frame/camera) axis."""
    s = batch_sharding(mesh)
    return {k: jax.device_put(v, s) for k, v in batch.items()}


def replicate_tree(tree, mesh: Mesh):
    s = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)


def pad_batch_to_devices(batch: Dict[str, jnp.ndarray], n_devices: int):
    """Pad the batch axis to a multiple of the mesh size (weight-0 padding,
    consistent with the tracker's static-shape padding convention)."""
    B = batch["timestep_index"].shape[0]
    rem = (-B) % n_devices
    if rem == 0:
        return batch
    out = {}
    for k, v in batch.items():
        pad_rows = jnp.repeat(v[-1:], rem, axis=0)
        if k == "weight":
            pad_rows = jnp.zeros_like(pad_rows)
        out[k] = jnp.concatenate([v, pad_rows], axis=0)
    return out

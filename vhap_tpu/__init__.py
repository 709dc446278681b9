"""vhap_tpu: TPU-native photometric head tracking (FLAME fitting) in JAX.

A ground-up re-design of the VHAP pipeline (photometric head alignment with
adaptive appearance priors) for TPU hardware:

- FLAME 2023 forward (blendshapes, LBS, landmarks) as pure JAX functions.
- A differentiable tile-binned mesh rasterizer (Pallas TPU kernel + XLA
  fallback) replacing nvdiffrast: rasterize / interpolate / mip-mapped
  texture sampling / silhouette antialiasing, all differentiable w.r.t.
  vertex positions and texels.
- The staged Adam optimization loop compiled once per stage with
  ``jax.jit``; per-frame parameters live in a single pytree so a whole
  sequence amortizes one XLA compile.
- Multi-view / multi-chip scaling via ``jax.sharding`` over a device mesh
  (cameras or frames sharded on the batch axis; gradient reduction rides
  ICI collectives inserted by XLA).

Reference behavior parity targets ShenhanQian/VHAP (see SURVEY.md at repo
root); docstrings cite reference files as ``vhap/<file>:<line>``.
"""

__version__ = "0.1.0"

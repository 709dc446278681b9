"""Test configuration: force CPU with 8 virtual devices for sharding tests.

Must set env vars before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the dev env presets JAX_PLATFORMS=axon (TPU)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The dev image's sitecustomize calls jax.config.update("jax_platforms",
# "axon,cpu") at interpreter start, overriding the env var — undo it here
# (conftest runs before any test imports initialize backends).
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


@pytest.fixture(scope="session")
def tiny_head():
    """Small synthetic FLAME-like head (sphere topology) for fast math tests."""
    from vhap_tpu.model.assets import load_flame_assets
    from vhap_tpu.model.flame import FlameHead

    assets = load_flame_assets(asset_dir="/nonexistent_force_synth", allow_synthetic=True, seed=0)
    return FlameHead.build(n_shape=20, n_expr=10, assets=assets, add_teeth=False)


@pytest.fixture(scope="session")
def full_head():
    """FLAME head with real template topology when available, else synthetic."""
    from vhap_tpu.model.flame import FlameHead

    return FlameHead.build(
        n_shape=150, n_expr=65, add_teeth=True,
        face_clusters=("skin", "hair", "boundary", "lips_tight", "teeth",
                       "sclerae", "irises"),
    )

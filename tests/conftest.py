"""Test env: force JAX onto a virtual 8-device CPU mesh before jax imports.

Multi-device sharding tests run on this mesh
(SURVEY.md §4: add what the reference lacks — CPU-runnable kernel tests and
multi-device tests on a host-platform mesh).
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# The image's sitecustomize pre-imports jax with JAX_PLATFORMS=axon (the real
# TPU tunnel); env vars alone are too late, so force the platform via config.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_KITTI_BIN = "/root/reference/Kdtree_Octree/000000.bin"


@pytest.fixture(scope="session")
def kitti_scan():
    """The one real KITTI scan shipped with the reference (124,668 x 4 f32)."""
    if not os.path.exists(REFERENCE_KITTI_BIN):
        pytest.skip("reference KITTI scan not available")
    from pctpu.core.io import read_velodyne_bin
    return read_velodyne_bin(REFERENCE_KITTI_BIN)


@pytest.fixture()
def rng():
    return np.random.default_rng(0)

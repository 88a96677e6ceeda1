"""Test harness configuration.

All tests run on the CPU backend with 8 virtual XLA devices so that
multi-device sharding (data parallel + tensor parallel meshes) is exercised
without TPU hardware, mirroring how the reference would be tested with a fake
distributed backend (it has none — see SURVEY.md §4).
"""

import os
import sys

# Must be set before jax is imported anywhere. The session environment pins
# JAX_PLATFORMS to the TPU tunnel; tests always run on the virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)

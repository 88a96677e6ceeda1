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
# Single-core host: multiple OpenMP runtimes (torch, TF-via-transformers,
# XLA) deadlock on futexes when they each spin up thread pools. Pin
# everything to one thread and keep transformers from importing TF/flax.
os.environ.setdefault("OMP_NUM_THREADS", "1")
os.environ.setdefault("MKL_NUM_THREADS", "1")
os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")
os.environ.setdefault("USE_TF", "0")
os.environ.setdefault("TRANSFORMERS_NO_ADVISORY_WARNINGS", "1")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags += " --xla_force_host_platform_device_count=8"
# On a single-core host, XLA:CPU's multi-threaded Eigen/oneDNN convolutions
# intermittently deadlock (main thread blocks in Array._value while the
# conv thunk waits for pool threads). Single-threaded Eigen is reliable.
if "xla_cpu_multi_thread_eigen" not in flags:
    flags += " --xla_cpu_multi_thread_eigen=false --xla_cpu_parallel_codegen_split_count=1"
os.environ["XLA_FLAGS"] = flags.strip()
# The real deadlock source: XLA:CPU async dispatch hands execution to a
# worker thread that (flakily) never gets scheduled on this 1-core host
# while the main thread blocks in Array._value. Execute synchronously.
os.environ.setdefault("JAX_CPU_ENABLE_ASYNC_DISPATCH", "false")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# This environment PRE-IMPORTS jax at interpreter startup with the `axon`
# TPU platform already selected, so the env vars above don't reach backend
# selection — without the overrides below, "CPU" tests would silently run
# on (and fight over) the single real TPU chip. Forcing via jax.config works
# because no backend is initialized yet at conftest time.
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
# Persistent compile cache (VERDICT r03 next #8): the heavy parity/SPMD
# suites are compile-bound on this 1-core host; warm reruns skip XLA
# compilation entirely. Kept separate from the TPU cache (.jax_cache).
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)

"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set the XLA flags before jax is imported anywhere; pytest imports
conftest first, so this is the safe place.
"""

import os

# Force CPU regardless of any ambient TPU platform: unit tests must be
# deterministic and run on the virtual 8-device mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# A pytest plugin may import jax before this conftest runs, capturing the
# ambient JAX_PLATFORMS (the experimental TPU tunnel) into jax.config — so
# the env var alone is not enough; set the config explicitly too.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: this host has a single CPU core and XLA
# compiles dominate test runtime; the cache amortizes them across runs.
jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)

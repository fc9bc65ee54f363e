"""Test harness setup: force CPU with 8 virtual devices so the multi-chip
sharded paths (parallel/) are exercised without TPU hardware (SURVEY.md §4).

Must run before the first ``import jax`` anywhere in the test session.
"""

import os

# NOTE: this interpreter's sitecustomize imports jax before conftest runs, so
# env vars (JAX_PLATFORMS / XLA_FLAGS) are read too early to take effect —
# set everything through jax.config, which works until backends initialize.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
# This environment pays ~0.5-1 s of XLA compile time per distinct computation
# (even trivial eager ops); the persistent cache makes repeat test runs cheap.
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_comp"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)

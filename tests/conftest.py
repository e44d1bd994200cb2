"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the TPU-native answer to "test distributed without a cluster"
(SURVEY.md §4): jax's cpu device-count override simulates an 8-chip mesh on
CPU, so data-parallel sharding, collectives, and the full compress/decompress
paths are exercised in CI without TPU hardware.

Note: the environment's sitecustomize may force JAX_PLATFORMS=axon (TPU
tunnel); jax.config.update overrides it reliably, the env var does not.
"""
import os

import pytest

# Persistent XLA compilation cache: first run pays compile time, reruns are
# fast. Kept inside the repo (gitignored).
_CACHE_DIR = os.path.join(os.path.dirname(__file__), '.jax_cache')
os.makedirs(_CACHE_DIR, exist_ok=True)

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_num_cpu_devices', 8)
jax.config.update('jax_compilation_cache_dir', _CACHE_DIR)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)


@pytest.fixture(scope='session')
def rng_np():
    import numpy as np
    return np.random.default_rng(0)

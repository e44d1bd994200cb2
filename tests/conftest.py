"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the TPU-native answer to "test distributed without a cluster"
(SURVEY.md §4): jax's cpu device-count override simulates an 8-chip mesh on
CPU, so data-parallel sharding, collectives, and the full compress/decompress
paths are exercised in CI without TPU hardware.

Note: the environment's sitecustomize may force JAX_PLATFORMS=axon (TPU
tunnel); jax.config.update overrides it reliably, the env var does not.
"""
import os
import signal

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


def pytest_configure(config):
    config.addinivalue_line(
        'markers',
        'timeout(seconds): fail (not hang) a test exceeding the limit')


@pytest.hookimpl(hookwrapper=True)
def pytest_runtest_call(item):
    """A real implementation of @pytest.mark.timeout — the pytest-timeout
    plugin is not installed in this environment, so without this hook the
    marks would be silently inert and a wedged multiprocess test (e.g. a
    jax.distributed worker deadlocked on its coordinator) would hang CI
    forever. SIGALRM interrupts even blocking syscalls like
    subprocess.communicate (the pytest-timeout 'signal' method)."""
    m = item.get_closest_marker('timeout')
    if m and hasattr(signal, 'SIGALRM'):
        seconds = int(m.args[0])

        def _on_timeout(signum, frame):
            raise TimeoutError(f'test exceeded its {seconds}s timeout')

        old = signal.signal(signal.SIGALRM, _on_timeout)
        signal.alarm(seconds)
        try:
            yield
        finally:
            signal.alarm(0)
            signal.signal(signal.SIGALRM, old)
    else:
        yield


@pytest.fixture(scope='session')
def rng_np():
    import numpy as np
    return np.random.default_rng(0)

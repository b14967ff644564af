'''Test configuration: force an 8-device virtual CPU platform so multi-chip
sharding paths are exercised without TPU hardware.

Note: this environment's sitecustomize registers the 'axon' TPU PJRT plugin
and exports JAX_PLATFORMS=axon in every interpreter, importing jax before
conftest runs — so the platform must be overridden via jax.config (backends
initialize lazily), not via os.environ alone.
'''
import os

flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()
os.environ['JAX_PLATFORMS'] = 'cpu'

import jax
import numpy as np
import pytest

jax.config.update('jax_platforms', 'cpu')

# parity tests compare against torch fp32; JAX's default matmul precision is
# bf16-based, so force full fp32 matmuls in tests
jax.config.update('jax_default_matmul_precision', 'highest')

# persist compiled executables across runs
_CACHE_DIR = os.path.join(os.path.dirname(__file__), '..', '.jax_cache')
jax.config.update('jax_compilation_cache_dir', os.path.abspath(_CACHE_DIR))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)


def pytest_configure(config):
    assert jax.default_backend() == 'cpu', jax.default_backend()
    assert len(jax.devices()) == 8, jax.devices()


@pytest.fixture
def rng():
    return np.random.default_rng(0)

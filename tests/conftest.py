'''Test configuration: force an 8-device virtual CPU platform so multi-chip
sharding paths are exercised without TPU hardware.'''
import os

# must run before jax is imported anywhere
os.environ.setdefault('JAX_PLATFORMS', 'cpu')
flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

import jax
import numpy as np
import pytest

# parity tests compare against torch fp32; JAX's default matmul precision is
# bf16-based even on CPU, so force full fp32 matmuls in tests
jax.config.update('jax_default_matmul_precision', 'highest')

# XLA compile on this host is slow — persist compiled executables across runs
_CACHE_DIR = os.path.join(os.path.dirname(__file__), '..', '.jax_cache')
jax.config.update('jax_compilation_cache_dir', os.path.abspath(_CACHE_DIR))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)


@pytest.fixture
def rng():
    return np.random.default_rng(0)

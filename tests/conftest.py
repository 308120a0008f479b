"""Test configuration: run JAX on a virtual 8-device CPU platform.

Multi-chip hardware is not available in CI; sharding logic is validated on
a simulated 8-device CPU mesh (SURVEY.md §4's recommended strategy).
"""

import os

# Must be set before jax is imported anywhere.  Hard-set (not setdefault):
# the environment pins JAX_PLATFORMS=axon for the real-TPU tunnel, but tests
# must run on the virtual CPU mesh.  Stash the original so hardware-gated
# tests (test_fused_hw.py) can reach the real chip via a subprocess.
os.environ.setdefault('NBASR_HW_JAX_PLATFORMS',
                      os.environ.get('JAX_PLATFORMS', ''))
os.environ['JAX_PLATFORMS'] = 'cpu'
flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

# Plugins may import jax before this conftest runs; jax_platforms can still
# be forced as long as no backend has been initialized yet.
import jax  # noqa: E402
jax.config.update('jax_platforms', 'cpu')
assert jax.default_backend() == 'cpu', 'tests must run on the virtual CPU mesh'
assert jax.device_count() == 8, 'expected 8 virtual CPU devices'

import pytest  # noqa: E402


@pytest.fixture(scope='session')
def rng_key():
    import jax
    return jax.random.PRNGKey(0)

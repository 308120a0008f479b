"""Test configuration: run JAX on a virtual 8-device CPU platform.

Multi-chip hardware is not available in CI; sharding logic is validated on
a simulated 8-device CPU mesh (SURVEY.md §4's recommended strategy).
"""

import os

# Must be set before jax is imported anywhere.
os.environ.setdefault('JAX_PLATFORMS', 'cpu')
flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

import pytest  # noqa: E402


@pytest.fixture(scope='session')
def rng_key():
    import jax
    return jax.random.PRNGKey(0)

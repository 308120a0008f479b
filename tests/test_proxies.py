"""Zero-cost proxy tests: finiteness, determinism, and sane discrimination
(a zero-everything architecture scores no higher than a real one)."""

import numpy as np
import pytest
import jax.numpy as jnp

from nbasr_tpu.models.proxies import compute_proxy, PROXIES

TINY_KW = dict(block_filters=(8, 8, 8, 8), cells_per_block=(1, 1, 1, 1),
               cell_groups=2)
REAL_ARCH = [[1, 0], [2, 1, 0], [0, 0, 1, 0]]
ZERO_ARCH = [[5, 0], [5, 0, 0], [5, 0, 0, 0]]


@pytest.fixture(scope='module')
def batch():
    rng = np.random.RandomState(0)
    feats = rng.randn(2, 32, 80).astype(np.float32)
    fsize = np.array([32, 24], np.int32)
    labels = rng.randint(1, 49, size=(2, 5)).astype(np.int32)
    lsize = np.array([5, 4], np.int32)
    return feats, fsize, labels, lsize


@pytest.mark.parametrize('name', sorted(PROXIES))
def test_proxy_finite_and_deterministic(name, batch):
    feats, fsize, labels, lsize = batch
    a = compute_proxy(name, REAL_ARCH, feats, fsize, labels, lsize, **TINY_KW)
    b = compute_proxy(name, REAL_ARCH, feats, fsize, labels, lsize, **TINY_KW)
    assert np.isfinite(a) and a == b


def test_synflow_zero_arch_scores_lower(batch):
    feats, fsize, labels, lsize = batch
    real = compute_proxy('synflow', REAL_ARCH, feats, fsize, **TINY_KW)
    dead = compute_proxy('synflow', ZERO_ARCH, feats, fsize, **TINY_KW)
    assert real > dead


def test_unknown_proxy_raises(batch):
    feats, fsize, labels, lsize = batch
    with pytest.raises(ValueError):
        compute_proxy('nope', REAL_ARCH, feats, fsize)

"""Pallas grouped-conv kernel tests (interpret mode on CPU): forward and
both gradients against the XLA grouped conv as oracle."""

import functools

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from nbasr_tpu.ops.grouped_conv import grouped_conv1d
from nbasr_tpu.models.layers import conv_padding


def _xla_grouped(x, w, groups, lpad, rpad, dilation):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1,), padding=[(lpad, rpad)],
        rhs_dilation=(dilation,), feature_group_count=groups,
        dimension_numbers=('NWC', 'WIO', 'NWC'))


CASES = [
    # (B, T, C, groups, K, dilation)
    (2, 24, 12, 4, 5, 1),
    (2, 24, 12, 4, 5, 2),
    (3, 17, 24, 4, 7, 1),
    (1, 31, 8, 2, 7, 2),
]


@pytest.mark.parametrize('B,T,C,groups,K,dilation', CASES)
def test_forward_matches_xla(B, T, C, groups, K, dilation):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, T, C).astype(np.float32))
    w = jnp.asarray(rng.randn(K, C // groups, C).astype(np.float32) * 0.2)
    lpad, rpad = conv_padding(K, dilation, 1)
    ours = grouped_conv1d(x, w, groups, lpad, rpad, dilation, True)
    ref = _xla_grouped(x, w, groups, lpad, rpad, dilation)
    assert ours.shape == ref.shape == (B, T, C)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize('B,T,C,groups,K,dilation', CASES[:2])
def test_gradients_match_xla(B, T, C, groups, K, dilation):
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(B, T, C).astype(np.float32))
    w = jnp.asarray(rng.randn(K, C // groups, C).astype(np.float32) * 0.2)
    cot = jnp.asarray(rng.randn(B, T, C).astype(np.float32))
    lpad, rpad = conv_padding(K, dilation, 1)

    def ours(x, w):
        return (grouped_conv1d(x, w, groups, lpad, rpad, dilation, True) * cot).sum()

    def ref(x, w):
        return (_xla_grouped(x, w, groups, lpad, rpad, dilation) * cot).sum()

    gx_o, gw_o = jax.grad(ours, argnums=(0, 1))(x, w)
    gx_r, gw_r = jax.grad(ref, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx_o), np.asarray(gx_r),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw_o), np.asarray(gw_r),
                               rtol=1e-4, atol=1e-4)


def test_reference_cell_shapes():
    """The exact shapes of the flagship cells (groups=100, C=600)."""
    rng = np.random.RandomState(2)
    B, T, C, G, K, d = 2, 40, 600, 100, 5, 1
    x = jnp.asarray(rng.randn(B, T, C).astype(np.float32) * 0.1)
    w = jnp.asarray(rng.randn(K, C // G, C).astype(np.float32) * 0.1)
    lpad, rpad = conv_padding(K, d, 1)
    ours = grouped_conv1d(x, w, G, lpad, rpad, d, True)
    ref = _xla_grouped(x, w, G, lpad, rpad, d)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)

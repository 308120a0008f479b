"""Split-layout cell path (ops/cell_ops.py): the fused grouped-conv kernel
against an XLA oracle, and full cell/model equivalence against the
masked_dense implementation (identical parameter trees), interpret mode."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import nbasr_tpu.ops.cell_ops as cell_ops
from nbasr_tpu.ops.cell_ops import to_split, from_split, grouped_conv_relu
from nbasr_tpu.models.layers import conv_padding
from nbasr_tpu.models.cell import SearchCell
from nbasr_tpu.models.asr import ASRModel


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(cell_ops, 'INTERPRET', True)
    # XLA's CPU conv defaults to a low-precision path (~3e-3 relative error
    # at these shapes, verified against float64 numpy); the Pallas kernels
    # accumulate in f32 and are exact to ~5e-7.  Pin the oracle to full
    # precision so the comparison measures *our* error, not the oracle's.
    with jax.default_matmul_precision('highest'):
        yield


def _oracle(x, w, b, groups, lpad, rpad, dilation):
    """Dense-layout XLA conv + bias + clip-ReLU on [B, T, C]."""
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(1,), padding=[(lpad, rpad)],
        rhs_dilation=(dilation,), feature_group_count=groups,
        dimension_numbers=('NWC', 'WIO', 'NWC'),
        precision=jax.lax.Precision.HIGHEST)
    return jnp.clip(y + b, 0.0, 20.0)


def test_split_roundtrip():
    x = jnp.arange(2 * 7 * 12, dtype=jnp.float32).reshape(2, 7, 12)
    assert np.array_equal(np.asarray(from_split(to_split(x, 4))),
                          np.asarray(x))


CASES = [
    # (B, T, C, groups, K, dilation)
    (2, 24, 12, 4, 5, 1),
    (2, 24, 12, 4, 5, 2),
    (3, 17, 24, 4, 7, 1),
    (1, 31, 8, 2, 7, 2),
]


@pytest.mark.parametrize('B,T,C,groups,K,dilation', CASES)
def test_fused_conv_relu_matches_xla(B, T, C, groups, K, dilation):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, T, C).astype(np.float32))
    w = jnp.asarray(rng.randn(K, C // groups, C).astype(np.float32) * 0.2)
    b = jnp.asarray(rng.randn(C).astype(np.float32) * 0.1)
    lpad, rpad = conv_padding(K, dilation, 1)
    ours = from_split(grouped_conv_relu(to_split(x, groups), w, b, groups,
                                        lpad, rpad, dilation))
    ref = _oracle(x, w, b, groups, lpad, rpad, dilation)
    assert ours.shape == ref.shape == (B, T, C)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize('B,T,C,groups,K,dilation', CASES[:2])
def test_fused_conv_relu_grads(B, T, C, groups, K, dilation):
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(B, T, C).astype(np.float32))
    w = jnp.asarray(rng.randn(K, C // groups, C).astype(np.float32) * 0.2)
    b = jnp.asarray(rng.randn(C).astype(np.float32) * 0.1)
    cot = jnp.asarray(rng.randn(B, T, C).astype(np.float32))
    lpad, rpad = conv_padding(K, dilation, 1)

    def ours(x, w, b):
        y = grouped_conv_relu(to_split(x, groups), w, b, groups,
                              lpad, rpad, dilation)
        return (from_split(y) * cot).sum()

    def ref(x, w, b):
        return (_oracle(x, w, b, groups, lpad, rpad, dilation) * cot).sum()

    g_o = jax.grad(ours, argnums=(0, 1, 2))(x, w, b)
    g_r = jax.grad(ref, argnums=(0, 1, 2))(x, w, b)
    for a, e in zip(g_o, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                   rtol=1e-4, atol=1e-4)


ARCHS = [
    ((('conv5', 0), ('conv7d2', 1, 1), ('linear', 0, 1, 1)),),
    ((('conv5d2', 1), ('zero', 0, 1), ('conv7', 1, 0, 0)),),
]


@pytest.mark.parametrize('arch_desc', [a[0] for a in ARCHS])
def test_cell_matches_masked_dense(arch_desc):
    """Same variables dict drives both impls — outputs must agree."""
    B, T, C, G = 2, 19, 24, 4
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(B, T, C).astype(np.float32))

    dense_cell = SearchCell(filters=C, arch_desc=arch_desc, dropout_rate=0.0,
                            groups=G, grouped_impl='masked_dense')
    split_cell = SearchCell(filters=C, arch_desc=arch_desc, dropout_rate=0.0,
                            groups=G, grouped_impl='pallas_split')
    variables = dense_cell.init(jax.random.PRNGKey(0), x)

    ref = dense_cell.apply(variables, x)
    ours = from_split(split_cell.apply(variables, to_split(x, G)))
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_full_model_matches_masked_dense():
    """Small ASRModel: forward and loss gradients agree across impls."""
    arch = [[1, 0], [3, 0, 1], [0, 1, 0, 0]]
    kw = dict(num_classes=8, use_rnn=False, dropout_rate=0.0,
              cell_dropout=0.0,
              block_kernels=(4, 4), block_strides=(1, 2),
              block_filters=(16, 24), cells_per_block=(1, 2), cell_groups=4)
    dense = ASRModel.from_arch_vec(arch, grouped_impl='masked_dense', **kw)
    split = ASRModel.from_arch_vec(arch, grouped_impl='pallas_split', **kw)

    B, T = 2, 23
    rng = np.random.RandomState(3)
    feats = jnp.asarray(rng.randn(B, T, 80).astype(np.float32))
    sizes = jnp.asarray([T, T - 5], jnp.int32)
    variables = dense.init(jax.random.PRNGKey(1), feats, sizes)

    ref = dense.apply(variables, feats, sizes)
    ours = split.apply(variables, feats, sizes)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)

    cot = jnp.asarray(rng.randn(*ref.shape).astype(np.float32))

    # Gradient check on full-length inputs: masked-out (all-zero) frames
    # make LayerNorm variance exactly 0 there, and the rsqrt(eps)-amplified
    # bias gradients through those degenerate positions are ill-conditioned
    # in ANY implementation (f32 differences of ~20% between two correct
    # VJPs; the reference TF stack shares the same degeneracy).  Kernel
    # gradients contract against real data and match to ~1e-6 regardless.
    sizes_full = jnp.asarray([T, T], jnp.int32)

    def loss(model):
        def f(params):
            out = model.apply({'params': params}, feats, sizes_full)
            return (out * cot).sum()
        return f

    g_ref = jax.grad(loss(dense))(variables['params'])
    g_ours = jax.grad(loss(split))(variables['params'])
    flat_r = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_o = dict(jax.tree_util.tree_leaves_with_path(g_ours))
    for path, leaf in flat_r:
        np.testing.assert_allclose(
            np.asarray(flat_o[path]), np.asarray(leaf), rtol=2e-4, atol=2e-4,
            err_msg=jax.tree_util.keystr(path))

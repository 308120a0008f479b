"""Model tests: shapes, parameter counts, padding math, op semantics,
and numerical parity of a cell against the reference torch implementation."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from nbasr_tpu.models import (
    ASRModel, get_model, count_params, logits_length, conv_padding, relu20,
)

GOLDEN_ARCH = [[1, 0], [1, 0, 0], [1, 0, 0, 0]]  # conv5 everywhere, no skips


def _init(model, T=64, B=2, train=False):
    x = jnp.zeros((B, T, 80), jnp.float32)
    sizes = jnp.full((B,), T, jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), x, sizes, train=train)
    return variables, x, sizes


def test_param_count_golden_arch():
    """26,339,349 with LSTM head / 22,971,649 without — matches the reference
    torch model modulo its double LSTM bias (+2000); the README's published
    26,338,848 is the reference static-info generator's 48-unit-head
    off-by-one (see models/asr.py docstring)."""
    m = get_model(GOLDEN_ARCH, use_rnn=True, dropout_rate=0.2)
    variables, *_ = _init(m, T=16)
    assert count_params(variables['params']) == 26339349

    m2 = get_model(GOLDEN_ARCH, use_rnn=False)
    v2, *_ = _init(m2, T=16)
    assert count_params(v2['params']) == 22971649


def test_output_shape_and_time_reduction():
    m = get_model(GOLDEN_ARCH, use_rnn=False)
    variables, x, sizes = _init(m, T=64)
    y = m.apply(variables, x, sizes)
    assert y.shape == (2, 16, 49)  # T/4, num_classes+1
    # odd length: ceil semantics through the two stride-2 convs
    x2 = jnp.zeros((2, 61, 80))
    y2 = m.apply(m.init(jax.random.PRNGKey(0), x2), x2)
    assert y2.shape == (2, 16, 49)  # ceil(ceil(61/2)/2) = 16


def test_logits_length_matches_tf_rule():
    sizes = jnp.array([64, 61, 31, 1])
    out = logits_length(sizes, t_in=64, t_out=16)
    np.testing.assert_array_equal(np.asarray(out), [16, 15, 7, 0])


def test_conv_padding_reference_values():
    # block conv stride 1: (3, 4); stride 2: (5, 2)  [torch ops.py:12-17]
    assert conv_padding(8, 1, 1) == (3, 4)
    assert conv_padding(8, 1, 2) == (5, 2)
    # cell convs (stride 1): conv5 (0,4), conv5d2 (4,4), conv7 (2,4), conv7d2 (8,4)
    assert conv_padding(5, 1, 1) == (0, 4)
    assert conv_padding(5, 2, 1) == (4, 4)
    assert conv_padding(7, 1, 1) == (2, 4)
    assert conv_padding(7, 2, 1) == (8, 4)


def test_relu20_clips():
    x = jnp.array([-1.0, 5.0, 25.0])
    np.testing.assert_array_equal(np.asarray(relu20(x)), [0.0, 5.0, 20.0])


def test_zero_op_and_skip_semantics():
    """arch with all zero ops and no skips -> cell output is LN(0) = 0."""
    arch = [[5, 0], [5, 0, 0], [5, 0, 0, 0]]
    m = get_model(arch, use_rnn=False, use_norm=False)
    variables, x, sizes = _init(m, T=16)
    # with use_norm False the cells pass through exact zeros; the model's
    # block convs still add bias, so check a single cell directly instead
    from nbasr_tpu.models.cell import SearchCell
    cell = SearchCell(filters=8, arch_desc=(('zero', 0), ('zero', 0, 0), ('zero', 0, 0, 0)),
                      use_norm=False)
    cx = jnp.ones((1, 4, 8))
    cv = cell.init(jax.random.PRNGKey(0), cx)
    out = cell.apply(cv, cx)
    np.testing.assert_allclose(np.asarray(out), 0.0)


def test_skip_branch_identity():
    """zero op + skip bit 1 on every input: node output = sum of skips."""
    from nbasr_tpu.models.cell import SearchCell
    cell = SearchCell(filters=8, arch_desc=(('zero', 1),), use_norm=False)
    cx = jnp.ones((1, 4, 8)) * 3.0
    cv = cell.init(jax.random.PRNGKey(0), cx)
    out = cell.apply(cv, cx)
    np.testing.assert_allclose(np.asarray(out), 3.0)  # identity skip of input


def test_masking_zeroes_padded_frames():
    mean = tuple([0.0] * 80)
    var = tuple([1.0] * 80)
    m = get_model(GOLDEN_ARCH, use_rnn=False, data_norm=(mean, var))
    x = jnp.ones((1, 32, 80))
    sizes = jnp.array([16], jnp.int32)
    variables = m.init(jax.random.PRNGKey(0), x, sizes)
    y_masked = m.apply(variables, x, sizes)
    x_zeroed = x.at[:, 16:].set(0.0)
    y_manual = m.apply(variables, x_zeroed, jnp.array([32], jnp.int32))
    # valid-region outputs agree: masking == zeroing the padded tail
    np.testing.assert_allclose(np.asarray(y_masked)[:, :2], np.asarray(y_manual)[:, :2],
                               rtol=1e-5, atol=1e-5)


def test_dropout_active_only_in_train():
    # 'scaled' init keeps activations alive; the faithful 'reference' init
    # collapses them below dropout visibility (see test_reference_init_collapse)
    m = get_model(GOLDEN_ARCH, use_rnn=False, init_scheme='scaled')
    variables, x, sizes = _init(m, T=16)
    x = jax.random.normal(jax.random.PRNGKey(1), x.shape)
    y1 = m.apply(variables, x, sizes, train=False)
    y2 = m.apply(variables, x, sizes, train=False)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
    yt1 = m.apply(variables, x, sizes, train=True,
                  rngs={'dropout': jax.random.PRNGKey(2)})
    yt2 = m.apply(variables, x, sizes, train=True,
                  rngs={'dropout': jax.random.PRNGKey(3)})
    assert not np.allclose(np.asarray(yt1), np.asarray(yt2))


def _load_ref_torch_cell():
    """Load the reference torch ops module standalone (dev-time oracle)."""
    import importlib.util, sys, types, pathlib
    ref = pathlib.Path('/root/reference/nasbench_asr/model/torch')
    if not ref.exists():
        pytest.skip('reference repo not available')
    pkg = types.ModuleType('_ref_torch_model')
    pkg.__path__ = [str(ref)]
    sys.modules['_ref_torch_model'] = pkg
    for name in ['ops', 'model']:
        spec = importlib.util.spec_from_file_location(f'_ref_torch_model.{name}', ref / f'{name}.py')
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f'_ref_torch_model.{name}'] = mod
        spec.loader.exec_module(mod)
    return sys.modules['_ref_torch_model.ops'], sys.modules['_ref_torch_model.model']


@pytest.mark.parametrize('impl', ['native', 'masked_dense'])
@pytest.mark.parametrize('op_name,kernel,dilation', [
    ('conv5', 5, 1), ('conv5d2', 5, 2), ('conv7', 7, 1), ('conv7d2', 7, 2),
])
def test_conv_op_parity_with_torch_reference(op_name, kernel, dilation, impl):
    """Bit-for-bit (fp32 tolerance) parity of a grouped conv op against the
    reference torch implementation with transplanted weights, for every
    grouped-conv implementation."""
    import torch
    ref_ops, _ = _load_ref_torch_cell()
    C, T, B = 100, 24, 2
    tmodel = ref_ops.PadConvRelu(C, C, kernel_size=kernel, dilation=dilation,
                                 strides=1, groups=100, dropout_rate=0)
    tmodel.eval()

    from nbasr_tpu.models.layers import PadConvRelu
    jmodel = PadConvRelu(C, kernel_size=kernel, dilation=dilation, strides=1,
                         groups=100, dropout_rate=0, grouped_impl=impl)
    x = np.random.RandomState(0).randn(B, T, C).astype(np.float32)
    # transplant torch weights: torch conv weight [out, in/groups, k] ->
    # compact grouped layout [k, in/groups, out] (shared by all impls)
    w = jnp.asarray(tmodel.conv.weight.detach().numpy().transpose(2, 1, 0))
    b = jnp.asarray(tmodel.conv.bias.detach().numpy())
    if impl == 'masked_dense':
        variables = {'params': {'conv_kernel_grouped': w, 'conv_bias': b}}
    else:
        variables = {'params': {'conv': {'kernel': w, 'bias': b}}}
    ours = np.asarray(jmodel.apply(variables, jnp.asarray(x)))
    with torch.no_grad():
        theirs = tmodel(torch.from_numpy(x.transpose(0, 2, 1))).numpy().transpose(0, 2, 1)
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_reference_init_collapse_documented():
    """The reference's glorot init on 100-group convs shrinks activations
    ~10x per conv (Keras/torch compute fan_out over ALL groups); with the
    'reference' scheme the untrained full model outputs collapse toward
    zero, exactly as the reference backends do at init — which is why the
    SHIPPED default is now 'scaled' (r5; see models/asr.py)."""
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 80))
    m_ref = get_model(GOLDEN_ARCH, use_rnn=False, init_scheme='reference')
    v = m_ref.init(jax.random.PRNGKey(0), x)
    y_ref = m_ref.apply(v, x)
    assert float(jnp.abs(y_ref).max()) < 1e-20  # collapsed (reference-faithful)

    m_sc = get_model(GOLDEN_ARCH, use_rnn=False, init_scheme='scaled')
    v = m_sc.init(jax.random.PRNGKey(0), x)
    y_sc = m_sc.apply(v, x)
    assert float(jnp.abs(y_sc).max()) > 1e-3  # alive


def test_remat_cells_equivalent():
    """remat_cells changes memory behavior, not numerics."""
    kw = dict(use_rnn=False, block_filters=(8, 8, 8, 8),
              cells_per_block=(1, 1, 1, 1), cell_groups=2,
              init_scheme='scaled', cell_dropout=0.0)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 24, 80))
    m1 = get_model(GOLDEN_ARCH, **kw)
    m2 = get_model(GOLDEN_ARCH, remat_cells=True, **kw)
    v = m1.init(jax.random.PRNGKey(1), x)
    y1 = m1.apply(v, x)
    y2 = m2.apply(v, x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=1e-6)
    g1 = jax.grad(lambda p: (m1.apply({'params': p}, x) ** 2).sum())(v['params'])
    g2 = jax.grad(lambda p: (m2.apply({'params': p}, x) ** 2).sum())(v['params'])
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_tap_matmul_block_conv_parity():
    """block_conv_impl='tap_matmul' shares the nn.Conv param tree and
    reproduces logits and gradients in f32 (layers.PadConvRelu dense_impl)."""
    small = dict(block_filters=(24, 32, 40, 48), cells_per_block=(1, 1, 1, 1),
                 cell_groups=4)
    m_conv = get_model(GOLDEN_ARCH, use_rnn=False, **small)
    m_tap = get_model(GOLDEN_ARCH, use_rnn=False,
                      block_conv_impl='tap_matmul', **small)
    variables, x, sizes = _init(m_conv, T=37)
    x = jnp.asarray(np.random.RandomState(0).randn(*x.shape), jnp.float32)

    y_conv = m_conv.apply(variables, x, sizes)
    y_tap = m_tap.apply(variables, x, sizes)  # same param tree by design
    np.testing.assert_allclose(np.asarray(y_tap), np.asarray(y_conv),
                               rtol=2e-5, atol=2e-5)

    def loss(fn_model, params):
        return (fn_model.apply({'params': params}, x, sizes) ** 2).sum()

    from jax.flatten_util import ravel_pytree
    g_conv = jax.grad(lambda p: loss(m_conv, p))(variables['params'])
    g_tap = jax.grad(lambda p: loss(m_tap, p))(variables['params'])
    flat_c, _ = ravel_pytree(g_conv)
    flat_t, _ = ravel_pytree(g_tap)
    # tap accumulation reassociates the K-sum: tiny f32 ordering noise
    np.testing.assert_allclose(np.asarray(flat_t), np.asarray(flat_c),
                               rtol=5e-3, atol=2e-3)

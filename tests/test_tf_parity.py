"""Logits parity against the *shipped TF backend* — the code that produced
the published dataset numbers (reference README.md:155-156).

The TF backend differs from the canonical graph semantics in three shipped
quirks (SURVEY.md §2.2): inverted branch wiring (model/tf/ops.py:87),
dropped dilation (model/tf/ops.py:24), and dilation-blind pad math
(model/tf/ops.py:16-21).  This test transplants weights from our model
(built with branch_semantics='tf_inverted', apply_dilation=False,
pad_math='tf') into the reference TF ASRModel and requires matching
logits — the prerequisite staging for regenerating the published PER
curves."""

import importlib.util
import pathlib
import sys
import types

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from nbasr_tpu.models import get_model

tf = pytest.importorskip('tensorflow')

REF = pathlib.Path('/root/reference/nasbench_asr')


@pytest.fixture(autouse=True)
def _highest_precision():
    with jax.default_matmul_precision('highest'):
        yield


def _load_ref_tf():
    """Import the reference TF model modules from file paths, with a stub
    quiet_tensorflow so no reference package machinery runs."""
    if not REF.exists():
        pytest.skip('reference repo not available')
    tf.config.set_visible_devices([], 'GPU')
    if '_ref_tf.model' in sys.modules:
        return sys.modules['_ref_tf.model']
    quiet = types.ModuleType('nasbench_asr.quiet_tensorflow')
    quiet.tensorflow = tf
    pkg = types.ModuleType('nasbench_asr')
    pkg.__path__ = [str(REF)]
    sys.modules.setdefault('nasbench_asr', pkg)
    sys.modules['nasbench_asr.quiet_tensorflow'] = quiet
    ref_pkg = types.ModuleType('_ref_tf')
    ref_pkg.__path__ = [str(REF / 'model' / 'tf')]
    sys.modules['_ref_tf'] = ref_pkg
    for name in ['mean_variance_normalization', 'ops', 'model']:
        spec = importlib.util.spec_from_file_location(
            f'_ref_tf.{name}', REF / 'model' / 'tf' / f'{name}.py')
        mod = importlib.util.module_from_spec(spec)
        # the reference modules import siblings via relative names
        sys.modules[f'_ref_tf.{name}'] = mod
        spec.loader.exec_module(mod)
    return sys.modules['_ref_tf.model']


def _assign(var, value):
    value = np.asarray(value, np.float32)
    assert tuple(var.shape) == value.shape, (var.name, var.shape, value.shape)
    var.assign(value)


def _transplant(params, tf_model, arch_vec, cells_per_block=(3, 4, 5, 6)):
    """Copy our param tree into the reference TF ASRModel's variables."""
    layers = tf_model._model.layers
    li = 0
    assert 'masking' in layers[li].name
    li += 1
    op_names = ['linear', 'conv5', 'conv5d2', 'conv7', 'conv7d2', 'zero']
    for b in range(4):
        pc = layers[li]; li += 1           # PadConvRelu
        conv = pc.layer.layers[1]
        p = params[f'block{b}_conv']['conv']
        _assign(conv.kernel, p['kernel'])
        _assign(conv.bias, p['bias'])
        ln = layers[li]; li += 1           # LayerNormalization
        p = params[f'block{b}_norm']
        _assign(ln.gamma, p['scale'])
        _assign(ln.beta, p['bias'])
        for c in range(cells_per_block[b]):
            cell = layers[li]; li += 1     # SearchCell
            cp = params[f'block{b}_cell{c}']
            for n, node_cfg in enumerate(arch_vec):
                name = op_names[node_cfg[0]]
                op = cell._nodes[n]._op
                if name == 'zero':
                    continue
                np_ = cp[f'node{n}_{name}']
                if name == 'linear':
                    dense = op.layer.layers[0]
                    _assign(dense.kernel, np_['dense']['kernel'])
                    _assign(dense.bias, np_['dense']['bias'])
                else:
                    conv = op.layer.layers[1]
                    if 'conv_kernel_grouped' in np_:
                        _assign(conv.kernel, np_['conv_kernel_grouped'])
                        _assign(conv.bias, np_['conv_bias'])
                    else:
                        _assign(conv.kernel, np_['conv']['kernel'])
                        _assign(conv.bias, np_['conv']['bias'])
            _assign(cell.norm_layer.gamma, cp['norm']['scale'])
            _assign(cell.norm_layer.beta, cp['norm']['bias'])
    dense = layers[li]                     # head
    _assign(dense.kernel, params['head']['kernel'])
    _assign(dense.bias, params['head']['bias'])


# conv5 chain; dilated + branch-heavy; zero op + linear
ARCHS = [
    [[1, 0], [1, 0, 0], [1, 0, 0, 0]],
    [[2, 0], [4, 1, 0], [2, 0, 1, 1]],
    [[0, 1], [5, 0, 1], [3, 1, 1, 0]],
]


@pytest.mark.parametrize('arch', ARCHS, ids=['flagship', 'dilated', 'zero+lin'])
def test_tf_backend_logits_parity(arch):
    ref_model_mod = _load_ref_tf()
    B, T = 2, 50
    x = np.random.RandomState(0).randn(B, T, 80).astype(np.float32) * 0.5

    model = get_model(arch, use_rnn=False, dropout_rate=0.0, use_norm=True,
                      data_norm=None, cell_dropout=0.0,
                      branch_semantics='tf_inverted', apply_dilation=False,
                      pad_math='tf', grouped_impl='masked_dense',
                      init_scheme='scaled')
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x),
                           jnp.asarray([T, T]))
    ours = np.asarray(model.apply(variables, jnp.asarray(x),
                                  jnp.asarray([T, T])))

    tf_model = ref_model_mod.ASRModel(arch, num_classes=48, use_rnn=False,
                                      dropout_rate=0.0)
    theirs0 = tf_model(tf.constant(x), training=False)  # build weights
    _transplant(variables['params'], tf_model, arch)
    theirs = np.asarray(tf_model(tf.constant(x), training=False))

    assert theirs.shape == ours.shape
    scale = np.abs(theirs).max() + 1e-6
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-4 * scale)

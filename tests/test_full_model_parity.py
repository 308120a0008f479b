"""End-to-end model parity: transplant every weight from the reference torch
ASRModel into the JAX model and compare logits.

This validates the complete forward graph — padding asymmetry, dilation,
grouped-conv semantics, LayerNorm placement/eps, branch wiring, LSTM gate
order, head — against the reference implementation (torch backend, whose
branch semantics match the canonical hash graph)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from nbasr_tpu.models import get_model

torch = pytest.importorskip('torch')


@pytest.fixture(autouse=True)
def _highest_precision():
    # Pin full-precision convs: XLA's default CPU conv path carries ~3e-3
    # relative error that varies with compilation context (order-flaky).
    with jax.default_matmul_precision('highest'):
        yield


def _load_ref_torch():
    import importlib.util, sys, types, pathlib
    ref = pathlib.Path('/root/reference/nasbench_asr/model/torch')
    if not ref.exists():
        pytest.skip('reference repo not available')
    if '_ref_torch_model.model' in sys.modules:
        return sys.modules['_ref_torch_model.model']
    pkg = types.ModuleType('_ref_torch_model')
    pkg.__path__ = [str(ref)]
    sys.modules['_ref_torch_model'] = pkg
    for name in ['ops', 'model']:
        spec = importlib.util.spec_from_file_location(
            f'_ref_torch_model.{name}', ref / f'{name}.py')
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f'_ref_torch_model.{name}'] = mod
        spec.loader.exec_module(mod)
    return sys.modules['_ref_torch_model.model']


def _t(x):
    return jnp.asarray(x.detach().numpy())


def _transplant(tmodel, params, use_rnn):
    """Copy reference torch weights into the JAX param tree (in place copy)."""
    import torch.nn as nn
    ref_ops = __import__('sys').modules['_ref_torch_model.ops']
    params = jax.tree_util.tree_map(lambda x: x, params)  # shallow copy

    modules = list(tmodel.model)
    idx = 0
    block = 0
    while idx < len(modules):
        m = modules[idx]
        if isinstance(m, ref_ops.PadConvRelu):  # block conv
            conv = params[f'block{block}_conv']['conv']
            conv['kernel'] = _t(m.conv.weight).transpose(2, 1, 0)
            conv['bias'] = _t(m.conv.bias)
            idx += 1
            ln = modules[idx]
            assert isinstance(ln, nn.LayerNorm)
            params[f'block{block}_norm']['scale'] = _t(ln.weight)
            params[f'block{block}_norm']['bias'] = _t(ln.bias)
            idx += 1
            cell_idx = 0
            while idx < len(modules) and type(modules[idx]).__name__ == 'SearchCell':
                cell = modules[idx]
                jcell = params[f'block{block}_cell{cell_idx}']
                for nidx, node in enumerate(cell.nodes):
                    op = node.op
                    jname = [k for k in jcell if k.startswith(f'node{nidx}_')]
                    if not jname:
                        continue  # zero op has no params
                    jop = jcell[jname[0]]
                    if isinstance(op, ref_ops.PadConvRelu):
                        if 'conv' in jop:
                            jop['conv']['kernel'] = _t(op.conv.weight).transpose(2, 1, 0)
                            jop['conv']['bias'] = _t(op.conv.bias)
                        else:
                            jop['conv_kernel_grouped'] = _t(op.conv.weight).transpose(2, 1, 0)
                            jop['conv_bias'] = _t(op.conv.bias)
                    elif isinstance(op, ref_ops.Linear):
                        jop['dense']['kernel'] = _t(op.linear.weight).T
                        jop['dense']['bias'] = _t(op.linear.bias)
                if cell.use_norm:
                    jcell['norm']['scale'] = _t(cell.norm_layer.weight)
                    jcell['norm']['bias'] = _t(cell.norm_layer.bias)
                idx += 1
                cell_idx += 1
            block += 1
        elif isinstance(m, nn.LSTM):
            lstm = params['lstm']
            lstm['kernel'] = _t(m.weight_ih_l0).T          # [F, 4H], i,f,g,o
            lstm['recurrent'] = _t(m.weight_hh_l0).T       # [H, 4H]
            lstm['bias'] = _t(m.bias_ih_l0) + _t(m.bias_hh_l0)
            idx += 1
        elif isinstance(m, nn.Linear):
            params['head']['kernel'] = _t(m.weight).T
            params['head']['bias'] = _t(m.bias)
            idx += 1
        else:  # dropout etc.
            idx += 1
    return params


@pytest.mark.parametrize('arch,use_rnn', [
    ([[1, 0], [1, 0, 0], [1, 0, 0, 0]], False),       # flagship, conv5
    ([[0, 1], [2, 1, 0], [4, 0, 1, 1]], False),       # linear + dilated + skips
    ([[3, 0], [5, 1, 1], [0, 1, 0, 1]], False),       # zero node + skips
    ([[1, 0], [1, 0, 0], [1, 0, 0, 0]], True),        # with LSTM head
])
def test_full_model_logits_match_reference_torch(arch, use_rnn):
    mod = _load_ref_torch()
    from nbasr_tpu.search_space import arch_vec_to_names
    tmodel = mod.ASRModel(arch_vec_to_names(arch), num_classes=48,
                          use_rnn=use_rnn, dropout_rate=0.0)
    tmodel.eval()

    jmodel = get_model(arch, use_rnn=use_rnn, dropout_rate=0.0,
                       cell_dropout=0.0, data_norm=None)
    B, T = 2, 32
    x = np.random.RandomState(0).randn(B, T, 80).astype(np.float32) * 0.5
    variables = jmodel.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = _transplant(tmodel, variables['params'], use_rnn)

    ours = np.asarray(jmodel.apply({'params': params}, jnp.asarray(x)))
    with torch.no_grad():
        theirs = tmodel(torch.from_numpy(x.transpose(0, 2, 1))).numpy()
        if theirs.shape[1] != ours.shape[2]:  # torch returns [B, T', C]
            pass
    np.testing.assert_allclose(ours, theirs, rtol=2e-3, atol=2e-4)

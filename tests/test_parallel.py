"""Mesh-parallel tests on the virtual 8-device CPU mesh: sharding placement,
DP/TP numerical consistency with the single-device trainer, and the
multi-chip dry run."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from nbasr_tpu.data import get_dataloaders
from nbasr_tpu.models import get_model
from nbasr_tpu.parallel import (
    make_mesh, param_shardings, ParallelTrainer,
)
from nbasr_tpu.training import get_loss, get_trainer

TINY_ARCH = [[0, 1], [1, 0, 0], [5, 0, 1, 0]]
TINY_KW = dict(block_filters=(16, 16, 32, 32), cells_per_block=(1, 1, 1, 1),
               cell_groups=4, rnn_units=16, init_scheme='scaled')


def tiny_model():
    return get_model(TINY_ARCH, use_rnn=False, **TINY_KW)


def test_make_mesh_shapes():
    mesh = make_mesh(dp=4, tp=2)
    assert dict(mesh.shape) == {'data': 4, 'model': 2}
    mesh = make_mesh()  # defaults: all devices, tp=1
    assert dict(mesh.shape) == {'data': 8, 'model': 1}
    with pytest.raises(ValueError):
        make_mesh(dp=3, tp=2)


def test_param_shardings_split_wide_kernels():
    mesh = make_mesh(dp=4, tp=2)
    model = tiny_model()
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 80)))['params']
    shardings = param_shardings(params, mesh)
    conv_sh = shardings['block0_conv']['conv']['kernel']
    assert conv_sh.spec[-1] == 'model'  # wide conv output channels sharded
    bias_sh = shardings['block0_conv']['conv']['bias']
    assert all(a is None for a in bias_sh.spec)
    head_sh = shardings['head']['kernel']
    assert all(a is None for a in head_sh.spec)  # 49 not divisible by tp


@pytest.fixture(scope='module')
def loaders():
    return get_dataloaders('synthetic:16', batch_size=8, curriculum=())


def _batch_padded_to(loaders, rows):
    batch = next(iter(loaders[1]))
    pad = rows - batch['audio'].shape[0]
    if pad > 0:
        batch = {k: np.concatenate([v, np.zeros((pad,) + v.shape[1:], v.dtype)])
                 for k, v in batch.items()}
    return batch


@pytest.mark.parametrize('dp,tp', [(8, 1), (4, 2), (2, 4)])
def test_parallel_matches_single_device(loaders, dp, tp):
    """One train step on a (dp, tp) mesh must match the single-device step."""
    model = tiny_model()
    batch = _batch_padded_to(loaders, 8)

    single = get_trainer(loaders, get_loss(), verbose=False, eval_decoder='greedy')
    single.init_state(model, seed=0)
    m_single = single.step(batch, training=True, lr=1e-3)

    par = ParallelTrainer(loaders, get_loss(), mesh=make_mesh(dp=dp, tp=tp),
                          verbose=False, eval_decoder='greedy')
    par.init_state(model, seed=0)
    m_par = par.step(batch, training=True, lr=1e-3)
    assert m_par['ctc_loss'] == pytest.approx(m_single['ctc_loss'], rel=1e-3)

    # params after the update agree too (tolerances allow for float
    # reassociation across GSPMD partitionings)
    p_s = jax.tree_util.tree_leaves(single.state.params)
    p_p = jax.tree_util.tree_leaves(par.state.params)
    for a, b in zip(p_s, p_p):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=1e-4)


def test_parallel_eval_matches_single(loaders):
    model = tiny_model()
    single = get_trainer(loaders, get_loss(), verbose=False, eval_decoder='greedy')
    single.init_state(model, seed=1)
    m_s = single.evaluate(loaders[2])

    par = ParallelTrainer(loaders, get_loss(), mesh=make_mesh(dp=4, tp=2),
                          verbose=False, eval_decoder='greedy')
    par.init_state(model, seed=1)
    m_p = par.evaluate(loaders[2])
    assert m_p['ler'] == pytest.approx(m_s['ler'], rel=1e-4)
    assert m_p['ctc_loss'] == pytest.approx(m_s['ctc_loss'], rel=1e-4)


def test_state_is_actually_sharded(loaders):
    model = tiny_model()
    par = ParallelTrainer(loaders, get_loss(), mesh=make_mesh(dp=4, tp=2),
                          verbose=False, eval_decoder='greedy')
    par.init_state(model, seed=0)
    kernel = par.state.params['block3_conv']['conv']['kernel']
    assert len(kernel.sharding.device_set) == 8
    # the model axis actually partitions the value (shard smaller than whole)
    shard_shape = kernel.sharding.shard_shape(kernel.shape)
    assert shard_shape[-1] == kernel.shape[-1] // 2


@pytest.mark.slow
def test_mesh_forces_chunked_for_fused_impls(loaders, monkeypatch):
    """Under a multi-device mesh the fused Pallas impls fall back to the
    pure-XLA 'chunked' path (GSPMD has no partitioning rule for the Mosaic
    custom-call); the parameter tree is unchanged so single-chip fused
    checkpoints load as-is (VERDICT r2 next #6)."""
    import nbasr_tpu.models.cell as cell_mod
    from nbasr_tpu.training.metrics import ratios
    # simulate the TPU auto-resolution: 'auto' would pick the fused kernel
    monkeypatch.setattr(cell_mod, 'AUTO_CELL_IMPL', 'fused_aligned')
    for impl in ('auto', 'fused_aligned'):
        model = get_model(TINY_ARCH, use_rnn=False, grouped_impl=impl,
                          **TINY_KW)
        par = ParallelTrainer(loaders, get_loss(), mesh=make_mesh(dp=4, tp=2),
                              verbose=False)
        par.init_state(model, seed=0)
        assert par.model.grouped_impl == 'chunked'
        batch = par._put_batch(_batch_padded_to(loaders, 8))
        state = par._train_step(par.state, batch, jnp.float32(1e-3))
        assert np.isfinite(float(ratios(state.metrics)['ctc_loss']))


@pytest.mark.slow
def test_shard_map_runs_fused_under_dp_mesh(loaders, monkeypatch):
    """On a tp==1 mesh the fused Pallas cell is KEPT and the whole step
    runs per-device via shard_map with explicit psums (VERDICT r4 next #6)
    — train and eval match the single-device fused trainer."""
    import nbasr_tpu.ops.fused_cell as fused_cell
    monkeypatch.setattr(fused_cell, 'INTERPRET', True)
    # cell_dropout=0: the shard_map path folds the data-axis index into the
    # dropout stream (different masks per shard, by design), so train-step
    # comparisons must be dropout-free to be deterministic
    model = get_model(TINY_ARCH, use_rnn=False, grouped_impl='fused_aligned',
                      cell_dropout=0.0, **TINY_KW)
    batch = _batch_padded_to(loaders, 8)

    single = get_trainer(loaders, get_loss(), verbose=False,
                         eval_decoder='greedy')
    single.init_state(model, seed=0)
    m_single = single.step(batch, training=True, lr=1e-3)

    par = ParallelTrainer(loaders, get_loss(), mesh=make_mesh(dp=8, tp=1),
                          verbose=False, eval_decoder='greedy')
    par.init_state(model, seed=0)
    assert par._shard_axis == 'data'
    assert par.model.grouped_impl == 'fused_aligned'  # NOT forced to chunked
    m_par = par.step(batch, training=True, lr=1e-3)
    assert m_par['ctc_loss'] == pytest.approx(m_single['ctc_loss'], rel=1e-3)
    for a, b in zip(jax.tree_util.tree_leaves(single.state.params),
                    jax.tree_util.tree_leaves(par.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=1e-4)

    m_se = single.evaluate(loaders[2])
    m_pe = par.evaluate(loaders[2])
    assert m_pe['ler'] == pytest.approx(m_se['ler'], rel=1e-4)
    assert m_pe['ctc_loss'] == pytest.approx(m_se['ctc_loss'], rel=1e-3)


def test_dryrun_multichip_entrypoint():
    import sys
    sys.path.insert(0, '/root/repo')
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)

"""Sequence parallelism (parallel/seqparallel.py): time-sharded execution
must reproduce the unsharded model exactly, on a 4-way 'seq' CPU mesh."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from nbasr_tpu.models.asr import ASRModel
from nbasr_tpu.parallel.seqparallel import encoder_halo, seq_parallel_apply

ARCH = [[1, 0], [3, 0, 1], [2, 1, 0, 0]]  # conv5 / conv7 / conv5d2 mix

KW = dict(num_classes=8, dropout_rate=0.0, cell_dropout=0.0,
          block_kernels=(4, 4), block_strides=(1, 2),
          block_filters=(16, 24), cells_per_block=(1, 2), cell_groups=4)


def _mesh(n=4):
    return Mesh(np.asarray(jax.devices()[:n]), ('seq',))


def _data(T, B=2, seed=0):
    rng = np.random.RandomState(seed)
    feats = jnp.asarray(rng.randn(B, T, 80).astype(np.float32))
    sizes = jnp.asarray([T, T - 13], jnp.int32)
    return feats, sizes


def test_encoder_halo_flagship():
    model = ASRModel.from_arch_vec([[1, 0], [1, 0, 0], [1, 0, 0, 0]])
    hl, hr = encoder_halo(model)
    assert hl % 4 == 0 and hr % 4 == 0
    # conv5 cells are (lpad 0, rpad 4) per node; block convs k=8 are
    # (3, 4) at stride 1 and (5, 2) at stride 2.  Backward accumulation:
    #   block3: l 0*2+5=5,  r 72*2+2=146
    #   block2: l 5*2+5=15, r (146+60)*2+2=414
    #   block1: l 15+3=18,  r 414+48+4=466
    #   block0: l 18+3=21,  r 466+36+4=506  -> rounded to (24, 508)
    assert (hl, hr) == (24, 508)


@pytest.mark.parametrize('use_rnn,lstm_mode', [
    (False, 'chain'), (True, 'chain'), (True, 'gather')])
def test_matches_unsharded(use_rnn, lstm_mode):
    model = ASRModel.from_arch_vec(ARCH, use_rnn=use_rnn, rnn_units=12,
                                   init_scheme='scaled', **KW)
    # halo for this config is (30, 66): shard length must exceed their sum
    T = 4 * 2 * 48
    feats, sizes = _data(T)
    variables = model.init(jax.random.PRNGKey(0), feats, sizes)
    ref = model.apply(variables, feats, sizes)
    mesh = _mesh(4)
    ours = seq_parallel_apply(model, variables, feats, sizes, mesh,
                              lstm_mode=lstm_mode)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_matches_under_jit():
    model = ASRModel.from_arch_vec(ARCH, use_rnn=True, rnn_units=12,
                                   init_scheme='scaled', **KW)
    T = 4 * 2 * 48
    feats, sizes = _data(T, seed=1)
    variables = model.init(jax.random.PRNGKey(0), feats, sizes)
    ref = model.apply(variables, feats, sizes)
    mesh = _mesh(4)
    f = jax.jit(lambda v, x, s: seq_parallel_apply(model, v, x, s, mesh))
    ours = f(variables, feats, sizes)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_stage_split_consistency():
    """stage='encode' + stage='head' == stage='full' (unsharded)."""
    model = ASRModel.from_arch_vec(ARCH, use_rnn=True, rnn_units=12,
                                   init_scheme='scaled', **KW)
    feats, sizes = _data(32)
    variables = model.init(jax.random.PRNGKey(0), feats, sizes)
    full = model.apply(variables, feats, sizes)
    enc = model.apply(variables, feats, sizes, stage='encode')
    head = model.apply(variables, enc, stage='head')
    np.testing.assert_allclose(np.asarray(head), np.asarray(full),
                               rtol=1e-6, atol=1e-6)

"""Hardware check + train-step timing: pallas_split vs native grouped conv.

Usage: python scripts/bench_split_step.py [impl ...]   (default: both)
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir', '/tmp/nbasr_jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

sys.path.insert(0, '/root/repo')
from nbasr_tpu.models import get_model
from nbasr_tpu.data import get_dataloaders
from nbasr_tpu.training import get_loss, get_trainer

ARCH = [[1, 0], [1, 0, 0], [1, 0, 0, 0]]


def fwd_check():
    """Forward agreement native vs pallas_split on-device (same params)."""
    kw = dict(use_rnn=False, dropout_rate=0.0, cell_dropout=0.0,
              data_norm=True)
    native = get_model(ARCH, grouped_impl='masked_dense', **kw)
    split = get_model(ARCH, grouped_impl='pallas_split', **kw)
    B, T = 4, 470
    feats = jnp.asarray(np.random.RandomState(0).randn(B, T, 80), jnp.float32)
    sizes = jnp.asarray([T, T, T - 40, T - 111], jnp.int32)
    v = jax.jit(native.init)(jax.random.PRNGKey(0), feats, sizes)
    a = jax.jit(lambda v, f, s: native.apply(v, f, s))(v, feats, sizes)
    b = jax.jit(lambda v, f, s: split.apply(v, f, s))(v, feats, sizes)
    d = float(jnp.abs(a - b).max())
    m = float(jnp.abs(a).max())
    print(f'fwd agreement (masked_dense vs pallas_split): maxdiff {d:.3e} '
          f'(ref max {m:.3e})')


def step_time(impl, n_steps=30):
    model = get_model(ARCH, use_rnn=True, dropout_rate=0.2, data_norm=True,
                      compute_dtype=jnp.bfloat16, grouped_impl=impl)
    loaders = get_dataloaders('synthetic:64', batch_size=32, curriculum=())
    trainer = get_trainer(loaders, get_loss(), verbose=False,
                          eval_decoder='greedy')
    trainer.init_state(model, seed=0)
    batch = trainer._put_batch(next(iter(loaders[1])))
    state = trainer._train_step(trainer.state, batch, jnp.float32(1e-4))
    jax.block_until_ready(state.params)
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state = trainer._train_step(state, batch, jnp.float32(1e-4))
    jax.block_until_ready(state.params)
    dt = (time.perf_counter() - t0) / n_steps
    print(f'{impl}: {dt * 1e3:.2f} ms/step '
          f'(B=32, S={batch["audio"].shape[1]})')
    return dt


if __name__ == '__main__':
    impls = sys.argv[1:] or ['native', 'pallas_split']
    fwd_check()
    for impl in impls:
        step_time(impl)

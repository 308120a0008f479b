"""Where does the pallas_split train step spend its time?

Ablates the flagship train step on the real chip: encoder fwd / fwd+bwd,
block-convs alone, cells alone, dropout on/off, LSTM/CTC/Adam deltas.
"""

import sys
import functools

import numpy as np
import jax
import jax.numpy as jnp
import optax

jax.config.update('jax_compilation_cache_dir', '/tmp/nbasr_jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

sys.path.insert(0, '/root/repo')
from nbasr_tpu.models import get_model
from scripts._timing import timed

ARCH = [[1, 0], [1, 0, 0], [1, 0, 0, 0]]
B, T = 32, 470
IMPL = sys.argv[1] if len(sys.argv) > 1 else 'pallas_split'


def model_for(cells=True, dropout=True):
    kw = dict(use_rnn=False, data_norm=None, compute_dtype=jnp.bfloat16,
              grouped_impl=IMPL, init_scheme='scaled')
    if not dropout:
        kw.update(dropout_rate=0.0, cell_dropout=0.0)
    else:
        kw.update(dropout_rate=0.2)
    if not cells:
        kw['cells_per_block'] = (0, 0, 0, 0)
    return get_model(ARCH, **kw)


def bench_model(tag, model, train):
    feats = jnp.asarray(np.random.RandomState(0).randn(B, T, 80), jnp.bfloat16)
    sizes = jnp.full((B,), T, jnp.int32)
    v = jax.jit(model.init)(jax.random.PRNGKey(0), feats, sizes)
    params = v['params']
    rng = jax.random.PRNGKey(1)

    if not train:
        f = jax.jit(lambda p, x: model.apply({'params': p}, x, sizes,
                                             train=False))
        ms = timed(f, params, feats)
        print(f'{tag:44s} fwd       {ms:7.2f} ms')
        return

    def loss(p, x, r):
        y = model.apply({'params': p}, x, sizes, train=True,
                        rngs={'dropout': r})
        return jnp.sum(y.astype(jnp.float32) ** 2) * 1e-6

    g = jax.jit(lambda p, x, r: jax.grad(loss)(p, x, r))
    ms = timed(g, params, feats, rng)
    print(f'{tag:44s} fwd+bwd   {ms:7.2f} ms')


if __name__ == '__main__':
    print(f'impl = {IMPL}')
    bench_model('full encoder (no dropout)', model_for(dropout=False), False)
    bench_model('full encoder (no dropout)', model_for(dropout=False), True)
    bench_model('full encoder (dropout 0.2)', model_for(dropout=True), True)
    bench_model('block convs only (no cells, no dropout)',
                model_for(cells=False, dropout=False), True)

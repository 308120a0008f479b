"""Round-3 perf breakdown of the fused-cell train step (VERDICT r2 #2).

Times, on the real chip at flagship bucket-1 shapes (B=32, T=470, bf16,
dropout 0.2):

  - full model fwd+bwd (with/without LSTM)
  - encoder fwd+bwd, block convs+LNs alone (cells_per_block zeros)
  - cells of each block in isolation (delta vs the conv-only model)
  - one bare fused cell fwd / fwd+bwd at each block's (T, C)

Usage: python scripts/bench_fused_breakdown.py [impl]
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir', '/tmp/nbasr_jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

sys.path.insert(0, '/root/repo')
from nbasr_tpu.models import get_model
from nbasr_tpu.models.cell import SearchCell
from scripts._timing import timed

ARCH = [[1, 0], [1, 0, 0], [1, 0, 0, 0]]
B, T = 32, 470
IMPL = sys.argv[1] if len(sys.argv) > 1 else 'fused_aligned'


def model_for(cells=(3, 4, 5, 6), rnn=False):
    return get_model(ARCH, use_rnn=rnn, dropout_rate=0.2, data_norm=None,
                     compute_dtype=jnp.bfloat16, grouped_impl=IMPL,
                     init_scheme='scaled', cells_per_block=tuple(cells))


def bench_model(tag, model):
    feats = jnp.asarray(np.random.RandomState(0).randn(B, T, 80),
                        jnp.bfloat16)
    sizes = jnp.full((B,), T, jnp.int32)
    v = jax.jit(model.init)(jax.random.PRNGKey(0), feats, sizes)
    params = v['params']
    rng = jax.random.PRNGKey(1)

    def loss(p, x, r):
        y = model.apply({'params': p}, x, sizes, train=True,
                        rngs={'dropout': r})
        return jnp.sum(y.astype(jnp.float32) ** 2) * 1e-6

    g = jax.jit(lambda p, x, r: jax.grad(loss)(p, x, r))
    ms = timed(g, params, feats, rng)
    print(f'{tag:40s} fwd+bwd {ms:7.2f} ms', flush=True)
    return ms


def bench_cell(tag, C, t):
    cell = SearchCell(filters=C, arch_desc=(('conv5', 0), ('conv5', 0, 0),
                                            ('conv5', 0, 0, 0)),
                      dropout_rate=0.2, groups=100, init_scheme='scaled',
                      grouped_impl=IMPL)
    x = jnp.asarray(np.random.RandomState(0).randn(B, t, C) * 0.5,
                    jnp.bfloat16)
    v = cell.init(jax.random.PRNGKey(0), x)
    rng = jax.random.PRNGKey(1)
    f = jax.jit(lambda v, x, r: cell.apply(v, x, True, rngs={'dropout': r}))
    fms = timed(f, v, x, rng)

    def loss(v, x, r):
        return jnp.sum(cell.apply(v, x, True,
                                  rngs={'dropout': r}).astype(jnp.float32)
                       ** 2) * 1e-6

    g = jax.jit(lambda v, x, r: jax.grad(loss, argnums=(0, 1))(v, x, r))
    gms = timed(g, v, x, rng)
    print(f'{tag:40s} fwd {fms:6.2f} ms   fwd+bwd {gms:7.2f} ms', flush=True)


if __name__ == '__main__':
    print(f'impl = {IMPL}  B={B} T={T}')
    full = bench_model('full model + LSTM', model_for(rnn=True))
    enc = bench_model('encoder (no LSTM)', model_for())
    conv = bench_model('block convs + LNs only', model_for(cells=(0, 0, 0, 0)))
    shapes = [(600, T), (800, T), (1000, -(-T // 2)), (1200, -(-T // 4))]
    for i, (C, t) in enumerate(shapes):
        cells = [0, 0, 0, 0]
        cells[i] = (3, 4, 5, 6)[i]
        m = bench_model(f'convs + block{i} cells x{cells[i]}',
                        model_for(cells=cells))
        print(f'  -> block{i} cell stack delta: {m - conv:6.2f} ms '
              f'({(m - conv) / cells[i]:5.2f} ms/cell)', flush=True)
    for i, (C, t) in enumerate(shapes):
        bench_cell(f'bare cell block{i} (C={C}, T={t})', C, t)
    print(f'LSTM delta: {full - enc:6.2f} ms')

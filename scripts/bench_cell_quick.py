"""Quick bare-cell fwd/fwd+bwd microbench (blocks 0+1 only) for fused-
kernel iteration — 4 compiles instead of bench_fused_breakdown's ~24.

Usage: python scripts/bench_cell_quick.py [impl] [blocks]
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir', '/tmp/nbasr_jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

sys.path.insert(0, '/root/repo')
from nbasr_tpu.models.cell import SearchCell
from scripts._timing import timed

B, T = 32, 470
IMPL = sys.argv[1] if len(sys.argv) > 1 else 'fused_aligned'
BLOCKS = [int(b) for b in (sys.argv[2] if len(sys.argv) > 2 else '01')]
SHAPES = [(600, T), (800, T), (1000, -(-T // 2)), (1200, -(-T // 4))]

for i in BLOCKS:
    C, t = SHAPES[i]
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
    print(f'block{i} (C={C}, T={t}) {IMPL}: fwd {fms:6.2f} ms   '
          f'fwd+bwd {gms:7.2f} ms', flush=True)

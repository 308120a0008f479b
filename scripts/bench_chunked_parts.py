"""Isolate chunked-conv bwd, LayerNorm, and dropout RNG costs on-chip."""

import sys
import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

jax.config.update('jax_compilation_cache_dir', '/tmp/nbasr_jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

sys.path.insert(0, '/root/repo')
from nbasr_tpu.models.layers import PadConvRelu
from scripts._timing import timed

B = 32
N = 9


def conv_chain(ci_pg, C, T, K=5, d=1):
    m = PadConvRelu(C, kernel_size=K, dilation=d, groups=100,
                    grouped_impl='chunked', init_scheme='scaled')
    x = jnp.asarray(np.random.RandomState(0).randn(B, T, C), jnp.bfloat16) * 0.1
    v = m.init(jax.random.PRNGKey(0), x)

    def chain(v, x):
        for _ in range(N):
            x = m.apply(v, x)
        return x

    f = jax.jit(chain)
    ms = timed(f, v, x, n=20)
    print(f'conv C={C} T={T}: fwd {ms / N * 1e3:6.0f} us/op', end='')
    g = jax.jit(jax.grad(lambda v, x: jnp.sum(chain(v, x).astype(jnp.float32) ** 2) * 1e-6))
    ms = timed(g, v, x, n=20)
    print(f'   fwd+bwd {ms / N * 1e3:6.0f} us/op')


def ln_chain(C, T):
    m = nn.LayerNorm(epsilon=1e-3)
    x = jnp.asarray(np.random.RandomState(0).randn(B, T, C), jnp.bfloat16)
    v = m.init(jax.random.PRNGKey(0), x)

    def chain(v, x):
        for _ in range(N):
            x = m.apply(v, x)
        return x

    ms = timed(jax.jit(chain), v, x, n=20)
    print(f'LN   C={C} T={T}: fwd {ms / N * 1e3:6.0f} us/op', end='')
    g = jax.jit(jax.grad(lambda v, x: jnp.sum(chain(v, x).astype(jnp.float32) ** 2) * 1e-6))
    ms = timed(g, v, x, n=20)
    print(f'   fwd+bwd {ms / N * 1e3:6.0f} us/op')


def dropout_chain(C, T, impl):
    x = jnp.asarray(np.random.RandomState(0).randn(B, T, C), jnp.bfloat16)
    key = jax.random.PRNGKey(0) if impl == 'threefry' else \
        jax.random.key(0, impl=impl)

    def chain(key, x):
        for i in range(N):
            k = jax.random.fold_in(key, i)
            keep = jax.random.bernoulli(k, 0.8, x.shape)
            x = jnp.where(keep, x / 0.8, 0)
        return x

    ms = timed(jax.jit(chain), key, x, n=20)
    print(f'drop C={C} T={T} {impl}: fwd {ms / N * 1e3:6.0f} us/op')


if __name__ == '__main__':
    conv_chain(6, 600, 470)
    conv_chain(8, 800, 470)
    conv_chain(8, 800, 470, K=7, d=2)
    conv_chain(12, 1200, 118)
    ln_chain(600, 470)
    ln_chain(800, 470)
    dropout_chain(800, 470, 'threefry')
    dropout_chain(800, 470, 'rbg')

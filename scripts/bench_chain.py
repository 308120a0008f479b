"""Chain-dependency microbench: N dependent fused ops in one jit, per-op
cost, vs dropout-in-cell and LN contexts.  Isolates why in-model per-op
cost (~0.7 ms) exceeds the isolated kernel time (~0.05 ms)."""

import sys
import time
import functools

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir', '/tmp/nbasr_jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

sys.path.insert(0, '/root/repo')
from nbasr_tpu.ops.cell_ops import grouped_conv_relu

B, ci, T, G, K = 32, 8, 470, 100, 5
N = 12


from _timing import timed  # noqa: E402


def main(dtype):
    rng = np.random.RandomState(0)
    C = ci * G
    xs = jnp.asarray(rng.randn(B, ci, T, G) * 0.1, dtype)
    w = jnp.asarray(rng.randn(K, ci, C) * 0.05, dtype)
    b = jnp.asarray(rng.randn(C) * 0.1, dtype)

    @jax.jit
    def chain(xs, w, b):
        y = xs
        for _ in range(N):
            y = grouped_conv_relu(y, w, b, G, 0, 4, 1)
        return y

    t = timed(chain, xs, w, b)
    print(f'{N}-op fwd chain: {t:.3f} ms -> {t / N:.4f} ms/op')

    @jax.jit
    def chain_drop(key, xs, w, b):
        y = xs
        for i in range(N):
            y = grouped_conv_relu(y, w, b, G, 0, 4, 1)
            key, k = jax.random.split(key)
            y = jnp.where(jax.random.bernoulli(k, 0.8, y.shape),
                          y / jnp.asarray(0.8, y.dtype),
                          jnp.zeros((), y.dtype))
        return y

    key = jax.random.PRNGKey(0)
    t = timed(chain_drop, key, xs, w, b)
    print(f'{N}-op fwd chain + dropout: {t:.3f} ms -> {t / N:.4f} ms/op')

    def loss(xs, w, b):
        return (chain(xs, w, b).astype(jnp.float32) ** 2).mean()

    g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
    t = timed(g, xs, w, b)
    print(f'{N}-op chain fwd+bwd: {t:.3f} ms -> {t / N:.4f} ms/op')


if __name__ == '__main__':
    main(jnp.bfloat16 if 'bf16' in sys.argv else jnp.float32)

"""Microbench the split-layout fused op: fwd and full VJP per block shape,
plus the elementwise glue costs (dropout, LN) on split arrays."""

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir', '/tmp/nbasr_jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

import sys
sys.path.insert(0, '/root/repo')
from nbasr_tpu.ops.cell_ops import grouped_conv_relu

BLOCKS = [('b0', 6, 470), ('b1', 8, 470), ('b2', 10, 235), ('b3', 12, 118)]
K, G, B = 5, 100, 32


from _timing import timed  # noqa: E402


def main(dtype=jnp.float32):
    rng = np.random.RandomState(0)
    tot_f = tot_b = 0.0
    for name, ci, T in BLOCKS:
        C = ci * G
        xs = jnp.asarray(rng.randn(B, ci, T, G), dtype)
        w = jnp.asarray(rng.randn(K, ci, C) * 0.2, dtype)
        b = jnp.asarray(rng.randn(C) * 0.1, dtype)
        dy = jnp.asarray(rng.randn(B, ci, T, G), dtype)

        fwd = jax.jit(lambda xs, w, b: grouped_conv_relu(xs, w, b, G, 0, 4, 1))

        def vjp_all(xs, w, b, dy):
            y, pull = jax.vjp(lambda *a: grouped_conv_relu(*a, G, 0, 4, 1),
                              xs, w, b)
            return pull(dy)
        bwd = jax.jit(vjp_all)

        t_f = timed(fwd, xs, w, b)
        t_b = timed(bwd, xs, w, b, dy)
        print(f'{name} ci={ci} T={T}: fwd {t_f:6.3f} ms   vjp(all) {t_b:6.3f} ms')
        tot_f += t_f
        tot_b += t_b
    print(f'sum per-shape: fwd {tot_f:.2f} ms, vjp {tot_b:.2f} ms')
    # flagship has 9/12/15/18 ops at these shapes:
    counts = [9, 12, 15, 18]

    # elementwise glue on split arrays: dropout fwd and a [B,ci,T,G] add
    xs = jnp.asarray(rng.randn(B, 8, 470, G), dtype)
    key = jax.random.PRNGKey(0)
    drop = jax.jit(lambda k, x: jnp.where(
        jax.random.bernoulli(k, 0.8, x.shape), x / 0.8, 0))
    add = jax.jit(lambda a, b: a + b)
    print(f'dropout [32,8,470,100]: {timed(drop, key, xs):.3f} ms; '
          f'add: {timed(add, xs, xs):.3f} ms')

    def ln(x):
        mu = x.mean(axis=(1, 3), keepdims=True)
        var = ((x - mu) ** 2).mean(axis=(1, 3), keepdims=True)
        return (x - mu) * jax.lax.rsqrt(var + 1e-3)
    lnf = jax.jit(ln)
    print(f'split LN fwd [32,8,470,100]: {timed(lnf, xs):.3f} ms')


if __name__ == '__main__':
    main(jnp.bfloat16 if 'bf16' in sys.argv else jnp.float32)

"""Microbench: chained grouped_conv_relu kernels at flagship block shapes.

Times N chained conv kernels (output feeds input) per block shape, fwd and
fwd+bwd, isolating kernel + pad cost from the rest of the model.
"""

import sys
import functools

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir', '/tmp/nbasr_jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

sys.path.insert(0, '/root/repo')
from nbasr_tpu.ops.cell_ops import grouped_conv_relu
from scripts._timing import timed

B, G = 32, 100
SHAPES = [  # (ci, T) per block, flagship
    (6, 470), (8, 470), (10, 235), (12, 118),
]
N_CHAIN = 9  # 3 cells x 3 convs for block0-like stacks


def run(ci, T, dtype):
    K, d = 5, 1
    lpad, rpad = 0, 4
    x = jnp.asarray(np.random.randn(B, ci, T, G), dtype) * 0.1
    w = jnp.asarray(np.random.randn(K, ci, ci * G), dtype) * 0.05
    b = jnp.zeros((ci * G,), dtype)

    def chain(x, w, b):
        for _ in range(N_CHAIN):
            x = grouped_conv_relu(x, w, b, G, lpad, rpad, d)
        return x

    f = jax.jit(chain)
    ms = timed(f, x, w, b, n=20)
    print(f'ci={ci:3d} T={T:4d} {dtype.__name__}: fwd chain of {N_CHAIN}: '
          f'{ms:7.2f} ms ({ms / N_CHAIN * 1e3:6.0f} us/op)')

    def loss(x, w, b):
        return jnp.sum(chain(x, w, b).astype(jnp.float32) ** 2) * 1e-6

    g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
    ms = timed(g, x, w, b, n=20)
    print(f'                 fwd+bwd chain of {N_CHAIN}: '
          f'{ms:7.2f} ms ({ms / N_CHAIN * 1e3:6.0f} us/op)')


if __name__ == '__main__':
    for ci, T in SHAPES:
        run(ci, T, jnp.bfloat16)

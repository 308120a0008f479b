"""Microbench: pallas grouped-conv kernel times WITHOUT layout transposes.

Feeds pre-split [B, ci, T, G] / [K, ci, co, G] arrays straight into the
pallas_call paths to isolate pure kernel time from the XLA transposes that
wrap them in grouped_conv1d.  Shapes = the four flagship blocks (conv5).
"""

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nbasr_tpu.ops import grouped_conv as gc

jax.config.update('jax_compilation_cache_dir', '/tmp/nbasr_jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

BLOCKS = [  # (name, ci, T, B)
    ('b0 C=600 T=470', 6, 470, 32),
    ('b1 C=800 T=470', 8, 470, 32),
    ('b2 C=1000 T=235', 10, 235, 32),
    ('b3 C=1200 T=118', 12, 118, 32),
]
K, G, DIL = 5, 100, 1
LPAD, RPAD = 0, 4  # conv5 d1 s1


def timed(fn, *args, n=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def fwd_call(xg, wg, *, ci, co, T_pad, T_out, B):
    kernel = functools.partial(gc._fwd_kernel, K=K, ci=ci, co=co, T=T_out,
                               dilation=DIL)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, ci, T_pad, G), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, ci, co, G), lambda b: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, T_out, co, G), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T_out, co, G), xg.dtype),
        scratch_shapes=[pltpu.VMEM((T_out, co, G), jnp.float32)],
    )(xg, wg)


def dx_call(dyg_pad, wg, *, ci, co, T_in, T_dy, B):
    kernel = functools.partial(gc._dx_kernel, K=K, ci=ci, co=co, T_in=T_in,
                               dilation=DIL)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, co, T_dy, G), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, ci, co, G), lambda b: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, T_in, ci, G), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T_in, ci, G), jnp.float32),
        scratch_shapes=[pltpu.VMEM((T_in, G), jnp.float32)],
    )(dyg_pad, wg)


def dw_call(xg, dyg, *, ci, co, T_pad, T_out, B):
    kernel = functools.partial(gc._dw_kernel, K=K, ci=ci, co=co, T=T_out,
                               dilation=DIL)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, ci, T_pad, G), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co, T_out, G), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((K, ci, co, G), lambda b: (0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((K, ci, co, G), jnp.float32),
    )(xg, dyg)


def main():
    rng = np.random.RandomState(0)
    total = {'fwd': 0.0, 'dx': 0.0, 'dw': 0.0}
    for name, ci, T, B in BLOCKS:
        co = ci
        T_pad = T + LPAD + RPAD
        T_out = T_pad - (K - 1) * DIL
        span = (K - 1) * DIL
        T_dy = T + span
        xg = jnp.asarray(rng.randn(B, ci, T_pad, G), jnp.float32)
        wg = jnp.asarray(rng.randn(K, ci, co, G), jnp.float32)
        dyg = jnp.asarray(rng.randn(B, co, T_out, G), jnp.float32)
        dyg_pad = jnp.asarray(rng.randn(B, co, T_dy, G), jnp.float32)

        f = jax.jit(functools.partial(fwd_call, ci=ci, co=co, T_pad=T_pad,
                                      T_out=T_out, B=B))
        dx = jax.jit(functools.partial(dx_call, ci=ci, co=co, T_in=T,
                                       T_dy=T_dy, B=B))
        dw = jax.jit(functools.partial(dw_call, ci=ci, co=co, T_pad=T_pad,
                                       T_out=T_out, B=B))
        t_f = timed(f, xg, wg)
        t_dx = timed(dx, dyg_pad, wg)
        t_dw = timed(dw, xg, dyg)
        gflop = 2 * K * ci * T * co * 128 * B / 1e9
        print(f'{name}: fwd {t_f:6.3f} ms  dx {t_dx:6.3f} ms  dw {t_dw:6.3f} ms'
              f'  ({gflop:.2f} padded GFLOP, fwd {gflop/t_f:.0f} GF/s)')
        total['fwd'] += t_f
        total['dx'] += t_dx
        total['dw'] += t_dw
    print(f"sum over 4 block shapes: fwd {total['fwd']:.2f}  dx {total['dx']:.2f}"
          f"  dw {total['dw']:.2f} ms")


if __name__ == '__main__':
    main()

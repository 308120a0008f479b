"""Block-conv lever (VERDICT r4 next #3): can a tap-matmul formulation
beat XLA's conv lowering for the four dense block convs?

PERF.md r3 measured the block convs + LayerNorms at 6.9 ms fwd+bwd vs a
~4.5 ms MXU floor.  The convs are plain dense NWC convs (k=8, stride
1/1/2/2, channels 80->600->800->1000->1200); this bench isolates each
block's conv+bias+relu20+LayerNorm fwd+bwd and compares:

  A. ``lax.conv_general_dilated`` (what ``nn.Conv`` lowers to today)
  B. tap-matmul: pad once, then ``y = sum_k x[:, k::s][:T_out] @ W[k]``
     — K dense [B*T, cin] x [cin, co] matmuls accumulated in f32
  C. tap-matmul with the K taps concatenated into ONE
     [B*T, K*cin] x [K*cin, co] matmul over an im2col gather

All variants are checked for f32 agreement before timing; bf16 is the
timed dtype (the bench/train dtype).  Run on the real chip:

  python scripts/bench_blockconv.py
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, '/root/repo')

import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir', '/tmp/nbasr_jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

from nbasr_tpu.models.layers import conv_padding, relu20, norm_eps

import os

B = int(os.environ.get('BC_B', 32))
T0 = int(os.environ.get('BC_T', 470))   # bucket-2 frames (r3 breakdown)
BLOCKS = [        # (cin, co, stride) for block0..3
    (80, 600, 1),
    (600, 800, 1),
    (800, 1000, 2),
    (1000, 1200, 2),
]
K = 8


def layer_norm(y, scale, bias):
    yf = y.astype(jnp.float32)
    mu = yf.mean(axis=-1, keepdims=True)
    var = ((yf - mu) ** 2).mean(axis=-1, keepdims=True)
    return ((yf - mu) * jax.lax.rsqrt(var + norm_eps) * scale
            + bias).astype(y.dtype)


def post(y, b, scale, bias):
    return layer_norm(relu20(y + b.astype(y.dtype)), scale, bias)


def conv_xla(x, w, b, scale, bias, stride, lpad, rpad):
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(stride,),
        padding=[(lpad, rpad)], dimension_numbers=('NWC', 'WIO', 'NWC'))
    return post(y, b, scale, bias)


def conv_taps(x, w, b, scale, bias, stride, lpad, rpad):
    # pad once; tap k contributes x_pad[:, k + s*t] @ w[k]
    xp = jnp.pad(x, ((0, 0), (lpad, rpad), (0, 0)))
    t_out = -(-x.shape[1] // stride)
    acc = None
    for k in range(K):
        xs = jax.lax.slice_in_dim(xp, k, k + (t_out - 1) * stride + 1, axis=1)
        if stride > 1:
            xs = xs[:, ::stride]
        part = jax.lax.dot_general(
            xs, w[k].astype(x.dtype), (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = part if acc is None else acc + part
    return post(acc.astype(x.dtype), b, scale, bias)


def conv_im2col(x, w, b, scale, bias, stride, lpad, rpad):
    xp = jnp.pad(x, ((0, 0), (lpad, rpad), (0, 0)))
    t_out = -(-x.shape[1] // stride)
    cols = jnp.stack([
        jax.lax.slice_in_dim(xp, k, k + (t_out - 1) * stride + 1,
                             axis=1)[:, ::stride] if stride > 1 else
        jax.lax.slice_in_dim(xp, k, k + t_out, axis=1)
        for k in range(K)], axis=2)           # [B, T_out, K, cin]
    cols = cols.reshape(x.shape[0], t_out, K * x.shape[2])
    y = jax.lax.dot_general(
        cols, w.reshape(K * x.shape[2], w.shape[2]).astype(x.dtype),
        (((2,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    return post(y.astype(x.dtype), b, scale, bias)


VARIANTS = {'xla_conv': conv_xla, 'tap_matmul': conv_taps,
            'im2col': conv_im2col}


def timed(fn, args, n=50):
    fn(*args)[0].block_until_ready()          # compile
    for _ in range(5):
        fn(*args)
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(n)]
    jax.block_until_ready(outs[-1])
    return (time.perf_counter() - t0) / n


def main():
    dtype = jnp.bfloat16
    print(f'device={jax.devices()[0].device_kind} dtype={dtype.__name__} '
          f'B={B} T0={T0}')
    totals = {name: 0.0 for name in VARIANTS}
    t_in = T0
    for i, (cin, co, stride) in enumerate(BLOCKS):
        lpad, rpad = conv_padding(K, 1, stride)
        rs = np.random.RandomState(i)
        x = jnp.asarray(rs.randn(B, t_in, cin), dtype)
        w = jnp.asarray(rs.randn(K, cin, co) * (1 / np.sqrt(K * cin)),
                        jnp.float32)
        bias = jnp.zeros((co,), jnp.float32)
        scale = jnp.ones((co,), jnp.float32)
        beta = jnp.zeros((co,), jnp.float32)
        t_out = -(-t_in // stride)
        cot = jnp.asarray(rs.randn(B, t_out, co), dtype)

        # f32 agreement check
        ref = None
        for name, fn in VARIANTS.items():
            out = np.asarray(fn(x.astype(jnp.float32), w, bias, scale, beta,
                                stride, lpad, rpad), np.float64)
            if ref is None:
                ref = out
            else:
                err = np.abs(out - ref).max() / max(np.abs(ref).max(), 1e-9)
                assert err < 1e-5, (name, i, err)

        row = [f'block{i} cin={cin:4d} co={co:4d} s={stride}']
        for name, fn in VARIANTS.items():
            def fwd_bwd(x, w, b, scale, beta):
                def loss(x, w, b, scale, beta):
                    y = fn(x, w, b, scale, beta, stride, lpad, rpad)
                    return (y * cot).astype(jnp.float32).sum()
                l, g = jax.value_and_grad(loss, argnums=(0, 1))(
                    x, w, b, scale, beta)
                return l, g
            jf = jax.jit(fwd_bwd)
            dt = timed(jf, (x, w, bias, scale, beta))
            totals[name] += dt
            row.append(f'{name} {dt * 1e3:6.2f}ms')
        print('  '.join(row))
        t_in = t_out
        # chain shapes like the real model: next block's input co channels
    print('TOTALS (fwd+bwd, conv+bias+relu20+LN): '
          + '  '.join(f'{k}={v * 1e3:.2f}ms' for k, v in totals.items()))


if __name__ == '__main__':
    main()

"""Split-layout cell ops: grouped conv (+bias +clip-ReLU) as Pallas TPU
kernels that chain *without* inter-op layout transposes.

Why this exists.  The cell convs of NAS-Bench-ASR are ``groups=100`` with
6-12 channels per group (reference ``model/tf/ops.py:69-76``); the right
TPU mapping puts the group axis on the VPU's 128 lanes (see
``ops/grouped_conv.py``).  Microbenchmarks on v5e show the *kernels* cost
20-40 us each at flagship shapes while the XLA layout transposes wrapped
around each op cost ~2 ms — 98% of the measured per-op time.  So the
split layout ``[B, c, T, G]`` (channel-of-group major, time, group on
lanes) is made the *resident* activation layout for a whole block's cell
stack: ``to_split`` / ``from_split`` run once per block (8 transposes per
step instead of ~170), every conv op is a Pallas kernel in that layout,
and the elementwise glue (branch adds, dropout, LayerNorm) runs in XLA on
the split arrays directly.

Channel convention: dense channel ``c_full = g * cpg + c`` (group-major),
matching XLA's ``feature_group_count`` and the compact grouped kernel
layout ``[K, ci, C_out]`` used by every other implementation — parameters
and checkpoints are interchangeable across impls.

The fused op ``grouped_conv_relu`` = pad → grouped conv → +bias →
clip-ReLU(0,20) (reference ``model/tf/ops.py:16-26``), with a custom VJP:
the ReLU gate is reconstructed from the saved *output* (``0 < y < 20``),
so the backward needs no extra residuals beyond (x, w, y).

All kernels grid over the batch; VMEM per step at the worst flagship
shape (block1: ci=co=8, T=470, G=100→128 lanes) is ~10 MB incl. double
buffering.  Stride is 1 (all reference cell convs); dilation supported.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .grouped_conv import _dw_kernel

__all__ = ['to_split', 'from_split', 'grouped_conv_relu']

#: Tests set this to run the kernels in interpret mode on CPU.
INTERPRET = False


def to_split(x, groups):
    """[B, T, C] -> [B, C//G, T, G] (group-major channels)."""
    B, T, C = x.shape
    return x.reshape(B, T, groups, C // groups).transpose(0, 3, 1, 2)


def from_split(xs):
    """[B, c, T, G] -> [B, T, G*c] (inverse of :func:`to_split`)."""
    B, c, T, G = xs.shape
    return xs.transpose(0, 2, 3, 1).reshape(B, T, G * c)


def _fwd_kernel(x_ref, w_ref, b_ref, o_ref, acc_ref, *, K, ci, co, T,
                dilation):
    """x [1, ci, T+pad, G]; w [K, ci, co, G]; b [co, G]; out [1, co, T, G].

    One broadcast-FMA over a [co, T, G] tile per (k, c) tap — K*ci <= 84
    vector ops at full lane occupancy.  f32 scratch accumulator; bias and
    the clipped ReLU are fused into the epilogue.
    """
    acc_ref[...] = jnp.broadcast_to(
        b_ref[...].astype(jnp.float32)[:, None, :], acc_ref.shape)
    for k in range(K):
        off = k * dilation
        for c in range(ci):
            xs = x_ref[0, c, off:off + T, :].astype(jnp.float32)   # [T, G]
            wk = w_ref[k, c, :, :].astype(jnp.float32)             # [co, G]
            acc_ref[...] += xs[None, :, :] * wk[:, None, :]
    o_ref[0, ...] = jnp.clip(acc_ref[...], 0.0, 20.0).astype(o_ref.dtype)


def _dx_kernel(dz_ref, wt_ref, o_ref, acc_ref, *, K, ci, co, T_in, dilation):
    """dz [1, co, T_in+span, G] (pre-padded); wt [K, co, ci, G] (transposed
    weights); dx [1, ci, T_in, G]:
        dx[c, t] = sum_{k, o} dz_pad[o, t + span - k*d] * w[k, c, o].
    """
    span = (K - 1) * dilation
    acc_ref[...] = jnp.zeros_like(acc_ref)
    for k in range(K):
        off = span - k * dilation
        for o in range(co):
            ds = dz_ref[0, o, off:off + T_in, :].astype(jnp.float32)  # [T, G]
            wk = wt_ref[k, o, :, :].astype(jnp.float32)               # [ci, G]
            acc_ref[...] += ds[None, :, :] * wk[:, None, :]
    o_ref[0, ...] = acc_ref[...].astype(o_ref.dtype)


def _split_w(w, groups):
    """compact [K, ci, C_out] -> [K, ci, co, G] (+ bias [C_out] -> [co, G])."""
    K, ci, Cout = w.shape
    co = Cout // groups
    return w.reshape(K, ci, groups, co).transpose(0, 1, 3, 2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def grouped_conv_relu(xs, w, b, groups, lpad, rpad, dilation=1):
    """Pad → grouped conv1d (stride 1) → +bias → clip-ReLU(0, 20).

    ``xs`` is split-layout ``[B, ci, T, G]``; ``w`` the compact grouped
    kernel ``[K, ci, C_out]``; ``b`` ``[C_out]``.  Returns ``[B, co, T, G]``
    (stride-1 cell convs satisfy lpad+rpad == (K-1)*dilation, so T is
    preserved).  Differentiable w.r.t. xs, w and b.
    """
    return _forward(xs, w, b, groups, lpad, rpad, dilation)


def _forward(xs, w, b, groups, lpad, rpad, dilation):
    B, ci, T_in, G = xs.shape
    K, _, Cout = w.shape
    co = Cout // groups
    wg = _split_w(w, groups)
    bg = b.reshape(groups, co).T
    x_pad = jnp.pad(xs, ((0, 0), (0, 0), (lpad, rpad), (0, 0)))
    T_pad = T_in + lpad + rpad
    T_out = T_pad - (K - 1) * dilation
    kernel = functools.partial(_fwd_kernel, K=K, ci=ci, co=co, T=T_out,
                               dilation=dilation)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, ci, T_pad, G), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, ci, co, G), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((co, G), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, co, T_out, G), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, co, T_out, G), xs.dtype),
        scratch_shapes=[pltpu.VMEM((co, T_out, G), jnp.float32)],
        interpret=INTERPRET,
    )(x_pad, wg, bg)


def _fwd_rule(xs, w, b, groups, lpad, rpad, dilation):
    ys = _forward(xs, w, b, groups, lpad, rpad, dilation)
    return ys, (xs, w, ys, b)


def _bwd_rule(groups, lpad, rpad, dilation, res, dy):
    xs, w, ys, b = res
    B, ci, T_in, G = xs.shape
    K, _, Cout = w.shape
    co = Cout // groups
    span = (K - 1) * dilation

    # ReLU gate from the saved output: strictly inside (0, 20) — matches
    # jnp.clip's VJP except on the measure-zero boundary.
    gate = (ys > 0.0) & (ys < 20.0)
    dz = jnp.where(gate, dy, 0).astype(dy.dtype)                 # [B,co,T,G]

    db = dz.sum(axis=(0, 2), dtype=jnp.float32)                  # [co, G]
    db = db.T.reshape(Cout)

    wg = _split_w(w, groups)
    wt = wg.transpose(0, 2, 1, 3)                                # [K,co,ci,G]
    # dx[t] = sum_k dz[t + lpad - k*d]: pad dz so index (t + span - k*d)
    # lands on it (left = span - lpad = rpad, right = lpad).
    dz_pad = jnp.pad(dz, ((0, 0), (0, 0), (span - lpad, lpad), (0, 0)))
    T_dz = T_in + span
    dx_kernel = functools.partial(_dx_kernel, K=K, ci=ci, co=co, T_in=T_in,
                                  dilation=dilation)
    dx = pl.pallas_call(
        dx_kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, co, T_dz, G), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, co, ci, G), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ci, T_in, G), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, ci, T_in, G), xs.dtype),
        scratch_shapes=[pltpu.VMEM((ci, T_in, G), jnp.float32)],
        interpret=INTERPRET,
    )(dz_pad, wt)

    x_pad = jnp.pad(xs, ((0, 0), (0, 0), (lpad, rpad), (0, 0)))
    T_pad = T_in + lpad + rpad
    T_out = T_pad - span
    dw_kernel = functools.partial(_dw_kernel, K=K, ci=ci, co=co, T=T_out,
                                  dilation=dilation)
    dwg = pl.pallas_call(
        dw_kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, ci, T_pad, G), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co, T_out, G), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((K, ci, co, G), lambda i: (0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((K, ci, co, G), jnp.float32),
        interpret=INTERPRET,
    )(x_pad, dz)
    dw = dwg.transpose(0, 1, 3, 2).reshape(K, ci, Cout).astype(w.dtype)
    return dx, dw, db.astype(b.dtype)


grouped_conv_relu.defvjp(_fwd_rule, _bwd_rule)

"""Sequence parallelism: time-sharded execution of the ASR encoder.

Green-field design (SURVEY.md §5): the reference handles long audio only by
bucketing and curriculum filtering (``training/tf/__init__.py:42,94-99``) —
it has no sequence scaling of any kind.  On a TPU mesh the natural scaling
axis for audio is *time*: features ``[B, T, F]`` are sharded on T across a
``'seq'`` mesh axis, and three properties of this model family make the
sharded computation exact:

1. **The conv encoder is finite-receptive-field.**  Every op is a stride-1
   conv with (lpad, rpad) time padding, a pointwise op, or one of the four
   strided block convs — so a local chunk extended by a fixed *halo* of
   neighbour frames computes exactly the global result on its interior.
   The halo is exchanged ONCE on the raw features (one neighbour
   ``ppermute`` each way, riding ICI), the unmodified model runs on a
   fixed-size window cut from the exchanged buffer, and the output is
   trimmed — no mid-model communication.  Windows are *clipped* at the
   global sequence boundary: an edge shard's window starts/ends exactly at
   the true edge, where the model's own per-op zero padding coincides with
   the global computation (a zero-filled halo would not — every op re-pads
   zeros at its own depth, which no precomputed halo content reproduces).

2. **Halo sizes come from the architecture.**  :func:`encoder_halo`
   back-propagates the (lpad, rpad) requirement of every op from the
   output to the input (cells are stride-1 and sequential, so their pads
   add; a strided block conv scales the requirement), then rounds up to a
   multiple of the total time reduction so trim offsets stay aligned.
   For the flagship arch the halo is ~100 input frames per side — at
   TIMIT lengths that is pointless (as the reference's no-op here shows),
   but at hour-scale audio the redundant fraction vanishes.

3. **The LSTM head carries O(B·H) state.**  The only sequential coupling
   crosses shards through the (c, h) carry — 2·B·500 floats.  Two modes:
   ``'chain'`` runs the local LSTM in shard order, forwarding the carry by
   neighbour ppermute (exact; wall-clock equals the inherently sequential
   full-T scan, while activations stay distributed — each round every
   device computes its chunk speculatively and keeps the round where its
   incoming carry is correct); ``'gather'`` all-gathers the ×4-reduced
   encoder output and runs the head replicated (fine at short T).

Masking note: local chunks build their padding mask from *global* frame
positions (the ``mask`` argument added to ``ASRModel.__call__``), so
mean-variance normalisation and Masking semantics match the unsharded
model bit-for-bit.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..models.layers import conv_padding

__all__ = ['encoder_halo', 'seq_parallel_apply']

_OP_CONVS = {'conv5': (5, 1), 'conv5d2': (5, 2),
             'conv7': (7, 1), 'conv7d2': (7, 2)}


def _op_pads(op_name):
    if op_name in _OP_CONVS:
        k, d = _OP_CONVS[op_name]
        return conv_padding(k, d, 1)
    return (0, 0)  # linear / zero / skip are pointwise in time


def encoder_halo(model):
    """(left, right) input-frame halo for exact time-sharded execution.

    Walks the blocks back-to-front: each cell's nodes run sequentially so
    their pads accumulate; the block conv scales the downstream need by
    its stride and adds its own pads.  Rounded up to the total time
    reduction so output trim offsets are integral.
    """
    need_l = need_r = 0
    blocks = list(zip(model.block_kernels, model.block_strides,
                      model.cells_per_block))
    for kernel, stride, cells in reversed(blocks):
        need_l += cells * sum(_op_pads(n[0])[0] for n in model.arch_desc)
        need_r += cells * sum(_op_pads(n[0])[1] for n in model.arch_desc)
        lp, rp = conv_padding(kernel, 1, stride)
        need_l = need_l * stride + lp
        need_r = need_r * stride + rp
    total = int(np.prod(model.block_strides))
    up = lambda v: int(-(-v // total) * total)
    return up(need_l), up(need_r)


def seq_parallel_apply(model, variables, features, feature_size, mesh,
                       seq_axis='seq', train=False, lstm_mode='chain',
                       rngs=None):
    """Run ``model`` with the time axis sharded over ``mesh[seq_axis]``.

    ``features [B, T, F]`` must have T divisible by (mesh size × total
    stride).  Returns logits ``[B, T/stride, V]`` (sharded on time under
    jit).  Exact w.r.t. the unsharded ``model.apply`` up to float
    reassociation; ``train=True`` draws independent dropout masks per
    shard (pass ``rngs={'dropout': key}``).
    """
    B, T, F = features.shape
    n = mesh.shape[seq_axis]
    ts = int(np.prod(model.block_strides))
    if T % (n * ts):
        raise ValueError(f'T={T} not divisible by seq={n} x stride={ts}')
    hl, hr = encoder_halo(model)
    m = hl + hr
    if T // n < m:
        # single-hop neighbour exchange: each shard must be at least one
        # total halo long (true by a wide margin in the long-audio regime
        # this is for; use fewer shards otherwise)
        raise ValueError(
            f'shard length {T // n} < total halo {m} = {hl}+{hr}; '
            f'use at most seq={T // m} shards for T={T}')
    fwd = [(i, i + 1) for i in range(n - 1)]
    bwd = [(i + 1, i) for i in range(n - 1)]

    def local_fn(feats_l, fsize):
        idx = jax.lax.axis_index(seq_axis)
        L = feats_l.shape[1]
        L_ext = L + m
        # Exchange `m` edge frames each way, then cut a window of fixed
        # length L+m whose placement is CLIPPED to the true sequence: edge
        # shards' windows start/end exactly at the global boundary, where
        # the model's own conv padding coincides with the global
        # computation's padding (a zero-filled halo would not — the global
        # model re-pads zeros at every op's depth, which partially-real
        # halo windows cannot reproduce).  Interior window edges are
        # absorbed by the halo.  All offsets stay multiples of the total
        # stride, so trim indices are integral.
        left = jax.lax.ppermute(feats_l[:, L - m:, :], seq_axis, fwd)
        right = jax.lax.ppermute(feats_l[:, :m, :], seq_axis, bwd)
        buf = jnp.concatenate([left, feats_l, right], axis=1)  # [B, L+2m, F]
        w = jnp.clip(idx * L - hl, 0, T - L_ext)       # global window start
        off = w - (idx * L - m)                        # offset into buf
        ext = jax.lax.dynamic_slice_in_dim(buf, off, L_ext, axis=1)
        pos = w + jnp.arange(L_ext)
        mask = pos[None, :] < fsize[:, None]
        enc = model.apply(variables, ext, train=train, mask=mask,
                          stage='encode', rngs=rngs)
        enc = jax.lax.dynamic_slice_in_dim(enc, (idx * L - w) // ts,
                                           L // ts, axis=1)

        if not model.use_rnn or lstm_mode == 'gather':
            if model.use_rnn:  # gather the x4-reduced features, run replicated
                full = jax.lax.all_gather(enc, seq_axis, axis=1, tiled=True)
                logits = model.apply(variables, full, train=train,
                                     stage='head', rngs=rngs)
                return jax.lax.dynamic_slice_in_dim(
                    logits, idx * (L // ts), L // ts, axis=1)
            return model.apply(variables, enc, train=train, stage='head',
                               rngs=rngs)

        # 'chain': sequential carry relay across shards
        dt = model.compute_dtype
        H = model.rnn_units
        carry = (jnp.zeros((B, H), dt), jnp.zeros((B, H), dt))
        out = jnp.zeros((B, L // ts, model.num_classes + 1), jnp.float32)
        for s in range(n):
            logits_s, carry_s = model.apply(
                variables, enc, train=train, stage='head',
                rnn_carry=carry, return_rnn_carry=True, rngs=rngs)
            take = idx == s
            out = jnp.where(take, logits_s, out)
            carry = jax.tree.map(
                lambda new, old: jnp.where(take, new, old), carry_s, carry)
            if s < n - 1:
                carry = jax.lax.ppermute(carry, seq_axis, fwd)
        return out

    sharded = shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(None, seq_axis, None), P()),
        out_specs=P(None, seq_axis, None),
        check_rep=False)
    return sharded(features, feature_size)

"""Pallas TPU kernels for the CTC forward-backward recursions.

Optional fast path for :mod:`nbasr_tpu.ops.ctc` (SURVEY.md §7.4's "fused
alpha-beta kernel").  The XLA ``lax.scan`` path is already fast (<2 ms in
the flagship train step — see PERF.md); these kernels eliminate the
per-step scan overhead by running the whole time recursion inside one
kernel invocation with the ``[B, S]`` state resident in VMEM:

  - extended-label states S live on the 128-wide lanes (S ≈ 2U+1 ≤ 256),
  - batch B on sublanes,
  - the t-loop is a ``fori_loop`` reading one ``[B, S]`` emission row per
    step from the VMEM-resident ``[T, B, S]`` emission block,
  - the s-1 / s-2 state shifts are lane rolls with edge masking.

Emissions/transition masks are precomputed by the shared helpers in
``ops.ctc`` (one XLA gather), so both implementations share semantics and
the final loss gather stays in XLA where per-row dynamic indexing is cheap.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .ctc import (
    _NEG_INF, _emission_logprobs, _extended_labels, _log_add,
    _transition_masks,
)

__all__ = ['alpha_scan_pallas', 'beta_scan_pallas', 'ctc_loss_pallas']


def _shift_lanes(x, shift):
    """Shift along the last (lane) axis, filling vacated lanes with -inf."""
    rolled = pltpu.roll(x, shift, axis=1)
    cols = jax.lax.broadcasted_iota(jnp.int32, x.shape, dimension=1)
    return jnp.where(cols < shift, _NEG_INF, rolled)


def _alpha_kernel(em_ref, skip_ref, out_ref, alpha_ref, *, T):
    B, S = alpha_ref.shape
    # init = em[0] on states 0 and 1, -inf elsewhere — built with masked
    # selects (``.at[].set`` would lower to scatter, unsupported on TC)
    cols = jax.lax.broadcasted_iota(jnp.int32, (B, S), dimension=1)
    em0 = em_ref[0, :, :]
    init = jnp.where(cols < 2, em0, _NEG_INF)
    alpha_ref[...] = init
    out_ref[0, ...] = init

    def body(t, _):
        alpha = alpha_ref[...]
        prev = _log_add(alpha, _shift_lanes(alpha, 1))
        skip = jnp.where(skip_ref[...] > 0,
                         _log_add(prev, _shift_lanes(alpha, 2)), prev)
        new = skip + em_ref[t, :, :]
        alpha_ref[...] = new
        out_ref[t, ...] = new
        return 0

    jax.lax.fori_loop(1, T, body, 0)


def alpha_scan_pallas(em, skip_ok, interpret=False):
    """[T, B, S] emissions + [B, S] skip mask -> stacked alphas [T, B, S]."""
    T, B, S = em.shape
    kernel = functools.partial(_alpha_kernel, T=T)
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, B, S), jnp.float32),
        scratch_shapes=[pltpu.VMEM((B, S), jnp.float32)],
        interpret=interpret,
    )(em, skip_ok.astype(jnp.float32))


def _shift_lanes_neg(x, shift):
    """Shift toward lower lane indices, filling the tail with -inf."""
    S = x.shape[1]
    rolled = pltpu.roll(x, S - shift, axis=1)
    cols = jax.lax.broadcasted_iota(jnp.int32, x.shape, dimension=1)
    return jnp.where(cols >= S - shift, _NEG_INF, rolled)


def _beta_kernel(em_ref, skipn_ref, final_ref, out_ref, beta_ref, *, T):
    B, S = beta_ref.shape
    init = jnp.where(final_ref[...] > 0, 0.0, _NEG_INF)
    beta_ref[...] = init
    out_ref[T - 1, ...] = init

    def body(i, _):
        t = T - 2 - i
        inc = beta_ref[...] + em_ref[t + 1, :, :]
        nxt = _log_add(inc, _shift_lanes_neg(inc, 1))
        skip = jnp.where(skipn_ref[...] > 0,
                         _log_add(nxt, _shift_lanes_neg(inc, 2)), nxt)
        beta_ref[...] = skip
        out_ref[t, ...] = skip
        return 0

    jax.lax.fori_loop(0, T - 1, body, 0)


def beta_scan_pallas(em, skip_ok, final_states, interpret=False):
    """Backward recursion; mirrors ops.ctc._beta_scan semantics."""
    T, B, S = em.shape
    # the skip *into* s+2 is allowed when skip_ok[s+2]; pre-shift the mask
    skip_next = jnp.concatenate(
        [skip_ok[:, 2:], jnp.zeros((B, 2), skip_ok.dtype)], axis=1)
    kernel = functools.partial(_beta_kernel, T=T)
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, B, S), jnp.float32),
        scratch_shapes=[pltpu.VMEM((B, S), jnp.float32)],
        interpret=interpret,
    )(em, skip_next.astype(jnp.float32), final_states.astype(jnp.float32))


def ctc_loss_pallas(logits, logit_len, labels, label_len, blank=0,
                    interpret=False):
    """Per-sample CTC nll via the Pallas alpha kernel (forward only —
    gradients should use :func:`nbasr_tpu.ops.ctc.ctc_loss`)."""
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    ext = _extended_labels(labels, blank)
    em = _emission_logprobs(log_probs, ext, logit_len, blank)
    skip_ok = _transition_masks(ext, blank)
    alphas = alpha_scan_pallas(em, skip_ok, interpret=interpret)

    B, S = ext.shape
    rows = jnp.arange(B)
    last = alphas[-1]
    end = 2 * label_len
    ll = _log_add(last[rows, end],
                  jnp.where(label_len > 0, last[rows, jnp.maximum(end - 1, 0)],
                            _NEG_INF))
    return -ll

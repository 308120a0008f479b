"""CTC loss on TPU: log-space forward-backward as XLA scans, custom VJP.

TPU-native replacement for the reference's native CTC kernels
(``tf.nn.ctc_loss`` C++/CUDA at ``training/tf/metrics/ctc.py:12-19``;
``torch.nn.functional.ctc_loss`` at ``training/torch/trainer.py:39``).

Semantics match the reference contract:
  - ``blank = 0``; labels are 1-based ids, 0-padded,
  - inputs are **unnormalised logits** (log-softmax applied internally,
    like ``tf.nn.ctc_loss``),
  - per-sample losses; the reference's ``/(logit_length+1)`` normalisation
    (``metrics/ctc.py:27-28``) lives in :func:`normalized_ctc_loss`.

Design notes (how this maps to the hardware):
  - The recursion runs over *time* via ``lax.scan`` with a ``[B, S]``
    state (S = 2U+1 extended labels) — time is inherently sequential but
    each step is a fully-vectorised VPU op over batch x states.
  - Emission log-probs are pre-gathered to ``[T, B, S]`` once (a single
    XLA gather) so the scan body is gather-free.
  - Length masking uses the *certain-blank extension* identity: frames at
    ``t >= logit_length`` are treated as emitting blank with probability 1,
    which leaves the CTC likelihood unchanged and keeps every shape static.
  - The backward pass is an explicit beta scan (custom VJP) rather than
    autodiff through the forward scan: grad wrt logits is the closed form
    ``softmax(logits) - alignment_posterior``, assembled with one one-hot
    matmul per sample (MXU) instead of T scatters.
"""

import jax
import jax.numpy as jnp

__all__ = ['ctc_loss', 'normalized_ctc_loss', 'ctc_alignment_posteriors']

_NEG_INF = -1e30


def _log_add(a, b):
    """Numerically-stable log(exp(a)+exp(b)) that tolerates -inf floors."""
    mx = jnp.maximum(a, b)
    mx = jnp.where(mx <= _NEG_INF, 0.0, mx)
    return mx + jnp.log(jnp.exp(a - mx) + jnp.exp(b - mx))


def _extended_labels(labels, blank):
    """[B, U] labels -> [B, 2U+1] blank-interleaved extended sequence."""
    B, U = labels.shape
    ext = jnp.full((B, 2 * U + 1), blank, labels.dtype)
    return ext.at[:, 1::2].set(labels)


def _emission_logprobs(log_probs, ext, logit_len, blank):
    """[B, T, V] log-probs -> [T, B, S] emissions for the extended labels.

    Frames past ``logit_len`` are replaced by certain-blank emissions
    (0 for blank states, -inf otherwise), which is likelihood-preserving.
    """
    B, T, V = log_probs.shape
    em = jnp.take_along_axis(log_probs[:, :, None, :],
                             ext[:, None, :, None].astype(jnp.int32),
                             axis=-1)[..., 0]            # [B, T, S]
    is_blank = (ext == blank)[:, None, :]                # [B, 1, S]
    pad = jnp.arange(T)[None, :, None] >= logit_len[:, None, None]
    certain_blank = jnp.where(is_blank, 0.0, _NEG_INF)
    em = jnp.where(pad, certain_blank, em)
    return em.transpose(1, 0, 2)                         # [T, B, S]


def _transition_masks(ext, blank):
    """Allowed-transition masks: (from s-1) always, (from s-2) when the
    state is a non-blank label different from the label two back."""
    skip_ok = (ext != blank) & (ext != jnp.roll(ext, 2, axis=1))
    skip_ok = skip_ok.at[:, :2].set(False)
    return skip_ok


def _shift1(x):
    return jnp.concatenate([jnp.full_like(x[:, :1], _NEG_INF), x[:, :-1]], axis=1)


def _shift2(x):
    return jnp.concatenate([jnp.full_like(x[:, :2], _NEG_INF), x[:, :-2]], axis=1)


def _alpha_scan(em, skip_ok):
    """Forward scan; returns stacked alphas [T, B, S]."""
    T = em.shape[0]
    a0 = jnp.full(em.shape[1:], _NEG_INF).at[:, 0].set(em[0, :, 0])
    a0 = a0.at[:, 1].set(em[0, :, 1])

    def step(alpha, em_t):
        prev = _log_add(alpha, _shift1(alpha))
        prev = jnp.where(skip_ok, _log_add(prev, _shift2(alpha)), prev)
        alpha = prev + em_t
        return alpha, alpha

    _, alphas = jax.lax.scan(step, a0, em[1:])
    return jnp.concatenate([a0[None], alphas], axis=0)


def _beta_scan(em, skip_ok, final_states):
    """Backward scan; returns stacked betas [T, B, S] (beta includes no
    emission at its own step: beta_t(s) = P(suffix after emitting at t))."""
    T, B, S = em.shape
    bT = jnp.where(final_states, 0.0, _NEG_INF)

    def step(beta, em_next):
        inc = beta + em_next                 # beta_{t+1}(s) * p_{t+1}(s)
        nxt = _log_add(inc, jnp.concatenate(
            [inc[:, 1:], jnp.full((B, 1), _NEG_INF)], axis=1))
        skip = jnp.concatenate(
            [inc[:, 2:], jnp.full((B, 2), _NEG_INF)], axis=1)
        skip_from = jnp.concatenate(
            [skip_ok[:, 2:], jnp.zeros((B, 2), bool)], axis=1)
        nxt = jnp.where(skip_from, _log_add(nxt, skip), nxt)
        return nxt, nxt

    _, betas = jax.lax.scan(step, bT, em[1:][::-1])
    return jnp.concatenate([betas[::-1], bT[None]], axis=0)


def _forward(logits, logit_len, labels, label_len, blank):
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    ext = _extended_labels(labels, blank)
    em = _emission_logprobs(log_probs, ext, logit_len, blank)
    skip_ok = _transition_masks(ext, blank)
    alphas = _alpha_scan(em, skip_ok)

    B, S = ext.shape
    rows = jnp.arange(B)
    last = alphas[-1]                               # [B, S]
    end = 2 * label_len                             # blank after last label
    ll = _log_add(last[rows, end],
                  jnp.where(label_len > 0, last[rows, jnp.maximum(end - 1, 0)],
                            _NEG_INF))
    return -ll, (log_probs, ext, em, skip_ok, alphas, ll)


@jax.custom_vjp
def ctc_loss(logits, logit_len, labels, label_len, blank=0):
    """Per-sample CTC negative log-likelihood.

    Args:
      logits: ``[B, T, V]`` unnormalised scores.
      logit_len: ``[B]`` true frame counts (<= T).
      labels: ``[B, U]`` 1-based ids, 0-padded.
      label_len: ``[B]`` true label counts (<= U).
      blank: blank id (0 everywhere in this framework).

    Returns ``[B]`` losses; impossible alignments (label_len >
    logit_len after collapsing) yield a large finite value (~1e30 scale
    clipped by the -inf floor), matching ``zero_infinity``-style safety
    when combined with :func:`normalized_ctc_loss`.
    """
    loss, _ = _forward(logits, logit_len, labels, label_len, blank)
    return loss


def _fwd(logits, logit_len, labels, label_len, blank):
    loss, res = _forward(logits, logit_len, labels, label_len, blank)
    return loss, (res, logits, logit_len, label_len, blank)


def _bwd(saved, g):
    (log_probs, ext, em, skip_ok, alphas, ll), logits, logit_len, label_len, blank = saved
    T, B, S = em.shape
    V = log_probs.shape[-1]

    final_states = jnp.zeros((B, S), bool)
    rows = jnp.arange(B)
    end = 2 * label_len
    final_states = final_states.at[rows, end].set(True)
    final_states = final_states.at[rows, jnp.maximum(end - 1, 0)].set(
        (label_len > 0) & True)

    betas = _beta_scan(em, skip_ok, final_states)
    # alignment posteriors gamma [T, B, S]
    gamma = jnp.exp(alphas + betas - ll[None, :, None])
    # fold state posteriors into vocab slots: [B, T, S] x [B, S, V] matmul
    onehot = jax.nn.one_hot(ext, V, dtype=gamma.dtype)          # [B, S, V]
    post_v = jnp.einsum('tbs,bsv->btv', gamma, onehot)           # [B, T, V]
    # d(-ll)/dlogits = softmax - posterior, zeroed on padded frames
    dlogits = jnp.exp(log_probs) * post_v.sum(-1, keepdims=True) - post_v
    pad = jnp.arange(T)[None, :, None] >= logit_len[:, None, None]
    dlogits = jnp.where(pad, 0.0, dlogits) * g[:, None, None]
    return dlogits.astype(logits.dtype), None, None, None, None


ctc_loss.defvjp(_fwd, _bwd)


def ctc_alignment_posteriors(logits, logit_len, labels, label_len, blank=0):
    """Per-frame label posteriors [B, T, V] (diagnostics / forced alignment)."""
    loss, (log_probs, ext, em, skip_ok, alphas, ll) = _forward(
        logits, logit_len, labels, label_len, blank)
    B, S = ext.shape
    rows = jnp.arange(B)
    end = 2 * label_len
    final_states = jnp.zeros((B, S), bool).at[rows, end].set(True)
    final_states = final_states.at[rows, jnp.maximum(end - 1, 0)].set(label_len > 0)
    betas = _beta_scan(em, skip_ok, final_states)
    gamma = jnp.exp(alphas + betas - ll[None, :, None])
    onehot = jax.nn.one_hot(ext, log_probs.shape[-1], dtype=gamma.dtype)
    return jnp.einsum('tbs,bsv->btv', gamma, onehot)


def normalized_ctc_loss(logits, logit_len, labels, label_len, blank=0,
                        zero_infinity=True):
    """Reference-normalised per-sample loss: nll / (logit_len + 1).

    Mirrors ``get_normalized_ctc_loss_without_reduce``
    (``training/tf/metrics/ctc.py:10-36``).  ``zero_infinity`` replaces
    impossible-alignment losses with 0 (torch ``trainer.py:39`` semantics);
    the TF backend would instead crash via ``check_numerics``.
    """
    loss = ctc_loss(logits, logit_len, labels, label_len, blank)
    loss = loss / (logit_len + 1).astype(loss.dtype)
    if zero_infinity:
        loss = jnp.where(loss >= -_NEG_INF / 1e6, 0.0, loss)
    return loss

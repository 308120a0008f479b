"""Batched Levenshtein distance on TPU (fully vectorised DP).

TPU-native replacement for the reference's native edit-distance kernels
(``tf.edit_distance`` at ``training/tf/metrics/ler.py:22-27``;
``torch_edit_distance.compute_wer`` CUDA at ``training/torch/trainer.py:245``).

The DP runs as a ``lax.scan`` over hypothesis tokens (rows).  The
within-row dependency (insertions) is the min-plus prefix recurrence
``C[j] = min_k<=j (B[k] + (j-k))``, solved in O(log N) depth with an
associative ``cummin`` over ``B[k]-k`` — so each row is one vectorised VPU
pass over the whole batch instead of a serial inner loop.  Sequences are
0-padded; true lengths are passed explicitly and rows past ``hyp_len``
are carried unchanged so every shape stays static.
"""

import jax
import jax.numpy as jnp

__all__ = ['edit_distance', 'error_rate']

_BIG = jnp.float32(1e9)


def edit_distance(hyp, hyp_len, ref, ref_len):
    """Levenshtein distance between 0-padded id sequences.

    Args:
      hyp: ``[B, M]`` int ids.
      hyp_len: ``[B]`` true hypothesis lengths.
      ref: ``[B, N]`` int ids.
      ref_len: ``[B]`` true reference lengths.

    Returns ``[B]`` float32 distances.
    """
    hyp = jnp.asarray(hyp)
    ref = jnp.asarray(ref)
    B, M = hyp.shape
    N = ref.shape[1]
    cols = jnp.arange(N + 1, dtype=jnp.float32)

    row0 = jnp.broadcast_to(cols, (B, N + 1))  # D[0][j] = j

    def step(prev, i):
        # substitution cost against ref[j-1] for j in 1..N
        sub = (hyp[:, i - 1, None] != ref).astype(jnp.float32)
        # B[j] = min(del, sub) for j>=1; B[0] = i (all-deletions base)
        cand = jnp.minimum(prev[:, 1:] + 1.0, prev[:, :-1] + sub)
        base = jnp.full((B, 1), i, jnp.float32)
        b_row = jnp.concatenate([base, cand], axis=1)
        # C[j] = min_k<=j B[k] + (j - k)  — cummin over (B[k] - k) plus j
        run = jax.lax.associative_scan(jnp.minimum, b_row - cols, axis=1)
        cur = run + cols
        # freeze rows past the true hypothesis length
        cur = jnp.where((i <= hyp_len)[:, None], cur, prev)
        return cur, None

    last, _ = jax.lax.scan(step, row0, jnp.arange(1, M + 1))
    return jnp.take_along_axis(last, ref_len[:, None].astype(jnp.int32), axis=1)[:, 0]


def error_rate(hyp, hyp_len, ref, ref_len):
    """Per-sample edit distance / reference length (PER/LER/WER numerically).

    Matches the reference's ratio convention: numerator = raw distance,
    denominator = reference token count (``metrics/ler.py:29-33``).
    """
    d = edit_distance(hyp, hyp_len, ref, ref_len)
    return d / jnp.maximum(ref_len.astype(d.dtype), 1.0)

"""On-device CTC decoders: greedy and batched merged-prefix beam search.

TPU-native replacement for the reference's native decoders
(``tf.nn.ctc_greedy_decoder`` / ``tf.nn.ctc_beam_search_decoder`` at
``training/tf/metrics/ctc.py:76-89``; ``ctcdecode.CTCBeamDecoder`` C++ at
``training/torch/trainer.py:71``).

Both decoders work natively with ``blank = 0`` — the reference's
roll-blank-to-last dance (``metrics/ctc.py:61-100``) is unnecessary here.
Everything is fixed-shape and jit/vmap-safe:

  - **Greedy**: per-frame argmax → collapse repeats → drop blanks →
    left-compact via a stable sort (pure XLA, no host round-trip).
  - **Beam search**: the standard prefix beam search *with full prefix
    merging*.  Prefixes are identified by a pair of 32-bit rolling hashes;
    per step the ``W + W*(V-1)`` candidates are sorted by hash and equal
    prefixes are log-sum-exp-merged before the top-W cut, which reproduces
    the merging semantics of TF's C++ decoder with static shapes.
"""

import functools

import jax
import jax.numpy as jnp

__all__ = ['greedy_decode', 'beam_search_decode']

_NEG_INF = -1e30

# rolling-hash multipliers (odd constants; two independent 32-bit streams)
_H1_MULT = jnp.uint32(2654435761)
_H2_MULT = jnp.uint32(0x9E3779B1)


def _log_add(a, b):
    mx = jnp.maximum(a, b)
    mx = jnp.where(mx <= _NEG_INF, 0.0, mx)
    return mx + jnp.log(jnp.exp(a - mx) + jnp.exp(b - mx))


def _left_compact(values, keep):
    """Move kept entries left (stable), zero the rest. [L] -> [L]."""
    L = values.shape[0]
    order = jnp.argsort(~keep, stable=True)
    packed = jnp.where(jnp.sort(~keep, stable=True), 0, values[order])
    return packed, keep.sum().astype(jnp.int32)


def greedy_decode(logits, logit_len, blank=0):
    """[B, T, V] logits -> ([B, T] 0-padded label ids, [B] lengths)."""
    ids = jnp.argmax(logits, axis=-1).astype(jnp.int32)      # [B, T]
    T = ids.shape[1]
    valid = jnp.arange(T)[None, :] < logit_len[:, None]
    prev = jnp.concatenate([jnp.full_like(ids[:, :1], -1), ids[:, :-1]], axis=1)
    keep = (ids != blank) & (ids != prev) & valid

    def per_row(v, k):
        return _left_compact(v, k)

    out, lens = jax.vmap(per_row)(ids, keep)
    return out, lens


@functools.partial(jax.jit, static_argnames=('beam_width', 'max_len', 'blank'))
def beam_search_decode(logits, logit_len, beam_width=12, max_len=None, blank=0):
    """Merged-prefix CTC beam search; returns (top prefix [B, U], lengths [B]).

    ``max_len`` caps stored prefix length (defaults to T).  Scores follow
    the standard p_blank/p_nonblank decomposition; ties and merges match
    the canonical prefix-beam-search algorithm used by the reference's
    decoders (beam_width=12 in the trainer, ``tf/trainer.py:102``).
    """
    B, T, V = logits.shape
    U = max_len or T
    W = beam_width
    log_probs = jax.nn.log_softmax(logits, axis=-1)

    def decode_one(lp, length):
        # beam state
        prefixes = jnp.zeros((W, U), jnp.int32)
        lens = jnp.zeros((W,), jnp.int32)
        last = jnp.full((W,), -1, jnp.int32)
        h1 = jnp.zeros((W,), jnp.uint32)
        h2 = jnp.zeros((W,), jnp.uint32)
        p_b = jnp.full((W,), _NEG_INF).at[0].set(0.0)   # empty prefix, blank
        p_nb = jnp.full((W,), _NEG_INF)

        chars = jnp.arange(1, V, dtype=jnp.int32)        # non-blank chars

        def step(state, inp):
            prefixes, lens, last, h1, h2, p_b, p_nb = state
            lp_t, t = inp

            lp_blank = lp_t[blank]
            lp_last = jnp.where(last >= 0, lp_t[jnp.maximum(last, 0)], _NEG_INF)

            # stay candidates (same prefix): blank emission + repeat emission
            stay_pb = _log_add(p_b, p_nb) + lp_blank
            stay_pnb = p_nb + lp_last

            # extend candidates: [W, V-1]
            lp_c = lp_t[1:][None, :]                            # [1, V-1]
            from_pb = p_b[:, None]
            from_any = _log_add(p_b, p_nb)[:, None]
            ext_pnb = lp_c + jnp.where(chars[None, :] == last[:, None],
                                       from_pb, from_any)
            ext_h1 = h1[:, None] * _H1_MULT + chars[None, :].astype(jnp.uint32)
            ext_h2 = h2[:, None] * _H2_MULT + chars[None, :].astype(jnp.uint32)

            # flatten candidates: first W stays, then W*(V-1) extends
            cand_pb = jnp.concatenate([stay_pb, jnp.full((W * (V - 1),), _NEG_INF)])
            cand_pnb = jnp.concatenate([stay_pnb, ext_pnb.reshape(-1)])
            cand_h1 = jnp.concatenate([h1, ext_h1.reshape(-1)])
            cand_h2 = jnp.concatenate([h2, ext_h2.reshape(-1)])
            cand_parent = jnp.concatenate([
                jnp.arange(W, dtype=jnp.int32),
                jnp.repeat(jnp.arange(W, dtype=jnp.int32), V - 1)])
            cand_char = jnp.concatenate([
                jnp.full((W,), -1, jnp.int32),
                jnp.tile(chars, W)])

            # merge identical prefixes: one multi-operand lexsort by
            # (h1, h2) carrying the probabilities and the candidate index
            # as payload.  A single sort op (vs two chained stable argsorts
            # + gathers) compiles ~5x faster and runs leaner; stability is
            # unnecessary — any element of an equal-hash run reconstructs
            # the same prefix.
            idx = jnp.arange(cand_h1.shape[0], dtype=jnp.int32)
            s_h1, s_h2, s_pb, s_pnb, order = jax.lax.sort(
                (cand_h1, cand_h2, cand_pb, cand_pnb, idx), num_keys=2)
            same = jnp.concatenate([
                jnp.array([False]),
                (s_h1[1:] == s_h1[:-1]) & (s_h2[1:] == s_h2[:-1])])
            # segment logsumexp via an associative segmented scan (O(log N)
            # depth on the VPU instead of a sequential loop):
            # element = (pb, pnb, is_segment_start); the combine keeps the
            # right value when the right element starts a new segment.
            starts = ~same

            def seg_op(left, right):
                lpb, lpnb, lst = left
                rpb, rpnb, rst = right
                return (jnp.where(rst, rpb, _log_add(lpb, rpb)),
                        jnp.where(rst, rpnb, _log_add(lpnb, rpnb)),
                        lst | rst)

            run_pb, run_pnb, _ = jax.lax.associative_scan(
                seg_op, (s_pb, s_pnb, starts))
            # run totals live at the LAST element of each run
            is_last = jnp.concatenate([~same[1:], jnp.array([True])])
            tot = _log_add(run_pb, run_pnb)
            score = jnp.where(is_last, tot, _NEG_INF)

            top_score, top_idx = jax.lax.top_k(score, W)
            sel = order[top_idx]
            # slots below the number of live runs pick score=-inf filler
            # rows; their (partial-run) probabilities must be masked out or
            # they would duplicate mass of a surviving prefix.
            alive = top_score > _NEG_INF / 2
            new_pb = jnp.where(alive, run_pb[top_idx], _NEG_INF)
            new_pnb = jnp.where(alive, run_pnb[top_idx], _NEG_INF)
            new_h1 = cand_h1[sel]
            new_h2 = cand_h2[sel]
            parent = cand_parent[sel]
            char = cand_char[sel]

            new_prefixes = prefixes[parent]
            new_lens = lens[parent]
            new_last = last[parent]
            is_ext = char >= 0
            pos = jnp.minimum(new_lens, U - 1)
            appended = new_prefixes.at[jnp.arange(W), pos].set(
                jnp.where(is_ext, char, new_prefixes[jnp.arange(W), pos]))
            new_prefixes = jnp.where(is_ext[:, None], appended, new_prefixes)
            new_lens = jnp.where(is_ext, jnp.minimum(new_lens + 1, U), new_lens)
            new_last = jnp.where(is_ext, char, new_last)

            new_state = (new_prefixes, new_lens, new_last, new_h1, new_h2,
                         new_pb, new_pnb)
            # freeze past the true length
            frozen = jax.tree_util.tree_map(
                lambda new, old: jnp.where(
                    jnp.reshape(t < length, (-1,) + (1,) * (new.ndim - 1)),
                    new, old),
                new_state, state)
            return frozen, None

        init = (prefixes, lens, last, h1, h2, p_b, p_nb)
        (prefixes, lens, last, h1, h2, p_b, p_nb), _ = jax.lax.scan(
            step, init, (lp, jnp.arange(T)))
        best = jnp.argmax(_log_add(p_b, p_nb))
        return prefixes[best], lens[best]

    return jax.vmap(decode_one)(log_probs, logit_len)

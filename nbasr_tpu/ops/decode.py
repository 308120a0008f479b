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

    Design (TPU): the scan carries only O(W) scalars per beam — no prefix
    arrays.  Prefix merging exploits structure instead of sorting all
    ``W·V`` candidates: beam entries are pairwise-distinct prefixes, so
    extends are pairwise distinct and the *only* possible collision is
    ``extend(w, c) == stay(w')`` with ``prefix_w' = prefix_w + c``.  Those
    are found with an O(W²) parent-hash match (each entry carries the hash
    of its prefix *minus its last char*), merged into the stay, and the
    matched extends masked out — then a single ``top_k`` replaces the old
    5-operand lexsort + segmented scan (~10× leaner per step, and the
    compile shrinks accordingly).  The winning prefix is reconstructed
    from per-step (parent, char) backpointers after the scan.
    """
    B, T, V = logits.shape
    U = max_len or T
    W = beam_width
    log_probs = jax.nn.log_softmax(logits, axis=-1)

    def decode_one(lp, length):
        # beam state: probabilities, last char, prefix hash, parent-prefix
        # hash (prefix minus last char) — two independent 32-bit streams
        last = jnp.full((W,), -1, jnp.int32)
        h1 = jnp.zeros((W,), jnp.uint32)
        h2 = jnp.zeros((W,), jnp.uint32)
        h1p = jnp.zeros((W,), jnp.uint32)
        h2p = jnp.zeros((W,), jnp.uint32)
        p_b = jnp.full((W,), _NEG_INF).at[0].set(0.0)   # empty prefix, blank
        p_nb = jnp.full((W,), _NEG_INF)

        chars = jnp.arange(1, V, dtype=jnp.int32)        # non-blank chars
        iw = jnp.arange(W, dtype=jnp.int32)

        def step(state, inp):
            last, h1, h2, h1p, h2p, p_b, p_nb = state
            lp_t, t = inp

            lp_blank = lp_t[blank]
            lp_last = jnp.where(last >= 0, lp_t[jnp.maximum(last, 0)], _NEG_INF)
            p_tot = _log_add(p_b, p_nb)

            # stay candidates (same prefix): blank emission + repeat emission
            stay_pb = p_tot + lp_blank
            stay_pnb = p_nb + lp_last

            # extend candidates [W, V-1]
            lp_c = lp_t[1:][None, :]
            ext_pnb = lp_c + jnp.where(chars[None, :] == last[:, None],
                                       p_b[:, None], p_tot[:, None])

            # --- merge extend(w, c) into stay(w') where prefix_w' ==
            # prefix_w + c: hash(prefix_w) must equal the parent hash of
            # w', and the extending char is last_w'.
            match = ((h1[:, None] == h1p[None, :])
                     & (h2[:, None] == h2p[None, :])
                     & (last[None, :] >= 0)
                     & (p_tot[:, None] > _NEG_INF / 2))       # [W ext, W stay]
            # ext_for_stay[w, w'] = ext_pnb[w, last_w' - 1], via a masked
            # max over the last-char one-hot — exact (no MXU rounding) and
            # free of take_along_axis's gather lowering; the [W, W, V-1]
            # intermediate is 7k elements
            last_onehot = (jnp.maximum(last, 0)[:, None] - 1
                           == jnp.arange(V - 1)[None, :])     # [W stay, V-1]
            ext_for_stay = jnp.max(
                jnp.where(last_onehot[None, :, :], ext_pnb[:, None, :],
                          _NEG_INF), axis=-1)                 # [W ext, W stay]
            oh = last_onehot.astype(jnp.float32)
            contrib = jnp.where(match, ext_for_stay, _NEG_INF)
            merged = jax.nn.logsumexp(contrib, axis=0)        # [W stay]
            stay_pnb = _log_add(stay_pnb, merged)
            # mask out merged extends: kill[w, c] = ∃w' matched with last=c+1
            kill = (match.astype(jnp.float32) @ oh) > 0.5     # [W ext, V-1]
            ext_pnb = jnp.where(kill, _NEG_INF, ext_pnb)

            # --- top-W over stays (fully merged) + extends (distinct)
            scores = jnp.concatenate([_log_add(stay_pb, stay_pnb),
                                      ext_pnb.reshape(-1)])
            top_score, top_idx = jax.lax.top_k(scores, W)
            alive = top_score > _NEG_INF / 2
            is_stay = top_idx < W
            w_sel = jnp.where(is_stay, top_idx, (top_idx - W) // (V - 1))
            c_sel = jnp.where(is_stay, -1, (top_idx - W) % (V - 1) + 1)
            cu = c_sel.astype(jnp.uint32)

            new_pb = jnp.where(alive & is_stay, stay_pb[w_sel], _NEG_INF)
            # an extend's total score IS its p_nb (no blank mass yet), so
            # top_score already holds it — no 588-element gather needed
            new_pnb = jnp.where(
                alive,
                jnp.where(is_stay, stay_pnb[w_sel], top_score),
                _NEG_INF)
            new_last = jnp.where(is_stay, last[w_sel], c_sel)
            new_h1 = jnp.where(is_stay, h1[w_sel], h1[w_sel] * _H1_MULT + cu)
            new_h2 = jnp.where(is_stay, h2[w_sel], h2[w_sel] * _H2_MULT + cu)
            new_h1p = jnp.where(is_stay, h1p[w_sel], h1[w_sel])
            new_h2p = jnp.where(is_stay, h2p[w_sel], h2[w_sel])

            live = t < length
            new_state = (new_last, new_h1, new_h2, new_h1p, new_h2p,
                         new_pb, new_pnb)
            frozen = jax.tree_util.tree_map(
                lambda new, old: jnp.where(live, new, old), new_state, state)
            # backpointers: identity/no-emit on frozen steps
            bp_parent = jnp.where(live, w_sel, iw)
            bp_char = jnp.where(live, c_sel, -1)
            return frozen, (bp_parent, bp_char)

        init = (last, h1, h2, h1p, h2p, p_b, p_nb)
        (last, h1, h2, h1p, h2p, p_b, p_nb), (parents, cs) = jax.lax.scan(
            step, init, (lp, jnp.arange(T)))

        # --- reconstruct the winning prefix from backpointers (reverse walk)
        best = jnp.argmax(_log_add(p_b, p_nb)).astype(jnp.int32)

        def walk(idx, tb):
            par, ch = tb
            return par[idx], ch[idx]

        _, rev_chars = jax.lax.scan(walk, best, (parents, cs), reverse=True)
        # rev_chars[t] = char emitted at step t along the winning path
        out, n = _left_compact(rev_chars, rev_chars >= 1)
        return out[:U], jnp.minimum(n, U)

    return jax.vmap(decode_one)(log_probs, logit_len)

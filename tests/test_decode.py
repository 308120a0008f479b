"""Decoder + edit-distance tests: greedy against hand rules, beam search
against exhaustive enumeration, edit distance against a python DP oracle."""

import itertools

import numpy as np
import pytest
import jax.numpy as jnp

from nbasr_tpu.ops.decode import greedy_decode, beam_search_decode
from nbasr_tpu.ops.edit_distance import edit_distance, error_rate
from nbasr_tpu.ops.ctc import ctc_loss


def test_greedy_collapse_and_blank_removal():
    # frames argmax: [1 1 0 2 2 2 0 1] -> collapse -> 1 2 1
    V = 4
    path = [1, 1, 0, 2, 2, 2, 0, 1]
    logits = np.full((1, len(path), V), -10.0, np.float32)
    for t, c in enumerate(path):
        logits[0, t, c] = 10.0
    out, lens = greedy_decode(jnp.asarray(logits), jnp.asarray([len(path)]))
    assert lens[0] == 3
    assert out[0, :3].tolist() == [1, 2, 1]
    assert (np.asarray(out[0, 3:]) == 0).all()


def test_greedy_respects_length():
    path = [1, 0, 2, 2]
    logits = np.full((1, 4, 4), -10.0, np.float32)
    for t, c in enumerate(path):
        logits[0, t, c] = 10.0
    out, lens = greedy_decode(jnp.asarray(logits), jnp.asarray([2]))
    assert lens[0] == 1 and out[0, 0] == 1  # frames 2,3 ignored


def _brute_force_best(log_probs, T, V):
    """Exhaustive CTC decode: maximize sum-over-alignments likelihood."""
    best, best_p = (), -np.inf
    paths = {}
    for path in itertools.product(range(V), repeat=T):
        # collapse to labeling
        lab = []
        prev = -1
        for c in path:
            if c != 0 and c != prev:
                lab.append(c)
            prev = c
        p = sum(log_probs[t, c] for t, c in enumerate(path))
        key = tuple(lab)
        paths[key] = np.logaddexp(paths.get(key, -np.inf), p)
    for key, p in paths.items():
        if p > best_p:
            best, best_p = key, p
    return list(best), best_p


@pytest.mark.parametrize('seed', [0, 1, 2, 3])
def test_beam_search_exact_on_tiny_problems(seed):
    """With a wide beam, merged-prefix beam search must equal exhaustive search."""
    T, V = 5, 3
    rng = np.random.RandomState(seed)
    logits = rng.randn(1, T, V).astype(np.float32) * 1.5
    lp = np.asarray(jnp.asarray(logits[0]) - jnp.log(jnp.exp(jnp.asarray(logits[0])).sum(-1, keepdims=True)))
    expect, _ = _brute_force_best(lp, T, V)
    out, lens = beam_search_decode(jnp.asarray(logits), jnp.asarray([T]),
                                   beam_width=16)
    got = out[0, :int(lens[0])].tolist()
    assert got == expect, (got, expect)


def test_beam_search_merging_matters():
    """A case where two beams reach the same prefix: [a blank a] vs [a a].

    Without merging, the greedy-best path can win over the true best
    labeling; the merged decoder must pick the labeling with the higher
    *summed* probability.
    """
    # construct: p(a)=0.4, p(blank)=0.35, p(b)=0.25 at every of 2 frames
    # labelings: 'a' = aa + a_ + _a = .16+.14+.14=.44 ; 'b' similar lower;
    # 'ab','ba','' etc. Best = 'a'.
    p = np.array([[0.4, 0.35, 0.25]] * 2, np.float32)  # [T=2, V] with a=1? order: [a, blank, b]?
    # put blank at index 0: [blank, a, b]
    probs = np.array([[0.35, 0.4, 0.25]] * 2, np.float32)
    logits = np.log(probs)[None]
    out, lens = beam_search_decode(jnp.asarray(logits), jnp.asarray([2]),
                                   beam_width=8)
    assert out[0, :int(lens[0])].tolist() == [1]


def test_beam_search_batch_and_lengths():
    rng = np.random.RandomState(5)
    logits = rng.randn(3, 10, 5).astype(np.float32)
    out, lens = beam_search_decode(jnp.asarray(logits), jnp.asarray([10, 4, 7]),
                                   beam_width=6)
    assert out.shape[0] == 3
    # decoding a prefix of frames = decoding with shorter logit_len
    out2, lens2 = beam_search_decode(jnp.asarray(logits[1:2, :4]),
                                     jnp.asarray([4]), beam_width=6)
    assert out[1, :int(lens[1])].tolist() == out2[0, :int(lens2[0])].tolist()


def test_beam_top1_at_least_as_likely_as_greedy():
    """Beam top-1 labeling likelihood >= greedy labeling likelihood."""
    rng = np.random.RandomState(7)
    B, T, V = 4, 12, 6
    logits = rng.randn(B, T, V).astype(np.float32)
    ll = jnp.asarray([T] * B, jnp.int32)
    g_out, g_len = greedy_decode(jnp.asarray(logits), ll)
    b_out, b_len = beam_search_decode(jnp.asarray(logits), ll, beam_width=12)
    U = max(int(g_out.shape[1]), int(b_out.shape[1]))
    def nll(lab, lab_len):
        lab = jnp.asarray(np.pad(np.asarray(lab), ((0, 0), (0, U - lab.shape[1]))))
        return np.asarray(ctc_loss(jnp.asarray(logits), ll, lab, lab_len))
    nll_g = nll(g_out, g_len)
    nll_b = nll(b_out, b_len)
    assert (nll_b <= nll_g + 1e-4).all()


def _py_edit_distance(a, b):
    m, n = len(a), len(b)
    D = np.zeros((m + 1, n + 1))
    D[:, 0] = np.arange(m + 1)
    D[0, :] = np.arange(n + 1)
    for i in range(1, m + 1):
        for j in range(1, n + 1):
            D[i, j] = min(D[i - 1, j] + 1, D[i, j - 1] + 1,
                          D[i - 1, j - 1] + (a[i - 1] != b[j - 1]))
    return D[m, n]


@pytest.mark.parametrize('seed', [0, 1, 2])
def test_edit_distance_matches_python_dp(seed):
    rng = np.random.RandomState(seed)
    B, M, N = 6, 12, 10
    hyp = rng.randint(1, 6, size=(B, M)).astype(np.int32)
    ref = rng.randint(1, 6, size=(B, N)).astype(np.int32)
    hyp_len = rng.randint(0, M + 1, size=B).astype(np.int32)
    ref_len = rng.randint(1, N + 1, size=B).astype(np.int32)
    ours = np.asarray(edit_distance(jnp.asarray(hyp), jnp.asarray(hyp_len),
                                    jnp.asarray(ref), jnp.asarray(ref_len)))
    for b in range(B):
        expect = _py_edit_distance(hyp[b, :hyp_len[b]].tolist(),
                                   ref[b, :ref_len[b]].tolist())
        assert ours[b] == expect, (b, ours[b], expect)


def test_edit_distance_identical_and_empty():
    hyp = np.array([[1, 2, 3, 0]], np.int32)
    ref = np.array([[1, 2, 3]], np.int32)
    assert edit_distance(jnp.asarray(hyp), jnp.asarray([3]),
                         jnp.asarray(ref), jnp.asarray([3]))[0] == 0
    assert edit_distance(jnp.asarray(hyp), jnp.asarray([0]),
                         jnp.asarray(ref), jnp.asarray([3]))[0] == 3


def test_error_rate():
    hyp = np.array([[1, 2, 0]], np.int32)
    ref = np.array([[1, 3, 4, 5]], np.int32)
    per = np.asarray(error_rate(jnp.asarray(hyp), jnp.asarray([2]),
                                jnp.asarray(ref), jnp.asarray([4])))
    assert per[0] == pytest.approx(3 / 4)  # 1 sub + 2 del

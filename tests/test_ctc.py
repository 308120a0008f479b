"""CTC loss tests against torch.nn.functional.ctc_loss as an oracle,
plus gradient checks and edge cases."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from nbasr_tpu.ops.ctc import (
    ctc_loss, normalized_ctc_loss, ctc_alignment_posteriors,
)


def _random_case(B, T, U, V, seed=0, tight=False):
    rng = np.random.RandomState(seed)
    logits = rng.randn(B, T, V).astype(np.float32) * 2.0
    logit_len = rng.randint(max(T // 2, 1), T + 1, size=B).astype(np.int32)
    if tight:
        logit_len[:] = T
    labels = np.zeros((B, U), np.int32)
    label_len = np.zeros((B,), np.int32)
    for b in range(B):
        n = rng.randint(1, U + 1)
        # keep alignments feasible: n <= logit_len (collapsed repeats need more)
        n = min(n, logit_len[b] // 2)
        n = max(n, 1)
        labels[b, :n] = rng.randint(1, V, size=n)
        label_len[b] = n
    return logits, logit_len, labels, label_len


def _torch_ctc(logits, logit_len, labels, label_len):
    import torch
    lp = torch.from_numpy(logits).log_softmax(-1).transpose(0, 1)  # [T, B, V]
    return torch.nn.functional.ctc_loss(
        lp, torch.from_numpy(labels), torch.from_numpy(logit_len),
        torch.from_numpy(label_len), blank=0, reduction='none',
        zero_infinity=False).numpy()


@pytest.mark.parametrize('seed', [0, 1, 2])
def test_loss_matches_torch(seed):
    logits, logit_len, labels, label_len = _random_case(5, 20, 7, 10, seed)
    ours = np.asarray(ctc_loss(jnp.asarray(logits), jnp.asarray(logit_len),
                               jnp.asarray(labels), jnp.asarray(label_len)))
    theirs = _torch_ctc(logits, logit_len, labels, label_len)
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


def test_loss_matches_torch_repeated_labels():
    rng = np.random.RandomState(3)
    B, T, V = 4, 30, 6
    logits = rng.randn(B, T, V).astype(np.float32)
    labels = np.array([[1, 1, 2, 2, 1, 0, 0],
                       [3, 3, 3, 3, 3, 3, 3],
                       [1, 2, 1, 2, 1, 2, 0],
                       [5, 5, 0, 0, 0, 0, 0]], np.int32)
    label_len = np.array([5, 7, 6, 2], np.int32)
    logit_len = np.array([30, 30, 25, 18], np.int32)
    ours = np.asarray(ctc_loss(jnp.asarray(logits), jnp.asarray(logit_len),
                               jnp.asarray(labels), jnp.asarray(label_len)))
    theirs = _torch_ctc(logits, logit_len, labels, label_len)
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


def test_gradient_matches_torch():
    import torch
    logits, logit_len, labels, label_len = _random_case(3, 15, 5, 8, seed=4)

    def loss_fn(lg):
        return ctc_loss(lg, jnp.asarray(logit_len), jnp.asarray(labels),
                        jnp.asarray(label_len)).sum()

    ours = np.asarray(jax.grad(loss_fn)(jnp.asarray(logits)))

    tl = torch.from_numpy(logits).requires_grad_(True)
    lp = tl.log_softmax(-1).transpose(0, 1)
    loss = torch.nn.functional.ctc_loss(
        lp, torch.from_numpy(labels), torch.from_numpy(logit_len),
        torch.from_numpy(label_len), blank=0, reduction='sum',
        zero_infinity=False)
    loss.backward()
    np.testing.assert_allclose(ours, tl.grad.numpy(), rtol=1e-3, atol=1e-4)


def test_gradient_zero_on_padded_frames():
    logits, logit_len, labels, label_len = _random_case(3, 12, 4, 6, seed=5)
    logit_len[:] = [8, 12, 6]
    g = np.asarray(jax.grad(lambda lg: ctc_loss(
        lg, jnp.asarray(logit_len), jnp.asarray(labels),
        jnp.asarray(label_len)).sum())(jnp.asarray(logits)))
    assert np.allclose(g[0, 8:], 0) and np.allclose(g[2, 6:], 0)
    assert not np.allclose(g[1, 11], 0)


def test_gradient_vs_finite_differences():
    logits, logit_len, labels, label_len = _random_case(2, 8, 3, 5, seed=6, tight=True)
    f = lambda lg: float(ctc_loss(jnp.asarray(lg), jnp.asarray(logit_len),
                                  jnp.asarray(labels), jnp.asarray(label_len)).sum())
    g = np.asarray(jax.grad(lambda lg: ctc_loss(
        lg, jnp.asarray(logit_len), jnp.asarray(labels),
        jnp.asarray(label_len)).sum())(jnp.asarray(logits)))
    rng = np.random.RandomState(0)
    for _ in range(5):
        b, t, v = rng.randint(2), rng.randint(8), rng.randint(5)
        eps = 1e-3
        lp = logits.copy(); lp[b, t, v] += eps
        lm = logits.copy(); lm[b, t, v] -= eps
        fd = (f(lp) - f(lm)) / (2 * eps)
        assert abs(fd - g[b, t, v]) < 5e-3, (b, t, v, fd, g[b, t, v])


def test_single_label_certain_path():
    """T=1, one label, near-deterministic logits -> loss ~ -log p(label)."""
    V = 5
    logits = np.full((1, 1, V), -20.0, np.float32)
    logits[0, 0, 2] = 20.0
    loss = np.asarray(ctc_loss(jnp.asarray(logits), jnp.asarray([1]),
                               jnp.asarray([[2]]), jnp.asarray([1])))
    assert loss[0] < 1e-3


def test_empty_label_sequence():
    """label_len=0: loss = -sum log p(blank)."""
    rng = np.random.RandomState(7)
    logits = rng.randn(2, 6, 4).astype(np.float32)
    lp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), axis=-1))
    loss = np.asarray(ctc_loss(jnp.asarray(logits), jnp.asarray([6, 4]),
                               jnp.asarray(np.zeros((2, 3), np.int32)),
                               jnp.asarray([0, 0])))
    np.testing.assert_allclose(loss[0], -lp[0, :, 0].sum(), rtol=1e-4)
    np.testing.assert_allclose(loss[1], -lp[1, :4, 0].sum(), rtol=1e-4)


def test_impossible_alignment_zeroed_by_normalized_loss():
    logits = np.random.RandomState(8).randn(1, 3, 5).astype(np.float32)
    labels = np.array([[1, 2, 3, 4]], np.int32)  # needs >= 4 frames
    nl = np.asarray(normalized_ctc_loss(
        jnp.asarray(logits), jnp.asarray([3]), jnp.asarray(labels),
        jnp.asarray([4])))
    assert nl[0] == 0.0


def test_normalization_matches_reference_rule():
    logits, logit_len, labels, label_len = _random_case(4, 10, 3, 6, seed=9)
    base = np.asarray(ctc_loss(jnp.asarray(logits), jnp.asarray(logit_len),
                               jnp.asarray(labels), jnp.asarray(label_len)))
    norm = np.asarray(normalized_ctc_loss(
        jnp.asarray(logits), jnp.asarray(logit_len), jnp.asarray(labels),
        jnp.asarray(label_len)))
    np.testing.assert_allclose(norm, base / (logit_len + 1), rtol=1e-6)


def test_posteriors_sum_to_one_on_valid_frames():
    logits, logit_len, labels, label_len = _random_case(3, 12, 4, 7, seed=10)
    post = np.asarray(ctc_alignment_posteriors(
        jnp.asarray(logits), jnp.asarray(logit_len), jnp.asarray(labels),
        jnp.asarray(label_len)))
    for b in range(3):
        s = post[b, :logit_len[b]].sum(-1)
        np.testing.assert_allclose(s, 1.0, rtol=1e-4)


def test_jit_and_vmap_compose():
    logits, logit_len, labels, label_len = _random_case(4, 10, 3, 6, seed=11)
    f = jax.jit(ctc_loss)
    a = np.asarray(f(jnp.asarray(logits), jnp.asarray(logit_len),
                     jnp.asarray(labels), jnp.asarray(label_len)))
    b = np.asarray(ctc_loss(jnp.asarray(logits), jnp.asarray(logit_len),
                            jnp.asarray(labels), jnp.asarray(label_len)))
    np.testing.assert_allclose(a, b, rtol=1e-6)

"""Pallas CTC kernels (interpret mode) vs the XLA scan implementation."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from nbasr_tpu.ops import ctc as ctc_xla
from nbasr_tpu.ops.ctc_pallas import (
    alpha_scan_pallas, beta_scan_pallas, ctc_loss_pallas,
)


def _case(B=4, T=12, U=4, V=7, seed=0):
    rng = np.random.RandomState(seed)
    logits = jnp.asarray(rng.randn(B, T, V).astype(np.float32))
    logit_len = jnp.asarray(rng.randint(T // 2, T + 1, size=B), jnp.int32)
    labels = jnp.asarray(rng.randint(1, V, size=(B, U)), jnp.int32)
    label_len = jnp.asarray(rng.randint(1, U + 1, size=B), jnp.int32)
    return logits, logit_len, labels, label_len


@pytest.mark.parametrize('seed', [0, 1])
def test_loss_matches_xla(seed):
    logits, ll, labels, ul = _case(seed=seed)
    ours = np.asarray(ctc_loss_pallas(logits, ll, labels, ul, interpret=True))
    ref = np.asarray(ctc_xla.ctc_loss(logits, ll, labels, ul))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_alpha_stack_matches_xla():
    logits, ll, labels, ul = _case(seed=2)
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    ext = ctc_xla._extended_labels(labels, 0)
    em = ctc_xla._emission_logprobs(log_probs, ext, ll, 0)
    skip = ctc_xla._transition_masks(ext, 0)
    ours = np.asarray(alpha_scan_pallas(em, skip, interpret=True))
    ref = np.asarray(ctc_xla._alpha_scan(em, skip))
    finite = ref > -1e29
    np.testing.assert_allclose(ours[finite], ref[finite], rtol=1e-5, atol=1e-4)


def test_beta_stack_matches_xla():
    logits, ll, labels, ul = _case(seed=3)
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    ext = ctc_xla._extended_labels(labels, 0)
    em = ctc_xla._emission_logprobs(log_probs, ext, ll, 0)
    skip = ctc_xla._transition_masks(ext, 0)
    B, S = ext.shape
    rows = jnp.arange(B)
    end = 2 * ul
    final = jnp.zeros((B, S), bool).at[rows, end].set(True)
    final = final.at[rows, jnp.maximum(end - 1, 0)].set(ul > 0)
    ours = np.asarray(beta_scan_pallas(em, skip, final, interpret=True))
    ref = np.asarray(ctc_xla._beta_scan(em, skip, final))
    finite = ref > -1e29
    np.testing.assert_allclose(ours[finite], ref[finite], rtol=1e-5, atol=1e-4)

"""FastLSTM tests: numerics vs a plain per-step numpy LSTM, unroll
invariance, and parameter-count parity with the Keras layout."""

import numpy as np
import jax
import jax.numpy as jnp

from nbasr_tpu.models.lstm import FastLSTM


def _np_lstm(x, kernel, recurrent, bias):
    B, T, F = x.shape
    H = recurrent.shape[0]
    c = np.zeros((B, H)); h = np.zeros((B, H))
    sig = lambda v: 1.0 / (1.0 + np.exp(-v))
    out = []
    for t in range(T):
        gates = x[:, t] @ kernel + h @ recurrent + bias
        i, f, g, o = np.split(gates, 4, axis=-1)
        c = sig(f) * c + sig(i) * np.tanh(g)
        h = sig(o) * np.tanh(c)
        out.append(h.copy())
    return np.stack(out, axis=1)


def test_matches_numpy_reference():
    rng = np.random.RandomState(0)
    B, T, F, H = 3, 11, 6, 5
    x = rng.randn(B, T, F).astype(np.float32)
    m = FastLSTM(H, unroll=4)
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    p = {k: np.asarray(a) for k, a in v['params'].items()}
    ours = np.asarray(m.apply(v, jnp.asarray(x)))
    ref = _np_lstm(x, p['kernel'], p['recurrent'], p['bias'])
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_unroll_invariance():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 13, 4).astype(np.float32))
    v = FastLSTM(8, unroll=1).init(jax.random.PRNGKey(0), x)
    y1 = FastLSTM(8, unroll=1).apply(v, x)
    y8 = FastLSTM(8, unroll=8).apply(v, x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y8), rtol=1e-6)


def test_param_count_and_forget_bias():
    F, H = 1200, 500
    m = FastLSTM(H)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, F)))
    n = sum(a.size for a in jax.tree_util.tree_leaves(v['params']))
    assert n == 4 * H * (F + H + 1) == 3402000  # Keras LSTM(500) on 1200
    bias = np.asarray(v['params']['bias'])
    assert (bias[H:2 * H] == 1.0).all() and bias[:H].sum() == 0.0

"""Streaming serving path (serving.py): chunked execution must reproduce
the offline model exactly — logits and greedy transcripts — including
ragged stream ends and the LSTM carry relay."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from nbasr_tpu.models.asr import ASRModel
from nbasr_tpu.ops.decode import greedy_decode
from nbasr_tpu.ops.frontend import FrontendConfig, log_mel_spectrogram, num_frames
from nbasr_tpu.serving import StreamingASR, StreamingGreedyDecoder

@pytest.fixture(autouse=True)
def _highest_precision():
    # XLA's CPU conv defaults to a low-precision path whose numerics differ
    # between the fused whole-graph compilation and op-by-op dispatch (up to
    # ~5e-3 at these shapes).  Streaming-vs-offline exactness is a statement
    # about *our* window/carry bookkeeping, not about XLA's conv algorithm
    # choice — pin full precision so both sides compute the same thing.
    with jax.default_matmul_precision('highest'):
        yield


ARCH = [[1, 0], [3, 0, 1], [2, 1, 0, 0]]

KW = dict(num_classes=8, dropout_rate=0.0, cell_dropout=0.0,
          block_kernels=(4, 4), block_strides=(1, 2),
          block_filters=(16, 24), cells_per_block=(1, 2), cell_groups=4)


def _model(use_rnn):
    return ASRModel.from_arch_vec(ARCH, use_rnn=use_rnn, rnn_units=12,
                                  init_scheme='scaled', **KW)


def _audio(B, n_samples, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randn(B, n_samples).astype(np.float32) * 0.1


def _offline_logits(model, variables, audio, valid_samples, s):
    """Offline apply on the streaming-canonical pad length Tp."""
    cfg = s.frontend
    feats = np.asarray(log_mel_spectrogram(jnp.asarray(audio), cfg))
    f_valid = np.asarray(num_frames(np.asarray(valid_samples), cfg))
    f_max = int(f_valid.max())
    tp = max(-(-f_max // s.C) * s.C, s.Wf)
    pad = tp - feats.shape[1]
    if pad > 0:
        feats = np.pad(feats, ((0, 0), (0, pad), (0, 0)))
    else:
        feats = feats[:, :tp]
    mask = np.arange(tp)[None, :] < f_valid[:, None]
    logits = model.apply(variables, jnp.asarray(feats),
                         mask=jnp.asarray(mask))
    return np.asarray(logits), f_valid


def _run_stream(s, audio, valid_samples, block=1111):
    """Push audio in uneven blocks; return concatenated logits."""
    B, S = audio.shape
    chunks = []
    for lo in range(0, S, block):
        hi = min(lo + block, S)
        n_valid = np.clip(np.asarray(valid_samples) - lo, 0, hi - lo)
        chunks += s.push(audio[:, lo:hi], n_valid)
    chunks += s.flush()
    return chunks


@pytest.mark.parametrize('use_rnn', [False, True])
def test_streaming_matches_offline(use_rnn):
    model = _model(use_rnn)
    B, S = 2, 16000
    audio = _audio(B, S)
    valid = np.array([S, S - 4000])
    cfg = FrontendConfig()
    feats = log_mel_spectrogram(jnp.asarray(audio), cfg)
    sizes = jnp.asarray(num_frames(valid, cfg))
    variables = model.init(jax.random.PRNGKey(0), feats, sizes)

    s = StreamingASR(model, variables, chunk_frames=24, batch_size=B)
    chunks = _run_stream(s, audio, valid)
    got = np.concatenate([np.asarray(lg) for lg, _ in chunks], axis=1)

    ref, f_valid = _offline_logits(model, variables, audio, valid, s)
    n = got.shape[1]
    assert n >= int(s.logit_lengths.max())
    np.testing.assert_allclose(got, ref[:, :n], rtol=2e-5, atol=2e-5)


def test_streaming_greedy_matches_offline():
    model = _model(True)
    B, S = 2, 12000
    audio = _audio(B, S, seed=1)
    valid = np.array([S, S - 3000])
    cfg = FrontendConfig()
    feats = log_mel_spectrogram(jnp.asarray(audio), cfg)
    sizes = jnp.asarray(num_frames(valid, cfg))
    variables = model.init(jax.random.PRNGKey(1), feats, sizes)

    s = StreamingASR(model, variables, chunk_frames=16, batch_size=B)
    dec = StreamingGreedyDecoder(B)
    for lg, vl in _run_stream(s, audio, valid, block=800):
        dec.push(lg, vl)

    ref, _ = _offline_logits(model, variables, audio, valid, s)
    lens = jnp.asarray(s.logit_lengths)
    ref_ids, ref_lens = greedy_decode(jnp.asarray(ref), lens)
    for b in range(B):
        want = list(np.asarray(ref_ids[b][:int(ref_lens[b])]))
        assert dec.tokens[b] == want


def test_chunk_frames_must_divide_reduction():
    model = _model(False)
    feats = jnp.zeros((1, 64, 80))
    variables = model.init(jax.random.PRNGKey(0), feats, jnp.asarray([64]))
    with pytest.raises(ValueError):
        StreamingASR(model, variables, chunk_frames=7, batch_size=1)


def test_latency_reporting():
    model = _model(False)
    feats = jnp.zeros((1, 64, 80))
    variables = model.init(jax.random.PRNGKey(0), feats, jnp.asarray([64]))
    s = StreamingASR(model, variables, chunk_frames=24, batch_size=1)
    assert s.latency_frames == s.hr + 24
    assert s.latency_seconds == pytest.approx(s.latency_frames * 0.010)


def test_streaming_int8_quantized():
    """StreamingASR(quantize=True): int8-resident serving tracks the f32
    stream within per-channel quantization error and matches the offline
    apply on the dequantized weights exactly (same chunk math)."""
    from nbasr_tpu.quant import dequantize_tree
    model = _model(True)
    B, S = 2, 12000
    audio = _audio(B, S)
    valid = np.array([S, S - 3000])
    cfg = FrontendConfig()
    feats = log_mel_spectrogram(jnp.asarray(audio), cfg)
    sizes = jnp.asarray(num_frames(valid, cfg))
    variables = model.init(jax.random.PRNGKey(0), feats, sizes)

    sq = StreamingASR(model, variables, chunk_frames=24, batch_size=B,
                      quantize=True)
    got = np.concatenate([np.asarray(lg) for lg, _ in
                          _run_stream(sq, audio, valid)], axis=1)

    # exactness vs the dequantized-weights stream (identical math path)
    deq_vars = {**{k: v for k, v in sq.variables.items() if k != '_qparams'},
                'params': dequantize_tree(sq.variables['_qparams'])}
    sd = StreamingASR(model, deq_vars, chunk_frames=24, batch_size=B)
    ref = np.concatenate([np.asarray(lg) for lg, _ in
                          _run_stream(sd, audio, valid)], axis=1)
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)

    # accuracy vs the unquantized stream: bounded by int8 kernel error
    s0 = StreamingASR(model, variables, chunk_frames=24, batch_size=B)
    full = np.concatenate([np.asarray(lg) for lg, _ in
                           _run_stream(s0, audio, valid)], axis=1)
    scale = np.abs(full).max()
    # random-init tiny channels quantize worst-case (~7% of range across
    # 10 layers + LSTM recurrence); the per-kernel bound lives in
    # test_quant, this guards end-to-end sanity
    assert np.abs(got - full).max() < 0.12 * scale

"""Native C++ runtime tests: build, then cross-check every entry point
against the python/JAX implementations."""

import numpy as np
import pytest
import jax.numpy as jnp

from nbasr_tpu import native


pytestmark = pytest.mark.skipif(not native.available(),
                                reason='native toolchain unavailable')


def test_parse_wav_riff_matches_python(tmp_path):
    from tests.test_pipeline import _write_riff
    from nbasr_tpu.data import read_wav
    audio = (np.sin(np.linspace(0, 300, 8000)) * 0.7).astype(np.float32)
    _write_riff(tmp_path / 'x.WAV', audio)
    data = (tmp_path / 'x.WAV').read_bytes()
    n_audio, n_rate = native.parse_wav(data)
    p_audio, p_rate = read_wav(tmp_path / 'x.WAV')
    assert n_rate == p_rate == 16000
    np.testing.assert_allclose(n_audio, p_audio, atol=1e-6)


def test_parse_wav_sphere_matches_python(tmp_path):
    from tests.test_pipeline import _write_sphere
    from nbasr_tpu.data import read_wav
    audio = (np.random.RandomState(0).randn(5000) * 0.2).astype(np.float32)
    _write_sphere(tmp_path / 'y.WAV', audio)
    data = (tmp_path / 'y.WAV').read_bytes()
    n_audio, n_rate = native.parse_wav(data)
    p_audio, p_rate = read_wav(tmp_path / 'y.WAV')
    assert n_rate == p_rate
    np.testing.assert_allclose(n_audio, p_audio, atol=1e-6)


def test_parse_wav_rejects_garbage():
    with pytest.raises(ValueError):
        native.parse_wav(b'this is not a wav file at all..')


def test_levenshtein_matches_jax_kernel():
    from nbasr_tpu.ops.edit_distance import edit_distance
    rng = np.random.RandomState(3)
    B, M, N = 8, 20, 16
    hyp = rng.randint(1, 6, size=(B, M)).astype(np.int32)
    ref = rng.randint(1, 6, size=(B, N)).astype(np.int32)
    hyp_len = rng.randint(0, M + 1, size=B).astype(np.int32)
    ref_len = rng.randint(1, N + 1, size=B).astype(np.int32)
    ours = native.levenshtein(hyp, hyp_len, ref, ref_len)
    theirs = np.asarray(edit_distance(jnp.asarray(hyp), jnp.asarray(hyp_len),
                                      jnp.asarray(ref), jnp.asarray(ref_len)))
    np.testing.assert_array_equal(ours, theirs)


def test_beam_search_matches_device_decoder():
    from nbasr_tpu.ops.decode import beam_search_decode
    rng = np.random.RandomState(4)
    B, T, V = 3, 12, 6
    logits = rng.randn(B, T, V).astype(np.float32)
    lp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    n_labels, n_lens = native.beam_search(lp, beam_width=8)
    d_labels, d_lens = beam_search_decode(jnp.asarray(logits),
                                          jnp.asarray([T] * B), beam_width=8)
    for b in range(B):
        assert n_labels[b, :n_lens[b]].tolist() == \
            np.asarray(d_labels[b, :int(d_lens[b])]).tolist()


def test_beam_search_single_utterance():
    lp = np.log(np.array([[0.35, 0.4, 0.25]] * 2, np.float32))
    labels, length = native.beam_search(lp, beam_width=4)
    assert labels[:length].tolist() == [1]

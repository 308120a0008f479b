"""Extended featurizer tests: dispatcher parity relationships, MFCC DCT
against scipy, inverse-STFT round trip."""

import numpy as np
import pytest
import jax.numpy as jnp

from nbasr_tpu.ops import frontend as fe


def _audio(n=8000, seed=0):
    rng = np.random.RandomState(seed)
    t = np.arange(n) / 16000.0
    return (0.5 * np.sin(2 * np.pi * 220 * t)
            + 0.1 * rng.randn(n)).astype(np.float32)


def test_dispatcher_types_and_relationships():
    x = _audio()
    cfg = fe.FrontendConfig()
    spec = np.asarray(fe.get_feature(x, cfg, 'spec'))
    mel = np.asarray(fe.get_feature(x, cfg, 'mel'))
    lmel = np.asarray(fe.get_feature(x, cfg, 'lmel'))
    pmel = np.asarray(fe.get_feature(x, cfg, 'pmel'))
    assert spec.shape[1] == 201 and mel.shape[1] == 80
    np.testing.assert_allclose(lmel, np.log(mel + 1e-10), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(pmel, mel ** (1 / 15), rtol=1e-4, atol=1e-5)
    with pytest.raises(NotImplementedError):
        fe.get_feature(x, cfg, 'nope')


def test_spec_db_range():
    db = np.asarray(fe.get_feature(_audio(), None, 'spec_dB'))
    assert (db >= 0).all() and (db <= 1).all()


def test_mfcc_matches_scipy_dct():
    from scipy.fftpack import dct as scipy_dct
    x = _audio(4000, seed=1)
    cfg = fe.FrontendConfig()
    lmel = np.asarray(fe.log_mel_spectrogram(x, cfg))
    ours = np.asarray(fe.mfcc(x, cfg, num_coeffs=13))
    ref = scipy_dct(lmel, type=2, norm='ortho', axis=-1)[:, :13]
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_inverse_stft_round_trip():
    """istft(stft(x)) reconstructs the interior of the signal."""
    x = _audio(4000, seed=2)
    cfg = fe.FrontendConfig()
    frames = fe.frame_signal(jnp.asarray(x), cfg.window, cfg.hop)
    w = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(cfg.window) / cfg.window)
    stft = jnp.fft.rfft(frames * w, n=cfg.fft_length, axis=-1)
    recon = np.asarray(fe.inverse_stft(stft, cfg, length=len(x)))
    # interior (edges lack full overlap coverage)
    lo, hi = cfg.window, len(recon) - cfg.window
    np.testing.assert_allclose(recon[lo:hi], x[lo:hi], atol=5e-3)

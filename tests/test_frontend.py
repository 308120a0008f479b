"""Audio frontend tests: against torch.stft as an independent oracle and
internal consistency between the FFT and MXU-matmul (DFT) paths."""

import numpy as np
import pytest

from nbasr_tpu.ops import frontend as fe


def _rand_audio(n, seed=0):
    rng = np.random.RandomState(seed)
    return (rng.randn(n) * 0.1).astype(np.float32)


def test_num_frames_matches_pad_end_false():
    cfg = fe.FrontendConfig()
    # pad_end=False: frames fit fully inside the signal
    assert fe.num_frames(400, cfg) == 1
    assert fe.num_frames(399, cfg) == 0
    assert fe.num_frames(400 + 160, cfg) == 2
    assert fe.num_frames(16000, cfg) == 98


def test_frame_signal_values():
    x = np.arange(1000, dtype=np.float32)
    frames = fe.frame_signal(x, 400, 160)
    assert frames.shape == (4, 400)
    assert frames[0, 0] == 0 and frames[1, 0] == 160 and frames[3, 399] == 3 * 160 + 399


def test_power_spectrum_matches_torch_stft():
    """STFT magnitude^2 vs torch.stft(center=False, hann periodic)."""
    import torch
    x = _rand_audio(16000)
    cfg = fe.FrontendConfig()
    ours = np.asarray(fe._power_spectrum(
        fe.frame_signal(x, cfg.window, cfg.hop), cfg))

    t = torch.stft(torch.from_numpy(x), n_fft=400, hop_length=160,
                   win_length=400, window=torch.hann_window(400, periodic=True),
                   center=False, onesided=True, return_complex=True)
    theirs = (t.abs() ** 2).numpy().T  # [frames, bins]
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-4)


def test_dft_path_matches_rfft_path():
    x = _rand_audio(8000, seed=1)
    lm_fft = np.asarray(fe.log_mel_spectrogram(x, fe.FrontendConfig(fft_mode='rfft')))
    lm_dft = np.asarray(fe.log_mel_spectrogram(x, fe.FrontendConfig(fft_mode='dft')))
    np.testing.assert_allclose(lm_fft, lm_dft, rtol=1e-3, atol=1e-3)


def test_mel_matrix_properties():
    m = fe.mel_weight_matrix()
    assert m.shape == (201, 80)
    assert (m >= 0).all()
    assert np.allclose(m[0], 0)           # DC bin zeroed (TF bands_to_zero=1)
    assert (m.sum(axis=0) > 0).all()      # every filter has support
    # triangle peaks move to higher bins monotonically
    peaks = m.argmax(axis=0)
    assert (np.diff(peaks) >= 0).all()
    # filters are normalized like TF (peak height <= 1, unnormalized triangles)
    assert m.max() <= 1.0 + 1e-6


def test_mel_matrix_against_htk_formula():
    """Golden-check a few filter peak frequencies against the HTK mel formula."""
    m = fe.mel_weight_matrix(num_mel_bins=10, num_spectrogram_bins=257,
                             sample_rate=16000, lower_hz=0.0, upper_hz=8000.0)
    mel = lambda f: 1127.0 * np.log1p(f / 700.0)
    inv_mel = lambda m_: 700.0 * (np.expm1(m_ / 1127.0))
    centers_mel = np.linspace(mel(0.0), mel(8000.0), 12)[1:-1]
    centers_hz = inv_mel(centers_mel)
    bin_hz = np.linspace(0, 8000, 257)
    for k in range(10):
        peak_bin = m[:, k].argmax()
        assert abs(bin_hz[peak_bin] - centers_hz[k]) < 8000 / 256 + 1e-6


def test_log_mel_batched_and_jittable():
    import jax
    x = np.stack([_rand_audio(8000, s) for s in range(3)])
    cfg = fe.FrontendConfig()
    f = jax.jit(lambda a: fe.log_mel_spectrogram(a, cfg))
    out = np.asarray(f(x))
    assert out.shape == (3, fe.num_frames(8000, cfg), 80)
    ref = np.asarray(fe.log_mel_spectrogram(x[1], cfg))
    np.testing.assert_allclose(out[1], ref, rtol=1e-4, atol=1e-5)


def test_log_floor():
    x = np.zeros(1000, dtype=np.float32)
    lm = np.asarray(fe.log_mel_spectrogram(x))
    np.testing.assert_allclose(lm, np.log(1e-10), rtol=1e-5)

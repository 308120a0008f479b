"""Jittable audio frontend: framing → Hann → rFFT → mel → log, on TPU.

TPU-native replacement for the reference's TF DSP stack
(``training/tf/datasets/audio_feature.py``): the canonical feature is the
80-bin log-mel filterbank at 16 kHz with a 25 ms window / 10 ms hop,
``pad_end=False`` (no centering), Hann window, power spectrum, HTK mel
scale with fmax=8 kHz, and ``log(x + 1e-10)``
(reference ``audio_feature.py:131-185,299-394``; config
``training/tf/__init__.py:49-58``).

Everything here is pure-functional and jit/vmap-friendly with static
shapes, so the frontend can run on TPU as part of the input pipeline or be
fused into the train step.  Two spectrum paths are provided:

  - ``rfft``: ``jnp.fft.rfft`` (XLA FFT),
  - ``dft``: an explicit real-DFT as two matmuls — for 400-sample frames
    this maps straight onto the MXU and is often faster than FFT on TPU.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ['FrontendConfig', 'mel_weight_matrix', 'log_mel_spectrogram',
           'num_frames', 'frame_signal', 'magnitude_spectrogram',
           'mel_spectrogram', 'power_mel_spectrogram', 'mfcc', 'to_db',
           'get_feature', 'inverse_stft']


class FrontendConfig:
    """Static frontend hyper-parameters (defaults = reference TIMIT recipe)."""

    def __init__(self, sample_rate=16000, window_sec=0.025, hop_sec=0.010,
                 num_mel_bins=80, lower_hz=0.0, upper_hz=8000.0,
                 fft_mode='rfft', log_floor=1e-10):
        self.sample_rate = sample_rate
        self.window = int(window_sec * sample_rate)   # 400
        self.hop = int(hop_sec * sample_rate)         # 160
        self.fft_length = self.window                 # nfft = window (reference)
        self.num_bins = self.fft_length // 2 + 1      # 201
        self.num_mel_bins = num_mel_bins
        self.lower_hz = lower_hz
        self.upper_hz = upper_hz
        self.fft_mode = fft_mode
        self.log_floor = log_floor


def _hertz_to_mel(freq_hz):
    """HTK mel scale used by tf.signal: 1127 * ln(1 + f/700)."""
    return 1127.0 * np.log1p(np.asarray(freq_hz, dtype=np.float64) / 700.0)


def mel_weight_matrix(num_mel_bins=80, num_spectrogram_bins=201,
                      sample_rate=16000, lower_hz=0.0, upper_hz=8000.0,
                      dtype=np.float32):
    """Triangular mel filterbank identical to ``tf.signal.linear_to_mel_weight_matrix``.

    Returns ``[num_spectrogram_bins, num_mel_bins]``.  The DC bin row is
    zero (TF's ``bands_to_zero=1``); triangles are linear in mel space and
    unnormalised.
    """
    bands_to_zero = 1
    nyquist = sample_rate / 2.0
    linear_freqs = np.linspace(0.0, nyquist, num_spectrogram_bins)[bands_to_zero:]
    spectrogram_mels = _hertz_to_mel(linear_freqs)[:, None]

    edges = np.linspace(_hertz_to_mel(lower_hz), _hertz_to_mel(upper_hz),
                        num_mel_bins + 2)
    lower_edge, center, upper_edge = edges[:-2], edges[1:-1], edges[2:]

    lower_slopes = (spectrogram_mels - lower_edge) / (center - lower_edge)
    upper_slopes = (upper_edge - spectrogram_mels) / (upper_edge - center)
    weights = np.maximum(0.0, np.minimum(lower_slopes, upper_slopes))
    return np.vstack([np.zeros((bands_to_zero, num_mel_bins)), weights]).astype(dtype)


def num_frames(num_samples, config=None):
    """Frame count for ``pad_end=False`` framing; works on ints or arrays."""
    config = config or FrontendConfig()
    n = (num_samples - config.window) // config.hop + 1
    return np.maximum(n, 0) if isinstance(num_samples, np.ndarray) else (
        jnp.maximum(n, 0) if isinstance(num_samples, jnp.ndarray) else max(int(n), 0))


def frame_signal(audio, window, hop):
    """[..., samples] -> [..., frames, window] by strided gather (static shapes)."""
    total = audio.shape[-1]
    n = max((total - window) // hop + 1, 0)
    idx = np.arange(n)[:, None] * hop + np.arange(window)[None, :]
    return audio[..., idx]


@functools.lru_cache(maxsize=8)
def _dft_matrices(fft_length, num_bins, window):
    """Real-DFT basis (cos, -sin) as [window, num_bins] float32 matmul weights."""
    k = np.arange(num_bins)[None, :]
    t = np.arange(fft_length)[:, None]
    angle = 2.0 * np.pi * t * k / fft_length
    cos_m = np.cos(angle)[:window].astype(np.float32)
    sin_m = (-np.sin(angle))[:window].astype(np.float32)
    return cos_m, sin_m


def _power_spectrum(frames, config):
    """Windowed power spectrum of [..., frames, window] -> [..., frames, bins]."""
    # periodic Hann, matching tf.signal.hann_window(periodic=True)
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(config.window) / config.window)
    frames = frames * jnp.asarray(w, frames.dtype)
    if config.fft_mode == 'dft':
        cos_m, sin_m = _dft_matrices(config.fft_length, config.num_bins, config.window)
        re = jnp.matmul(frames, jnp.asarray(cos_m), preferred_element_type=jnp.float32)
        im = jnp.matmul(frames, jnp.asarray(sin_m), preferred_element_type=jnp.float32)
        return re * re + im * im
    stft = jnp.fft.rfft(frames, n=config.fft_length, axis=-1)
    return jnp.abs(stft).astype(jnp.float32) ** 2


def log_mel_spectrogram(audio, config=None, mel_mat=None):
    """[..., samples] float audio -> [..., frames, num_mel_bins] log-mel.

    Pure function of static-shaped inputs; jit/vmap/pjit-safe.  Padded audio
    tails produce garbage frames past the true frame count — callers carry
    ``feature_size`` (see :func:`num_frames`) exactly as the reference
    pipeline carries it (``preprocess.py:42-51``).
    """
    config = config or FrontendConfig()
    if mel_mat is None:
        mel_mat = mel_weight_matrix(
            config.num_mel_bins, config.num_bins, config.sample_rate,
            config.lower_hz, config.upper_hz)
    frames = frame_signal(jnp.asarray(audio, jnp.float32), config.window, config.hop)
    power = _power_spectrum(frames, config)
    mel = jnp.matmul(power, jnp.asarray(mel_mat), preferred_element_type=jnp.float32)
    return jnp.log(mel + config.log_floor)


# ---------------------------------------------------------------------------
# Extended featurizer library (reference audio_feature.py dispatcher surface:
# spec / spec_dB / mel / pmel / lmel / mfcc, plus inverse STFT).  All
# jittable; mel/DCT projections are MXU matmuls.
# ---------------------------------------------------------------------------

def magnitude_spectrogram(audio, config=None, exponent=2.0):
    """[..., samples] -> [..., frames, bins] |STFT|^exponent
    (reference ``audio_feature.py:131-185``)."""
    config = config or FrontendConfig()
    frames = frame_signal(jnp.asarray(audio, jnp.float32), config.window,
                          config.hop)
    power = _power_spectrum(frames, config)       # |stft|^2
    if exponent == 2.0:
        return power
    return jnp.power(jnp.sqrt(power), exponent)


def to_db(spec, ref_level_db=20.0, min_level_db=-100.0, clip=True):
    """Power/magnitude spectrogram -> normalised dB in [0, 1]
    (reference ``audio_feature.py:36-66``)."""
    db = 20.0 * jnp.log10(jnp.maximum(spec, 1e-10)) - ref_level_db
    db = db / -min_level_db
    if clip:
        db = jnp.clip(db, -1.0, 0.0) + 1.0
    return db


def mel_spectrogram(audio, config=None, mel_mat=None, exponent=2.0):
    """Linear-power mel filterbank (reference ``audio_feature.py:299-369``)."""
    config = config or FrontendConfig()
    if mel_mat is None:
        mel_mat = mel_weight_matrix(config.num_mel_bins, config.num_bins,
                                    config.sample_rate, config.lower_hz,
                                    config.upper_hz)
    spec = magnitude_spectrogram(audio, config, exponent)
    return jnp.matmul(spec, jnp.asarray(mel_mat),
                      preferred_element_type=jnp.float32)


def power_mel_spectrogram(audio, config=None, power_coeff=1.0 / 15.0, **kw):
    """PNCC-style power-law mel (reference ``audio_feature.py:424-456``)."""
    return jnp.power(mel_spectrogram(audio, config, **kw), power_coeff)


@functools.lru_cache(maxsize=4)
def _dct_matrix(n_in, n_out):
    """Orthonormal DCT-II basis [n_in, n_out] (tf.signal.mfccs... semantics)."""
    k = np.arange(n_out)[None, :]
    n = np.arange(n_in)[:, None]
    basis = np.cos(np.pi * (2 * n + 1) * k / (2 * n_in))
    basis *= np.sqrt(2.0 / n_in)
    basis[:, 0] *= np.sqrt(0.5)
    return basis.astype(np.float32)


def mfcc(audio, config=None, num_coeffs=13, **kw):
    """MFCCs: orthonormal DCT-II of the log-mel filterbank
    (reference ``audio_feature.py:396-421``)."""
    config = config or FrontendConfig()
    lmel = log_mel_spectrogram(audio, config, **kw)
    dct = jnp.asarray(_dct_matrix(config.num_mel_bins, num_coeffs))
    return jnp.matmul(lmel, dct, preferred_element_type=jnp.float32)


def get_feature(audio, config=None, feature_type='lmel', **kw):
    """Feature dispatcher (reference ``audio_feature.py:458-475``)."""
    table = {
        'spec': magnitude_spectrogram,
        'spec_dB': lambda a, c, **k: to_db(magnitude_spectrogram(a, c), **k),
        'mel': mel_spectrogram,
        'pmel': power_mel_spectrogram,
        'lmel': log_mel_spectrogram,
        'mfcc': mfcc,
    }
    if feature_type not in table:
        raise NotImplementedError(
            f'Unsupported audio feature type {feature_type!r}')
    return table[feature_type](audio, config, **kw)


def inverse_stft(stft, config=None, length=None):
    """Complex STFT [..., frames, bins] -> audio, by windowed overlap-add
    with squared-window normalisation (reference ``spec2wav``,
    ``audio_feature.py:247-297``)."""
    config = config or FrontendConfig()
    frames = jnp.fft.irfft(stft, n=config.fft_length, axis=-1)
    w = (0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(config.window)
                            / config.window)).astype(np.float32)
    frames = frames[..., :config.window] * w
    n_frames = frames.shape[-2]
    total = config.window + (n_frames - 1) * config.hop
    idx = (np.arange(n_frames)[:, None] * config.hop
           + np.arange(config.window)[None, :]).reshape(-1)
    flat = frames.reshape(frames.shape[:-2] + (-1,))
    audio = jnp.zeros(frames.shape[:-2] + (total,), jnp.float32)
    audio = audio.at[..., idx].add(flat)
    norm = np.zeros(total, np.float32)
    np.add.at(norm, idx, np.tile(w * w, n_frames))
    audio = audio / jnp.maximum(jnp.asarray(norm), 1e-8)
    if length is not None:
        if length <= total:
            audio = audio[..., :length]
        else:  # framing dropped a tail shorter than one hop; zero-pad back
            pad = [(0, 0)] * (audio.ndim - 1) + [(0, length - total)]
            audio = jnp.pad(audio, pad)
    return audio

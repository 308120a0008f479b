"""TPU compute ops: audio frontend, CTC loss, decoders, edit distance."""

from .frontend import (
    FrontendConfig, mel_weight_matrix, log_mel_spectrogram, num_frames,
    frame_signal,
)

__all__ = [
    'FrontendConfig', 'mel_weight_matrix', 'log_mel_spectrogram',
    'num_frames', 'frame_signal',
]

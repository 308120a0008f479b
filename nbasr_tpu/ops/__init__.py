"""TPU compute ops: audio frontend, CTC loss, decoders, edit distance."""

from .frontend import (
    FrontendConfig, mel_weight_matrix, log_mel_spectrogram, num_frames,
    frame_signal,
)
from .ctc import ctc_loss, normalized_ctc_loss, ctc_alignment_posteriors
from .grouped_conv import grouped_conv1d
from .decode import greedy_decode, beam_search_decode
from .edit_distance import edit_distance, error_rate

__all__ = [
    'FrontendConfig', 'mel_weight_matrix', 'log_mel_spectrogram',
    'num_frames', 'frame_signal',
    'ctc_loss', 'normalized_ctc_loss', 'ctc_alignment_posteriors',
    'grouped_conv1d',
    'greedy_decode', 'beam_search_decode',
    'edit_distance', 'error_rate',
]

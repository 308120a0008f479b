"""Data layer: TIMIT reading, phoneme encodings, batching, synthetic corpora."""

from .phonemes import PhonemeEncoder, fold_ids, VOCAB_P39, VOCAB_P48, VOCAB_P61
from .pipeline import (
    Loader, ArrayDataset, CurriculumStream, make_synthetic_split,
    get_dataloaders, load_train_stats, DEFAULT_CURRICULUM,
)
from .timit import TimitSplit, read_wav, read_phn, scan_split

__all__ = [
    'PhonemeEncoder', 'fold_ids', 'VOCAB_P39', 'VOCAB_P48', 'VOCAB_P61',
    'Loader', 'ArrayDataset', 'CurriculumStream', 'make_synthetic_split',
    'get_dataloaders', 'load_train_stats', 'DEFAULT_CURRICULUM',
    'TimitSplit', 'read_wav', 'read_phn', 'scan_split',
]

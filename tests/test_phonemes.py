"""Phoneme encoding/folding tests against the published TIMIT table semantics."""

import numpy as np
import pytest

from nbasr_tpu.data.phonemes import (
    PhonemeEncoder, fold_ids, VOCAB_P39, VOCAB_P48, VOCAB_P61,
)


def test_vocab_sizes():
    assert len(VOCAB_P61) == 61
    assert len(VOCAB_P48) == 48
    assert len(VOCAB_P39) == 39
    enc = PhonemeEncoder(48)
    assert enc.vocab_size == 49  # reference phoneme_encoder.py:20


def test_encode_p48_folds_and_drops_q():
    enc = PhonemeEncoder(48)
    # 'q' has no p48 mapping and must be silently dropped
    # (reference phoneme_encoder.py:27-31)
    ids = enc.encode(['aa', 'q', 'ao', 'bcl'])
    assert len(ids) == 3
    assert all(1 <= i <= 48 for i in ids)
    # 'ao' folds to 'ao' in p48 (distinct from 'aa' until p39)
    assert enc.decode(ids) == ['aa', 'ao', 'vcl']


def test_encode_accepts_bytes():
    enc = PhonemeEncoder(48)
    assert enc.encode([b'aa']) == enc.encode(['aa'])


def test_unknown_phoneme_raises():
    with pytest.raises(KeyError):
        PhonemeEncoder(48).encode(['xyz'])


def test_p48_to_p39_folding_merges_ao_into_aa():
    enc = PhonemeEncoder(48)
    ids = np.array(enc.encode(['aa', 'ao']), dtype=np.int32)
    folded = enc.fold_encoded(ids, 39)
    assert folded[0] == folded[1]  # both -> 'aa' in p39


def test_fold_compacts_zeros_right():
    # padding zeros stay zeros, order of real ids preserved
    enc = PhonemeEncoder(48)
    ids = np.array([[5, 0, 7, 0, 0]], dtype=np.int32)
    folded = enc.fold_encoded(ids, 39)
    nz = folded[0][folded[0] > 0]
    assert len(nz) == 2
    assert (folded[0][len(nz):] == 0).all()


def test_fold_table_matches_fold_ids():
    enc = PhonemeEncoder(48)
    table = enc.fold_table(39)
    ids = np.arange(49, dtype=np.int32)
    assert (table[ids] == fold_ids(ids, 48, 39, compact=False)).all()
    assert table[0] == 0
    assert (table[1:] > 0).all()  # every p48 phoneme maps to a p39 phoneme


def test_p61_encoder_identity():
    enc = PhonemeEncoder(61)
    ids = enc.encode(['q', 'aa'])
    assert len(ids) == 2  # no folding at p61, q kept
    assert enc.decode(ids) == ['q', 'aa']


def test_round_trip_sentence():
    enc = PhonemeEncoder(48)
    phones = ['h#', 'hh', 'ah', 'l', 'ow', 'h#']  # p61 input
    ids = enc.encode(phones)
    assert enc.decode_to_sentence(ids) == 'sil hh ah l ow sil'  # p48 output


def test_get_vocab_with_blank():
    enc = PhonemeEncoder(48)
    v = enc.get_vocab(inc_blank=True)
    assert v[0] == '_' and len(v) == 49

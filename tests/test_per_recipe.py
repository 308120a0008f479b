"""Prove the training recipe drives PER below chance through the FULL path:
frontend → encoder → CTC → beam-12 decode → p39 fold → edit distance.

The reference's claim to fame is that its recipe reproduces the dataset
PER numbers (README.md:61: epoch-1 val PER 0.47851).  TIMIT is not in
this environment, so this trains a small-but-real model on a *learnable*
synthetic corpus — tone-coded phonemes: each label id maps to a pure tone
and utterances are concatenations of 0.2 s tone segments — until val PER
< 0.5.  Loss decreasing alone does NOT validate the decode→fold→edit-
distance→PER chain; this does."""

import numpy as np
import pytest
import jax

from nbasr_tpu.data.phonemes import PhonemeEncoder
from nbasr_tpu.data.pipeline import ArrayDataset, Loader
from nbasr_tpu.models import get_model
from nbasr_tpu.training import get_loss, get_trainer

TONE_FREQS = np.array([400.0, 800.0, 1400.0, 2200.0])


def make_tone_split(n, seed, seg=3200, sr=16000, name=''):
    """Utterances of concatenated pure-tone segments; label = tone index."""
    rng = np.random.RandomState(seed)
    audio, labels = [], []
    for _ in range(n):
        L = rng.randint(3, 7)
        ids = rng.randint(1, len(TONE_FREQS) + 1, size=L)
        sig = np.concatenate([
            np.sin(2 * np.pi * TONE_FREQS[i - 1] * np.arange(seg) / sr) * 0.5
            for i in ids])
        sig = sig + rng.randn(len(sig)) * 0.05  # noise floor: keeps the
        # log-mel of quiet bins finite/speech-like (log(0+1e-10) ≈ -23
        # would dominate normalisation otherwise)
        audio.append(sig.astype(np.float32))
        labels.append(ids.astype(np.int32))
    return ArrayDataset(audio, labels, name=name)


def tone_loaders(batch_size=8):
    enc = PhonemeEncoder(48)
    train = make_tone_split(48, 0, name='TRAIN')
    val = make_tone_split(8, 1, name='VAL')
    ltr = Loader(train, batch_size, shuffle=True, seed=0)
    lva = Loader(val, batch_size)
    return enc, ltr, lva, lva


@pytest.mark.slow
def test_recipe_reaches_per_below_half():
    loaders = tone_loaders()
    trainer = get_trainer(loaders, get_loss(), verbose=False,
                          eval_decoder='beam', beam_width=12,
                          decay_start_epoch=100)
    model = get_model([[1, 0], [1, 0, 0], [1, 0, 0, 0]], use_rnn=False,
                      block_filters=(32, 32, 48, 48), cell_groups=4,
                      cells_per_block=(1, 1, 1, 1), init_scheme='scaled',
                      cell_dropout=0.0, dropout_rate=0.0)
    history, test_scores = trainer.train(model, epochs=40, lr=1e-3)
    best = min(history['val_ler'])
    assert best < 0.5, history['val_ler']
    # the final test eval runs on the remembered-best weights
    assert test_scores['val_ler'] < 0.6, test_scores
    # and chance level for 4 symbols is ~0.75+; early epochs prove the
    # metric starts near/above chance rather than being trivially small
    assert history['val_ler'][0] > 0.6

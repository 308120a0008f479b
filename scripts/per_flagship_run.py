"""Flagship-model PER proof on the real chip: train the full 26M-param
README arch on the tone-coded corpus until val PER collapses.

Logs per-epoch val PER; results recorded in PERF.md.

NOTE on defaults (ADVICE r3): round 3 changed the argv defaults to
lr=1e-3 and a 32-utterance val split; the round-2 runs documented in
PERF.md used lr=3e-4 and val=16.  To reproduce those, pass the lr
explicitly: ``python scripts/per_flagship_run.py N 3e-4``.  New runs
should always record their full command line next to the curve."""

import sys
import time

import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir', '/tmp/nbasr_jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

sys.path.insert(0, '/root/repo')
from nbasr_tpu.models import get_model
from nbasr_tpu.training import get_loss, get_trainer
from tests.test_per_recipe import make_tone_split, tone_loaders
from nbasr_tpu.data.phonemes import PhonemeEncoder
from nbasr_tpu.data.pipeline import Loader

EPOCHS = int(sys.argv[1]) if len(sys.argv) > 1 else 10
LR = float(sys.argv[2]) if len(sys.argv) > 2 else 1e-3
N_TRAIN = int(sys.argv[3]) if len(sys.argv) > 3 else 256
DROPOUT = float(sys.argv[4]) if len(sys.argv) > 4 else 0.2
RNN = (sys.argv[5] != '0') if len(sys.argv) > 5 else True
DTYPE = (jnp.float32 if len(sys.argv) > 6 and sys.argv[6] == 'f32'
         else jnp.bfloat16)
# The reference's eps=1e-7 starves the late layers at flagship depth:
# the backward pass amplifies gradients ~1e13 from head to block0
# (branch adds + LayerNorm backward across 18 cells, PERF.md r4), so
# after clip_by_global_norm(5.0) the head/LSTM grads land ~1e-12 and
# sqrt(v) << eps kills their Adam updates — the model is pinned at the
# CTC all-blank minimum.  A small eps restores Adam's per-parameter
# scale invariance; pass 1e-7 to reproduce the (non-converging)
# reference-eps behaviour on this proxy task.  1e-16 IS the shipped
# Trainer default since r5 (trainer.py), so this run exercises exactly
# what `python train.py 1 0 1 0 0 1 0 0 0` ships.
ADAM_EPS = float(sys.argv[7]) if len(sys.argv) > 7 else 1e-16
#: tone-class count of the proxy corpus (default: the 4-tone corpus of
#: tests/test_per_recipe.py; larger values span 300-6000 Hz and make the
#: task phoneme-rich like TIMIT — with only 4 classes the CTC posterior
#: concentrates on blank and the big model lingers in the blank phase).
N_TONES = int(sys.argv[8]) if len(sys.argv) > 8 else 4
#: lr decay start epoch (reference rule is 5; 1000 = effectively off for
#: long proxy runs — r4: decay_start=100 froze a 300-epoch run at ~1e-10)
DECAY_START = int(sys.argv[9]) if len(sys.argv) > 9 else 1000

if N_TONES != 4:
    # tone ids run 1..N_TONES; the encoder is fixed at PhonemeEncoder(48)
    # (vocab 49 with blank), so ids must stay below 48 (ADVICE r4 low)
    assert 1 <= N_TONES < 48, f'N_TONES={N_TONES} out of vocab range [1,47]'
    import numpy as _np
    import tests.test_per_recipe as _tpr
    _tpr.TONE_FREQS = _np.geomspace(300.0, 6000.0, N_TONES)
enc = PhonemeEncoder(48)
train = make_tone_split(N_TRAIN, 0, name='TRAIN')
val = make_tone_split(32, 1, name='VAL')
loaders = (enc, Loader(train, 16, shuffle=True, seed=0), Loader(val, 16),
           Loader(val, 16))

trainer = get_trainer(loaders, get_loss(), verbose=True,
                      eval_decoder='beam', beam_width=12,
                      decay_start_epoch=DECAY_START, adam_eps=ADAM_EPS)
model = get_model([[1, 0], [1, 0, 0], [1, 0, 0, 0]], use_rnn=RNN,
                  dropout_rate=DROPOUT, cell_dropout=DROPOUT,
                  data_norm=None, compute_dtype=DTYPE,
                  init_scheme='scaled')
print(f'epochs={EPOCHS} lr={LR} n={N_TRAIN} dropout={DROPOUT} rnn={RNN} '
      f'dtype={DTYPE.__name__} adam_eps={ADAM_EPS} n_tones={N_TONES} '
      f'decay_start={DECAY_START}')

t0 = time.time()
history, test_scores = trainer.train(model, epochs=EPOCHS, lr=LR)
print('val_ler curve:', [round(v, 3) for v in history['val_ler']])
print('test:', test_scores)
print('total', round(time.time() - t0, 1), 's')

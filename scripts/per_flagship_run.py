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

enc = PhonemeEncoder(48)
train = make_tone_split(N_TRAIN, 0, name='TRAIN')
val = make_tone_split(32, 1, name='VAL')
loaders = (enc, Loader(train, 16, shuffle=True, seed=0), Loader(val, 16),
           Loader(val, 16))

trainer = get_trainer(loaders, get_loss(), verbose=True,
                      eval_decoder='beam', beam_width=12,
                      decay_start_epoch=100)
model = get_model([[1, 0], [1, 0, 0], [1, 0, 0, 0]], use_rnn=RNN,
                  dropout_rate=DROPOUT, cell_dropout=DROPOUT,
                  data_norm=None, compute_dtype=DTYPE,
                  init_scheme='scaled')
print(f'epochs={EPOCHS} lr={LR} n={N_TRAIN} dropout={DROPOUT} rnn={RNN} '
      f'dtype={DTYPE.__name__}')

t0 = time.time()
history, test_scores = trainer.train(model, epochs=EPOCHS, lr=LR)
print('val_ler curve:', [round(v, 3) for v in history['val_ler']])
print('test:', test_scores)
print('total', round(time.time() - t0, 1), 's')

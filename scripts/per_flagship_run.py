"""Flagship-model PER proof on the real chip: train the full 26M-param
README arch on the tone-coded corpus until val PER collapses.

Logs per-epoch val PER; results recorded in PERF.md."""

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

enc = PhonemeEncoder(48)
train = make_tone_split(128, 0, name='TRAIN')
val = make_tone_split(16, 1, name='VAL')
loaders = (enc, Loader(train, 16, shuffle=True, seed=0), Loader(val, 16),
           Loader(val, 16))

trainer = get_trainer(loaders, get_loss(), verbose=True,
                      eval_decoder='beam', beam_width=12,
                      decay_start_epoch=100)
model = get_model([[1, 0], [1, 0, 0], [1, 0, 0, 0]], use_rnn=True,
                  dropout_rate=0.2, data_norm=None,
                  compute_dtype=jnp.bfloat16, init_scheme='scaled')

t0 = time.time()
history, test_scores = trainer.train(model, epochs=int(sys.argv[1]) if
                                     len(sys.argv) > 1 else 10, lr=3e-4)
print('val_ler curve:', [round(v, 3) for v in history['val_ler']])
print('test:', test_scores)
print('total', round(time.time() - t0, 1), 's')

"""int8-PTQ accuracy proof: train the proven tone-corpus recipe
(tests/test_per_recipe.py::test_recipe_reaches_per_below_half config) on
CPU, then compare beam-12 eval between the f32 best weights and their
weights-only int8 quantization (nbasr_tpu/quant.py).

Measured (r5, this script): f32 PER 0.0571 / loss 0.1017 ->
int8 PER 0.0571 (unchanged) / loss 0.1028 (+1%).

Usage: python scripts/quant_per_check.py
"""

import sys

sys.path.insert(0, '/root/repo')

import jax

jax.config.update('jax_platforms', 'cpu')

from tests.test_per_recipe import tone_loaders
from nbasr_tpu.training import get_loss, get_trainer
from nbasr_tpu.models import get_model
from nbasr_tpu.quant import quantize_tree, dequantize_tree


def main():
    loaders = tone_loaders()
    trainer = get_trainer(loaders, get_loss(), verbose=False,
                          eval_decoder='beam', beam_width=12,
                          decay_start_epoch=100)
    model = get_model([[1, 0], [1, 0, 0], [1, 0, 0, 0]], use_rnn=False,
                      block_filters=(32, 32, 48, 48), cell_groups=4,
                      cells_per_block=(1, 1, 1, 1), init_scheme='scaled',
                      cell_dropout=0.0, dropout_rate=0.0)
    trainer.train(model, epochs=40, lr=1e-3)
    trainer.recall_best()
    f32 = trainer.evaluate(loaders[3])
    print('f32  best-weights:', {k: round(float(v), 4) for k, v in f32.items()})
    q = quantize_tree(trainer.state.params)
    trainer.state = trainer.state.replace(params=dequantize_tree(q))
    i8 = trainer.evaluate(loaders[3])
    print('int8 best-weights:', {k: round(float(v), 4) for k, v in i8.items()})


if __name__ == '__main__':
    main()

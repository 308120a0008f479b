"""Mixed-precision tests: bf16 encoder path trains and stays close to f32."""

import numpy as np
import jax
import jax.numpy as jnp

from nbasr_tpu.data import get_dataloaders
from nbasr_tpu.models import get_model
from nbasr_tpu.training import get_loss, get_trainer
from nbasr_tpu.training.metrics import zeros_like_metrics

TINY_ARCH = [[1, 0], [0, 0, 0], [1, 0, 0, 1]]
TINY_KW = dict(block_filters=(16, 16, 24, 24), cells_per_block=(1, 1, 1, 1),
               cell_groups=4, init_scheme='scaled')


def _loss_after_steps(dtype, n=6):
    loaders = get_dataloaders('synthetic:12', batch_size=4, curriculum=())
    model = get_model(TINY_ARCH, use_rnn=False, compute_dtype=dtype, **TINY_KW)
    tr = get_trainer(loaders, get_loss(), verbose=False, eval_decoder='greedy')
    tr.init_state(model, seed=0)
    batch = next(iter(loaders[1]))
    losses = []
    for _ in range(n):
        tr.state = tr.state.replace(metrics=zeros_like_metrics(('ctc_loss',)))
        m = tr.step(batch, training=True, lr=3e-4)
        losses.append(m['ctc_loss'])
    return losses


def test_bf16_trains_and_tracks_f32():
    f32 = _loss_after_steps(jnp.float32)
    bf16 = _loss_after_steps(jnp.bfloat16)
    assert all(np.isfinite(bf16))
    assert bf16[-1] < bf16[0]          # learning happens
    # trajectories stay close (params and head are f32; encoder is bf16)
    assert abs(bf16[0] - f32[0]) / f32[0] < 0.05
    assert abs(bf16[-1] - f32[-1]) / max(f32[-1], 1e-6) < 0.15


def test_bf16_params_stay_f32():
    model = get_model(TINY_ARCH, use_rnn=False, compute_dtype=jnp.bfloat16,
                      **TINY_KW)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 80)))
    for leaf in jax.tree_util.tree_leaves(v['params']):
        assert leaf.dtype == jnp.float32
    out = model.apply(v, jnp.zeros((2, 16, 80)))
    assert out.dtype == jnp.float32  # head logits in f32 for CTC stability

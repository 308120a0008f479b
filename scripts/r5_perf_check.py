"""Round-5 on-chip checks, run after the e40 sweep frees the chip.

1. Train-step time at the BUCKET-2 probe shape (B=32, T=470 frames) —
   NOT the bench.py bucket-1 protocol (~300 frames, 31.27 ms r5); this
   longer-sequence probe tracks the r3/r4 per-block breakdown tables.
2. Beam-search cold-compile time with the persistent cache disabled
   (VERDICT r4 next #5 target: < 60 s) + steady per-batch latency.
3. shard_map-wrapped fused train step on a REAL-chip 1-device mesh
   (VERDICT r4 next #6 composition proof).

Usage: python scripts/r5_perf_check.py [step|beam|shardmap|all]
"""

import sys
import time

import numpy as np

sys.path.insert(0, '/root/repo')

what = sys.argv[1] if len(sys.argv) > 1 else 'all'

import jax
import jax.numpy as jnp

if what != 'beam':
    jax.config.update('jax_compilation_cache_dir', '/tmp/nbasr_jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

ARCH = [[1, 0], [1, 0, 0], [1, 0, 0, 0]]


def chained_step_time(trainer, batch, lr=1e-4, n=30):
    """Chained steps (state feeds next step) + final scalar fetch."""
    state = trainer.state
    placed = trainer._put_batch(batch)
    state = trainer._train_step(state, placed, jnp.float32(lr))  # compile
    for _ in range(5):
        state = trainer._train_step(state, placed, jnp.float32(lr))
    jax.block_until_ready(state.params)
    t0 = time.perf_counter()
    for _ in range(n):
        state = trainer._train_step(state, placed, jnp.float32(lr))
    float(state.metrics['ctc_loss'][0])
    dt = (time.perf_counter() - t0) / n
    trainer.state = state   # the original state's buffers were donated
    return dt


def make_batch(B=32, T_frames=470, seed=0):
    from nbasr_tpu.ops.frontend import FrontendConfig
    cfg = FrontendConfig()
    S = cfg.window + (T_frames - 1) * cfg.hop
    rs = np.random.RandomState(seed)
    return {
        'audio': rs.randn(B, S).astype(np.float32) * 0.1,
        'feature_size': np.full((B,), T_frames, np.int32),
        'labels': rs.randint(1, 49, size=(B, 48)).astype(np.int32),
        'label_size': np.full((B,), 48, np.int32),
        'valid': np.ones((B,), np.float32),
    }


def bench_trainer(mesh=None, grouped_impl='fused_aligned'):
    from nbasr_tpu.data.pipeline import Loader, make_synthetic_split
    from nbasr_tpu.data.phonemes import PhonemeEncoder
    from nbasr_tpu.training import get_loss, get_trainer
    from nbasr_tpu.models import get_model
    enc = PhonemeEncoder(48)
    split = make_synthetic_split(8, 0)
    loaders = (enc, Loader(split, 4), Loader(split, 4), Loader(split, 4))
    if mesh is not None:
        from nbasr_tpu.parallel import ParallelTrainer
        trainer = ParallelTrainer(loaders, get_loss(), mesh=mesh,
                                  verbose=False, eval_decoder='greedy')
    else:
        trainer = get_trainer(loaders, get_loss(), verbose=False,
                              eval_decoder='greedy')
    model = get_model(ARCH, use_rnn=True, dropout_rate=0.2,
                      data_norm=True, compute_dtype=jnp.bfloat16,
                      grouped_impl=grouped_impl)
    trainer.init_state(model, seed=0)
    return trainer


if what in ('step', 'all'):
    trainer = bench_trainer()
    dt = chained_step_time(trainer, make_batch())
    print(f'STEP: {dt * 1e3:.2f} ms/step (r4 baseline 31.89; target <= 27)')

if what in ('shardmap', 'all'):
    from nbasr_tpu.parallel import make_mesh
    mesh = make_mesh(dp=1, tp=1, devices=jax.devices()[:1])
    trainer = bench_trainer(mesh=mesh)
    assert trainer._shard_axis == 'data', 'shard_map mode not active'
    assert trainer.model.grouped_impl == 'fused_aligned'
    dt = chained_step_time(trainer, make_batch())
    m = trainer.evaluate(trainer.data_validate)
    print(f'SHARDMAP(1-dev mesh): {dt * 1e3:.2f} ms/step, eval {m} — '
          f'fused cell composes with the mesh path on hardware')

if what in ('beam', 'all'):
    # cold compile: fresh process, no persistent cache (run via 'beam' only
    # in a fresh interpreter for a true cold number)
    from nbasr_tpu.ops.decode import beam_search_decode
    B, T, V = 8, 118, 49
    logits = jnp.asarray(np.random.RandomState(0).randn(B, T, V), jnp.float32)
    ll = jnp.full((B,), T, jnp.int32)
    t0 = time.perf_counter()
    out = beam_search_decode(logits, ll, beam_width=12)
    jax.block_until_ready(out)
    t1 = time.perf_counter()
    for _ in range(3):
        out = beam_search_decode(logits, ll, beam_width=12)
    jax.block_until_ready(out)
    t2 = time.perf_counter()
    n = 20
    t3 = time.perf_counter()
    for _ in range(n):
        out = beam_search_decode(logits, ll, beam_width=12)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t3) / n
    print(f'BEAM: cold compile+run {t1 - t0:.1f} s (target < 60), '
          f'steady {dt * 1e3:.2f} ms/batch (r4: 3.4)')

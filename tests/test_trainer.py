"""Trainer tests: loss decreases on a learnable synthetic task, checkpoints
round-trip and resume, LR schedule, metrics, and the loss closure contract."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from nbasr_tpu.data import get_dataloaders
from nbasr_tpu.models import get_model
from nbasr_tpu.training import (
    get_loss, get_trainer, lr_at_epoch, conv_l2, set_seed, prepare_devices,
)

TINY_ARCH = [[1, 0], [0, 0, 0], [1, 0, 0, 1]]
TINY_KW = dict(block_filters=(16, 16, 24, 24), cells_per_block=(1, 1, 1, 1),
               cell_groups=4, rnn_units=16, init_scheme='scaled')


def tiny_model(**kw):
    merged = dict(TINY_KW, **kw)
    return get_model(TINY_ARCH, use_rnn=False, **merged)


@pytest.fixture(scope='module')
def tiny_loaders():
    return get_dataloaders('synthetic:12', batch_size=4, curriculum=())


def _tiny_trainer(tmp_path=None, loaders=None, **kw):
    kw.setdefault('eval_decoder', 'greedy')
    return get_trainer(loaders, get_loss(),
                       save_dir=str(tmp_path) if tmp_path else None,
                       verbose=False, **kw)


def test_lr_schedule_reference_rule():
    assert lr_at_epoch(1e-4, 1) == 1e-4
    assert lr_at_epoch(1e-4, 5) == 1e-4
    assert lr_at_epoch(1e-4, 6) == pytest.approx(9e-5)
    assert lr_at_epoch(1e-4, 7) == pytest.approx(8.1e-5)


def test_loss_closure_contract():
    loss = get_loss()
    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(3, 10, 6).astype(np.float32))
    m = {}
    out = loss(logits, jnp.asarray([10, 8, 6]),
               jnp.asarray([[1, 2, 0], [3, 0, 0], [4, 5, 1]]),
               jnp.asarray([2, 1, 3]), metrics=m)
    assert np.isfinite(float(out))
    num, den = m['ctc_loss']
    assert float(den) == 3.0
    assert float(num) / float(den) == pytest.approx(float(out))


def test_loss_valid_mask_excludes_padding_rows():
    loss = get_loss()
    rng = np.random.RandomState(1)
    logits = jnp.asarray(rng.randn(2, 8, 5).astype(np.float32))
    labels = jnp.asarray([[1, 2], [3, 4]])
    sizes = jnp.asarray([8, 8])
    lsz = jnp.asarray([2, 2])
    full = loss(logits, sizes, labels, lsz)
    masked = loss(logits, sizes, labels, lsz, valid=jnp.asarray([1.0, 0.0]))
    only_first = loss(logits[:1], sizes[:1], labels[:1], lsz[:1])
    assert float(masked) == pytest.approx(float(only_first), rel=1e-5)
    assert float(masked) != pytest.approx(float(full), rel=1e-3)


def test_conv_l2_only_on_conv_kernels():
    m = get_model(TINY_ARCH, use_rnn=False)
    x = jnp.zeros((1, 16, 80))
    params = m.init(jax.random.PRNGKey(0), x)['params']
    reg = float(conv_l2(params))
    assert reg > 0
    # dense-only params contribute nothing
    from nbasr_tpu.training.loss import conv_l2 as c2
    assert float(c2({'head': {'dense': {'kernel': jnp.ones((4, 4))}}})) == 0.0
    assert float(c2({'op': {'conv': {'kernel': jnp.ones((2, 2))}}})) == pytest.approx(0.04)


def test_train_step_reduces_loss(tiny_loaders):
    trainer = _tiny_trainer(loaders=tiny_loaders)
    model = tiny_model()
    trainer.init_state(model, seed=0)
    batch = next(iter(tiny_loaders[1]))
    # eval-mode (dropout-free) loss is the deterministic progress measure;
    # per-step train loss is dropout-noisy over a handful of steps
    first = trainer.step(batch, training=False)['ctc_loss']
    for i in range(8):
        trainer.step(batch, training=True, lr=3e-4)
    last = trainer.step(batch, training=False)['ctc_loss']
    assert last < first, (first, last)


def test_eval_step_metrics(tiny_loaders):
    trainer = _tiny_trainer(loaders=tiny_loaders)
    model = tiny_model()
    trainer.init_state(model, seed=0)
    m = trainer.evaluate(tiny_loaders[2])
    assert set(m) == {'ctc_loss', 'wer', 'ler'}
    assert m['ler'] > 0  # untrained model can't be perfect
    assert np.isfinite(m['ctc_loss'])


@pytest.mark.slow
def test_short_training_run_and_artifacts(tmp_path, tiny_loaders):
    trainer = _tiny_trainer(tmp_path, loaders=tiny_loaders)
    model = tiny_model()
    hist, test_scores = trainer.train(model, epochs=2, lr=3e-4,
                                      model_name='t1', seed=0)
    assert len(hist['val_ler']) == 2
    assert (tmp_path / 't1' / 'scores.pickle').exists()
    assert (tmp_path / 't1' / 'test_scores.pickle').exists()
    assert (tmp_path / 't1' / 'best.ckpt').exists()
    assert 'val_ler' in test_scores


@pytest.mark.slow
def test_checkpoint_resume(tmp_path, tiny_loaders):
    model = tiny_model()
    t1 = _tiny_trainer(tmp_path, loaders=tiny_loaders)
    t1.train(model, epochs=1, lr=3e-4, model_name='r', seed=0)
    step_after_1 = int(t1.state.step)

    # resume: epos=2 continues from epoch 2 (one more epoch of steps)
    t2 = _tiny_trainer(tmp_path, loaders=tiny_loaders)
    t2.train(model, epochs=2, lr=3e-4, model_name='r', seed=0)
    assert int(t2.state.step) == step_after_1 + 2 * tiny_loaders[1].steps - tiny_loaders[1].steps

    # reset starts fresh
    t3 = _tiny_trainer(tmp_path, loaders=tiny_loaders)
    hist, _ = t3.train(model, epochs=1, lr=3e-4, model_name='r', seed=0,
                       reset=True)
    assert len(hist['val_ler']) == 1


def test_save_load_roundtrip(tmp_path, tiny_loaders):
    trainer = _tiny_trainer(loaders=tiny_loaders)
    model = tiny_model()
    trainer.init_state(model, seed=0)
    p0 = jax.tree_util.tree_map(np.asarray, trainer.state.params)
    trainer.save(tmp_path / 'w.ckpt', epoch=3)
    batch = next(iter(tiny_loaders[1]))
    trainer.step(batch, training=True, lr=1e-3)
    meta = trainer.load(tmp_path / 'w.ckpt')
    assert meta['epoch'] == 3
    p1 = jax.tree_util.tree_map(np.asarray, trainer.state.params)
    jax.tree_util.tree_map(np.testing.assert_array_equal, p0, p1)


def test_set_seed_and_prepare_devices():
    key = set_seed(123)
    assert key.shape == (2,)
    devs = prepare_devices()
    assert len(devs) == 8  # virtual CPU mesh
    assert prepare_devices(0) == [devs[0]]
    with pytest.raises(ValueError):
        prepare_devices(99)


def test_nonfinite_guard_skips_and_counts(tiny_loaders):
    """A NaN-producing batch must not corrupt params; apply_if_finite
    counts the skipped update (reference crash-on-NaN replacement)."""
    trainer = _tiny_trainer(loaders=tiny_loaders)
    trainer.init_state(tiny_model(), seed=0)
    batch = {k: np.array(v) for k, v in next(iter(tiny_loaders[1])).items()}
    p_before = jax.tree_util.tree_map(np.asarray, trainer.state.params)
    bad = dict(batch)
    bad['audio'] = batch['audio'].copy()
    bad['audio'][0, :10] = np.inf
    trainer.step(bad, training=True, lr=1e-3)
    assert int(trainer.state.opt_state.total_notfinite) == 1
    p_after = jax.tree_util.tree_map(np.asarray, trainer.state.params)
    jax.tree_util.tree_map(np.testing.assert_array_equal, p_before, p_after)
    # a good batch afterwards still updates; cumulative count is stable
    trainer.step(batch, training=True, lr=1e-3)
    assert int(trainer.state.opt_state.total_notfinite) == 1
    p_final = jax.tree_util.tree_map(np.asarray, trainer.state.params)
    changed = any(not np.array_equal(a, b) for a, b in zip(
        jax.tree_util.tree_leaves(p_after), jax.tree_util.tree_leaves(p_final)))
    assert changed


def test_eval_with_beam_decoder(tiny_loaders):
    """Integration: trainer eval path with the merged-prefix beam decoder
    (beam 4) and p39 folding."""
    trainer = _tiny_trainer(loaders=tiny_loaders, eval_decoder='beam',
                            beam_width=4)
    trainer.init_state(tiny_model(), seed=0)
    m = trainer.evaluate(tiny_loaders[2])
    assert np.isfinite(m['ctc_loss'])
    assert 0 <= m['ler'] <= 2.0


def test_prewarm_eval_compiles_and_matches(tiny_loaders):
    """prewarm_eval AOT-compiles the eval step per bucket shape on a
    background thread; evaluate() must join it, use the compiled
    executables, and produce identical metrics (VERDICT r2 next #7: the
    cold beam compile overlaps epoch-1 training instead of serialising
    after it)."""
    trainer = _tiny_trainer(loaders=tiny_loaders)
    model = tiny_model()
    trainer.init_state(model, seed=0)
    baseline = trainer.evaluate(tiny_loaders[2])

    trainer2 = _tiny_trainer(loaders=tiny_loaders)
    trainer2.init_state(model, seed=0)
    trainer2.prewarm_eval(tiny_loaders[2])
    m = trainer2.evaluate(tiny_loaders[2])
    assert trainer2._prewarm_thread is None          # joined
    assert len(trainer2._eval_compiled) >= 1         # used AOT executables
    for k in baseline:
        np.testing.assert_allclose(m[k], baseline[k], rtol=1e-6)


def test_prewarm_failure_is_surfaced_and_falls_back(tiny_loaders,
                                                    monkeypatch, recwarn):
    """A poisoned eval step must not be swallowed by the prewarm thread
    (VERDICT r3 #7): the failure is recorded + warned, and evaluate()
    still works by falling back to the plain jit path."""
    trainer = _tiny_trainer(loaders=tiny_loaders)
    model = tiny_model()
    trainer.init_state(model, seed=0)
    baseline = trainer.evaluate(tiny_loaders[2])

    trainer2 = _tiny_trainer(loaders=tiny_loaders)
    trainer2.init_state(model, seed=0)

    class _Poisoned:
        def lower(self, *a, **k):
            raise RuntimeError('poisoned eval step')

        def __call__(self, *a, **k):
            return trainer2.__class__._run_eval_step  # never reached

    real_step = trainer2._eval_fwd
    monkeypatch.setattr(trainer2, '_eval_fwd', _Poisoned())
    trainer2.prewarm_eval(tiny_loaders[2])
    trainer2._prewarm_thread.join()
    assert trainer2.prewarm_error is not None
    assert any('prewarm_eval' in str(w.message) for w in recwarn.list)
    assert not trainer2._eval_compiled                # nothing cached
    # evaluate still runs via the (restored) jit path
    monkeypatch.setattr(trainer2, '_eval_fwd', real_step)
    m = trainer2.evaluate(tiny_loaders[2])
    for k in baseline:
        np.testing.assert_allclose(m[k], baseline[k], rtol=1e-6)


@pytest.mark.slow
def test_default_config_trains_all_layers(tiny_loaders):
    """The SHIPPED defaults (init_scheme='scaled', adam_eps=1e-16, bf16
    encoder) must actually move every layer's params at flagship DEPTH
    (18 cells + 4 block convs; narrow channels for CPU speed) — the r4
    failure mode was late layers frozen by clip-rescaled gradients
    falling below Adam's eps (VERDICT r4 next #2)."""
    import jax.numpy as jnp
    from nbasr_tpu.models.asr import ASRModel
    from nbasr_tpu.training.trainer import Trainer
    assert ASRModel.__dataclass_fields__['init_scheme'].default == 'scaled'
    import inspect
    assert inspect.signature(Trainer.__init__).parameters[
        'adam_eps'].default == 1e-16

    trainer = get_trainer(tiny_loaders, get_loss(), verbose=False,
                          eval_decoder='greedy')   # default adam_eps
    model = get_model([[1, 0], [1, 0, 0], [1, 0, 0, 0]], use_rnn=True,
                      dropout_rate=0.0, cell_dropout=0.0, data_norm=None,
                      block_filters=(40, 40, 60, 60), cell_groups=10,
                      rnn_units=32, compute_dtype=jnp.bfloat16)
    trainer.init_state(model, seed=0)
    p0 = jax.tree_util.tree_map(np.asarray, trainer.state.params)
    batch = next(iter(tiny_loaders[1]))
    for _ in range(4):
        trainer.step(batch, training=True, lr=1e-4)
    assert int(trainer.state.opt_state.total_notfinite) == 0
    p1 = trainer.state.params

    def rel_movement(sub):
        a = jax.tree_util.tree_leaves(p0[sub])
        b = jax.tree_util.tree_leaves(p1[sub])
        num = sum(float(np.abs(np.asarray(x, np.float32)
                               - np.asarray(y, np.float32)).sum())
                  for x, y in zip(a, b))
        den = sum(float(np.abs(np.asarray(x, np.float32)).sum())
                  for x in a) + 1e-12
        return num / den

    for sub in ('head', 'lstm', 'block0_conv', 'block3_cell5'):
        assert rel_movement(sub) > 1e-6, f'{sub} params frozen'

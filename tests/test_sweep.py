"""Sweep orchestrator tests: a micro sweep end-to-end into reference-format
dataset files, then queried back through from_folder."""

import pytest

from nbasr_tpu import from_folder
from nbasr_tpu.parallel.sweep import (
    unique_architectures, run_sweep, static_info_pass, device_groups,
)
from nbasr_tpu.search_space import get_model_hash


def test_unique_architectures_dedupes():
    archs = unique_architectures(limit=50)
    assert len(archs) == 50
    assert all(get_model_hash(a) == h for h, a in archs.items())


def test_device_groups():
    groups = device_groups(group_size=4)
    assert len(groups) == 2 and all(len(g) == 4 for g in groups)
    with pytest.raises(ValueError):
        device_groups(group_size=3)


@pytest.mark.slow
def test_micro_sweep_round_trip(tmp_path):
    """2 archs x 2 seeds x 2 epochs on synthetic data -> valid dataset files."""
    archs = [[[1, 0], [0, 0, 0], [1, 0, 0, 0]],
             [[0, 0], [1, 0, 1], [2, 0, 0, 1]]]
    tiny = dict(block_filters=(8, 8, 8, 8), cells_per_block=(1, 1, 1, 1),
                cell_groups=2, rnn_units=8, init_scheme='scaled')
    paths = run_sweep(archs, seeds=(1, 2), data_root='synthetic:12',
                      out_dir=str(tmp_path), batch_size=4, epochs=2,
                      use_rnn=False, eval_decoder='greedy', progress=False,
                      group_size=4, model_kwargs=tiny)  # 2 groups -> threaded
    assert len(paths) == 2

    si = static_info_pass(archs, out_dir=str(tmp_path), use_rnn=False,
                          feature_frames=64, model_kwargs=tiny)
    assert si.exists()

    d = from_folder(tmp_path, max_epochs=2, include_static_info=True,
                    devices=False)
    assert sorted(d.seeds) == [1, 2]
    info = d.full_info(archs[0], seed=1)
    assert len(info['val_per']) == 2
    assert info['arch_vec'] == archs[0]
    import jax
    import jax.numpy as jnp
    from nbasr_tpu.models import get_model, count_params
    m = get_model(archs[0], use_rnn=False, **tiny)
    expected = count_params(jax.eval_shape(
        lambda: m.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 80))))['params'])
    assert d.params(archs[0]) == expected
    assert d.val_acc(archs[0], seed=2) is not None


def test_sweep_resume_replays_log(tmp_path, monkeypatch):
    """An interrupted sweep must not lose finished jobs: completed rows
    are journaled to sweep-e{E}.jsonl as they finish, and a restarted
    run replays them instead of retraining (r5: the first e40 regeneration
    died mid-flight and lost 36 finished jobs)."""
    import nbasr_tpu.parallel.sweep as sw
    from nbasr_tpu import dataset as ds

    calls = []

    def fake_train(arch, seed, *a, **k):
        calls.append((str(arch), seed))
        return [0.5, 0.4], 0.45

    monkeypatch.setattr(sw, '_train_one', fake_train)
    archs = list(sw.unique_architectures(limit=2).values())
    paths = sw.run_sweep(archs, seeds=(1, 2), data_root='synthetic:4',
                         out_dir=str(tmp_path), epochs=2, progress=False)
    assert len(calls) == 4
    assert (tmp_path / 'sweep-e2.jsonl').exists()

    # delete the DBs (simulating a crash before the final write) and rerun
    for p in paths:
        import pathlib
        pathlib.Path(p).unlink()
    calls.clear()
    paths = sw.run_sweep(archs, seeds=(1, 2), data_root='synthetic:4',
                         out_dir=str(tmp_path), epochs=2, progress=False)
    assert calls == []          # everything replayed from the journal
    d = ds.from_folder(str(tmp_path), max_epochs=2, seeds=[1, 2],
                       devices=False)
    info = d.full_info(archs[0], seed=1, return_dict=True)
    assert info['val_per'] == [0.5, 0.4] and info['test_per'] == 0.45

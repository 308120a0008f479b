"""Dataset query-layer tests: synthesized pickle round-trips.

Exercises the exact on-disk format of the reference reader
(reference nasbench_asr/dataset.py:28-84,477-555).
"""

import pytest

from nbasr_tpu import dataset as ds
from nbasr_tpu import search_space as ss

ARCHS = [
    [[1, 0], [1, 0, 0], [1, 0, 0, 0]],
    [[0, 1], [2, 0, 1], [3, 1, 0, 1]],
    [[4, 0], [0, 1, 0], [1, 0, 1, 0]],
]


def _write_fake_folder(tmp_path, seeds=(1234, 1235), epochs=40,
                       devices=('tpu-v5e',), static_version=2):
    curves = {}
    for seed in seeds:
        rows = []
        for i, arch in enumerate(ARCHS):
            h = ss.get_model_hash(arch)
            curve = [0.9 - 0.01 * e - 0.001 * i - (seed % 10) * 1e-4 for e in range(epochs)]
            rows.append([h, curve, min(curve) + 0.02, arch])
            curves[(seed, h)] = curve
        header = ds.make_header('training', epochs=epochs, seed=seed)
        ds.write_db(tmp_path / f'nb-asr-e{epochs}-{seed}.pickle', header, rows)
    for dev in devices:
        rows = [[ss.get_model_hash(a), 0.001 * (i + 1)] for i, a in enumerate(ARCHS)]
        ds.write_db(tmp_path / f'nb-asr-bench-{dev}.pickle',
                    ds.make_header('benchmarking', device=dev), rows)
    rows = [[ss.get_model_hash(a), 1000 * (i + 1), 5000 * (i + 1)] for i, a in enumerate(ARCHS)]
    ds.write_db(tmp_path / 'nb-asr-info.pickle',
                ds.make_header('static', version=static_version), rows)
    return curves


def test_round_trip_full_info(tmp_path):
    curves = _write_fake_folder(tmp_path)
    d = ds.from_folder(tmp_path, include_static_info=True)
    assert sorted(d.seeds) == [1234, 1235]
    assert d.epochs == 40
    info = d.full_info(ARCHS[0], seed=1234)
    h = ss.get_model_hash(ARCHS[0])
    assert info['model_hash'] == h
    assert info['val_per'] == curves[(1234, h)]
    assert info['seed'] == 1234
    assert info['arch_vec'] == ARCHS[0]
    assert 'tpu-v5e' in info
    assert info['info'] == {'params': 1000, 'flops': 5000}


def test_val_acc_and_test_acc(tmp_path):
    curves = _write_fake_folder(tmp_path)
    d = ds.from_folder(tmp_path, devices=False)
    h = ss.get_model_hash(ARCHS[1])
    curve = curves[(1235, h)]
    assert d.val_acc(ARCHS[1], seed=1235) == min(curve)
    assert d.val_acc(ARCHS[1], epoch=5, best=False, seed=1235) == curve[4]
    assert d.val_acc(ARCHS[1], epoch=5, best=True, seed=1235) == min(curve[:5])
    assert d.test_acc(ARCHS[1], seed=1235) == pytest.approx(min(curve) + 0.02)


def test_latency_params_flops(tmp_path):
    _write_fake_folder(tmp_path)
    d = ds.from_folder(tmp_path, include_static_info=True)
    assert d.latency(ARCHS[2]) == [[0.003]]
    assert d.latency(ARCHS[2], devices='tpu-v5e', return_dict=True) == {
        'tpu-v5e': {'latency': 0.003}}
    assert d.params(ARCHS[2]) == 3000
    assert d.flops(ARCHS[2]) == 15000


def test_contains_uses_isomorphism(tmp_path):
    _write_fake_folder(tmp_path)
    d = ds.from_folder(tmp_path, devices=False)
    assert ARCHS[0] in d
    assert [[5, 0], [5, 0, 0], [5, 0, 0, 0]] not in d


def test_unknown_arch_returns_none(tmp_path):
    _write_fake_folder(tmp_path)
    d = ds.from_folder(tmp_path, devices=False)
    missing = [[0, 0], [0, 0, 0], [0, 0, 0, 0]]
    assert d.full_info(missing) is None
    assert d.test_acc(missing) is None
    assert d.val_acc(missing) is None


def test_seed_filtering(tmp_path):
    _write_fake_folder(tmp_path, seeds=(1234, 1235, 1236))
    d = ds.from_folder(tmp_path, seeds=[1234, 1236], devices=False)
    assert sorted(d.seeds) == [1234, 1236]


def test_wrong_type_rejected(tmp_path):
    _write_fake_folder(tmp_path)
    with pytest.raises(ValueError):
        ds.Dataset([str(tmp_path / 'nb-asr-info.pickle')])


def test_static_v1_has_no_flops(tmp_path):
    rows = [[ss.get_model_hash(ARCHS[0]), 123]]
    path = ds.write_db(tmp_path / 'nb-asr-info.pickle',
                       ds.make_header('static', version=1), rows)
    s = ds.StaticInfoDataset(str(path))
    assert s.params(ARCHS[0]) == 123
    with pytest.raises(ValueError):
        s.flops(ARCHS[0])


def test_cross_seed_validation_catches_mismatch(tmp_path):
    # seed files with different model sets must be rejected
    h0 = ss.get_model_hash(ARCHS[0])
    h1 = ss.get_model_hash(ARCHS[1])
    ds.write_db(tmp_path / 'nb-asr-e40-1.pickle',
                ds.make_header('training', epochs=40, seed=1),
                [[h0, [0.5], 0.5, ARCHS[0]]])
    ds.write_db(tmp_path / 'nb-asr-e40-2.pickle',
                ds.make_header('training', epochs=40, seed=2),
                [[h1, [0.5], 0.5, ARCHS[1]]])
    with pytest.raises(ValueError):
        ds.from_folder(tmp_path, devices=False)

"""Interop: the REFERENCE implementation can read datasets this framework
writes, and both agree on hashes and query results.

Loads the reference package from /root/reference (skipped when absent).
This is the strongest format-compatibility evidence available without the
released pickle files.
"""

import sys

import pytest

ref_path = '/root/reference'


def _load_reference_dataset_module():
    import pathlib
    if not pathlib.Path(ref_path).exists():
        pytest.skip('reference repo not available')
    pytest.importorskip('networkx')
    pytest.importorskip('tqdm')
    if ref_path not in sys.path:
        sys.path.insert(0, ref_path)
    try:
        from nasbench_asr import dataset as ref_dataset
        from nasbench_asr import search_space as ref_space
    except ImportError as e:
        pytest.skip(f'reference import failed: {e}')
    return ref_dataset, ref_space


ARCHS = [
    [[1, 0], [1, 0, 0], [1, 0, 0, 0]],
    [[0, 1], [2, 0, 1], [3, 1, 0, 1]],
]


def test_reference_reads_our_files(tmp_path):
    ref_dataset, _ = _load_reference_dataset_module()
    from nbasr_tpu import dataset as ours
    from nbasr_tpu.search_space import get_model_hash

    for seed in (1, 2):
        rows = [[get_model_hash(a), [0.5 - 0.1 * i, 0.4 - 0.1 * i],
                 0.45 - 0.1 * i, a] for i, a in enumerate(ARCHS)]
        ours.write_db(tmp_path / f'nb-asr-e2-{seed}.pickle',
                      ours.make_header('training', epochs=2, seed=seed), rows)
    ours.write_db(tmp_path / 'nb-asr-bench-tpu-v5e.pickle',
                  ours.make_header('benchmarking', device='tpu-v5e'),
                  [[get_model_hash(a), 0.001] for a in ARCHS])
    ours.write_db(tmp_path / 'nb-asr-info.pickle',
                  ours.make_header('static', version=2),
                  [[get_model_hash(a), 100, 200] for a in ARCHS])

    d = ref_dataset.from_folder(str(tmp_path), max_epochs=2,
                                include_static_info=True)
    info = d.full_info(ARCHS[0], seed=1)
    assert info['val_per'] == [0.5, 0.4]
    assert info['test_per'] == 0.45
    assert d.val_acc(ARCHS[1], seed=2) == pytest.approx(0.3)
    assert d.latency(ARCHS[0]) == [[0.001]]
    assert d.params(ARCHS[0]) == 100 and d.flops(ARCHS[0]) == 200


def test_hashes_agree_with_reference_on_sample():
    _, ref_space = _load_reference_dataset_module()
    from nbasr_tpu.search_space import get_model_hash, get_random_architectures
    for arch in get_random_architectures(25, seed=99):
        assert get_model_hash(arch) == ref_space.get_model_hash(arch)

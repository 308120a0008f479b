"""CLI subcommand tests (in-process via cli.main)."""

import json

import pytest

from nbasr_tpu import cli


GOLDEN = ['1', '0', '1', '0', '0', '1', '0', '0', '0']


def test_hash_command(capsys):
    cli.main(['hash'] + GOLDEN)
    assert capsys.readouterr().out.strip() == '36855332a5778e0df5114305bc3ce238'


def test_query_command(tmp_path, capsys):
    from nbasr_tpu import dataset as ds
    from nbasr_tpu.search_space import get_model_hash
    arch = [[1, 0], [1, 0, 0], [1, 0, 0, 0]]
    ds.write_db(tmp_path / 'nb-asr-e40-7.pickle',
                ds.make_header('training', epochs=40, seed=7),
                [[get_model_hash(arch), [0.5, 0.4], 0.42, arch]])
    cli.main(['query', str(tmp_path)] + GOLDEN + ['--seed', '7'])
    out = json.loads(capsys.readouterr().out)
    assert out['test_per'] == 0.42


def test_viz_command(tmp_path, capsys):
    cli.main(['viz'] + GOLDEN + ['--out', str(tmp_path)])
    out = capsys.readouterr().out.strip().splitlines()
    assert out and all(line for line in out)


@pytest.mark.slow
def test_proxy_command(capsys):
    cli.main(['proxy', 'num_params'] + GOLDEN + ['--frames', '32'])
    # proxies evaluate the rnn-free encoder (like the reference's bn=False
    # prunable copy): 22,971,649 params for the flagship arch
    assert float(capsys.readouterr().out.strip()) == 22971649.0

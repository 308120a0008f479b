"""Batching pipeline tests: static shapes, bucketing, curriculum, sharding,
and TIMIT file parsing on synthesized wav files."""

import numpy as np
import pytest

from nbasr_tpu.data import (
    Loader, make_synthetic_split, get_dataloaders, load_train_stats,
    read_wav, read_phn, PhonemeEncoder,
)
from nbasr_tpu.data.timit import TimitSplit
from nbasr_tpu.ops.frontend import FrontendConfig, num_frames


def test_loader_static_shapes():
    ds = make_synthetic_split(40, seed=0)
    loader = Loader(ds, batch_size=8)
    shapes = set()
    rows = 0
    for batch in loader:
        shapes.add(batch['audio'].shape)
        assert batch['labels'].shape[0] == batch['audio'].shape[0]
        assert batch['valid'].shape == (batch['audio'].shape[0],)
        rows += int(batch['valid'].sum())
    assert rows == 40                      # every utterance exactly once
    assert len(shapes) <= 2                # one static shape per bucket


def test_loader_feature_sizes_consistent():
    ds = make_synthetic_split(16, seed=1)
    cfg = FrontendConfig()
    loader = Loader(ds, batch_size=4)
    for batch in loader:
        for r in range(len(batch['valid'])):
            if batch['valid'][r]:
                assert 0 < batch['feature_size'][r] <= batch['audio'].shape[1]
                # frames fit in the padded frame budget of the bucket
                assert batch['feature_size'][r] <= max(loader.bucket_frames)


def test_loader_bucket_assignment():
    ds = make_synthetic_split(60, seed=2, min_samples=4000, max_samples=80000)
    loader = Loader(ds, batch_size=64)
    cfg = loader.frontend
    for batch in loader:
        frames = batch['feature_size'][batch['valid'] > 0]
        T = batch['audio'].shape[1]
        if T == loader.bucket_samples[0]:
            assert (frames <= 300).all()
        else:
            assert (frames > 300).any() or len(frames) > 0


def test_loader_shuffle_determinism_and_epoch_variation():
    ds = make_synthetic_split(30, seed=3)
    a = Loader(ds, batch_size=8, shuffle=True, seed=7)
    b = Loader(ds, batch_size=8, shuffle=True, seed=7)
    batch_a = next(iter(a))
    batch_b = next(iter(b))
    np.testing.assert_array_equal(batch_a['labels'], batch_b['labels'])
    batch_a2 = next(iter(a))  # second epoch reshuffles
    assert not np.array_equal(batch_a['labels'], batch_a2['labels'])


def test_sharding_partitions_data():
    """Schedule-global sharding: shards agree on steps/shapes and the
    valid rows of one global step partition the data across shards."""
    ds = make_synthetic_split(21, seed=4)
    l0 = Loader(ds, batch_size=64, num_shards=2, shard_index=0)
    l1 = Loader(ds, batch_size=64, num_shards=2, shard_index=1)
    assert l0.indices == l1.indices  # global schedule on both shards
    assert l0.steps == l1.steps
    seen = 0
    for b0, b1 in zip(iter(l0), iter(l1)):
        assert b0['audio'].shape == b1['audio'].shape
        seen += int(b0['valid'].sum() + b1['valid'].sum())
    assert seen == 21


def test_curriculum_stream_orders_short_first():
    enc, train, val, test = get_dataloaders('synthetic:64', batch_size=8,
                                            curriculum=((16000, 1), (32000, 1)))
    it = iter(train)
    first = next(it)
    # first curriculum batch contains only audio < 16000 samples
    sizes = first['feature_size'][first['valid'] > 0]
    assert (sizes <= num_frames(16000, FrontendConfig())).all()
    assert train.steps == sum(1 for _ in val) * 0 + train.full.steps


def test_get_dataloaders_synthetic():
    enc, train, val, test = get_dataloaders('synthetic:32', batch_size=8)
    assert isinstance(enc, PhonemeEncoder)
    assert val.steps > 0 and test.steps > 0
    batch = next(iter(val))
    assert batch['labels'].max() < enc.vocab_size


def test_load_train_stats():
    mean, var = load_train_stats()
    assert mean.shape == (80,) and var.shape == (80,)
    assert (var > 0).all()


def _write_riff(path, audio, rate=16000):
    import struct
    pcm = (np.clip(audio, -1, 1) * 32767).astype('<i2').tobytes()
    with open(path, 'wb') as f:
        f.write(b'RIFF' + struct.pack('<I', 36 + len(pcm)) + b'WAVE')
        f.write(b'fmt ' + struct.pack('<IHHIIHH', 16, 1, 1, rate, rate * 2, 2, 16))
        f.write(b'data' + struct.pack('<I', len(pcm)) + pcm)


def _write_sphere(path, audio, rate=16000):
    pcm = (np.clip(audio, -1, 1) * 32767).astype('<i2').tobytes()
    header = (f'NIST_1A\n   1024\nsample_rate -i {rate}\n'
              f'sample_n_bytes -i 2\nsample_byte_format -s2 01\n'
              f'channel_count -i 1\nend_head\n')
    with open(path, 'wb') as f:
        f.write(header.encode('ascii').ljust(1024, b' '))
        f.write(pcm)


def test_read_wav_riff_and_sphere(tmp_path):
    audio = np.sin(np.linspace(0, 100, 5000)).astype(np.float32) * 0.4
    _write_riff(tmp_path / 'a.RIFF.WAV', audio)
    _write_sphere(tmp_path / 'b.WAV', audio)
    for name in ['a.RIFF.WAV', 'b.WAV']:
        out, rate = read_wav(tmp_path / name)
        assert rate == 16000
        np.testing.assert_allclose(out, audio, atol=1e-4)


def test_timit_split_scan(tmp_path):
    d = tmp_path / 'TRAIN' / 'DR1' / 'SPK1'
    d.mkdir(parents=True)
    audio = np.random.RandomState(0).randn(6000).astype(np.float32) * 0.1
    for stem in ['SX1', 'SA1', 'SI2']:
        _write_sphere(d / f'{stem}.WAV', audio)
        (d / f'{stem}.PHN').write_text('0 1000 h#\n1000 3000 aa\n3000 6000 h#\n')
    enc = PhonemeEncoder(48)
    split = TimitSplit(tmp_path, 'TRAIN', enc)
    assert len(split) == 2  # SA1 dropped (reference audio_sentence_timit.py:97-101)
    assert split.labels[0].tolist() == enc.encode(['h#', 'aa', 'h#'])


def test_phn_parsing(tmp_path):
    p = tmp_path / 'x.PHN'
    p.write_text('0 160 h#\n160 1200 sh\n1200 2000 iy\n')
    assert read_phn(p) == ['h#', 'sh', 'iy']

"""TensorBoard scalar writer (utils/tbwriter.py) and eval transcript
surfaces (trainer.transcribe / evaluate(return_transcripts=)) — the
reference capabilities from callbacks/tensorboard.py:16-28 and
trainer.py:493-500."""

import struct

import numpy as np
import pytest

from nbasr_tpu.utils.tbwriter import SummaryWriter, _masked_crc


def _read_records(path):
    """Parse TFRecord framing, verifying both CRCs."""
    records = []
    with open(path, 'rb') as f:
        data = f.read()
    off = 0
    while off < len(data):
        header = data[off:off + 8]
        (length,) = struct.unpack('<Q', header)
        (hcrc,) = struct.unpack('<I', data[off + 8:off + 12])
        assert hcrc == _masked_crc(header)
        rec = data[off + 12:off + 12 + length]
        (dcrc,) = struct.unpack('<I', data[off + 12 + length:off + 16 + length])
        assert dcrc == _masked_crc(rec)
        records.append(rec)
        off += 16 + length
    return records


def _varint(data, off):
    shift, val = 0, 0
    while True:
        b = data[off]
        val |= (b & 0x7F) << shift
        off += 1
        if not b & 0x80:
            return val, off
        shift += 7


def _parse_fields(msg):
    """proto wire format -> {field_num: [values]} (raw bytes for len-type)."""
    fields = {}
    off = 0
    while off < len(msg):
        key, off = _varint(msg, off)
        num, wire = key >> 3, key & 7
        if wire == 0:
            val, off = _varint(msg, off)
        elif wire == 1:
            val = struct.unpack('<d', msg[off:off + 8])[0]
            off += 8
        elif wire == 5:
            val = struct.unpack('<f', msg[off:off + 4])[0]
            off += 4
        elif wire == 2:
            n, off = _varint(msg, off)
            val = msg[off:off + n]
            off += n
        else:
            raise AssertionError(f'unexpected wire type {wire}')
        fields.setdefault(num, []).append(val)
    return fields


def test_event_file_roundtrip(tmp_path):
    w = SummaryWriter(str(tmp_path))
    w.scalar('loss', 2.5, step=3)
    w.scalar('val_ler', 0.75, step=4)
    w.close()
    records = _read_records(w.path)
    assert len(records) == 3
    first = _parse_fields(records[0])
    assert first[3] == [b'brain.Event:2']

    seen = {}
    for rec in records[1:]:
        ev = _parse_fields(rec)
        step = ev[2][0]
        summary = _parse_fields(ev[5][0])
        value = _parse_fields(summary[1][0])
        tag = value[1][0].decode()
        seen[tag] = (step, value[2][0])
    assert seen['loss'][0] == 3
    assert seen['loss'][1] == pytest.approx(2.5)
    assert seen['val_ler'] == (4, pytest.approx(0.75))


def test_crc32c_known_vectors():
    # CRC-32C("123456789") = 0xE3069283 (Castagnoli test vector); the
    # masked form is what TFRecord stores.
    from nbasr_tpu.utils.tbwriter import _crc32c
    assert _crc32c(b'123456789') == 0xE3069283
    crc = 0xE3069283
    assert _masked_crc(b'123456789') == (((crc >> 15) | (crc << 17))
                                         + 0xA282EAD8 & 0xFFFFFFFF)


@pytest.fixture(scope='module')
def tiny_trainer():
    from nbasr_tpu.data.pipeline import get_dataloaders
    from nbasr_tpu.models import get_model
    from nbasr_tpu.training import get_loss, get_trainer
    loaders = get_dataloaders('synthetic:6', batch_size=2, curriculum=())
    trainer = get_trainer(loaders, get_loss(), verbose=False,
                          eval_decoder='greedy')
    model = get_model([[1, 0], [1, 0, 0], [1, 0, 0, 0]], use_rnn=False,
                      block_filters=(16, 16, 24, 24), cell_groups=4,
                      init_scheme='scaled')
    trainer.init_state(model, seed=0)
    return trainer


def test_eval_transcripts(tiny_trainer):
    m, transcripts = tiny_trainer.evaluate(tiny_trainer.data_validate,
                                           return_transcripts=2)
    assert set(m) == {'ctc_loss', 'wer', 'ler'}
    assert 1 <= len(transcripts) <= 2
    for hyp, ref in transcripts:
        assert isinstance(hyp, str) and isinstance(ref, str)
        assert len(ref.split()) >= 2  # real reference labels decode to phonemes
        for tok in ref.split():
            assert tok in tiny_trainer.encoder.phonemes


def test_train_writes_tensorboard(tmp_path):
    from nbasr_tpu.data.pipeline import get_dataloaders
    from nbasr_tpu.models import get_model
    from nbasr_tpu.training import get_loss, get_trainer
    loaders = get_dataloaders('synthetic:4', batch_size=2, curriculum=())
    trainer = get_trainer(loaders, get_loss(), verbose=False,
                          save_dir=str(tmp_path), eval_decoder='greedy',
                          tb_step_interval=1)
    model = get_model([[1, 0], [1, 0, 0], [1, 0, 0, 0]], use_rnn=False,
                      block_filters=(16, 16, 24, 24), cell_groups=4,
                      init_scheme='scaled')
    trainer.train(model, epochs=1, lr=1e-4)
    events = list((tmp_path / 'tb').glob('events.out.tfevents.*'))
    assert len(events) == 1
    records = _read_records(events[0])
    tags = set()
    for rec in records[1:]:
        ev = _parse_fields(rec)
        if 5 in ev:
            summary = _parse_fields(ev[5][0])
            tags.add(_parse_fields(summary[1][0])[1][0].decode())
    assert {'batch_ctc_loss', 'epoch_ctc_loss', 'epoch_val_ler',
            'lr'} <= tags

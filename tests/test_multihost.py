"""Multi-host (DCN) data parallelism, simulated with 2 local processes.

BASELINE.md's parity bar asks for the N>=2-hosts story; real multi-host
hardware is not available in CI, so this spawns two `jax.distributed`
processes (4 virtual CPU devices each = 8 global), each feeding its own
half of every global batch through ParallelTrainer's
``make_array_from_process_local_data`` path, and asserts the final
parameters match a single-process 8-device run of the same batches.
"""

import os
import pathlib
import socket
import subprocess
import sys

import numpy as np
import pytest

TINY = dict(use_rnn=False, block_filters=(8, 8, 16, 16), cell_groups=2,
            cells_per_block=(1, 1, 1, 1), init_scheme='scaled',
            dropout_rate=0.0, cell_dropout=0.0)
ARCH = [[1, 0], [1, 0, 0], [1, 0, 0, 0]]
N_STEPS = 3
GLOBAL_B = 8
N_SAMPLES = 3600


def make_global_batches():
    """Deterministic global batches shared by every topology."""
    rng = np.random.RandomState(7)
    batches = []
    for _ in range(N_STEPS):
        audio = rng.randn(GLOBAL_B, N_SAMPLES).astype(np.float32) * 0.1
        labels = rng.randint(1, 49, size=(GLOBAL_B, 6)).astype(np.int32)
        batches.append({
            'audio': audio,
            'feature_size': np.full((GLOBAL_B,), 21, np.int32),
            'labels': labels,
            'label_size': np.full((GLOBAL_B,), 6, np.int32),
            'valid': np.ones((GLOBAL_B,), np.float32),
        })
    return batches


def run_steps(local_batches, dp):
    """Init the tiny model and run the batches; returns final params."""
    import jax
    import jax.numpy as jnp
    from nbasr_tpu.models import get_model
    from nbasr_tpu.training import get_loss
    from nbasr_tpu.parallel.train_parallel import ParallelTrainer
    from nbasr_tpu.parallel.mesh import make_mesh
    from nbasr_tpu.data.pipeline import get_dataloaders

    loaders = get_dataloaders('synthetic:4', batch_size=2, curriculum=())
    mesh = make_mesh(dp=dp, tp=1)
    trainer = ParallelTrainer(loaders, get_loss(), mesh=mesh, verbose=False,
                              eval_decoder='greedy')
    model = get_model(ARCH, **TINY)
    trainer.init_state(model, seed=0)
    for b in local_batches:
        trainer.state = trainer._train_step(trainer.state,
                                            trainer._put_batch(b),
                                            jnp.float32(1e-4))
    params = jax.tree_util.tree_map(
        lambda x: np.asarray(jax.device_get(x)), trainer.state.params)
    return params


def run_train(num_shards, shard_index, dp, epochs=2):
    """End-to-end ``ParallelTrainer.train`` over SHARDED dataloaders.

    Exercises the full multi-host story: schedule-global Loader sharding
    (train AND eval splits), curriculum, per-epoch eval with metric
    accumulation, and the lead-process artifact guards.  Returns
    ``(final_params, history)``.
    """
    import jax
    from nbasr_tpu.models import get_model
    from nbasr_tpu.training import get_loss
    from nbasr_tpu.parallel.train_parallel import ParallelTrainer
    from nbasr_tpu.parallel.mesh import make_mesh
    from nbasr_tpu.data.pipeline import get_dataloaders

    loaders = get_dataloaders('synthetic:12', batch_size=4,
                              curriculum=((16000, 1),),
                              num_shards=num_shards, shard_index=shard_index)
    mesh = make_mesh(dp=dp, tp=1)
    trainer = ParallelTrainer(loaders, get_loss(), mesh=mesh, verbose=False,
                              eval_decoder='greedy')
    model = get_model(ARCH, **TINY)
    history, _ = trainer.train(model, epochs=epochs, lr=1e-4, seed=0)
    params = jax.tree_util.tree_map(
        lambda x: np.asarray(jax.device_get(x)), trainer.state.params)
    history = {k: np.asarray(v, np.float64)
               for k, v in history.items() if k != 'epoch_seconds'}
    return params, history


def _flat(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flat(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


def _free_port():
    s = socket.socket()
    s.bind(('localhost', 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_dp_matches_single_process(tmp_path):
    # reference: single process, 8 virtual devices (this test process)
    ref = _flat(run_steps(make_global_batches(), dp=8))

    port = _free_port()
    worker = pathlib.Path(__file__).parent / '_multihost_worker.py'
    env = {k: v for k, v in os.environ.items()
           if k not in ('XLA_FLAGS', 'JAX_PLATFORMS')}
    outs = [tmp_path / f'p{i}.npz' for i in range(2)]
    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(i), '2', str(port), str(outs[i])],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(2)]
    logs = [p.communicate(timeout=900)[0].decode() for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f'worker failed:\n{log[-3000:]}'

    got = [dict(np.load(o)) for o in outs]
    # both processes hold identical (replicated) final params
    for k in got[0]:
        np.testing.assert_array_equal(got[0][k], got[1][k])
    # and they match the single-process run (same batches, same seed; only
    # the reduction topology differs)
    for path, v in ref.items():
        key = '/'.join(path)
        np.testing.assert_allclose(got[0][key], v, rtol=2e-4, atol=2e-5,
                                   err_msg=key)


@pytest.mark.slow
def test_two_process_end_to_end_train(tmp_path):
    """`Trainer.train()` is multi-host-correct (VERDICT r4 next #4): two
    jax.distributed processes run the FULL host loop (sharded train+eval
    loaders, curriculum, per-epoch eval) and end with bit-matching params,
    which also match a single-process run of the same global schedule."""
    port = _free_port()
    worker = pathlib.Path(__file__).parent / '_multihost_worker.py'
    env = {k: v for k, v in os.environ.items()
           if k not in ('XLA_FLAGS', 'JAX_PLATFORMS')}
    outs = [tmp_path / f't{i}.npz' for i in range(2)]
    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(i), '2', str(port), str(outs[i]),
         'train'],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(2)]
    logs = [p.communicate(timeout=900)[0].decode() for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f'worker failed:\n{log[-3000:]}'

    got = [dict(np.load(o)) for o in outs]
    # both processes agree bit-for-bit on final params AND history
    for k in got[0]:
        np.testing.assert_array_equal(got[0][k], got[1][k], err_msg=k)

    # the same global schedule, unsharded, in this process (8 devices):
    # identical global batches, only the assembly path differs.  The two
    # topologies reduce gradients in different float orders, and two
    # epochs of clip+Adam amplify that reassociation noise (most at
    # block0, whose gradients are ~1e13 larger than the head's — PERF.md
    # r4), so elementwise tolerances are miscalibrated here; bound the
    # per-parameter relative L2 drift instead.  The load-bearing
    # multi-host assertion is the bit-match between processes above.
    ref_params, ref_history = run_train(num_shards=1, shard_index=0, dp=8)
    for path, v in _flat(ref_params).items():
        key = '/'.join(path)
        drift = (np.linalg.norm(got[0][key] - v)
                 / max(np.linalg.norm(v), 1e-12))
        # measured spread across repeat runs: 9e-3 .. 7e-2 at the conv
        # biases (XLA:CPU multi-threaded reductions are not run-to-run
        # deterministic, and two epochs of clip+Adam amplify the noise
        # most where gradients are ~1e13 — PERF.md r4).  0.15 still fails
        # on any real assembly bug: feeding wrong/duplicated rows drifts
        # the trajectory O(1) within an epoch.
        assert drift < 0.15, f'{key}: relative L2 drift {drift:.2e}'
    for k, v in ref_history.items():
        if k in ('val_wer', 'val_ler'):
            # decode is discontinuous: cross-topology float noise in the
            # logits can flip an argmax token, moving the ratio by ~1 edit
            np.testing.assert_allclose(got[0][f'history/{k}'], v, atol=0.08,
                                       err_msg=k)
        else:
            np.testing.assert_allclose(got[0][f'history/{k}'], v,
                                       rtol=1e-3, atol=1e-4, err_msg=k)


def test_loader_sharding_partitions_rows():
    """Schedule-global sharding: every shard sees the same steps and
    shapes; the union of valid rows at each step is the unsharded batch."""
    from nbasr_tpu.data.pipeline import Loader, make_synthetic_split
    ds = make_synthetic_split(11, seed=0)
    full = Loader(ds, batch_size=4)
    shards = [Loader(ds, batch_size=4, num_shards=2, shard_index=i)
              for i in range(2)]
    assert shards[0].steps == shards[1].steps == full.steps
    for b_full, b0, b1 in zip(iter(full), iter(shards[0]), iter(shards[1])):
        merged = {k: np.concatenate([b0[k], b1[k]]) for k in b0}
        assert merged['audio'].shape == b_full['audio'].shape
        # same utterances in the same global row order
        np.testing.assert_array_equal(merged['valid'], b_full['valid'])
        np.testing.assert_array_equal(merged['audio'], b_full['audio'])
        np.testing.assert_array_equal(merged['labels'], b_full['labels'])
        np.testing.assert_array_equal(merged['label_size'],
                                      b_full['label_size'])

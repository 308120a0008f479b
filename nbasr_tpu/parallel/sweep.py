"""Sweep orchestrator: regenerate the NAS-Bench-ASR dataset on TPU meshes.

The genuinely new layer of the TPU framework (SURVEY.md §2.6, §7.8): the
reference farmed its 8,242-arch × 3-seed sweep out to an external cluster
one process per arch (``train.py`` CLI); here the sweep is a first-class
scheduler that

  - enumerates unique architectures (one representative per graph hash),
  - maps (arch × seed) jobs onto device groups (sub-meshes) of the local
    slice — each job trains data-parallel inside its group,
  - collects per-epoch validation-PER curves + test PER and writes
    ``nb-asr-e{E}-{seed}.pickle`` files in the exact reference format
    (readable by both this package's and the reference's ``from_folder``),
  - runs static-info (params + XLA-counted FLOPs → ``nb-asr-info.pickle``)
    and latency-benchmarking (→ ``nb-asr-bench-{device}.pickle``) passes.
"""

import time

import numpy as np

from .. import dataset as ds
from ..search_space import ALL_OPS, get_all_architectures, get_model_hash
from ..utils import flatten

__all__ = ['unique_architectures', 'run_sweep', 'static_info_pass',
           'benchmark_pass', 'device_groups']


def unique_architectures(limit=None, ops=None, nodes=None):
    """One representative arch per unique graph hash (8,242 by default)."""
    seen = {}
    for arch in get_all_architectures(ops, nodes):
        h = get_model_hash(arch, ops=ops)
        if h not in seen:
            seen[h] = arch
            if limit is not None and len(seen) >= limit:
                break
    return seen  # {hash: arch}


def device_groups(devices=None, group_size=None):
    """Partition devices into equally-sized scheduling groups."""
    import jax
    devices = list(devices if devices is not None else jax.devices())
    group_size = group_size or len(devices)
    if len(devices) % group_size:
        raise ValueError(f'{len(devices)} devices not divisible by '
                         f'group_size={group_size}')
    return [devices[i:i + group_size]
            for i in range(0, len(devices), group_size)]


def _train_one(arch, seed, data_root, batch_size, epochs, lr, devices,
               use_rnn, eval_decoder, save_dir, verbose, model_kwargs):
    from ..models import get_model
    from ..training import get_dataloaders, get_loss, get_trainer
    from .mesh import make_mesh
    from .train_parallel import ParallelTrainer

    loaders = get_dataloaders(data_root, batch_size=batch_size)
    model = get_model(arch, use_rnn=use_rnn, dropout_rate=0.2, data_norm=True,
                      **(model_kwargs or {}))
    if devices is not None and len(devices) > 1:
        trainer = ParallelTrainer(loaders, get_loss(),
                                  mesh=make_mesh(devices=devices),
                                  save_dir=save_dir, verbose=verbose,
                                  eval_decoder=eval_decoder)
    else:
        trainer = get_trainer(loaders, get_loss(), save_dir=save_dir,
                              verbose=verbose, eval_decoder=eval_decoder)
    history, test_scores = trainer.train(
        model, epochs=epochs, lr=lr, seed=seed,
        model_name='_'.join(map(str, flatten(arch))) + f'_s{seed}')
    return history['val_ler'], test_scores['val_ler']


def run_sweep(archs, seeds=(1234, 1235, 1236), *, data_root='TIMIT',
              out_dir='nb-asr-db', batch_size=64, epochs=40, lr=1e-4,
              use_rnn=True, eval_decoder='beam', group_size=None,
              save_dir=None, verbose=False, progress=True, model_kwargs=None,
              workers=None, resume=True):
    """Train ``archs`` × ``seeds`` and write reference-format training DBs.

    ``archs``: list of arch vectors, or an int (take the first N unique
    hashes), or ``None`` (all 8,242 — a full regeneration run).
    Jobs are scheduled round-robin over local device groups; inside a group
    the job runs data-parallel.  ``workers`` > number of groups oversubscribes
    devices — worker threads share groups round-robin (useful on one chip:
    thread A's host work overlaps thread B's device work, and XLA dispatch
    plus the compilation cache are thread-safe).  Returns the written paths.

    ``resume``: every completed job is appended to
    ``{out_dir}/sweep-e{epochs}.jsonl`` as it finishes; a restarted sweep
    replays finished (seed, hash) rows from the log instead of retraining
    them, so an interrupted multi-hour regeneration loses at most the
    in-flight jobs (a long sweep is exactly where preemption happens).
    """
    import json
    import pathlib
    import threading as _threading

    if archs is None or isinstance(archs, int):
        archs = list(unique_architectures(limit=archs).values())
    groups = device_groups(group_size=group_size)
    if workers is not None and workers > len(groups):
        groups = [groups[i % len(groups)] for i in range(workers)]

    jobs = [(seed, i, arch) for seed in seeds for i, arch in enumerate(archs)]
    per_seed_rows = {seed: [None] * len(archs) for seed in seeds}

    log_path = pathlib.Path(out_dir) / f'sweep-e{epochs}.jsonl'
    log_lock = _threading.Lock()
    done = {}
    if resume and log_path.exists():
        with open(log_path) as f:
            for line in f:
                try:
                    rec = json.loads(line)
                except ValueError:
                    continue    # torn tail write from a killed run
                done[(rec['seed'], rec['hash'])] = rec
        if progress and done:
            print(f'[sweep] resume: {len(done)} finished jobs in {log_path}')

    def run_job(job, group):
        seed, i, arch = job
        h = get_model_hash(arch)
        cached = done.get((seed, h))
        if cached is not None:
            per_seed_rows[seed][i] = [h, cached['curve'], cached['test'],
                                      arch]
            return
        t0 = time.time()
        curve, test_per = _train_one(
            arch, seed, data_root, batch_size, epochs, lr, group,
            use_rnn, eval_decoder, save_dir, verbose, model_kwargs)
        row = [h, list(map(float, curve)), float(test_per), arch]
        per_seed_rows[seed][i] = row
        if resume:
            rec = json.dumps({'seed': seed, 'hash': h, 'curve': row[1],
                              'test': row[2]})
            with log_lock:
                log_path.parent.mkdir(parents=True, exist_ok=True)
                with open(log_path, 'a') as f:
                    f.write(rec + '\n')
        if progress:
            print(f'[sweep] seed {seed} arch {i + 1}/{len(archs)} '
                  f'hash {h[:8]} best_val {min(curve):.4f} '
                  f'test {test_per:.4f} ({time.time() - t0:.0f}s)')

    if len(groups) > 1:
        # one worker thread per device group: jobs run concurrently, each
        # confined to its group's sub-mesh (JAX dispatch is thread-safe)
        import queue as _queue
        import threading
        q = _queue.Queue()
        for job in jobs:
            q.put(job)

        def worker(group):
            while True:
                try:
                    job = q.get_nowait()
                except _queue.Empty:
                    return
                run_job(job, group)

        threads = [threading.Thread(target=worker, args=(g,)) for g in groups]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
    else:
        for job in jobs:
            run_job(job, groups[0])

    paths = []
    for seed, rows in per_seed_rows.items():
        header = ds.make_header('training', epochs=epochs, seed=seed)
        paths.append(ds.write_db(
            f'{out_dir}/nb-asr-e{epochs}-{seed}.pickle', header, rows))
    return paths


def static_info_pass(archs=None, out_dir='nb-asr-db', use_rnn=True,
                     feature_frames=500, model_kwargs=None):
    """Write nb-asr-info.pickle (params + XLA-counted FLOPs per arch)."""
    import jax
    import jax.numpy as jnp
    from ..models import count_params, get_model

    if archs is None or isinstance(archs, int):
        archs = list(unique_architectures(limit=archs).values())

    rows = []
    feats = jnp.zeros((1, feature_frames, 80), jnp.float32)
    sizes = jnp.asarray([feature_frames], jnp.int32)
    for arch in archs:
        model = get_model(arch, use_rnn=use_rnn, dropout_rate=0.0,
                          **(model_kwargs or {}))
        variables = jax.eval_shape(
            lambda m=model: m.init(jax.random.PRNGKey(0), feats, sizes))
        params = count_params(variables['params'])
        flops = _xla_flops(model, feats, sizes)
        rows.append([get_model_hash(arch), int(params), int(flops)])
    header = ds.make_header('static', version=2)
    return ds.write_db(f'{out_dir}/nb-asr-info.pickle', header, rows)


def _xla_flops(model, feats, sizes):
    import jax
    variables = model.init(jax.random.PRNGKey(0), feats, sizes, train=False)
    lowered = jax.jit(
        lambda v, f, s: model.apply(v, f, s, train=False)).lower(
            variables, feats, sizes)
    try:
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return cost.get('flops', 0)
    except Exception:
        return 0


def benchmark_pass(archs=None, out_dir='nb-asr-db', device_name=None,
                   use_rnn=True, feature_frames=500, repeats=20):
    """Write nb-asr-bench-{device}.pickle with measured TPU latencies."""
    import jax
    import jax.numpy as jnp
    from ..models import get_model

    if archs is None or isinstance(archs, int):
        archs = list(unique_architectures(limit=archs).values())
    if device_name is None:
        kind = jax.devices()[0].device_kind.lower().replace(' ', '-')
        device_name = f'{kind}-fp32'

    rows = []
    feats = jnp.asarray(np.random.RandomState(0).randn(1, feature_frames, 80),
                        jnp.float32)
    sizes = jnp.asarray([feature_frames], jnp.int32)
    for arch in archs:
        model = get_model(arch, use_rnn=use_rnn, dropout_rate=0.0)
        variables = model.init(jax.random.PRNGKey(0), feats, sizes, train=False)
        fwd = jax.jit(lambda v, f, s, m=model: m.apply(v, f, s, train=False))
        fwd(variables, feats, sizes).block_until_ready()
        times = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            fwd(variables, feats, sizes).block_until_ready()
            times.append(time.perf_counter() - t0)
        rows.append([get_model_hash(arch), float(np.median(times))])
    header = ds.make_header('benchmarking', device=device_name)
    return ds.write_db(f'{out_dir}/nb-asr-bench-{device_name}.pickle', header, rows)

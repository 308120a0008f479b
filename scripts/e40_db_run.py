"""Reference-complete DB folder at e40 scale (VERDICT r2 next #5).

Runs the sweep scheduler at the REAL epoch count: ~32 unique archs × 3
seeds × {e5, e40} on synthetic data (2 worker threads sharing the chip),
plus the static-info and latency-benchmark passes, all into ONE folder —
then loads it with the REFERENCE ``from_folder(include_static_info=True)``
and asserts the full contract:

  - ``full_info`` returns complete rows (hash, 40-float curve, test PER,
    latency dict, params, flops) for every arch × seed,
  - ``val_acc(epoch=E, best=True)`` == ``min(curve[:E])`` and
    ``val_acc(epoch=E, best=False)`` == ``curve[E-1]`` over the 40-float
    curves (reference ``dataset.py:422-453``),
  - the e5 files coexist and are selected by ``max_epochs=5``
    (the README's reduced-dataset queries, ``README.md:129``).

Usage: python scripts/e40_db_run.py [n_archs] [out_dir]
"""

import importlib.util
import pathlib
import sys
import tempfile
import time
import types

import jax

jax.config.update('jax_compilation_cache_dir', '/tmp/nbasr_jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

sys.path.insert(0, '/root/repo')
from nbasr_tpu.parallel.sweep import (run_sweep, unique_architectures,
                                      static_info_pass, benchmark_pass)

N_ARCHS = int(sys.argv[1]) if len(sys.argv) > 1 else 32
SEEDS = (1234, 1235, 1236)
out = pathlib.Path(sys.argv[2] if len(sys.argv) > 2
                   else tempfile.mkdtemp(prefix='e40db_'))
out.mkdir(parents=True, exist_ok=True)

archs = list(unique_architectures(limit=N_ARCHS).values())
# scaled model: full macro-topology (4 blocks + cells + groups), narrower
# channels — the DB *format* contract is epoch-count/semantics, not size
small = dict(block_filters=(120, 120, 200, 200), cells_per_block=(1, 2, 2, 2),
             cell_groups=20)

wall = {}
for epochs in (5, 40):
    t0 = time.time()
    run_sweep(archs, seeds=SEEDS, data_root='synthetic:48',
              out_dir=str(out), batch_size=16, epochs=epochs, lr=3e-4,
              use_rnn=False, eval_decoder='greedy', workers=2,
              model_kwargs=small, progress=True)
    wall[epochs] = time.time() - t0
    print(f'=== e{epochs}: {len(archs) * len(SEEDS)} jobs in '
          f'{wall[epochs]:.0f}s ===')

t0 = time.time()
static_info_pass(archs, out_dir=str(out), use_rnn=False, model_kwargs=small)
bench_path = benchmark_pass(archs, out_dir=str(out), use_rnn=False)
wall['passes'] = time.time() - t0
device_name = bench_path.name[len('nb-asr-bench-'):-len('.pickle')]
print(f'static+bench passes: {wall["passes"]:.0f}s (device {device_name})')

# ---------------------------------------------------------------------------
# Verify through the REFERENCE reader
# ---------------------------------------------------------------------------
ref_root = pathlib.Path('/root/reference/nasbench_asr')
pkg = types.ModuleType('ref_nasbench')
pkg.__path__ = [str(ref_root)]
sys.modules['ref_nasbench'] = pkg
for name in ['utils', 'graph_utils', 'search_space', 'dataset']:
    spec = importlib.util.spec_from_file_location(
        f'ref_nasbench.{name}', ref_root / f'{name}.py')
    mod = importlib.util.module_from_spec(spec)
    sys.modules[f'ref_nasbench.{name}'] = mod
    sys.modules.setdefault('nasbench_asr', pkg)
    sys.modules[f'nasbench_asr.{name}'] = mod
    spec.loader.exec_module(mod)
ref_ds = sys.modules['ref_nasbench.dataset']

ref = ref_ds.from_folder(str(out), max_epochs=40, seeds=list(SEEDS),
                         devices=[device_name], include_static_info=True)
checked = 0
for arch in archs:
    for seed in SEEDS:
        info = ref.full_info(arch, seed=seed, include_static_info=True,
                             return_dict=True)
        assert info is not None, (arch, seed)
        curve = info['val_per']
        assert len(curve) == 40, f'curve length {len(curve)} != 40'
        assert all(isinstance(v, float) for v in curve)
        assert isinstance(info['test_per'], float)
        assert info['arch_vec'] is not None
        # reference nests static info under 'info' and latency under the
        # device key (dataset.py:309-326, 129-133, 194-214)
        assert info['info']['params'] > 0, info
        assert info['info']['flops'] > 0, info
        assert info[device_name]['latency'] > 0, info
        # val_acc semantics over the 40-float curve (dataset.py:422-453)
        for e in (1, 16, 40):
            assert ref.val_acc(arch, epoch=e, best=True, seed=seed) == \
                min(curve[:e])
            assert ref.val_acc(arch, epoch=e, best=False, seed=seed) == \
                curve[e - 1]
        assert ref.test_acc(arch, seed=seed) == info['test_per']
        checked += 1
print(f'REFERENCE READER e40: {checked} (arch, seed) rows complete')

# e5 files coexist in the same folder and are selected by max_epochs=5
ref5 = ref_ds.from_folder(str(out), max_epochs=5, seeds=list(SEEDS),
                          include_static_info=False)
for arch in archs[:4]:
    info = ref5.full_info(arch, seed=SEEDS[0], devices=False,
                          return_dict=True)
    assert len(info['val_per']) == 5, info
print('REFERENCE READER e5: reduced-dataset selection OK')

jobs = len(archs) * len(SEEDS)
print(f'chip-time: e40 {wall[40]:.0f}s for {jobs} jobs '
      f'({wall[40] / jobs:.1f}s/job); full regeneration 8242x3 at this '
      f'rate ~ {8242 * 3 * wall[40] / jobs / 3600:.1f} chip-hours '
      f'(scaled model, synthetic data; flagship+TIMIT scales with '
      f'~12s/epoch steady per PERF.md)')
print('E40 DB OK:', out)

"""Sweep-scheduler scale test on the real chip (VERDICT round-1 item #7):
8 archs x 2 seeds x 2 epochs with 2 worker threads sharing the chip.
Proves no deadlock / compile contention, records per-job wall time, then
re-queries the written DBs through BOTH readers (ours and the reference's).
"""

import pathlib
import sys
import tempfile
import time

import jax

jax.config.update('jax_compilation_cache_dir', '/tmp/nbasr_jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

sys.path.insert(0, '/root/repo')
from nbasr_tpu.parallel.sweep import run_sweep, unique_architectures

N_ARCHS = int(sys.argv[1]) if len(sys.argv) > 1 else 8
SEEDS = (1234, 1235)
EPOCHS = 2

out = pathlib.Path(tempfile.mkdtemp(prefix='sweepdb_'))
archs = list(unique_architectures(limit=N_ARCHS).values())
small = dict(block_filters=(120, 120, 200, 200), cells_per_block=(1, 2, 2, 2),
             cell_groups=20)

t0 = time.time()
paths = run_sweep(archs, seeds=SEEDS, data_root='synthetic:48',
                  out_dir=str(out), batch_size=16, epochs=EPOCHS, lr=3e-4,
                  use_rnn=False, eval_decoder='greedy', workers=2,
                  model_kwargs=small, progress=True)
wall = time.time() - t0
print(f'TOTAL {len(archs) * len(SEEDS)} jobs x {EPOCHS} epochs: {wall:.0f}s '
      f'({wall / (len(archs) * len(SEEDS)):.1f}s/job) with 2 threads/1 chip')

# --- re-query through our reader ---
import nbasr_tpu
d = nbasr_tpu.from_folder(str(out), max_epochs=EPOCHS, seeds=SEEDS)
info = d.full_info(archs[0], seed=SEEDS[0])
print('our reader full_info:', info)

# --- re-query through the REFERENCE reader ---
import importlib.util
import types
ref_root = pathlib.Path('/root/reference/nasbench_asr')
pkg = types.ModuleType('ref_nasbench')
pkg.__path__ = [str(ref_root)]
sys.modules['ref_nasbench'] = pkg
for name in ['utils', 'graph_utils', 'search_space', 'dataset']:
    spec = importlib.util.spec_from_file_location(
        f'ref_nasbench.{name}', ref_root / f'{name}.py')
    mod = importlib.util.module_from_spec(spec)
    sys.modules[f'ref_nasbench.{name}'] = mod
    # reference modules import each other as `nasbench_asr.x`
    sys.modules.setdefault('nasbench_asr', pkg)
    sys.modules[f'nasbench_asr.{name}'] = mod
    spec.loader.exec_module(mod)
ref_ds = sys.modules['ref_nasbench.dataset']
ref = ref_ds.from_folder(str(out), max_epochs=EPOCHS, seeds=list(SEEDS),
                         include_static_info=False)
val = ref.val_acc(archs[0], epoch=EPOCHS, seed=SEEDS[0])
test = ref.test_acc(archs[0], seed=SEEDS[0])
print('reference reader val_acc:', val, 'test_acc:', test)
assert val is not None and test is not None
print('REFERENCE READER OK')

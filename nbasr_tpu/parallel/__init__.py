"""Parallel runtime: meshes, sharded training, sweep orchestration."""

from .mesh import (
    make_mesh, param_spec, param_shardings, batch_shardings, replicated,
    initialize_distributed,
)
from .train_parallel import ParallelTrainer, get_parallel_trainer
from .sweep import (
    run_sweep, unique_architectures, static_info_pass, benchmark_pass,
    device_groups,
)

__all__ = [
    'make_mesh', 'param_spec', 'param_shardings', 'batch_shardings',
    'replicated', 'initialize_distributed',
    'ParallelTrainer', 'get_parallel_trainer',
    'run_sweep', 'unique_architectures', 'static_info_pass',
    'benchmark_pass', 'device_groups',
]

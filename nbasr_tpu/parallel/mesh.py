"""Device meshes and sharding rules for data/tensor parallelism.

This layer replaces the reference's stripped Horovod machinery
(``training/tf/trainer.py:433-436``, ``metrics/ratio.py:31-41``) with the
single SPMD runtime of JAX: one ``Mesh`` with axes

  - ``'data'``  — batch sharding (gradient psum rides ICI),
  - ``'model'`` — tensor sharding of the wide cell channels (filters up to
    1200, groups=100 convs split cleanly along output channels).

Shardings are expressed as ``NamedSharding`` annotations on params and
batches; XLA GSPMD inserts the collectives.  Multi-host: call
:func:`initialize_distributed` first, shard input batches by
``jax.process_index()`` (the data layer's ``num_shards``/``shard_index``).
"""

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ['make_mesh', 'param_spec', 'param_shardings', 'batch_shardings',
           'replicated', 'initialize_distributed']


def initialize_distributed(**kwargs):
    """Multi-host init (jax.distributed); safe no-op when single-process."""
    try:
        jax.distributed.initialize(**kwargs)
    except (RuntimeError, ValueError):
        pass  # already initialised or single-process
    return jax.process_index(), jax.process_count()


def make_mesh(dp=None, tp=1, devices=None):
    """Build a ('data', 'model') mesh over ``devices`` (default: all).

    ``dp`` defaults to ``len(devices) // tp``.  Axis sizes must multiply to
    the device count.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None:
        if n % tp:
            raise ValueError(f'{n} devices not divisible by tp={tp}')
        dp = n // tp
    if dp * tp != n:
        raise ValueError(f'dp*tp = {dp}*{tp} != {n} devices')
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, ('data', 'model'))


def _path_names(path):
    return [getattr(p, 'key', getattr(p, 'name', str(p))) for p in path]


def param_spec(path, leaf, tp):
    """PartitionSpec for one parameter: shard the widest divisible axis on
    'model'; replicate otherwise.  Biases and norm scales stay replicated
    (tiny), conv/dense kernels shard on their output-channel axis."""
    if tp <= 1 or leaf.ndim == 0:
        return P()
    names = _path_names(path)
    if names[-1] in ('bias', 'scale', 'mean', 'variance'):
        return P()
    # kernels: shard the last axis (output features) when divisible
    if leaf.shape[-1] % tp == 0 and leaf.shape[-1] >= tp * 8:
        return P(*([None] * (leaf.ndim - 1) + ['model']))
    return P()


def param_shardings(params, mesh):
    """NamedSharding pytree for a parameter pytree."""
    tp = mesh.shape['model']
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, param_spec(path, leaf, tp)),
        params)


def batch_shardings(mesh):
    """NamedSharding factory for input batches: batch axis on 'data'."""
    def spec(leaf):
        return NamedSharding(mesh, P('data', *([None] * (leaf.ndim - 1))))
    return spec


def replicated(mesh):
    return NamedSharding(mesh, P())

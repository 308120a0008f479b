"""Mesh-parallel trainer: DP over the batch axis + TP over wide channels.

Extends :class:`nbasr_tpu.training.trainer.Trainer` by *placement only*:
the step functions are identical; the train state is placed with
``NamedSharding`` annotations (params/optimizer moments sharded on the
``'model'`` axis, see ``mesh.param_spec``) and batches are placed with the
batch axis on ``'data'``.  ``jax.jit`` + GSPMD then compiles one SPMD
program whose gradient reductions ride the mesh's ICI links — there is no
hand-written collective anywhere (SURVEY.md §2.6's design note).

Multi-host use: initialise ``jax.distributed``, build the mesh over
``jax.devices()`` (all hosts), and give each process a disjoint data shard
via the loader's ``num_shards=jax.process_count(),
shard_index=jax.process_index()``.
"""

import jax

from ..training.trainer import Trainer
from .mesh import batch_shardings, make_mesh, param_spec

__all__ = ['ParallelTrainer', 'get_parallel_trainer']


class ParallelTrainer(Trainer):
    """Trainer whose state/batches live on a ('data', 'model') mesh."""

    def __init__(self, dataloaders, loss=None, mesh=None, dp=None, tp=1,
                 **kwargs):
        super().__init__(dataloaders, loss, **kwargs)
        self.mesh = mesh if mesh is not None else make_mesh(dp=dp, tp=tp)

    def init_state(self, model, seed=0, sample_batch=None):
        # GSPMD has no partitioning rule for the fused cell's Mosaic
        # custom-call, so the fused impls cannot run under jit-level
        # sharding.  Two cases (VERDICT r4 next #6):
        #   - tp == 1 (pure data parallelism — the pod-sweep topology):
        #     run the WHOLE step per-device via shard_map with explicit
        #     psums (grads + metric pairs); the Pallas kernel runs
        #     per-shard and dp sweeps keep the fast fused path.
        #   - tp > 1: channel-sharded matmuls inside the kernel are not
        #     supported; fall back to the pure-XLA 'chunked' impl, which
        #     GSPMD shards on both axes.  Identical parameter tree, so
        #     single-chip fused checkpoints load unchanged.
        fused = model.grouped_impl in ('auto', 'fused', 'fused_aligned')
        tp = self.mesh.shape['model']
        self._shard_axis = None
        self._shard_axis_size = 1
        if fused and tp == 1:
            from ..models.cell import auto_cell_impl
            impl = model.grouped_impl
            if impl == 'auto':
                impl = auto_cell_impl()
            if impl in ('fused', 'fused_aligned'):
                model = model.clone(grouped_impl=impl)
                self._shard_axis = 'data'
                self._shard_axis_size = int(self.mesh.shape['data'])
        elif fused and self.mesh.devices.size > 1:
            model = model.clone(grouped_impl='chunked')
        return super().init_state(model, seed=seed, sample_batch=sample_batch)

    def _state_shardings(self, state):
        from jax.sharding import NamedSharding
        tp = self.mesh.shape['model']
        return jax.tree_util.tree_map_with_path(
            lambda path, leaf: NamedSharding(self.mesh, param_spec(path, leaf, tp)),
            state)

    def _place_state(self, state):
        return jax.device_put(state, self._state_shardings(state))

    def _put_batch(self, batch):
        import numpy as np
        dp = self.mesh.shape['data']
        procs = jax.process_count()
        # Each process contributes its own (loader-shard) rows; the global
        # batch axis must shard evenly over the per-process slice of 'data'.
        local_dp = max(dp // procs, 1)
        rows = next(iter(batch.values())).shape[0]
        pad = (-rows) % local_dp
        if pad:
            # pad with zero rows (valid=0 ⇒ they contribute nothing to loss
            # or metrics) so the batch axis shards evenly over 'data'
            batch = {k: np.concatenate(
                [np.asarray(v),
                 np.zeros((pad,) + np.asarray(v).shape[1:], np.asarray(v).dtype)])
                for k, v in batch.items()}
        spec = batch_shardings(self.mesh)
        if procs > 1:
            # Multi-host: every process holds only ITS rows of the global
            # batch (loader num_shards=process_count); assemble the global
            # array from per-process local data (replaces the reference's
            # unused ds.shard hook, cache_shard_shuffle_batch.py:52-53).
            return {k: jax.make_array_from_process_local_data(
                        spec(jax.numpy.asarray(v)), np.asarray(v))
                    for k, v in batch.items()}
        return {k: jax.device_put(jax.numpy.asarray(v), spec(jax.numpy.asarray(v)))
                for k, v in batch.items()}

    # jit hooks: plain jit — input placements drive GSPMD partitioning.
    # In shard_map mode (fused cell + tp==1) the step runs per-device with
    # batch rows split on 'data' and everything else replicated; the
    # psums live inside the step (Trainer._build_steps).
    def _shard_map(self, fn, n_batch_arg):
        from jax.sharding import PartitionSpec as P
        specs = [P()] * 3
        specs[n_batch_arg] = P('data')
        return jax.shard_map(fn, mesh=self.mesh, in_specs=tuple(specs),
                             out_specs=P(), check_vma=False)

    def _jit_train_step(self, fn):
        if self._shard_axis:
            fn = self._shard_map(fn, 1)     # (state, batch, lr)
        return jax.jit(fn, donate_argnums=0)

    def _jit_eval_steps(self, fwd, decode):
        if not self._shard_axis:
            return jax.jit(fwd), jax.jit(decode, donate_argnums=3)
        from jax.sharding import PartitionSpec as P
        D = P('data')
        # eval_fwd: (params, batch) -> (logits, lsize, m_psummed)
        fwd = jax.shard_map(fwd, mesh=self.mesh, in_specs=(P(), D),
                            out_specs=(D, D, P()), check_vma=False)
        # eval_decode: (logits, lsize, batch, acc, m_fwd) -> acc'
        decode = jax.shard_map(decode, mesh=self.mesh,
                               in_specs=(D, D, D, P(), P()),
                               out_specs=P(), check_vma=False)
        return jax.jit(fwd), jax.jit(decode, donate_argnums=3)

    def _jit_decode_step(self, fn):
        if not self._shard_axis:
            return jax.jit(fn)
        from jax.sharding import PartitionSpec as P
        return jax.jit(jax.shard_map(
            fn, mesh=self.mesh, in_specs=(P(), P('data')),
            out_specs=P('data'), check_vma=False))


def get_parallel_trainer(dataloaders, loss=None, **kwargs):
    return ParallelTrainer(dataloaders, loss, **kwargs)

"""The flagship ASR encoder: arch_vec -> CTC-ready logits, Flax/linen.

TPU-native re-implementation of the macro-architecture shared by both
reference backends (``model/tf/model.py:49-95``,
``model/torch/model.py:62-131``):

  [B, T, 80] log-mel → mask → frozen mean/var norm →
  4 × (PadConvRelu(k=8, stride 1/1/2/2, filters 600/800/1000/1200)
       → LayerNorm → {3,4,5,6} SearchCells)
  → optional LSTM(500) → Dense(49)

Output is unnormalised logits with CTC blank at index 0; total time
reduction ×4.  Parameter counts for the README arch
``[[1,0],[1,0,0],[1,0,0,0]]``: 26,339,349 with the LSTM head and
22,971,649 without.  (The README's published 26,338,848 corresponds to a
48-unit head — an off-by-one in the reference's static-info generator; see
tests/test_model.py.)
"""

import jax.numpy as jnp
from flax import linen as nn

from ..search_space import arch_vec_to_names
from .cell import SearchCell, CELL_DROPOUT
from .layers import MeanVarianceNorm, PadConvRelu, norm_eps

__all__ = ['ASRModel', 'get_model', 'count_params', 'logits_length',
           'algorithmic_flops']

_BLOCK_KERNELS = (8, 8, 8, 8)
_BLOCK_STRIDES = (1, 1, 2, 2)
_BLOCK_FILTERS = (600, 800, 1000, 1200)
_CELLS_PER_BLOCK = (3, 4, 5, 6)


class ASRModel(nn.Module):
    """NAS-Bench-ASR encoder for a fixed cell architecture.

    ``arch_desc`` uses op *names* (``[['conv5', 0], ...]``); build from an
    index vector with :func:`get_model` / :meth:`from_arch_vec`.
    """

    arch_desc: tuple
    num_classes: int = 48
    use_rnn: bool = False
    use_norm: bool = True
    dropout_rate: float = 0.0
    cell_dropout: float = CELL_DROPOUT
    data_mean: tuple = None
    data_variance: tuple = None
    compute_dtype: jnp.dtype = jnp.float32
    # macro-architecture knobs (reference defaults; overridable for scaled
    # variants and fast tests — parity runs must keep the defaults)
    block_kernels: tuple = _BLOCK_KERNELS
    block_strides: tuple = _BLOCK_STRIDES
    block_filters: tuple = _BLOCK_FILTERS
    cells_per_block: tuple = _CELLS_PER_BLOCK
    cell_groups: int = 100
    rnn_units: int = 500
    #: 'reference' (faithful Keras/torch glorot — see layers.PadConvRelu
    #: note about init-time activation collapse) or 'scaled'
    #: (variance-preserving; recommended with bfloat16).
    #: default 'scaled' (per-group variance-preserving) — a DOCUMENTED
    #: deviation from the reference's Keras/torch glorot ('reference'):
    #: with groups=100 the reference fans shrink activations ~10x per
    #: layer, the flagship starts numerically collapsed, and in bf16 it
    #: cannot leave the CTC all-blank minimum (PERF.md r4; measured on
    #: the tone-proxy corpus).  'reference' remains available for
    #: bit-faithful init experiments (--init_scheme reference).
    init_scheme: str = 'scaled'
    #: grouped-conv implementation for the cell ops: 'auto' | 'native' |
    #: 'masked_dense' | 'pallas' (see layers.PadConvRelu perf note).
    grouped_impl: str = 'auto'
    #: dense block-conv lowering: 'auto' | 'conv' | 'tap_matmul'
    #: (see layers.PadConvRelu; scripts/bench_blockconv.py for numbers)
    block_conv_impl: str = 'auto'
    #: rematerialise each SearchCell in the backward pass (jax.checkpoint):
    #: trades ~35% more FLOPs for O(cells) less activation memory — enables
    #: much larger batch/sequence products per chip.
    remat_cells: bool = False
    # --- TF-backend quirk ablation toggles (SURVEY.md §2.2) ------------
    # The published dataset numbers come from the shipped TF backend,
    # which differs from the canonical graph semantics in three ways; all
    # three are reproducible for PER-parity ablations:
    #: 'canonical' | 'tf_inverted' (model/tf/ops.py:87 wires skip edges
    #: where the arch vector says 0)
    branch_semantics: str = 'canonical'
    #: False = drop dilation like the TF backend (model/tf/ops.py:24)
    apply_dilation: bool = True
    #: 'torch' | 'tf' pad formula (model/tf/ops.py:16-21 vs torch/ops.py:12-17)
    pad_math: str = 'torch'
    #: LayerNorm / data-norm epsilon (Keras default and torch both 1e-3)
    norm_epsilon: float = norm_eps

    @classmethod
    def from_arch_vec(cls, arch_vec, **kwargs):
        return cls(arch_desc=tuple(map(tuple, arch_vec_to_names(arch_vec))), **kwargs)

    @nn.compact
    def __call__(self, features, feature_size=None, train=False, mask=None,
                 stage='full', rnn_carry=None, return_rnn_carry=False):
        """[B, T, 80] features (+ true frame counts) -> [B, ceil(T/4), C+1] logits.

        ``mask`` overrides the mask derived from ``feature_size`` (used by
        the sequence-parallel runner, whose local chunks need masks built
        from *global* frame positions).  ``stage`` splits the model for
        time-sharded execution: ``'encode'`` returns the conv-block output,
        ``'head'`` treats ``features`` as that output and runs the
        LSTM+Dense head (``rnn_carry``/``return_rnn_carry`` thread the LSTM
        (c, h) state across sequence shards).  ``'full'`` is the normal
        end-to-end path.
        """
        if stage not in ('full', 'encode', 'head'):
            raise ValueError(f'unknown stage: {stage!r}')
        x = features
        if stage != 'head':
            x = features.astype(self.compute_dtype)
            if mask is None and feature_size is not None:
                t = jnp.arange(x.shape[1])[None, :]
                mask = t < feature_size[:, None]
            if mask is not None:
                x = jnp.where(mask[..., None], x, 0.0)  # Masking semantics

            if self.data_mean is not None:
                x = MeanVarianceNorm(jnp.asarray(self.data_mean),
                                     jnp.asarray(self.data_variance),
                                     epsilon=self.norm_epsilon,
                                     name='data_norm')(x, mask=mask)

            # In 'pallas_split' mode each block's cell stack runs in the
            # split layout [B, c, T, G] (see ops/cell_ops.py): one
            # to_split/from_split pair per block instead of layout
            # transposes around every conv op.
            split = (self.grouped_impl == 'pallas_split'
                     and self.cell_groups > 1)
            if split:
                from ..ops.cell_ops import to_split, from_split

            specs = zip(self.block_kernels, self.block_strides,
                        self.block_filters, self.cells_per_block)
            for i, (kernel, stride, filters, cells) in enumerate(specs):
                x = PadConvRelu(filters, kernel_size=kernel, strides=stride,
                                init_scheme=self.init_scheme,
                                pad_math=self.pad_math,
                                dense_impl=self.block_conv_impl,
                                name=f'block{i}_conv')(x, train=train)
                x = nn.LayerNorm(epsilon=self.norm_epsilon, dtype=x.dtype,
                                 name=f'block{i}_norm')(x)
                if split:
                    x = to_split(x, self.cell_groups)
                cell_cls = (nn.remat(SearchCell, static_argnums=(2,))
                            if self.remat_cells else SearchCell)
                for j in range(cells):
                    x = cell_cls(filters=filters, arch_desc=self.arch_desc,
                                 dropout_rate=self.cell_dropout,
                                 use_norm=self.use_norm,
                                 groups=self.cell_groups,
                                 init_scheme=self.init_scheme,
                                 grouped_impl=self.grouped_impl,
                                 branch_semantics=self.branch_semantics,
                                 apply_dilation=self.apply_dilation,
                                 pad_math=self.pad_math,
                                 norm_epsilon=self.norm_epsilon,
                                 name=f'block{i}_cell{j}')(x, train)
                if split:
                    x = from_split(x)
            if stage == 'encode':
                return x

        carry = None
        if self.use_rnn:
            if self.dropout_rate:
                # Keras LSTM(dropout=r) drops the input transform with one
                # mask shared across time (model/tf/model.py:87-88); the
                # torch backend uses a plain pre-LSTM dropout
                # (model/torch/model.py:98-100).  We use a time-shared mask.
                x = nn.Dropout(self.dropout_rate, deterministic=not train,
                               broadcast_dims=(1,))(x)
            from .lstm import FastLSTM
            x, carry = FastLSTM(self.rnn_units,
                                compute_dtype=self.compute_dtype,
                                name='lstm')(x, initial_carry=rnn_carry,
                                             return_carry=True)

        x = nn.Dense(self.num_classes + 1, name='head',
                     kernel_init=nn.initializers.xavier_uniform())(
                         x.astype(jnp.float32))
        return (x, carry) if return_rnn_carry else x


def logits_length(feature_size, t_in, t_out):
    """True output lengths from true input lengths, via the measured ratio.

    Mirrors TF's ``get_logits_size`` (``training/tf/trainer.py:19-27``):
    uses the observed time reduction rather than hard-coding ×4.
    """
    time_reduction = jnp.float32(t_in) / jnp.float32(t_out)
    return (feature_size.astype(jnp.float32) / time_reduction).astype(jnp.int32)


def get_model(arch_vec, use_rnn=True, dropout_rate=0.0, use_norm=True,
              data_norm=None, num_classes=48, compute_dtype=jnp.float32,
              gpu=None, **overrides):
    """Reference-compatible model factory (``model/__init__.py:19-20``).

    ``data_norm`` may be ``True`` (load the frozen TIMIT train stats),
    a ``(mean, variance)`` pair, or ``None``.  ``gpu`` is accepted for CLI
    compatibility and ignored (device placement is jit/sharding-driven).
    Extra keyword arguments override :class:`ASRModel` fields (e.g.
    ``block_filters`` for scaled variants).
    """
    if data_norm is True:
        from ..data.pipeline import load_train_stats
        data_norm = load_train_stats()
    mean, var = (None, None) if data_norm is None else data_norm
    return ASRModel.from_arch_vec(
        arch_vec, num_classes=num_classes, use_rnn=use_rnn, use_norm=use_norm,
        dropout_rate=dropout_rate,
        data_mean=None if mean is None else tuple(float(v) for v in mean),
        data_variance=None if var is None else tuple(float(v) for v in var),
        compute_dtype=compute_dtype, **overrides)


def count_params(params):
    """Total number of elements in a parameter pytree."""
    import jax
    return sum(x.size for x in jax.tree_util.tree_leaves(params))


def algorithmic_flops(model, batch, frames, train=True):
    """*Algorithmic* matmul FLOPs of one step: the true math of the model,
    independent of implementation (the chunked/fused grouped-conv
    formulations burn ~Gc× redundant hardware FLOPs for MXU occupancy —
    XLA's cost analysis counts those; this function does not).

    Counts multiply-adds as 2 FLOPs for the block convs, cell ops (true
    grouped-conv cost ``2·B·T·K·G·ci·co``), LSTM and head; elementwise work
    (LayerNorm, ReLU, dropout, frontend, CTC) is excluded, per the usual
    MFU convention.  ``train=True`` multiplies by 3 (backward ≈ 2× forward).
    """
    B, T = batch, frames
    fwd = 0.0
    t = T
    cin = 80
    for k, s, c, cells in zip(model.block_kernels, model.block_strides,
                              model.block_filters, model.cells_per_block):
        t = -(-t // s)
        fwd += 2.0 * B * t * k * cin * c          # dense block conv
        g = model.cell_groups
        ci = c // g
        per_conv = 2.0 * B * t * g * ci * ci      # per kernel tap
        for op_name, *_ in model.arch_desc:
            if op_name == 'linear':
                fwd += cells * 2.0 * B * t * c * c
            elif op_name.startswith('conv'):
                ksize = int(op_name[4])           # conv5* / conv7*
                fwd += cells * per_conv * ksize
        cin = c
    if model.use_rnn:
        h = model.rnn_units
        fwd += 2.0 * B * t * 4 * h * (cin + h)
        cin = h
    fwd += 2.0 * B * t * cin * (model.num_classes + 1)
    return fwd * (3.0 if train else 1.0)

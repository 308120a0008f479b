"""Search cell: a small DAG of ops + identity skip branches.

TPU-native re-implementation of the cell of NAS-Bench-ASR
(reference ``model/tf/model.py:10-46`` / ``model/torch/model.py:7-59``).

Semantics (canonical — matches the hash graph, the torch backend and the
paper): node *i* computes ``op_i(prev)`` and adds ``inputs[j]`` for every
branch bit ``b_ij == 1``; bit 0 means no connection.  The reference's
shipped TF backend inverted the branch indexing (``model/tf/ops.py:87``,
see SURVEY.md §2.2) — we deliberately do not reproduce that bug.

Branches with bit 0 are *not* computed at all (the reference multiplies by
zero at runtime; under XLA we simply don't emit the op, which also lets
dead ``zero``-op nodes be pruned by DCE).
"""

from flax import linen as nn

from .layers import PadConvRelu, LinearRelu, SplitLayerNorm, norm_eps

__all__ = ['SearchCell', 'CELL_DROPOUT', 'make_op']

#: Cell-op dropout is a constant 0.2 in the reference (tf/ops.py:60), not
#: the model-level dropout flag (which only feeds the LSTM).
CELL_DROPOUT = 0.2


def make_op(op_name, filters, dropout_rate=CELL_DROPOUT, name=None, groups=100,
            init_scheme='reference', grouped_impl='auto', apply_dilation=True,
            pad_math='torch'):
    """Instantiate a cell op by name (reference op table tf/ops.py:69-76).

    ``groups`` is 100 in the reference; it is configurable here so scaled
    model variants (and fast tests) can use narrower cells.
    ``apply_dilation=False`` reproduces the shipped TF backend, which
    accepts the dilation argument but never passes it to the conv
    (``model/tf/ops.py:24``) — ``conv5d2`` degenerates to ``conv5``.
    """
    convs = {
        'conv5': dict(kernel_size=5, dilation=1),
        'conv5d2': dict(kernel_size=5, dilation=2),
        'conv7': dict(kernel_size=7, dilation=1),
        'conv7d2': dict(kernel_size=7, dilation=2),
    }
    if op_name == 'linear':
        return LinearRelu(filters, dropout_rate=dropout_rate, name=name,
                          init_scheme=init_scheme)
    if op_name in convs:
        kw = dict(convs[op_name])
        if not apply_dilation:
            kw['dilation'] = 1
        return PadConvRelu(filters, strides=1, groups=groups,
                           dropout_rate=dropout_rate, name=name,
                           init_scheme=init_scheme, grouped_impl=grouped_impl,
                           pad_math=pad_math, **kw)
    if op_name == 'zero':
        return None  # contributes nothing; handled by the caller
    raise ValueError(f'Unknown op: {op_name!r}')


class SearchCell(nn.Module):
    """Nodes over a growing list of outputs, then LayerNorm.

    ``arch_desc`` is the named form: ``[[op_name, b...], ...]`` (op indices
    are translated by the model).  All 18 cells of the flagship model share
    one ``arch_desc`` (reference ``model/tf/model.py:84-85``).
    """

    filters: int
    arch_desc: tuple
    dropout_rate: float = CELL_DROPOUT
    use_norm: bool = True
    groups: int = 100
    init_scheme: str = 'reference'
    grouped_impl: str = 'auto'
    #: 'canonical' (bit 1 = skip edge, matching the hash graph / torch /
    #: paper) or 'tf_inverted' (the shipped TF backend's BRANCH_OPS_LIST =
    #: [skip, none], model/tf/ops.py:87 — bit 0 wires the edge).
    branch_semantics: str = 'canonical'
    apply_dilation: bool = True
    pad_math: str = 'torch'
    norm_epsilon: float = norm_eps

    @nn.compact
    def __call__(self, x, train=False):
        if self.branch_semantics not in ('canonical', 'tf_inverted'):
            raise ValueError(f'unknown branch_semantics: '
                             f'{self.branch_semantics!r}')
        # In 'pallas_split' mode the cell's input/output (and every
        # intermediate) live in split layout [B, c, T, G]; only the rare
        # 'linear' op round-trips to dense for its full-channel matmul.
        split = self.grouped_impl == 'pallas_split' and self.groups > 1
        outputs = [x]
        for nidx, node in enumerate(self.arch_desc):
            op_name, *branches = node
            op = make_op(op_name, self.filters, self.dropout_rate,
                         name=f'node{nidx}_{op_name}', groups=self.groups,
                         init_scheme=self.init_scheme,
                         grouped_impl=self.grouped_impl,
                         apply_dilation=self.apply_dilation,
                         pad_math=self.pad_math)
            if op is None:
                total = None
            elif split and op_name == 'linear':
                from ..ops.cell_ops import to_split, from_split
                total = to_split(op(from_split(outputs[-1]), train=train),
                                 self.groups)
            else:
                total = op(outputs[-1], train=train)
            live = 0 if self.branch_semantics == 'tf_inverted' else 1
            for j, bit in enumerate(branches):
                if bit == live:
                    total = outputs[j] if total is None else total + outputs[j]
            if total is None:  # zero op and no live branches
                total = outputs[-1] * 0.0
            outputs.append(total)
        out = outputs[-1]
        if self.use_norm:
            if split:
                out = SplitLayerNorm(epsilon=self.norm_epsilon,
                                     name='norm')(out)
            else:
                out = nn.LayerNorm(epsilon=self.norm_epsilon, name='norm')(out)
        return out

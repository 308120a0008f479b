"""Model layer: the NAS-Bench-ASR encoder as a Flax module."""

from .asr import ASRModel, get_model, count_params, logits_length
from .cell import SearchCell, make_op, CELL_DROPOUT
from .proxies import compute_proxy, PROXIES
from .layers import (
    PadConvRelu, LinearRelu, MeanVarianceNorm, relu20, conv_padding,
    FUTURE_CONTEXT,
)

__all__ = [
    'ASRModel', 'get_model', 'count_params', 'logits_length',
    'compute_proxy', 'PROXIES',
    'SearchCell', 'make_op', 'CELL_DROPOUT',
    'PadConvRelu', 'LinearRelu', 'MeanVarianceNorm', 'relu20',
    'conv_padding', 'FUTURE_CONTEXT',
]


def print_model_summary(model, params=None):
    """One-line param summary (reference model/__init__.py:23-24)."""
    from ..utils import make_nice_number
    if params is not None:
        print(f'{type(model).__name__}: {make_nice_number(count_params(params))} params')
    else:
        print(model)

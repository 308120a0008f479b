"""Primitive layers of the ASR encoder, Flax/linen, channels-last ([B, T, C]).

TPU-native re-implementation of the reference op set
(``model/tf/ops.py`` / ``model/torch/ops.py``):

  - :class:`PadConvRelu` — asymmetric causal-ish padding with a bounded
    4-frame look-ahead (``FUTURE_CONTEXT``), grouped 1-D conv, ReLU clipped
    at 20, dropout.  Dilation is *applied* (the reference TF backend
    silently dropped it, ``model/tf/ops.py:24``; the torch backend and the
    paper apply it, ``model/torch/ops.py:12-20`` — we follow the latter and
    document the deviation).
  - :class:`LinearRelu` — Dense + clipped ReLU + dropout (``tf/ops.py:34-43``).
  - :class:`MeanVarianceNorm` — frozen-stats normalisation, mask-aware
    (``model/tf/mean_variance_normalization.py:5-47``).

Channels-last keeps convolutions in XLA's native NWC layout so grouped
convs tile directly onto the MXU without transposes.
"""

import numpy as np
import jax.numpy as jnp
from flax import linen as nn

__all__ = ['PadConvRelu', 'LinearRelu', 'MeanVarianceNorm', 'relu20',
           'FUTURE_CONTEXT', 'conv_padding', 'norm_eps']

#: 4 frames of look-ahead = 40 ms (reference model/tf/ops.py:3).
FUTURE_CONTEXT = 4

#: LayerNorm epsilon: the torch backend's 1e-3 (model/torch/model.py:47,92);
#: TF used the Keras default 1e-3 as well for LayerNormalization.
norm_eps = 1e-3


def relu20(x):
    """ReLU clipped at 20 (reference tf/ops.py:26, torch/ops.py:28)."""
    return jnp.clip(x, 0.0, 20.0)


def conv_padding(kernel_size, dilation, strides, context=FUTURE_CONTEXT):
    """(left, right) time padding for :class:`PadConvRelu`.

    Right padding is capped at ``context // strides`` frames of look-ahead;
    the remainder of the receptive field is left padding (reference
    ``model/torch/ops.py:12-17``, which correctly scales by dilation).
    The output length equals ``ceil(T / strides)``.
    """
    span = kernel_size * dilation - strides
    if context // strides >= span:
        return 0, span
    rpad = context // strides
    return (kernel_size - 1) * dilation - rpad, rpad


class PadConvRelu(nn.Module):
    """Pad → grouped Conv1D → clip-ReLU(20) → dropout."""

    filters: int
    kernel_size: int
    strides: int = 1
    dilation: int = 1
    groups: int = 1
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, x, train=False):
        lpad, rpad = conv_padding(self.kernel_size, self.dilation, self.strides)
        x = nn.Conv(
            features=self.filters,
            kernel_size=(self.kernel_size,),
            strides=(self.strides,),
            kernel_dilation=(self.dilation,),
            feature_group_count=self.groups,
            padding=[(lpad, rpad)],
            name='conv',
        )(x)
        x = relu20(x)
        if self.dropout_rate:
            x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        return x


class LinearRelu(nn.Module):
    """Dense → clip-ReLU(20) → dropout (the 'linear' cell op)."""

    filters: int
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, x, train=False):
        x = nn.Dense(self.filters, name='dense')(x)
        x = relu20(x)
        if self.dropout_rate:
            x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        return x


class MeanVarianceNorm(nn.Module):
    """(x - mean) / sqrt(var + eps) with frozen stats; masked frames -> 0.

    Stats are stored as non-trainable variables in the ``'stats'``
    collection, mirroring the reference's non-trainable Keras weights.
    """

    mean: np.ndarray
    variance: np.ndarray
    epsilon: float = 1e-3

    @nn.compact
    def __call__(self, x, mask=None):
        mean = self.variable('stats', 'mean',
                             lambda: jnp.asarray(self.mean, jnp.float32)).value
        var = self.variable('stats', 'variance',
                            lambda: jnp.asarray(self.variance, jnp.float32)).value
        out = (x - mean) / jnp.sqrt(var + self.epsilon)
        if mask is not None:
            out = jnp.where(mask[..., None], out, 0.0)
        return out

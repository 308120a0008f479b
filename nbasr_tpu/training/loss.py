"""Loss closure + conv L2 regularisation matching the reference recipe.

Reference contracts:
  - loss closure signature/normalisation: ``training/tf/trainer.py:30-53``
    (normalised CTC, per-sample ÷(logit_len+1), mean over batch, metrics
    dict of (numerator, denominator) pairs),
  - L2 on every PadConvRelu conv kernel with Keras' default 0.01
    coefficient (``model/tf/ops.py:24``, collected via ``model.losses`` at
    ``trainer.py:431``).  The torch backend used ``0.01*Σ||w||₂``
    (un-squared, ``torch/trainer.py:221``); TF's squared form is canonical.
"""

import jax
import jax.numpy as jnp

from ..ops.ctc import normalized_ctc_loss

__all__ = ['get_loss', 'conv_l2', 'L2_COEFF']

L2_COEFF = 0.01


def conv_l2(params):
    """0.01 * sum of squared conv kernels (every PadConvRelu conv).

    Matches both conv-param layouts: the native ``.../conv/kernel`` and the
    MXU masked-dense ``.../conv_kernel_grouped`` (see models/layers.py).
    """
    total = 0.0
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        names = [getattr(p, 'key', getattr(p, 'name', '')) for p in path]
        is_conv = ('conv' in names and names[-1] == 'kernel') or \
            names[-1] == 'conv_kernel_grouped'
        if is_conv:
            total = total + jnp.sum(jnp.square(leaf))
    return L2_COEFF * total


def get_loss():
    """Reference-compatible loss closure (``training/tf/trainer.py:30-53``).

    ``loss(logits, logits_size, encodeds, encodeds_size, metrics=None,
    valid=None)`` returns the mean normalised CTC loss; when ``metrics`` is
    a dict it receives ``{'ctc_loss': (per_sample, ones)}`` ratio pairs.
    ``valid`` masks padding rows of partial batches.
    """

    def loss(logits, logits_size, encodeds, encodeds_size, metrics=None,
             valid=None):
        per_sample = normalized_ctc_loss(logits, logits_size, encodeds,
                                         encodeds_size)
        if valid is None:
            valid = jnp.ones_like(per_sample)
        per_sample = per_sample * valid
        denom = jnp.maximum(valid.sum(), 1.0)
        if metrics is not None:
            metrics['ctc_loss'] = (per_sample.sum(), valid.sum())
        return per_sample.sum() / denom

    return loss

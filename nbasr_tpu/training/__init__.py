"""Training layer: trainer, loss, metrics, seeding, device preparation."""

import random

import numpy as np

from .loss import get_loss, conv_l2, L2_COEFF
from .metrics import zeros_like_metrics, accumulate, ratios
from .trainer import Trainer, TrainState, get_trainer, lr_at_epoch

__all__ = [
    'get_loss', 'conv_l2', 'L2_COEFF',
    'zeros_like_metrics', 'accumulate', 'ratios',
    'Trainer', 'TrainState', 'get_trainer', 'lr_at_epoch',
    'set_seed', 'prepare_devices', 'get_dataloaders',
]


def set_seed(seed):
    """Seed host RNGs; returns a jax PRNG key for device-side randomness.

    (Reference: ``training/tf/__init__.py:17-20`` seeds python/np/tf; JAX
    randomness is explicit, so the key is returned rather than set globally.)
    """
    import jax
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)


def prepare_devices(devices=None):
    """Validate and return the JAX devices to use.

    Unlike the reference's TF backend (single-GPU enforced,
    ``training/tf/trainer.py:112-113``), any number of devices is allowed —
    multi-device execution goes through ``parallel``.
    """
    import jax
    available = jax.devices()
    if devices is None:
        return available
    if isinstance(devices, int):
        devices = [devices]
    picked = []
    for d in devices:
        if isinstance(d, int):
            if d >= len(available):
                raise ValueError(f'Device index {d} out of range '
                                 f'({len(available)} available)')
            picked.append(available[d])
        else:
            picked.append(d)
    return picked


def get_dataloaders(timit_root, batch_size=64, **kwargs):
    from ..data.pipeline import get_dataloaders as impl
    return impl(timit_root, batch_size=batch_size, **kwargs)

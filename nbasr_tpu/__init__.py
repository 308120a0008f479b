"""nbasr_tpu — a TPU-native (JAX/XLA/Pallas/pjit) NAS-Bench-ASR framework.

Single-backend re-design of SamsungLabs/nb-asr (reference
``nasbench_asr/__init__.py``): the reference's TF/torch dual-backend
dispatch (``utils.py:114-165``) is replaced by one JAX implementation, so
``set_default_backend`` / ``get_backend_name`` survive only as trivial
compatibility shims.

Public surface mirrors the reference facade (``__init__.py:11-52``):
  - dataset query: :func:`from_folder`, :class:`Dataset`,
    :class:`BenchmarkingDataset`, :class:`StaticInfoDataset`
  - search space: re-exported via :mod:`nbasr_tpu.search_space`
  - model/train: :func:`get_model`, :func:`get_dataloaders`,
    :func:`get_loss`, :func:`get_trainer`, :func:`set_seed`,
    :func:`prepare_devices`
"""

from . import search_space
from . import graph_utils
from .dataset import (
    Dataset, BenchmarkingDataset, StaticInfoDataset, from_folder,
)
from . import search
from .version import __version__


def set_default_backend(backend=None):
    """Compatibility shim: there is exactly one backend ('jax')."""
    if backend not in (None, 'jax', 'tpu'):
        raise ValueError(f'Unknown backend: {backend!r} (this framework is JAX-only)')
    return 'jax', 'jax'


def get_backend_name():
    """Compatibility shim: always ('jax', 'jax')."""
    return 'jax', 'jax'


def set_seed(seed):
    """Seed python/numpy RNGs and return a jax.random key for model/data use."""
    from .training import set_seed as impl
    return impl(seed)


def prepare_devices(devices=None):
    """Validate/select JAX devices (reference: training/tf/__init__.py:23-33)."""
    from .training import prepare_devices as impl
    return impl(devices)


def get_model(arch_vec, **kwargs):
    """Build the flagship ASR encoder for ``arch_vec`` (see models.asr)."""
    from .models import get_model as impl
    return impl(arch_vec, **kwargs)


def get_dataloaders(timit_root, batch_size=64, **kwargs):
    """Build TIMIT train/val/test loaders (see data.pipeline)."""
    from .data import get_dataloaders as impl
    return impl(timit_root, batch_size=batch_size, **kwargs)


def get_loss():
    """CTC loss closure matching the reference contract (training.loss)."""
    from .training import get_loss as impl
    return impl()


def get_trainer(dataloaders, loss, devices=None, save_dir=None, verbose=True, **kwargs):
    """Build a Trainer (see training.trainer)."""
    from .training import get_trainer as impl
    return impl(dataloaders, loss, devices=devices, save_dir=save_dir,
                verbose=verbose, **kwargs)

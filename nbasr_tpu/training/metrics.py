"""Streaming ratio metrics as psum-able (numerator, denominator) pairs.

TPU-native version of the reference's ``Ratio`` tracker
(``training/tf/metrics/ratio.py:8-29``): metrics accumulate on-device as
scalar pairs inside the train/eval state, so epoch averages are exactly
sample-weighted and — under data parallelism — a single ``psum`` of the
pair replaces the reference's stripped Horovod allreduce
(``ratio.py:31-41``).
"""

import jax.numpy as jnp

__all__ = ['zeros_like_metrics', 'accumulate', 'ratios', 'METRIC_KEYS']

METRIC_KEYS = ('ctc_loss', 'wer', 'ler')


def zeros_like_metrics(keys=METRIC_KEYS):
    """Fresh accumulator: {key: (0.0, 0.0)}."""
    return {k: (jnp.float32(0.0), jnp.float32(0.0)) for k in keys}


def accumulate(acc, update):
    """Add a step's (num, den) pairs into the accumulator (device-side)."""
    out = dict(acc)
    for k, (num, den) in update.items():
        if k in out:
            n0, d0 = out[k]
            out[k] = (n0 + num, d0 + den)
        else:
            out[k] = (jnp.float32(num), jnp.float32(den))
    return out


def ratios(acc):
    """Finalise to python floats {key: num/den} (NaN-free: 0/0 -> 0)."""
    out = {}
    for k, (num, den) in acc.items():
        den_f = float(den)
        out[k] = float(num) / den_f if den_f else 0.0
    return out

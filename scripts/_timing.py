"""Shared timing helper for TPU microbenches run through the axon tunnel.

`jax.block_until_ready` is unreliable through the tunnel (returns before
the device work drains — see PERF.md); the only trustworthy fence is a
device->host scalar fetch.  TPU executes a stream in order, so fetching a
scalar derived from the LAST output bounds the whole loop.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def _fence(out):
    leaf = jax.tree.leaves(out)[0]
    return float(np.asarray(jnp.sum(leaf).astype(jnp.float32)))


def timed(fn, *args, n=30, warmup=5):
    """Median-free mean ms/call with a scalar-fetch fence.

    Runs `warmup` calls (fenced) to flush compile + autotune, then times
    `n` calls ending in one scalar fetch.
    """
    out = None
    for _ in range(warmup):
        out = fn(*args)
    _fence(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _fence(out)
    return (time.perf_counter() - t0) / n * 1e3

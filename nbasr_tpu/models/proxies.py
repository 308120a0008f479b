"""Zero-cost NAS proxies for ranking architectures without training.

The reference exposes only a hook for this (``get_prunable_copy``,
``model/torch/model.py:108-114``, consumed by an external ``predictive.py``).
Here the proxies themselves are provided, jitted end-to-end on TPU:

  - ``grad_norm``  — L2 norm of loss gradients at init,
  - ``snip``       — |dL/dw * w| summed (connection sensitivity),
  - ``synflow``    — path-sensitivity with all-ones input on |w| (norm-free
                     variant: the model is evaluated with ``use_norm=False``,
                     matching the ``bn=False`` prunable copy of the reference),
  - ``num_params`` — trivial baseline.

All proxies consume a single batch (features/labels as produced by the data
pipeline) and return a python float; higher = predicted-better.
"""

import jax
import jax.numpy as jnp

from ..ops.ctc import normalized_ctc_loss
from .asr import count_params, get_model, logits_length

__all__ = ['compute_proxy', 'PROXIES']


def _loss_fn(model, params, feats, fsize, labels, label_size):
    logits = model.apply({'params': params}, feats, fsize)
    lsize = logits_length(fsize, feats.shape[1], logits.shape[1])
    return normalized_ctc_loss(logits, lsize, labels, label_size).mean()


def grad_norm(arch, feats, fsize, labels, label_size, seed=0, **model_kwargs):
    model = get_model(arch, use_rnn=False, cell_dropout=0.0,
                      init_scheme='scaled', **model_kwargs)
    params = model.init(jax.random.PRNGKey(seed), feats, fsize)['params']
    grads = jax.grad(lambda p: _loss_fn(model, p, feats, fsize,
                                        labels, label_size))(params)
    return float(jnp.sqrt(sum(jnp.sum(jnp.square(g))
                              for g in jax.tree_util.tree_leaves(grads))))


def snip(arch, feats, fsize, labels, label_size, seed=0, **model_kwargs):
    model = get_model(arch, use_rnn=False, cell_dropout=0.0,
                      init_scheme='scaled', **model_kwargs)
    params = model.init(jax.random.PRNGKey(seed), feats, fsize)['params']
    grads = jax.grad(lambda p: _loss_fn(model, p, feats, fsize,
                                        labels, label_size))(params)
    return float(sum(jnp.sum(jnp.abs(g * p)) for g, p in zip(
        jax.tree_util.tree_leaves(grads), jax.tree_util.tree_leaves(params))))


def synflow(arch, feats, fsize, labels=None, label_size=None, seed=0,
            **model_kwargs):
    """Σ |dR/dw * w| with R = Σ outputs on |params| and all-ones input.

    Uses ``use_norm=False`` (the reference's ``bn=False`` prunable copy) so
    normalisation does not break path multiplicativity.
    """
    model = get_model(arch, use_rnn=False, use_norm=False, cell_dropout=0.0,
                      init_scheme='scaled', **model_kwargs)
    ones = jnp.ones_like(feats)
    params = model.init(jax.random.PRNGKey(seed), ones, fsize)['params']
    abs_params = jax.tree_util.tree_map(jnp.abs, params)

    def objective(p):
        return model.apply({'params': p}, ones, fsize).sum()

    grads = jax.grad(objective)(abs_params)
    return float(sum(jnp.sum(jnp.abs(g * p)) for g, p in zip(
        jax.tree_util.tree_leaves(grads),
        jax.tree_util.tree_leaves(abs_params))))


def num_params(arch, feats, fsize, labels=None, label_size=None, seed=0,
               **model_kwargs):
    model = get_model(arch, use_rnn=False, **model_kwargs)
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), feats, fsize))
    return float(count_params(shapes['params']))


PROXIES = {
    'grad_norm': grad_norm,
    'snip': snip,
    'synflow': synflow,
    'num_params': num_params,
}


def compute_proxy(name, arch, batch_feats, feature_size, labels=None,
                  label_size=None, seed=0, **model_kwargs):
    """Evaluate proxy ``name`` for ``arch`` on one feature batch."""
    if name not in PROXIES:
        raise ValueError(f'Unknown proxy {name!r}; available: {sorted(PROXIES)}')
    return PROXIES[name](arch, jnp.asarray(batch_feats),
                         jnp.asarray(feature_size),
                         None if labels is None else jnp.asarray(labels),
                         None if label_size is None else jnp.asarray(label_size),
                         seed=seed, **model_kwargs)

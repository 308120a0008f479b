"""Weights-only int8 post-training quantization for serving.

Green-field extra (the reference ships no quantization path; its Jetson
latency table ran fp32 — ``README.md:61``).  Design, TPU-first:

- **Per-output-channel symmetric int8** for every matmul-class kernel
  (block convs, grouped cell convs, LinearRelu/Dense, LSTM input and
  recurrent kernels).  Per-channel scales cost one f32 per output lane
  and keep clip-ReLU(20) activations' effective error ~1e-2 relative;
  biases, LayerNorm/MVN parameters stay f32 (they are O(C) bytes).
- **int8 stays resident in HBM.**  :func:`quantized_apply` dequantizes
  inside the jitted computation (``w_i8 * scale`` fuses into XLA's
  elementwise pipeline before the conv/dot), so the stored model is
  ~4x smaller than f32 / ~2x smaller than bf16 in device memory —
  26 MB for the 26M-param flagship.  Activations stay in the model's
  compute dtype; the MXU consumes the dequantized operand.
- **Exactness contract by measurement, not construction**: quantization
  error is bounded by tests (kernel roundtrip < 1/127 per-channel
  relative; end-to-end greedy decode on the tone corpus unchanged).

Usage::

    qtree = quantize_tree(variables['params'])
    logits = quantized_apply(model, qtree, variables, feats, sizes)

`quantize_tree` returns a pytree mirroring ``params`` where each
quantized kernel leaf becomes ``{'q': int8[...], 's': f32[1,..,co]}``
(dict leaves are transparent to ``jax.tree_util`` path traversal used
here); non-kernel leaves pass through unchanged.
"""

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ['quantize_tree', 'dequantize_tree', 'quantized_apply',
           'quantized_size_bytes', 'save_quantized', 'load_quantized',
           'KERNEL_KEYS']

#: param-leaf names that hold matmul-class kernels (quantized along their
#: LAST axis = output channels/lanes):
#:   - 'kernel'                nn.Conv / nn.Dense / FastLSTM input
#:                             ([K, cin, co] / [cin, co] / [cin, 4H])
#:   - 'conv_kernel_grouped'   PadConvRelu compact grouped [K, ci, C_out]
#:   - 'recurrent'             FastLSTM recurrent kernel [H, 4H]
KERNEL_KEYS = ('kernel', 'conv_kernel_grouped', 'recurrent')


def _is_quantizable(path, leaf):
    name = path[-1].key if hasattr(path[-1], 'key') else str(path[-1])
    return (name in KERNEL_KEYS and hasattr(leaf, 'ndim') and leaf.ndim >= 2
            and leaf.dtype in (jnp.float32, jnp.bfloat16, np.float32))


def _quantize_leaf(w):
    """Symmetric per-output-channel int8: w ≈ q * s, q in [-127, 127]."""
    w = jnp.asarray(w, jnp.float32)
    absmax = jnp.max(jnp.abs(w), axis=tuple(range(w.ndim - 1)), keepdims=True)
    s = jnp.where(absmax > 0, absmax / 127.0, 1.0)
    q = jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8)
    return {'q': q, 's': s}


def quantize_tree(params):
    """params pytree -> same tree with kernel leaves as {'q': i8, 's': f32}."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    out = {}
    for path, leaf in flat:
        node = out
        keys = [p.key if hasattr(p, 'key') else str(p) for p in path]
        for k in keys[:-1]:
            node = node.setdefault(k, {})
        node[keys[-1]] = (_quantize_leaf(leaf) if _is_quantizable(path, leaf)
                         else leaf)
    return out


def _is_qleaf(x):
    return isinstance(x, dict) and set(x.keys()) == {'q', 's'}


def dequantize_tree(qtree, dtype=jnp.float32):
    """Inverse of :func:`quantize_tree` (lossy): {'q','s'} -> dense kernel."""
    def deq(node):
        if _is_qleaf(node):
            return (node['q'].astype(jnp.float32) * node['s']).astype(dtype)
        if isinstance(node, dict):
            return {k: deq(v) for k, v in node.items()}
        return node
    return deq(qtree)


def quantized_apply(model, qtree, variables, *args, **kwargs):
    """Run ``model.apply`` from int8-resident weights.

    Dequantization happens INSIDE the traced computation, so under jit
    the persistent buffers are the int8 tree + scales (the dense f32
    kernels are temporaries XLA materialises per call, not live state).
    ``variables`` supplies the non-param collections (e.g. frozen
    'stats'); its 'params' entry is ignored.
    """
    params = dequantize_tree(qtree)
    merged = {**variables, 'params': params}
    return model.apply(merged, *args, **kwargs)


def save_quantized(path, qtree):
    """Write a quantized tree to one ``.npz`` ('/'-joined path keys;
    ``...#q`` / ``...#s`` suffixes mark quantized kernel halves)."""
    flat = {}
    def walk(node, prefix):
        if _is_qleaf(node):
            flat[prefix + '#q'] = np.asarray(node['q'])
            flat[prefix + '#s'] = np.asarray(node['s'])
        elif isinstance(node, dict):
            for k, v in node.items():
                walk(v, f'{prefix}/{k}' if prefix else k)
        else:
            flat[prefix] = np.asarray(node)
    walk(qtree, '')
    np.savez(path, **flat)


def load_quantized(path):
    """Inverse of :func:`save_quantized`."""
    out = {}
    with np.load(path) as z:
        for key in z.files:
            arr = z[key]
            name, _, half = key.partition('#')
            parts = name.split('/')
            node = out
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            if half:
                node.setdefault(parts[-1], {})[half] = arr
            else:
                node[parts[-1]] = arr
    return out


def quantized_size_bytes(qtree):
    """(quantized_bytes, f32_bytes) accounting for a quantized tree."""
    qb = fb = 0
    def walk(node):
        nonlocal qb, fb
        if _is_qleaf(node):
            qb += node['q'].size * 1 + node['s'].size * 4
            fb += node['q'].size * 4 + 0
        elif isinstance(node, dict):
            for v in node.values():
                walk(v)
        else:
            qb += np.asarray(node).nbytes
            fb += np.asarray(node).size * 4
    walk(qtree)
    return qb, fb

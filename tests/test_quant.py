"""Weights-only int8 PTQ (nbasr_tpu/quant.py): roundtrip bounds, logits
accuracy, int8-resident apply, and size accounting."""

import numpy as np
import jax
import jax.numpy as jnp

from nbasr_tpu.models import get_model
from nbasr_tpu.quant import (quantize_tree, dequantize_tree, quantized_apply,
                             quantized_size_bytes)

ARCH = [[1, 0], [1, 0, 0], [1, 0, 0, 0]]
SMALL = dict(block_filters=(24, 32, 40, 48), cells_per_block=(1, 1, 1, 1),
             cell_groups=4)


def _small_model(use_rnn=True):
    m = get_model(ARCH, use_rnn=use_rnn, dropout_rate=0.0, **SMALL)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 41, 80), jnp.float32)
    sizes = jnp.asarray([41, 33], jnp.int32)
    variables = m.init(jax.random.PRNGKey(0), x, sizes, train=False)
    return m, variables, x, sizes


def test_roundtrip_error_bound():
    """Every quantized kernel reconstructs within s/2 per output channel
    (symmetric rounding), and non-kernel leaves pass through bit-exact."""
    _, variables, *_ = _small_model()
    qtree = quantize_tree(variables['params'])
    deq = dequantize_tree(qtree)

    flat_w = jax.tree_util.tree_flatten_with_path(variables['params'])[0]
    flat_d = dict(jax.tree_util.tree_flatten_with_path(deq)[0])
    paths = dict(flat_w)
    n_quantized = 0
    for path, w in flat_w:
        d = flat_d[path]
        name = path[-1].key
        if name in ('kernel', 'conv_kernel_grouped', 'recurrent') and w.ndim >= 2:
            n_quantized += 1
            absmax = np.max(np.abs(np.asarray(w)),
                            axis=tuple(range(w.ndim - 1)), keepdims=True)
            bound = absmax / 127.0 * 0.5 + 1e-8
            assert np.all(np.abs(np.asarray(w) - np.asarray(d)) <= bound), path
        else:
            np.testing.assert_array_equal(np.asarray(w), np.asarray(d),
                                          err_msg=str(path))
    # block convs (4) + cell convs (4 blocks x 3 grouped convs for this
    # arch) + head + lstm kernel/recurrent all quantized
    assert n_quantized >= 12, n_quantized


def test_quantized_logits_close_and_int8_resident():
    """quantized_apply runs from the int8 tree and tracks the f32 logits;
    it equals apply(dequantize_tree(...)) bit-for-bit."""
    m, variables, x, sizes = _small_model()
    y = m.apply(variables, x, sizes, train=False)
    qtree = quantize_tree(variables['params'])

    yq = quantized_apply(m, qtree, variables, x, sizes, train=False)
    # int8 path == dense path on the dequantized weights (same math)
    ydeq = m.apply({**variables, 'params': dequantize_tree(qtree)},
                   x, sizes, train=False)
    np.testing.assert_array_equal(np.asarray(yq), np.asarray(ydeq))

    # accuracy: per-channel int8 keeps logits within a few percent of the
    # dynamic range (random init; trained models quantize better)
    scale = float(np.abs(np.asarray(y)).max())
    err = float(np.abs(np.asarray(yq) - np.asarray(y)).max())
    assert err < 0.05 * scale, (err, scale)

    # the jitted int8 path carries int8 leaves as inputs (resident form);
    # jit fuses/reassociates, so compare to f32 tolerance, not bitwise
    jf = jax.jit(lambda q, v, x, s: quantized_apply(m, q, v, x, s,
                                                    train=False))
    np.testing.assert_allclose(np.asarray(jf(qtree, variables, x, sizes)),
                               np.asarray(yq), rtol=1e-4, atol=1e-5)


def test_size_accounting():
    _, variables, *_ = _small_model()
    qtree = quantize_tree(variables['params'])
    qb, fb = quantized_size_bytes(qtree)
    assert qb < 0.32 * fb, (qb, fb)  # ~4x smaller than f32 overall


def test_save_load_roundtrip_and_cli(tmp_path):
    """npz save/load reproduces the quantized tree; the CLI quantizes a
    flax-serialized checkpoint end-to-end."""
    from flax import serialization
    from nbasr_tpu.quant import save_quantized, load_quantized
    from nbasr_tpu import cli

    _, variables, *_ = _small_model(use_rnn=True)
    qtree = quantize_tree(variables['params'])
    p = tmp_path / 'model.int8.npz'
    save_quantized(p, qtree)
    back = load_quantized(p)
    flat_a = jax.tree_util.tree_flatten_with_path(qtree)[0]
    flat_b = dict(jax.tree_util.tree_flatten_with_path(back)[0])
    for path, leaf in flat_a:
        np.testing.assert_array_equal(np.asarray(leaf),
                                      np.asarray(flat_b[path]), str(path))

    ckpt = tmp_path / 'best.ckpt'
    payload = {'params': variables['params'], 'step': 0}
    ckpt.write_bytes(serialization.to_bytes(payload))
    out = tmp_path / 'out.npz'
    cli.main(['quantize', str(ckpt), '--out', str(out)])
    assert out.exists()
    again = load_quantized(out)
    flat_c = dict(jax.tree_util.tree_flatten_with_path(again)[0])
    for path, leaf in flat_a:
        np.testing.assert_array_equal(np.asarray(leaf),
                                      np.asarray(flat_c[path]), str(path))

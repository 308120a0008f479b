"""Fused SearchCell: one Pallas kernel per cell, forward and backward.

Motivation (PERF.md round 2): on v5e the train step is HBM-bandwidth
bound — every one of the ~6 XLA ops per cell node (pad, conv, bias+ReLU,
dropout RNG, branch add, LayerNorm) costs a full [B, T, C] round trip
(~200 µs at block-0/1 shapes), so a cell costs ~15 passes while its
*compute* is ~100 µs of MXU work.  This kernel runs the whole cell —
every node's grouped conv (as chunked block-diagonal MXU matmuls, the
same math as ``PadConvRelu``'s ``'chunked'`` impl), clip-ReLU(20),
dropout (TPU hardware PRNG), branch adds, and the final LayerNorm — in
one VMEM residency: the activation makes ONE trip from HBM per cell
instead of ~15.

Backward is a second fused kernel: it *recomputes* the forward (keeping
every node output and the combined ReLU-gate × dropout multiplier in
VMEM), then walks the node DAG in reverse producing dx, per-node
d(expanded weights)/d(bias), and the LayerNorm grads, with all
contractions on the MXU.  Gradients w.r.t. the *expanded* chunk weights
are projected back onto the compact grouped layout by XLA through the
(linear) expansion, so off-block-diagonal components vanish exactly.

Weight convention: conv nodes take the chunk-expanded kernel
``[K, Gc*ci, C_out]`` produced by :func:`expand_chunked` (block-diagonal
per chunk of ``Gc`` groups — see models/layers.py 'chunked'); linear
nodes take a dense ``[C, C]``; zero nodes take no parameters.

Reference semantics covered: cell op table ``model/tf/ops.py:69-76``
(clip-ReLU 20, dropout 0.2, groups=100), node branch adds
``model/tf/model.py:16-25``, trailing LayerNorm ``model/tf/model.py:39-46``.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ['FusedCellSpec', 'ConvNode', 'LinearNode', 'ZeroNode',
           'fused_cell_apply', 'expand_chunked', 'expand_chunked_aligned',
           'pad_lanes', 'unpad_lanes', 'aligned_chunk_cap', 'pad_groups',
           'unpad_groups', 'expand_grouped_aligned']

#: Tests set this to run the kernels in interpret mode on CPU.
INTERPRET = False

_LN_EPS_DEFAULT = 1e-3


def expand_chunked(kernel, groups, chunks):
    """Compact grouped ``[K, ci, C_out]`` -> chunked block-diag
    ``[K, Gc*ci, C_out]`` (see models/layers.py 'chunked' impl)."""
    K, cin, filters = kernel.shape
    S = chunks
    Gc = groups // S
    co = filters // groups
    kg = kernel.reshape(K, cin, S, Gc, co)
    eye = jnp.eye(Gc, dtype=kernel.dtype)
    return jnp.einsum('kcsgo,gh->khcsgo', kg, eye).reshape(
        K, Gc * cin, filters)


def pad_lanes(x, chunks, lane=128):
    """Pad each of ``chunks`` contiguous channel chunks to ``lane`` lanes
    with zeros: ``[..., S*w] -> [..., S*lane]`` (aligned fused layout)."""
    S = chunks
    w = x.shape[-1] // S
    if w == lane:
        return x
    lead = x.shape[:-1]
    xs = x.reshape(*lead, S, w)
    pads = [(0, 0)] * len(lead) + [(0, 0), (0, lane - w)]
    return jnp.pad(xs, pads).reshape(*lead, S * lane)


def unpad_lanes(x, chunks, c_real, lane=128):
    """Inverse of :func:`pad_lanes`: ``[..., S*lane] -> [..., c_real]``."""
    S = chunks
    w = c_real // S
    if w == lane:
        return x
    lead = x.shape[:-1]
    return x.reshape(*lead, S, lane)[..., :w].reshape(*lead, c_real)


def aligned_chunk_cap(groups, ci, co, lane=128):
    """Groups per 128-lane chunk for the aligned layout: as many whole
    groups as fit one lane tile (``floor(lane / max(ci, co))``), capped at
    ``groups``.  Unlike :meth:`PadConvRelu.chunk_count` this does NOT
    require the chunk count to divide ``groups`` — the last chunk simply
    carries fewer live groups (its dead lanes are exact zeros), which is
    what kills the 62.5%-lane waste of the divisor scheme at ci=8
    (PERF.md r4: block1 S=10 -> 7, every chunk a full 128-lane tile)."""
    w = max(ci, co)
    if w > lane:
        return 0            # ineligible (caller falls back to 'chunked')
    return min(groups, lane // w)


def pad_groups(x, groups, cw, cap, chunks, lane=128):
    """Group-aware aligned padding: ``[..., G*cw] -> [..., S*lane]``.

    The G groups (``cw`` channels each) are laid out ``cap`` per chunk;
    each chunk's live lanes are left-aligned and zero-padded to ``lane``.
    The last chunk may hold fewer than ``cap`` live groups.  Identity when
    the layout is already dense (``S*cap == G`` and ``cap*cw == lane``)."""
    S = chunks
    if S * cap == groups and cap * cw == lane:
        return x
    lead = x.shape[:-1]
    xg = x.reshape(*lead, groups, cw)
    pads = [(0, 0)] * len(lead) + [(0, S * cap - groups), (0, 0)]
    xg = jnp.pad(xg, pads).reshape(*lead, S, cap * cw)
    if cap * cw != lane:
        pads = [(0, 0)] * len(lead) + [(0, 0), (0, lane - cap * cw)]
        xg = jnp.pad(xg, pads)
    return xg.reshape(*lead, S * lane)


def unpad_groups(x, groups, cw, cap, chunks, lane=128):
    """Inverse of :func:`pad_groups`: ``[..., S*lane] -> [..., G*cw]``."""
    S = chunks
    if S * cap == groups and cap * cw == lane:
        return x
    lead = x.shape[:-1]
    xg = x.reshape(*lead, S, lane)[..., :cap * cw]
    return xg.reshape(*lead, S * cap, cw)[..., :groups, :].reshape(
        *lead, groups * cw)


def expand_grouped_aligned(kernel, groups, cap, chunks, lane=128):
    """Compact grouped ``[K, ci, C_out]`` -> lane-aligned block-diag
    ``[K, lane, S*lane]`` under the ``cap``-groups-per-chunk layout of
    :func:`pad_groups` (the ceil-chunking generalisation of
    :func:`expand_chunked_aligned`; chunks need not divide ``groups``)."""
    K, ci, filters = kernel.shape
    S = chunks
    co = filters // groups
    if cap * ci > lane or cap * co > lane:
        raise ValueError(f'chunk width {cap * max(ci, co)} exceeds '
                         f'lane {lane}')
    # pad the group axis to S*cap, then block-diagonalise per chunk
    kg = kernel.reshape(K, ci, groups, co)
    kg = jnp.pad(kg, ((0, 0), (0, 0), (0, S * cap - groups), (0, 0)))
    kg = kg.reshape(K, ci, S, cap, co)
    eye = jnp.eye(cap, dtype=kernel.dtype)
    w = jnp.einsum('kcsgo,gh->khcsgo', kg, eye)      # [K, cap, ci, S, cap, co]
    w = w.reshape(K, cap * ci, S, cap * co)
    w = jnp.pad(w, ((0, 0), (0, lane - cap * ci), (0, 0),
                    (0, lane - cap * co)))
    return w.reshape(K, lane, S * lane)


def expand_chunked_aligned(kernel, groups, chunks, lane=128):
    """Compact grouped ``[K, ci, C_out]`` -> lane-aligned chunked
    block-diag ``[K, lane, S*lane]``: :func:`expand_chunked` with each
    chunk's input rows and output columns zero-padded to ``lane`` so
    every per-chunk slice inside the kernel lands on a 128-lane
    boundary (Mosaic relayout-free)."""
    K, cin, filters = kernel.shape
    S = chunks
    Gc = groups // S
    if Gc * cin > lane:
        raise ValueError(f'chunk input width {Gc * cin} exceeds lane {lane}')
    if filters // S > lane:
        raise ValueError(f'chunk output width {filters // S} exceeds '
                         f'lane {lane}')
    w = expand_chunked(kernel, groups, chunks)          # [K, Gc*ci, C_out]
    w = pad_lanes(w, S, lane)                           # pad output columns
    return jnp.pad(w, ((0, 0), (0, lane - Gc * cin), (0, 0)))


class ConvNode:
    """Static spec of one grouped-conv node.

    ``lane``: when set, the per-chunk slice width/stride — activations and
    weights are zero-padded so every chunk occupies exactly ``lane``
    channels (the aligned layout; see :func:`expand_chunked_aligned`).
    ``None`` = compact chunks of ``Gc * cin_pg`` channels."""

    def __init__(self, kernel_size, dilation, lpad, rpad, groups, chunks,
                 cin_pg, cout_pg, branches, lane=None):
        self.kind = 'conv'
        self.K = kernel_size
        self.d = dilation
        self.lpad = lpad
        self.rpad = rpad
        self.S = chunks
        self.Gc = groups // chunks
        self.cin_pg = cin_pg
        self.cout_pg = cout_pg
        self.branches = tuple(branches)   # indices into outputs list
        self.lane = lane

    @property
    def lane_in(self):
        return self.lane or self.Gc * self.cin_pg

    @property
    def lane_out(self):
        return self.lane or self.Gc * self.cout_pg

    def key(self):
        return ('conv', self.K, self.d, self.lpad, self.rpad, self.S,
                self.Gc, self.cin_pg, self.cout_pg, self.branches, self.lane)


class LinearNode:
    def __init__(self, branches):
        self.kind = 'linear'
        self.branches = tuple(branches)

    def key(self):
        return ('linear', self.branches)


class ZeroNode:
    def __init__(self, branches):
        self.kind = 'zero'
        self.branches = tuple(branches)

    def key(self):
        return ('zero', self.branches)


class FusedCellSpec:
    """Static description of a cell: node list + dropout + LN epsilon.

    ``c_real``: in the aligned layout the kernel operates on ``S*lane``
    channels of which only ``c_real`` are live (pad lanes are exact
    zeros); the LayerNorm statistics divide by ``c_real``.  ``None`` =
    compact layout, statistics over the full width."""

    def __init__(self, nodes, dropout_rate=0.0, train=False,
                 ln_eps=_LN_EPS_DEFAULT, use_norm=True, c_real=None,
                 chunk_live=None):
        self.nodes = tuple(nodes)
        self.dropout_rate = float(dropout_rate)
        self.train = bool(train)
        self.ln_eps = float(ln_eps)
        self.use_norm = bool(use_norm)
        self.c_real = c_real
        #: per-chunk live-lane counts (ceil-chunking: the last chunk may
        #: carry fewer live groups).  None = uniform c_real // S per chunk.
        self.chunk_live = None if chunk_live is None else tuple(chunk_live)

    @property
    def dropping(self):
        return self.train and self.dropout_rate > 0.0

    def key(self):
        return (tuple(n.key() for n in self.nodes), self.dropout_rate,
                self.train, self.ln_eps, self.use_norm, self.c_real,
                self.chunk_live)

    @property
    def max_pad(self):
        pads = [(n.lpad, n.rpad) for n in self.nodes if n.kind == 'conv']
        if not pads:
            return (0, 0)
        return (max(p[0] for p in pads), max(p[1] for p in pads))


def _live_lane_mask(spec, T, C):
    """[T, C] mask of live (non-pad) lanes in the aligned layout: chunk s
    carries ``spec.chunk_live[s]`` live channels left-aligned in its 128
    lanes (uniform ``c_real // S`` when chunk_live is unset)."""
    S = C // 128
    if spec.chunk_live is None:
        live = (spec.c_real // S,) * S
    else:
        live = spec.chunk_live
    # all chunks but the last are uniformly full (ceil-chunking); express
    # the per-chunk threshold arithmetically — pallas kernels cannot
    # capture materialised constant arrays.
    assert all(v == live[0] for v in live[:-1]), live
    idx = jax.lax.broadcasted_iota(jnp.int32, (T, C), 1)
    lane = idx % 128
    thr = jnp.where(idx // 128 < S - 1, np.int32(live[0]),
                    np.int32(live[-1]))
    return lane < thr


def _masked_ln_stats(spec, xf, T, C):
    """(mu, var) over live channels only.  Pads are exact zeros, so the
    mean sum needs no mask; the variance uses the true two-pass form with
    pad lanes masked out of the sum — exact, and free of the cancellation
    both the one-pass E[x^2]-mu^2 form and the n_pad*mu^2-corrected form
    suffer when |mu| is large (ADVICE r2 #4)."""
    cr = np.float32(spec.c_real)
    mu = jnp.sum(xf, axis=1, keepdims=True) / cr
    d = jnp.where(_live_lane_mask(spec, T, C), xf - mu, 0.0)
    var = jnp.sum(jnp.square(d), axis=1, keepdims=True) / cr
    return mu, var


def _keep_threshold(rate):
    # keep iff bits < keep_prob * 2^32
    return np.uint32(min(int((1.0 - rate) * (1 << 32)), (1 << 32) - 1))


class _Prng:
    """TPU hardware PRNG, with a stateless-hash fallback for interpret
    mode (pltpu.prng_* has no CPU lowering).  The fallback is only used by
    CPU tests; fwd/bwd determinism holds because both passes consume bits
    in the same (node-ordered) sequence."""

    def __init__(self):
        self.interpret = INTERPRET
        self._state = None
        self._counter = 0

    def seed(self, s0, s1, pid):
        if self.interpret:
            self._state = (s0.astype(jnp.uint32), s1.astype(jnp.uint32),
                           pid.astype(jnp.uint32))
            self._counter = 0
        else:
            # Mosaic caps prng_seed at 2 values; mix the batch row into
            # the first word (large odd multiplier, wrapping int32).
            mixed = s0 ^ (pid.astype(jnp.int32) * jnp.int32(1779033703))
            pltpu.prng_seed(mixed, s1)

    def bits(self, shape):
        if not self.interpret:
            return pltpu.prng_random_bits(shape).astype(jnp.uint32)
        self._counter += 1
        s0, s1, pid = self._state
        i = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
        j = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
        x = (i * jnp.uint32(0x9E3779B1) ^ j * jnp.uint32(0x85EBCA6B)
             ^ (s0 * jnp.uint32(0xC2B2AE35)) ^ (s1 + jnp.uint32(0x27D4EB2F))
             ^ (pid * jnp.uint32(0x165667B1))
             ^ np.uint32((self._counter * 0x5851F42D) & 0xFFFFFFFF))
        for shift in (15, 13, 16):
            x = x ^ (x >> shift)
            x = x * jnp.uint32(0x2545F491)
        return x ^ (x >> 16)


def _node_weight_count(node):
    return {'conv': 2, 'linear': 2, 'zero': 0}[node.kind]


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _emit_conv(node, src, pad_ref, acc_ref, w_ref, b_ref, T, C):
    """conv(src) + bias into acc_ref; src is a [T, C] array (VMEM value).

    K-tap register blocking (PERF.md r4 lever): the chunk loop is OUTER and
    the K taps accumulate into an SSA *value*, so the MXU chains the K
    matmuls through its accumulator and the ``[T, lane]`` slab hits VMEM
    once per chunk — instead of one read-modify-write round trip per tap
    (K× the traffic) that the old ``acc_ref[...] +=`` form paid."""
    lpad, rpad, K, d, S = node.lpad, node.rpad, node.K, node.d, node.S
    Gci = node.lane_in
    Gco = node.lane_out
    if lpad:
        pad_ref[:lpad, :] = jnp.zeros((lpad, C), pad_ref.dtype)
    pad_ref[lpad:lpad + T, :] = src.astype(pad_ref.dtype)
    tail = pad_ref.shape[0] - (lpad + T)
    if tail:
        pad_ref[lpad + T:, :] = jnp.zeros((tail, C), pad_ref.dtype)
    bias = b_ref[0, :].astype(jnp.float32)
    for s in range(S):
        acc = jnp.broadcast_to(bias[s * Gco:(s + 1) * Gco], (T, Gco))
        for k in range(K):
            off = k * d
            xs = pad_ref[off:off + T, s * Gci:(s + 1) * Gci]
            wk = w_ref[k, :, s * Gco:(s + 1) * Gco]
            acc = acc + jax.lax.dot_general(
                xs, wk, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        acc_ref[:, s * Gco:(s + 1) * Gco] = acc


def _emit_linear(src, acc_ref, w_ref, b_ref, T, C):
    acc_ref[...] = (b_ref[0, :].astype(jnp.float32)[None, :]
                    + jax.lax.dot_general(
                        src, w_ref[...].astype(src.dtype),
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32))


def _fwd_kernel(spec, T, C, seed_ref, x_ref, *refs):
    n_nodes = len(spec.nodes)
    n_w = sum(_node_weight_count(n) for n in spec.nodes)
    w_refs = refs[:n_w]
    i = n_w
    if spec.use_norm:
        scale_ref, bias_ref = refs[i], refs[i + 1]
        i += 2
    o_ref = refs[i]
    outs_ref, pad_ref, acc_ref = refs[i + 1], refs[i + 2], refs[i + 3]

    prng = _Prng()
    if spec.dropping:
        prng.seed(seed_ref[0], seed_ref[1], pl.program_id(0))
        thr = _keep_threshold(spec.dropout_rate)
        inv_keep = np.float32(1.0 / (1.0 - spec.dropout_rate))

    outs_ref[0] = x_ref[0]
    wi = 0
    for n, node in enumerate(spec.nodes):
        src = outs_ref[n]
        if node.kind == 'conv':
            _emit_conv(node, src, pad_ref, acc_ref, w_refs[wi],
                       w_refs[wi + 1], T, C)
            wi += 2
        elif node.kind == 'linear':
            _emit_linear(src, acc_ref, w_refs[wi], w_refs[wi + 1], T, C)
            wi += 2
        if node.kind == 'zero':
            total = jnp.zeros((T, C), jnp.float32)
        else:
            y = jnp.clip(acc_ref[...], 0.0, 20.0)
            if spec.dropping:
                bits = prng.bits((T, C))
                y = jnp.where(bits < thr, y * inv_keep, 0.0)
            total = y
        for j in node.branches:
            total = total + outs_ref[j].astype(jnp.float32)
        outs_ref[n + 1] = total.astype(outs_ref.dtype)

    xf = outs_ref[n_nodes].astype(jnp.float32)
    if spec.use_norm:
        if spec.c_real:
            mu, var = _masked_ln_stats(spec, xf, T, C)
        else:
            mu = jnp.mean(xf, axis=1, keepdims=True)
            var = jnp.mean(jnp.square(xf - mu), axis=1, keepdims=True)
        xhat = (xf - mu) * jax.lax.rsqrt(var + spec.ln_eps)
        out = (xhat * scale_ref[0, :].astype(jnp.float32)[None, :]
               + bias_ref[0, :].astype(jnp.float32)[None, :])
    else:
        out = xf
    o_ref[0] = out.astype(o_ref.dtype)


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------

def _bwd_kernel(spec, T, C, seed_ref, x_ref, dy_ref, *refs):
    n_nodes = len(spec.nodes)
    n_w = sum(_node_weight_count(n) for n in spec.nodes)
    w_refs = refs[:n_w]
    i = n_w
    if spec.use_norm:
        scale_ref = refs[i]
        i += 1
    # outputs: dx, per-node (dw, db), (dscale, dbias)
    dx_ref = refs[i]
    i += 1
    dw_refs = refs[i:i + n_w]
    i += n_w
    if spec.use_norm:
        dscale_ref, dbias_ref = refs[i], refs[i + 1]
        i += 2
    outs_ref, mult_ref, g_ref, pad_ref, acc_ref, dzp_ref = refs[i:i + 6]

    row0 = pl.program_id(0) == 0

    prng = _Prng()
    if spec.dropping:
        prng.seed(seed_ref[0], seed_ref[1], pl.program_id(0))
        thr = _keep_threshold(spec.dropout_rate)
        inv_keep = np.float32(1.0 / (1.0 - spec.dropout_rate))

    # ---- recompute forward, keeping outs + combined bwd multipliers ----
    outs_ref[0] = x_ref[0]
    wi = 0
    for n, node in enumerate(spec.nodes):
        src = outs_ref[n]
        if node.kind == 'conv':
            _emit_conv(node, src, pad_ref, acc_ref, w_refs[wi],
                       w_refs[wi + 1], T, C)
            wi += 2
        elif node.kind == 'linear':
            _emit_linear(src, acc_ref, w_refs[wi], w_refs[wi + 1], T, C)
            wi += 2
        if node.kind == 'zero':
            total = jnp.zeros((T, C), jnp.float32)
        else:
            a = acc_ref[...]
            # clip-ReLU gate matching jnp.clip's VJP exactly, including the
            # 0.5/0.5 tie split at the boundaries — with zero-initialised
            # biases, whole ReLU-dead receptive windows make a == 0 exactly
            # (systematic, not measure-zero), and the unfused XLA paths
            # pass half the gradient there.
            gate = jnp.where((a > 0.0) & (a < 20.0), 1.0,
                             jnp.where((a == 0.0) | (a == 20.0), 0.5, 0.0))
            y = jnp.clip(a, 0.0, 20.0)
            if spec.dropping:
                bits = prng.bits((T, C))
                keep = bits < thr
                y = jnp.where(keep, y * inv_keep, 0.0)
                m = jnp.where(keep, gate * inv_keep, 0.0)
            else:
                m = gate
            mult_ref[n] = m.astype(mult_ref.dtype)
            total = y
        for j in node.branches:
            total = total + outs_ref[j].astype(jnp.float32)
        outs_ref[n + 1] = total.astype(outs_ref.dtype)

    # ---- LayerNorm backward -> g[n_nodes] ----
    xf = outs_ref[n_nodes].astype(jnp.float32)
    dy = dy_ref[0].astype(jnp.float32)
    if spec.use_norm:
        if spec.c_real:
            cr = np.float32(spec.c_real)
            mu, var = _masked_ln_stats(spec, xf, T, C)
        else:
            cr = np.float32(C)
            mu = jnp.mean(xf, axis=1, keepdims=True)
            var = jnp.mean(jnp.square(xf - mu), axis=1, keepdims=True)
        inv = jax.lax.rsqrt(var + spec.ln_eps)
        xhat = (xf - mu) * inv
        sc = scale_ref[0, :].astype(jnp.float32)[None, :]

        @pl.when(row0)
        def _():
            dscale_ref[...] = jnp.zeros_like(dscale_ref)
            dbias_ref[...] = jnp.zeros_like(dbias_ref)

        dscale_ref[0, :] += jnp.sum(dy * xhat, axis=0)
        dbias_ref[0, :] += jnp.sum(dy, axis=0)
        # dy pad lanes are exact zeros (the unpad slice's VJP), so these
        # sums over the padded width equal sums over live channels.
        dxhat = dy * sc
        g_last = (dxhat - jnp.sum(dxhat, axis=1, keepdims=True) / cr
                  - xhat * (jnp.sum(dxhat * xhat, axis=1, keepdims=True)
                            / cr)) * inv
    else:
        g_last = dy
    for n in range(n_nodes + 1):
        g_ref[n] = jnp.zeros((T, C), g_ref.dtype)
    g_ref[n_nodes] = g_last.astype(g_ref.dtype)

    # ---- reverse node walk ----
    w_starts = []
    wi = 0
    for node in spec.nodes:
        w_starts.append(wi)
        wi += _node_weight_count(node)

    for n in reversed(range(n_nodes)):
        node = spec.nodes[n]
        dtotal = g_ref[n + 1].astype(jnp.float32)
        for j in node.branches:
            g_ref[j] = (g_ref[j].astype(jnp.float32) + dtotal).astype(
                g_ref.dtype)
        if node.kind == 'zero':
            continue
        dz = (dtotal * mult_ref[n].astype(jnp.float32))
        wi = w_starts[n]
        w_ref, dw_ref, db_ref = w_refs[wi], dw_refs[wi], dw_refs[wi + 1]

        @pl.when(row0)
        def _():
            dw_ref[...] = jnp.zeros_like(dw_ref)
            db_ref[...] = jnp.zeros_like(db_ref)

        db_ref[0, :] += jnp.sum(dz, axis=0)
        dzc = dz.astype(x_ref.dtype)

        if node.kind == 'linear':
            src = outs_ref[n]
            dw_ref[...] += jax.lax.dot_general(
                src, dzc, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            contrib = jax.lax.dot_general(
                dzc, w_ref[...], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            g_ref[n] = (g_ref[n].astype(jnp.float32) + contrib).astype(
                g_ref.dtype)
            continue

        # conv: rebuild the padded source, then dw and dx on the MXU
        lpad, K, d, S = node.lpad, node.K, node.d, node.S
        Gci = node.lane_in
        Gco = node.lane_out
        if lpad:
            pad_ref[:lpad, :] = jnp.zeros((lpad, C), pad_ref.dtype)
        pad_ref[lpad:lpad + T, :] = outs_ref[n]
        tail = pad_ref.shape[0] - (lpad + T)
        if tail:
            pad_ref[lpad + T:, :] = jnp.zeros((tail, C), pad_ref.dtype)

        # dx as a GATHER conv over a padded dz buffer (flipped taps):
        # dx[i] = Σ_k dz[i + lpad − k·d] · w[k]ᵀ — placing dz at offset
        # o = (K−1)·d − lpad makes every tap a static slice at
        # off_k = (K−1−k)·d + (o+lpad−(K−1)·d) = maxoff − k·d, so like the
        # forward the K taps accumulate in an SSA value per chunk and the
        # [T, lane] accumulator hits VMEM once per chunk instead of one
        # read-modify-write per tap (the old dxp_ref[...] += scatter form).
        maxoff = (K - 1) * d
        o = maxoff - lpad
        assert o >= 0, (lpad, K, d)
        if o:
            dzp_ref[:o, :] = jnp.zeros((o, C), dzp_ref.dtype)
        dzp_ref[o:o + T, :] = dzc
        ztail = dzp_ref.shape[0] - (o + T)
        if ztail:
            dzp_ref[o + T:, :] = jnp.zeros((ztail, C), dzp_ref.dtype)

        for s in range(S):
            dzs = dzc[:, s * Gco:(s + 1) * Gco]
            for k in range(K):
                off = k * d
                xs = pad_ref[off:off + T, s * Gci:(s + 1) * Gci]
                dw_ref[k, :, s * Gco:(s + 1) * Gco] += jax.lax.dot_general(
                    xs, dzs, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            acc = jnp.zeros((T, Gci), jnp.float32)
            for k in range(K):
                off = maxoff - k * d
                dzk = dzp_ref[off:off + T, s * Gco:(s + 1) * Gco]
                wk = w_ref[k, :, s * Gco:(s + 1) * Gco]
                acc = acc + jax.lax.dot_general(
                    dzk, wk, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
            g_ref[n, :, s * Gci:(s + 1) * Gci] = (
                g_ref[n, :, s * Gci:(s + 1) * Gci].astype(jnp.float32)
                + acc).astype(g_ref.dtype)

    dx_ref[0] = g_ref[0].astype(dx_ref.dtype)


# ---------------------------------------------------------------------------
# pallas_call plumbing + custom_vjp
# ---------------------------------------------------------------------------

def _const_spec(shape):
    nd = len(shape)
    return pl.BlockSpec(shape, lambda i, _nd=nd: (0,) * _nd,
                        memory_space=pltpu.VMEM)


def _weight_shapes(spec, C):
    """Per-node (weight, bias) shapes in operand order."""
    shapes = []
    for node in spec.nodes:
        if node.kind == 'conv':
            shapes += [(node.K, node.lane_in, C), (1, C)]
        elif node.kind == 'linear':
            shapes += [(C, C), (1, C)]
    return shapes


def _forward(spec, x, weights, ln, seed):
    B, T, C = x.shape
    lpad, rpad = spec.max_pad
    n_nodes = len(spec.nodes)
    w_shapes = _weight_shapes(spec, C)
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((1, T, C), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)]
    in_specs += [_const_spec(s) for s in w_shapes]
    operands = [seed, x] + list(weights)
    if spec.use_norm:
        in_specs += [_const_spec((1, C)), _const_spec((1, C))]
        operands += [ln[0].reshape(1, C), ln[1].reshape(1, C)]
    kernel = functools.partial(_fwd_kernel, spec, T, C)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, T, C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T, C), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((n_nodes + 1, T, C), x.dtype),
            pltpu.VMEM((T + lpad + rpad, C), x.dtype),
            pltpu.VMEM((T, C), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=INTERPRET,
    )(*operands)


def _backward(spec, x, weights, ln, seed, dy):
    B, T, C = x.shape
    lpad, rpad = spec.max_pad
    n_nodes = len(spec.nodes)
    w_shapes = _weight_shapes(spec, C)
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((1, T, C), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, T, C), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)]
    in_specs += [_const_spec(s) for s in w_shapes]
    operands = [seed, x, dy] + list(weights)
    if spec.use_norm:
        in_specs += [_const_spec((1, C))]
        operands += [ln[0].reshape(1, C)]

    out_shapes = [jax.ShapeDtypeStruct((B, T, C), x.dtype)]        # dx
    out_specs = [pl.BlockSpec((1, T, C), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM)]
    for s in w_shapes:
        out_shapes.append(jax.ShapeDtypeStruct(s, jnp.float32))
        out_specs.append(_const_spec(s))
    if spec.use_norm:
        for _ in range(2):
            out_shapes.append(jax.ShapeDtypeStruct((1, C), jnp.float32))
            out_specs.append(_const_spec((1, C)))

    kernel = functools.partial(_bwd_kernel, spec, T, C)
    outs = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((n_nodes + 1, T, C), x.dtype),   # outs
            pltpu.VMEM((n_nodes, T, C), x.dtype),       # bwd multipliers
            # grads per output: f32 even when activations are bf16 — the
            # reverse walk re-rounds g at every node boundary otherwise,
            # and cancellation-heavy reductions (bias grads) measurably
            # lose accuracy vs the unfused path (r3 hardware gate).
            pltpu.VMEM((n_nodes + 1, T, C), jnp.float32),
            pltpu.VMEM((T + lpad + rpad, C), x.dtype),  # padded source
            pltpu.VMEM((T, C), jnp.float32),            # conv accumulator
            # padded-dz buffer for the gather-style dx (flipped-tap conv)
            pltpu.VMEM((T + max((
                (n.K - 1) * n.d for n in spec.nodes if n.kind == 'conv'),
                default=0), C), x.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=INTERPRET,
    )(*operands)
    return outs


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused_cell(spec_key, x, weights, ln, seed):
    spec = _SPECS[spec_key]
    return _forward(spec, x, weights, ln, seed)


def _fused_fwd(spec_key, x, weights, ln, seed):
    y = _fused_cell(spec_key, x, weights, ln, seed)
    return y, (x, weights, ln, seed)


def _fused_bwd(spec_key, res, dy):
    spec = _SPECS[spec_key]
    x, weights, ln, seed = res
    outs = _backward(spec, x, weights, ln, seed, dy)
    dx = outs[0]
    n_w = len(weights)
    dws = []
    for i, w in enumerate(weights):
        g = outs[1 + i]
        if g.shape != w.shape:      # biases returned as [1, C]
            g = g.reshape(w.shape)
        dws.append(g.astype(w.dtype))
    if spec.use_norm:
        dscale = outs[1 + n_w].reshape(ln[0].shape).astype(ln[0].dtype)
        dbias = outs[2 + n_w].reshape(ln[1].shape).astype(ln[1].dtype)
        dln = (dscale, dbias)
    else:
        dln = jax.tree_util.tree_map(jnp.zeros_like, ln)
    return dx, tuple(dws), dln, jnp.zeros_like(seed)


_fused_cell.defvjp(_fused_fwd, _fused_bwd)

#: spec registry: custom_vjp nondiff args must be hashable; specs are
#: registered once per unique static configuration.
_SPECS = {}


def fused_cell_apply(spec, x, weights, ln_params, seed):
    """Run one fused cell.

    spec: FusedCellSpec;  x: [B, T, C];  weights: flat tuple of per-node
    (w, b) in node order (conv w chunk-expanded, bias [C]); ln_params:
    (scale [C], bias [C]) (ignored when spec.use_norm is False — pass
    zeros); seed: int32 [2] (dropout stream id).
    """
    key = spec.key()
    _SPECS.setdefault(key, spec)
    weights = tuple(
        w if w.ndim != 1 else w.reshape(1, -1) for w in weights)
    return _fused_cell(key, x, weights, tuple(ln_params), seed)

"""Hardware exactness gate for the fused_aligned cell kernel.

VERDICT r2 next #1(a): before the fused whole-cell Pallas kernel may be
the ``grouped_impl='auto'`` default on TPU, its forward AND gradients must
be asserted against the pure-XLA ``'chunked'`` path **on the real chip**
at flagship shapes — interpret-mode parity (tests/test_fused_cell.py) is
not hardware (Mosaic relayouts, the hardware PRNG, and MXU rounding all
differ from the CPU emulation).  This script is that gate:

  1. forward + full gradient parity fused_aligned vs chunked, dropout off,
     f32 highest-precision, at the flagship block shapes
     (C=600, groups=100, T=301) and a dilated/branchy arch;
  2. the same in bf16 (training dtype) with bf16-appropriate tolerances;
  3. dropout-mask fwd/bwd consistency of the hardware-PRNG reseed
     (ops/fused_cell.py _Prng): a directional finite difference with a
     fixed rng must match the analytic gradient — only possible when the
     backward kernel regenerates exactly the masks the forward drew;
  4. 'auto' must resolve to 'fused_aligned' on this platform.

Exit code 0 + a JSON line with ``"ok": true`` = gate passed.  Skips
(exit 0, ``"skipped"``) off-TPU.  Run by tests/test_fused_hw.py in a
subprocess so the CPU-pinned pytest suite can still drive the real chip.
"""

import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update('jax_compilation_cache_dir', '/tmp/nbasr_jax_cache')
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:
        pass

    if jax.devices()[0].platform != 'tpu':
        print(json.dumps({'ok': True, 'skipped': 'not on TPU',
                          'platform': jax.devices()[0].platform}))
        return 0

    from nbasr_tpu.models.cell import SearchCell

    results = {}

    # flagship block-0 cell + a dilated/branchy arch at block-3 width
    cases = [
        ('flagship_b0', (('conv5', 0), ('conv5', 0, 0), ('conv5', 0, 0, 0)),
         600),
        ('dilated_b3', (('conv5d2', 1), ('conv7', 1, 0), ('linear', 0, 1, 1)),
         1200),
    ]
    B, T = 8, 301

    def build(arch, C, impl, dropout=0.0):
        return SearchCell(filters=C, arch_desc=arch, dropout_rate=dropout,
                          groups=100, init_scheme='scaled',
                          grouped_impl=impl)

    # 4. auto resolution on this platform
    assert build(cases[0][1], 600, 'auto')._resolve_impl() == 'fused_aligned', \
        "'auto' must resolve to fused_aligned on TPU"
    results['auto_resolves_fused'] = True

    # 0. regression guard for the XLA block-diagonal-filter bad rewrite
    # (found by this gate, round 3): at DEFAULT matmul precision, fusing
    # the in-jit chunk expansion into the grouped conv mis-compiled —
    # O(1) relative error, not rounding.  models/layers.py now puts an
    # optimization_barrier between expansion and conv; this asserts the
    # chunked path matches the 'native' lowering at default precision
    # (the precision the production bf16 train step runs at).
    from nbasr_tpu.models.layers import PadConvRelu
    C, G, K = 600, 100, 5
    rs = np.random.RandomState(7)
    x = jnp.asarray(rs.randn(2, T, C) * 0.5, jnp.float32)
    pcr = PadConvRelu(C, kernel_size=K, groups=G, grouped_impl='chunked',
                      init_scheme='scaled')
    v = pcr.init(jax.random.PRNGKey(0), x)
    # non-zero bias (ADVICE r3 low): the oracle must compute conv + bias
    # then clip — with the default zero init a missing bias term would be
    # invisible (and ReLU-dead windows sit exactly at the clip tie).
    # mutable deep copy that works for both dict and FrozenDict variable
    # collections (ADVICE r4 low: tree_map preserves FrozenDict, which
    # would reject item assignment)
    import flax.core
    v = flax.core.unfreeze(v)
    v['params'] = dict(v['params'])
    v['params']['conv_bias'] = jnp.asarray(
        rs.randn(C) * 0.1, jnp.float32)
    ya = jax.jit(pcr.apply)(v, x)
    # oracle: the same math with the block-diagonal expansion done OUTSIDE
    # the jit (numpy), so no fusion with the conv is possible
    kern = np.asarray(v['params']['conv_kernel_grouped'])
    ci = C // G
    S = PadConvRelu.chunk_count(G, ci, ci)
    Gc = G // S
    kg = kern.reshape(K, ci, S, Gc, ci)
    w = np.einsum('kcsgo,gh->khcsgo', kg, np.eye(Gc, dtype=kern.dtype)
                  ).reshape(K, Gc * ci, C)

    def oracle(x, w, b):
        return jnp.clip(jax.lax.conv_general_dilated(
            x, w, window_strides=(1,), padding=[(0, 4)],
            feature_group_count=S,
            dimension_numbers=('NWC', 'WIO', 'NWC')) + b, 0.0, 20.0)

    wj = jnp.asarray(w)
    bj = v['params']['conv_bias']
    yb = jax.jit(oracle)(x, wj, bj)
    err = float(jnp.max(jnp.abs(ya - yb)) / (jnp.max(jnp.abs(ya)) + 1e-9))
    assert err < 0.03, \
        f'chunked vs pre-expanded conv at default precision: {err}'
    results['chunked_default_precision_relerr'] = err

    # 0b. BACKWARD miscompile guard for the chunked path (ADVICE r3
    # medium): the r3 forward check would not catch a backward-only bad
    # rewrite, yet chunked is both the silent fused-ineligible fallback
    # and the explicit bf16 --grouped_impl=chunked path.  Compare every
    # gradient (x, compact kernel, bias) of the chunked apply at DEFAULT
    # precision against the pre-expanded-weights oracle; the oracle's
    # expanded-kernel grad maps back to the compact layout by extracting
    # the block-diagonal (dL/dkern[k,c,s,g,o] = dL/dw[k, g*ci+c, (s,g,o)]).
    r0 = jnp.asarray(rs.randn(*ya.shape), jnp.float32)
    gx_c, gv_c = jax.jit(jax.grad(
        lambda x, v: jnp.vdot(pcr.apply(v, x), r0), argnums=(0, 1)))(x, v)
    gx_o, gw_o, gb_o = jax.jit(jax.grad(
        lambda x, w, b: jnp.vdot(oracle(x, w, b), r0),
        argnums=(0, 1, 2)))(x, wj, bj)
    gw_o = np.asarray(gw_o).reshape(K, Gc, ci, S, Gc, ci)
    gk_o = np.einsum('khcsgo,gh->kcsgo', gw_o, np.eye(Gc)
                     ).reshape(K, ci, C)
    pairs = {
        'x': (gx_c, gx_o),
        'kernel': (gv_c['params']['conv_kernel_grouped'], jnp.asarray(gk_o)),
        'bias': (gv_c['params']['conv_bias'], gb_o),
    }
    for pname, (gc_, go_) in pairs.items():
        scale = float(jnp.abs(go_).max()) + 1e-6
        gerr = float(jnp.abs(gc_ - go_).max()) / scale
        results[f'chunked_default_precision_grad_{pname}_relerr'] = gerr
        assert gerr < 0.05, \
            f'chunked BACKWARD vs oracle at default precision ({pname}): {gerr}'

    for name, arch, C in cases:
        x = jnp.asarray(np.random.RandomState(0).randn(B, T, C) * 0.5,
                        jnp.float32)
        ref = build(arch, C, 'chunked')
        fus = build(arch, C, 'fused_aligned')
        assert fus._resolve_impl() == 'fused_aligned'
        v = ref.init(jax.random.PRNGKey(0), x)
        # random-projection loss sum(y*r): a generic cotangent direction.
        # (sum(y**2) would make dy proportional to xhat, and LayerNorm's
        # backward then cancels almost exactly — the true grads vanish and
        # any comparison measures amplified rounding noise, not kernels.)
        r = jnp.asarray(np.random.RandomState(5).randn(B, T, C), jnp.float32)

        # ---- 1. f32 highest-precision forward + gradient parity ----
        with jax.default_matmul_precision('highest'):
            ya = jax.jit(ref.apply)(v, x)
            yb = jax.jit(fus.apply)(v, x)
            fa = jax.jit(jax.grad(
                lambda v, x: jnp.vdot(ref.apply(v, x), r), argnums=(0, 1)))
            fb = jax.jit(jax.grad(
                lambda v, x: jnp.vdot(fus.apply(v, x), r), argnums=(0, 1)))
            ga, gb = fa(v, x), fb(v, x)
        fwd_err = float(jnp.max(jnp.abs(ya - yb))
                        / (jnp.max(jnp.abs(ya)) + 1e-9))
        assert fwd_err < 1e-5, f'{name}: f32 forward rel err {fwd_err}'
        grad_errs = {}
        for (path, la), (_, lb) in zip(
                jax.tree_util.tree_leaves_with_path(ga),
                jax.tree_util.tree_leaves_with_path(gb)):
            scale = float(jnp.abs(la).max()) + 1e-6
            err = float(jnp.abs(la - lb).max()) / scale
            grad_errs[jax.tree_util.keystr(path)] = err
            # 1e-3 (not 1e-5-ish): jnp.clip's VJP passes HALF the gradient
            # exactly at a == 0, and zero-init biases make whole ReLU-dead
            # receptive windows sit exactly there — any lowering change
            # that perturbs a by 1 ulp flips 0.5·dy at those elements.
            assert err < 1e-3, \
                f'{name}: f32 grad {jax.tree_util.keystr(path)} rel err {err}'
        results[f'{name}_f32_fwd_relerr'] = fwd_err
        results[f'{name}_f32_grad_max_relerr'] = max(grad_errs.values())

        # ---- 2. bf16 (training dtype) parity ----
        # Both bf16 paths are *approximations* of the f32 math; mutual
        # agreement is the wrong bar for cancellation-heavy tensors (bias
        # grads sum ~2400 signed bf16 terms, and clip-ReLU tie flips at
        # a == 0 move 0.5·dy per flipped element).  The gate therefore
        # judges each bf16 path against the f32-highest ground truth from
        # section 1 and requires the fused path to be no farther from it
        # than the chunked path (with slack), plus a small-forward bound.
        ga_truth = ga[0]
        xb = x.astype(jnp.bfloat16)
        ya = jax.jit(ref.apply)(v, xb).astype(jnp.float32)
        yb = jax.jit(fus.apply)(v, xb).astype(jnp.float32)
        fwd_err16 = float(jnp.max(jnp.abs(ya - yb))
                          / (jnp.max(jnp.abs(ya)) + 1e-9))
        assert fwd_err16 < 0.05, f'{name}: bf16 forward rel err {fwd_err16}'
        gc16 = jax.jit(jax.grad(
            lambda v, x: jnp.vdot(ref.apply(v, x).astype(jnp.float32), r),
            argnums=(0,)))(v, xb)[0]
        gf16 = jax.jit(jax.grad(
            lambda v, x: jnp.vdot(fus.apply(v, x).astype(jnp.float32), r),
            argnums=(0,)))(v, xb)[0]
        worst = worst_c = 0.0
        for (path, lt), (_, lc), (_, lf) in zip(
                jax.tree_util.tree_leaves_with_path(ga_truth),
                jax.tree_util.tree_leaves_with_path(gc16),
                jax.tree_util.tree_leaves_with_path(gf16)):
            lt = lt.astype(jnp.float32)
            scale = float(jnp.abs(lt).max()) + 1e-6
            err_c = float(jnp.abs(lc.astype(jnp.float32) - lt).max()) / scale
            err_f = float(jnp.abs(lf.astype(jnp.float32) - lt).max()) / scale
            worst = max(worst, err_f)
            worst_c = max(worst_c, err_c)
            # ADVICE r3 medium: bound the CHUNKED path against the f32
            # truth in absolute terms too — otherwise a chunked-backward
            # miscompile would inflate err_c and the relative fused bound
            # below would still pass.  0.15 (not 0.08): bias grads sum
            # ~2400 signed bf16 terms and legitimately reach ~0.09 on
            # hardware; the bound only needs to catch O(1) bad rewrites
            # (the f32 default-precision backward check in §0b catches
            # the miscompile class exactly).
            assert err_c < 0.15, \
                (f'{name}: bf16 CHUNKED grad {jax.tree_util.keystr(path)} '
                 f'err {err_c} vs f32 truth')
            assert err_f < max(2.5 * err_c, 0.08), \
                (f'{name}: bf16 grad {jax.tree_util.keystr(path)}: fused '
                 f'err {err_f} vs chunked err {err_c} (both vs f32 truth)')
        results[f'{name}_bf16_fwd_relerr'] = fwd_err16
        results[f'{name}_bf16_grad_max_err_vs_f32'] = worst
        results[f'{name}_bf16_chunked_grad_max_err_vs_f32'] = worst_c

    # ---- 3. hardware-PRNG dropout fwd/bwd mask consistency ----
    # Smaller B/T than the parity cases: the check is a finite difference
    # of a full-tensor reduction, and f32 evaluation noise of the sum
    # (~sqrt(N)·ulp) must sit well below the directional-derivative signal
    # (2·eps·|an|).  At B=2, T=128 the noise floor is ~1%.
    name, arch, C = cases[0]
    cell = build(arch, C, 'fused_aligned', dropout=0.2)
    x = jnp.asarray(np.random.RandomState(1).randn(2, 128, C) * 0.5,
                    jnp.float32)
    v = cell.init(jax.random.PRNGKey(0), x)
    r = jax.random.PRNGKey(11)

    # random-projection loss again: through the trailing LayerNorm,
    # sum(y**2) is nearly invariant in x (= B*T*C + O(eps)), so its true
    # directional derivative (~1e-2) sits below the f32 ulp of the loss
    # value (~0.1 at 1.4e6) and the finite difference quantises to 0.
    proj = jnp.asarray(np.random.RandomState(6).randn(*x.shape), jnp.float32)
    with jax.default_matmul_precision('highest'):
        def f(x):
            return jnp.vdot(cell.apply(v, x, True, rngs={'dropout': r}), proj)

        f = jax.jit(f)
        # determinism: two forwards with the same rng bit-match (the
        # hardware PRNG reseed is a pure function of (seed, program_id))
        y1 = f(x)
        y2 = f(x)
        assert float(jnp.abs(y1 - y2)) == 0.0, 'fwd not deterministic'
        g = jax.jit(jax.grad(f))(x)
        rng = np.random.RandomState(0)
        vdir = jnp.asarray(rng.randn(*x.shape), jnp.float32)
        vdir = vdir / jnp.linalg.norm(vdir)
        eps = 1e-2
        fd = (f(x + eps * vdir) - f(x - eps * vdir)) / (2 * eps)
        an = jnp.sum(g * vdir)
        rel = float(jnp.abs(fd - an)
                    / (jnp.maximum(jnp.abs(fd), jnp.abs(an)) + 1e-9))
    assert rel < 4e-2, f'dropout fwd/bwd mask inconsistency: fd rel err {rel}'
    results['dropout_fd_relerr'] = rel

    results['ok'] = True
    print(json.dumps(results))
    return 0


if __name__ == '__main__':
    sys.exit(main())

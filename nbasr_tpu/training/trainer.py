"""Single-program trainer: jitted train/eval steps, checkpoints, metrics.

TPU-native re-implementation of the reference trainers
(``training/tf/trainer.py:56-517``, ``training/torch/trainer.py:47-264``)
as a functional core (pure jitted step functions over an explicit
``TrainState``) plus a thin host loop with the reference's API surface:
``train / step / save / load / remember_best / recall_best``.

Recipe parity (BASELINE.md): Adam(lr), grad-clip 5.0 (before Adam),
lr ×0.9 per epoch from epoch 5, conv-kernel L2 0.01, beam-width-12
eval decoding, best-on-val-LER checkpointing with auto-resume, final test
evaluation on the best weights, ``scores.pickle``/``test_scores.pickle``
artifacts.

Documented deviation: ``adam_eps`` defaults to 1e-16, not the reference's
1e-7 (``torch/trainer.py:84``).  Global-norm clipping rescales the
flagship's gradients so the late layers' entries land below 1e-7, where
the reference eps destroys Adam's per-parameter scale invariance and
freezes the head — the 26M model then cannot leave the CTC all-blank
minimum (PERF.md r4, measured; eps=1e-16 unfreezes every block).  Pass
``adam_eps=1e-7`` to reproduce the reference optimizer bit-for-bit.

Differences by design:
  - The audio frontend runs *inside* the jitted step (log-mel on TPU, fused
    by XLA) instead of a host tf.data pipeline.
  - NaN handling: ``optax.apply_if_finite`` skips non-finite updates and
    counts them (surfaced per epoch; ``strict_numerics=True`` raises),
    replacing per-tensor ``check_numerics`` crashes (``trainer.py:439-450``).
  - Metrics accumulate on-device as (num, den) pairs (see metrics.py) — one
    host transfer per epoch, not per step.
"""

import json
import pathlib
import pickle
import time

import numpy as np
import jax
import jax.numpy as jnp
import optax
from flax import serialization
from flax import struct

from ..data.phonemes import PhonemeEncoder
from ..models.asr import logits_length
from ..ops.frontend import FrontendConfig, log_mel_spectrogram, mel_weight_matrix
from ..ops.decode import greedy_decode, beam_search_decode
from ..ops.edit_distance import edit_distance
from .loss import conv_l2, get_loss
from .metrics import accumulate, ratios, zeros_like_metrics

__all__ = ['Trainer', 'TrainState', 'get_trainer', 'lr_at_epoch']


def lr_at_epoch(base_lr, epoch, decay=0.9, start_epoch=5):
    """lr for 1-based ``epoch``: ×decay per epoch once epoch > start_epoch.

    Matches the reference callback (``callbacks/lrscheduler.py:37-60``):
    the first decay is applied at the *end* of ``start_epoch``.
    """
    return base_lr * decay ** max(0, epoch - start_epoch)


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: dict
    opt_state: object
    metrics: dict
    rng: jax.Array


class Trainer:
    """Reference-API trainer over one device (meshes: see parallel.train_parallel)."""

    def __init__(self, dataloaders, loss=None, devices=None, save_dir=None,
                 verbose=True, frontend=None, eval_decoder='beam',
                 beam_width=12, strict_numerics=False, decay=0.9,
                 decay_start_epoch=5, clip_norm=5.0, adam_eps=1e-16,
                 profile_dir=None, profile_steps=0, tensorboard=True,
                 tb_step_interval=10, rng_impl='rbg'):
        encoder, data_train, data_validate, data_test = dataloaders
        self.encoder = encoder
        self.data_train = data_train
        self.data_validate = data_validate
        self.data_test = data_test
        self.loss = loss or get_loss()
        self.save_dir = pathlib.Path(save_dir) if save_dir else None
        if self.save_dir:
            self.save_dir.mkdir(parents=True, exist_ok=True)
        self.verbose = verbose
        self.frontend = frontend or FrontendConfig()
        self.mel_mat = mel_weight_matrix(
            self.frontend.num_mel_bins, self.frontend.num_bins,
            self.frontend.sample_rate, self.frontend.lower_hz,
            self.frontend.upper_hz)
        self.eval_decoder = eval_decoder
        self.beam_width = beam_width
        self.strict_numerics = strict_numerics
        self.decay = decay
        self.decay_start_epoch = decay_start_epoch
        self.clip_norm = clip_norm
        self.adam_eps = adam_eps
        #: when set, a jax.profiler trace of ``profile_steps`` train steps is
        #: captured at the start of epoch 1 (replaces the reference's dead
        #: TensorBoard ``profile_batch`` hook, training/tf/main.py:92-97)
        self.profile_dir = profile_dir
        self.profile_steps = profile_steps
        #: TensorBoard scalars (reference callbacks/tensorboard.py:16-28):
        #: per-epoch metrics + running train loss every ``tb_step_interval``
        #: steps, written with the dependency-free utils.tbwriter.  Active
        #: only when ``save_dir`` is set.
        self.tensorboard = tensorboard
        self.tb_step_interval = tb_step_interval
        #: dropout PRNG implementation: 'rbg' uses the TPU's hardware RNG
        #: (measured 2.6x faster than threefry per dropout op on v5e; the
        #: reference's TF dropout is likewise a non-counter hardware RNG);
        #: 'threefry' for cross-run mask reproducibility experiments.
        self.rng_impl = rng_impl

        if isinstance(encoder, PhonemeEncoder):
            self.fold_table = jnp.asarray(encoder.fold_table(39))
        else:
            self.fold_table = None

        #: when set (ParallelTrainer's shard_map mode), the step functions
        #: run per-device over this mesh axis with explicit psums — the
        #: composition that lets the fused Pallas cell run under a
        #: multi-device data-parallel mesh (GSPMD cannot partition the
        #: Mosaic custom call; shard_map runs it per-shard).
        self._shard_axis = None
        self._shard_axis_size = 1
        self.model = None
        self.optimizer = None
        self.state = None
        self._best_weights = None
        self._stats = None
        self._train_step = None
        self._eval_fwd = None
        self._eval_decode = None
        self._decode_step = None
        #: shape-keyed AOT-compiled eval executables (see prewarm_eval)
        self._eval_compiled = {}
        self._prewarm_thread = None
        #: last prewarm-compile failure (None = ok / not attempted)
        self.prewarm_error = None

    # ------------------------------------------------------------------
    # functional core
    # ------------------------------------------------------------------

    def _features(self, batch):
        feats = log_mel_spectrogram(batch['audio'], self.frontend, self.mel_mat)
        return feats, batch['feature_size']

    def _variables(self, params):
        return {'params': params, **({'stats': self._stats} if self._stats else {})}

    def _build_steps(self):
        model, loss_fn = self.model, self.loss
        fold = self.fold_table

        rng_impl = self.rng_impl
        axis = self._shard_axis
        axis_size = self._shard_axis_size

        def psum_metrics(m):
            if axis is None:
                return m
            return {k: (jax.lax.psum(num, axis), jax.lax.psum(den, axis))
                    for k, (num, den) in m.items()}

        def train_step(state, batch, lr):
            rng = jax.random.fold_in(
                jax.random.wrap_key_data(state.rng, impl=rng_impl),
                state.step)
            if axis is not None:
                # distinct dropout stream per data shard
                rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))
            feats, fsize = self._features(batch)

            def inner(params):
                logits = model.apply(self._variables(params), feats, fsize,
                                     train=True, rngs={'dropout': rng})
                lsize = logits_length(fsize, feats.shape[1], logits.shape[1])
                m = {}
                ctc = loss_fn(logits, lsize, batch['labels'],
                              batch['label_size'], metrics=m,
                              valid=batch['valid'])
                if axis is not None:
                    # global-batch mean: this shard's weighted sum over the
                    # psum'd denominator; L2 is counted once globally
                    num, den = m['ctc_loss']
                    gden = jnp.maximum(jax.lax.psum(den, axis), 1.0)
                    ctc = num / gden
                    return ctc + conv_l2(params) / axis_size, m
                return ctc + conv_l2(params), m

            (_, m), grads = jax.value_and_grad(inner, has_aux=True)(state.params)
            if axis is not None:
                grads = jax.lax.psum(grads, axis)
                m = psum_metrics(m)
            updates, opt_state = self.optimizer.update(grads, state.opt_state,
                                                       state.params)
            updates = jax.tree_util.tree_map(lambda u: u * lr, updates)
            params = optax.apply_updates(state.params, updates)
            metrics = accumulate(state.metrics, m)
            return state.replace(step=state.step + 1, params=params,
                                 opt_state=opt_state, metrics=metrics)

        # The eval pass is TWO jitted programs, not one: composing the
        # decoder scan into the big encoder program makes XLA:TPU re-run
        # its optimization passes over the combined graph — measured 105 s
        # cold for encoder+beam vs 51 s encoder-only + 1.9 s beam-only
        # (r5; VERDICT r4 next #5).  Splitting at the logits boundary cuts
        # the cold eval compile in half for one extra [B, T/4, 49] HBM
        # round trip per batch.
        def eval_fwd(params, batch):
            feats, fsize = self._features(batch)
            logits = model.apply(self._variables(params), feats, fsize,
                                 train=False)
            lsize = logits_length(fsize, feats.shape[1], logits.shape[1])
            m = {}
            loss_fn(logits, lsize, batch['labels'], batch['label_size'],
                    metrics=m, valid=batch['valid'])
            return logits, lsize, psum_metrics(m)

        def eval_decode(logits, lsize, batch, acc, m_fwd):
            if self.eval_decoder == 'beam':
                hyp, hyp_len = beam_search_decode(logits, lsize,
                                                  beam_width=self.beam_width)
            else:
                hyp, hyp_len = greedy_decode(logits, lsize)
            valid = batch['valid']
            # WER: p48 tokens (pre-fold), reference trainer.py:506-507
            wer_num = edit_distance(hyp, hyp_len, batch['labels'],
                                    batch['label_size']) * valid
            wer_den = batch['label_size'].astype(jnp.float32) * valid
            # LER: p39-folded ids, reference trainer.py:502-510
            if fold is not None:
                ref39 = fold[batch['labels']]
                hyp39 = fold[jnp.clip(hyp, 0, fold.shape[0] - 1)]
            else:
                ref39, hyp39 = batch['labels'], hyp
            ler_num = edit_distance(hyp39, hyp_len, ref39,
                                    batch['label_size']) * valid
            ler_den = batch['label_size'].astype(jnp.float32) * valid
            m = {'wer': (wer_num.sum(), wer_den.sum()),
                 'ler': (ler_num.sum(), ler_den.sum())}
            m = psum_metrics(m)
            m.update(m_fwd)    # loss pair was already psum'd in eval_fwd
            return accumulate(acc, m)

        self._train_step = self._jit_train_step(train_step)
        self._eval_fwd, self._eval_decode = self._jit_eval_steps(eval_fwd,
                                                                 eval_decode)
        self._decode_step = None  # lazily rebuilt for the new model
        self._eval_compiled = {}  # AOT executables are model-specific

    # Overridable jit/placement hooks (ParallelTrainer shards here).
    def _jit_train_step(self, fn):
        return jax.jit(fn, donate_argnums=0)

    def _jit_eval_steps(self, fwd, decode):
        return jax.jit(fwd), jax.jit(decode, donate_argnums=3)

    def _jit_decode_step(self, fn):
        return jax.jit(fn)

    def _put_batch(self, batch):
        return {k: jnp.asarray(v) for k, v in batch.items()}

    def _place_state(self, state):
        return state

    # ------------------------------------------------------------------
    # reference API
    # ------------------------------------------------------------------

    def init_state(self, model, seed=0, sample_batch=None):
        """Initialise params/optimizer; usable standalone (tests, sweeps).

        Parameters are shape-independent of sequence length, so init runs on
        a tiny [1, 16-frame] batch — this halves compile cost (the model
        would otherwise compile once for init shapes and again for the real
        batch shapes).
        """
        self.model = model
        if sample_batch is not None:
            feats, fsize = self._features(
                {k: jnp.asarray(v) for k, v in sample_batch.items()})
        else:
            cfg = self.frontend
            frames = 16
            samples = cfg.window + (frames - 1) * cfg.hop
            feats, fsize = self._features({
                'audio': jnp.zeros((1, samples), jnp.float32),
                'feature_size': jnp.asarray([frames], jnp.int32)})
        variables = model.init(jax.random.PRNGKey(seed), feats,
                               jnp.asarray(fsize), train=False)
        self._stats = variables.get('stats')
        self.optimizer = optax.apply_if_finite(
            optax.chain(
                optax.clip_by_global_norm(self.clip_norm),
                optax.scale_by_adam(eps=self.adam_eps),
                optax.scale(-1.0),
            ), max_consecutive_errors=1 << 30)
        params = variables['params']
        self.state = TrainState(
            step=jnp.int32(0), params=params,
            opt_state=self.optimizer.init(params),
            metrics=zeros_like_metrics(('ctc_loss',)),
            rng=jax.random.key_data(
                jax.random.key(seed + 1, impl=self.rng_impl)))
        self.state = self._place_state(self.state)
        self._build_steps()
        return self.state

    def train(self, model, epochs=40, lr=0.0001, reset=False, model_name=None,
              seed=0):
        """Full training run; writes scores.pickle / test_scores.pickle.

        Returns ``(history, test_scores)``.
        """
        self.init_state(model, seed=seed)

        # Multi-host: artifacts (checkpoints/TB/JSONL/pickles) are written
        # by process 0 only; every process still *loads* checkpoints on
        # resume (shared-filesystem assumption) so params stay consistent.
        # Training/eval math is SPMD over global arrays, so metrics are
        # replicated and identical on every process by construction.
        lead = jax.process_index() == 0
        out_dir = None
        latest_ckpt = best_ckpt = None
        start_epoch, best_val = 1, None
        if self.save_dir is not None:
            out_dir = self.save_dir / model_name if model_name else self.save_dir
            out_dir.mkdir(parents=True, exist_ok=True)
            latest_ckpt = out_dir / 'latest.ckpt'
            best_ckpt = out_dir / 'best.ckpt'
            if reset:
                for f in (latest_ckpt, best_ckpt):
                    f.unlink(missing_ok=True)  # race-safe across processes
            else:
                if best_ckpt.exists():
                    self.load(best_ckpt)
                    self.remember_best()
                if latest_ckpt.exists():
                    meta = self.load(latest_ckpt)
                    start_epoch = meta.get('epoch', 0) + 1
                    best_val = meta.get('best_val')

        history = {'ctc_loss': [], 'val_ctc_loss': [], 'val_wer': [],
                   'val_ler': [], 'lr': [], 'nonfinite_steps': [],
                   'epoch_seconds': []}
        steps_per_epoch = self.data_train.steps

        def forever(loader):
            # CurriculumStream iterators are already infinite; bare Loaders
            # yield one epoch per pass and must be cycled (reshuffling).
            while True:
                yield from loader

        stream = (iter(self.data_train) if hasattr(self.data_train, 'full')
                  else forever(self.data_train))
        nonfinite_seen = 0
        if self.eval_decoder == 'beam' and start_epoch <= epochs:
            # overlap the (expensive) beam-eval compile with epoch-1 training
            self.prewarm_eval()

        tb = None
        if out_dir is not None and self.tensorboard and lead:
            from ..utils.tbwriter import SummaryWriter
            tb = SummaryWriter(str(out_dir / 'tb'))

        for epoch in range(start_epoch, epochs + 1):
            t0 = time.time()
            epoch_lr = lr_at_epoch(lr, epoch, self.decay, self.decay_start_epoch)
            self.state = self.state.replace(
                metrics=zeros_like_metrics(('ctc_loss',)))
            profiling = (self.profile_dir and epoch == start_epoch
                         and self.profile_steps > 0)
            for step_i in range(steps_per_epoch):
                if profiling and step_i == 1:  # skip the compile step
                    jax.profiler.start_trace(str(self.profile_dir))
                batch = self._put_batch(next(stream))
                self.state = self._train_step(self.state, batch,
                                              jnp.float32(epoch_lr))
                if (tb is not None and self.tb_step_interval
                        and (step_i + 1) % self.tb_step_interval == 0):
                    # running epoch-mean train loss, like the reference's
                    # every-10-batches scalar (callbacks/tensorboard.py:19-22)
                    tb.scalar('batch_ctc_loss',
                              ratios(self.state.metrics)['ctc_loss'],
                              step=int(self.state.step))
                if profiling and step_i == min(self.profile_steps,
                                               steps_per_epoch - 1):
                    jax.block_until_ready(self.state.params)
                    jax.profiler.stop_trace()
                    profiling = False
            train_m = ratios(self.state.metrics)
            # total_notfinite is cumulative; notfinite_count resets on any
            # finite step and would undercount per-epoch skips
            total_nf = int(self.state.opt_state.total_notfinite)
            notfinite = total_nf - nonfinite_seen
            nonfinite_seen = total_nf
            if notfinite and self.strict_numerics:
                raise FloatingPointError(
                    f'{notfinite} non-finite update(s) in epoch {epoch}')

            val_m = self.evaluate(self.data_validate)
            history['ctc_loss'].append(train_m['ctc_loss'])
            history['val_ctc_loss'].append(val_m['ctc_loss'])
            history['val_wer'].append(val_m['wer'])
            history['val_ler'].append(val_m['ler'])
            history['lr'].append(epoch_lr)
            history['nonfinite_steps'].append(notfinite)
            history['epoch_seconds'].append(time.time() - t0)

            if best_val is None or val_m['ler'] <= best_val:
                best_val = val_m['ler']
                self.remember_best()
                if best_ckpt and lead:
                    self.save(best_ckpt, epoch=epoch, best_val=best_val)
            if latest_ckpt and lead:
                self.save(latest_ckpt, epoch=epoch, best_val=best_val)
            if tb is not None:  # per-epoch scalars (ref tensorboard.py:24-28)
                tb.scalars({'epoch_ctc_loss': train_m['ctc_loss'],
                            'epoch_val_ctc_loss': val_m['ctc_loss'],
                            'epoch_val_wer': val_m['wer'],
                            'epoch_val_ler': val_m['ler'],
                            'lr': epoch_lr}, step=epoch)
                tb.flush()
            if out_dir and lead:  # streaming per-epoch JSONL (tensorboard-free observability)
                with open(out_dir / 'metrics.jsonl', 'a') as f:
                    f.write(json.dumps({
                        'epoch': epoch, 'lr': epoch_lr,
                        'ctc_loss': train_m['ctc_loss'],
                        'val_ctc_loss': val_m['ctc_loss'],
                        'val_wer': val_m['wer'], 'val_ler': val_m['ler'],
                        'nonfinite_steps': notfinite,
                        'seconds': history['epoch_seconds'][-1]}) + '\n')
            if self.verbose and lead:
                print(f'Epoch {epoch}: loss {train_m["ctc_loss"]:.4f} '
                      f'val_loss {val_m["ctc_loss"]:.4f} '
                      f'val_per {val_m["ler"]:.4f} lr {epoch_lr:.2e} '
                      f'({history["epoch_seconds"][-1]:.1f}s)')

        if tb is not None:
            tb.close()
        self.recall_best()
        test_m = self.evaluate(self.data_test)
        test_scores = {f'val_{k}': v for k, v in test_m.items()}
        if self.verbose and lead:
            print('Test:', test_scores)

        if out_dir and lead:
            with open(out_dir / 'scores.pickle', 'wb') as f:
                pickle.dump(history, f)
            with open(out_dir / 'test_scores.pickle', 'wb') as f:
                pickle.dump(test_scores, f)
        return history, test_scores

    @staticmethod
    def _batch_sig(batch):
        return tuple(sorted((k, tuple(np.shape(v)), str(np.asarray(v).dtype)
                             if not hasattr(v, 'dtype') else str(v.dtype))
                            for k, v in batch.items()))

    def prewarm_eval(self, loader=None):
        """AOT-compile the eval step for every distinct bucket shape of
        ``loader`` in a background thread.

        The beam-width-12 eval step is the compile pole of a cold sweep
        job (~86 s cold on the axon remote-compile, PERF.md); training
        epoch 1 doesn't need it, so overlapping the compile with epoch-1
        training hides the entire cold cost (wall = max(epoch, compile)
        instead of the sum).  ``evaluate`` joins the thread and then calls
        the AOT executables directly.  Reference counterpart: the TF
        decoder's graph build inside ``test_step``
        (``training/tf/metrics/ctc.py:82-88``)."""
        import threading
        loader = loader if loader is not None else self.data_validate
        sigs = {}
        for batch in loader:
            # run _put_batch so shapes/shardings match what evaluate sees
            # (ParallelTrainer pads rows and places on the mesh)
            placed = self._put_batch(batch)
            sig = self._batch_sig(placed)
            if sig not in sigs:
                sigs[sig] = placed
        acc = zeros_like_metrics()
        params = self.state.params

        def compile_all():
            for sig, placed in sigs.items():
                if sig in self._eval_compiled:
                    continue
                try:
                    fwd_c = self._eval_fwd.lower(params, placed).compile()
                    logits, lsize, m = jax.eval_shape(
                        self._eval_fwd, params, placed)
                    dec_c = self._eval_decode.lower(
                        logits, lsize, placed, acc, m).compile()
                    self._eval_compiled[sig] = (fwd_c, dec_c)
                except Exception as e:
                    # VERDICT r3 #7: a failed prewarm must not be silent —
                    # record it and fall back to plain jit in evaluate()
                    # (which will then surface any real error in the
                    # foreground instead of masking it).
                    self.prewarm_error = e
                    import warnings
                    warnings.warn(f'prewarm_eval: AOT compile failed, '
                                  f'falling back to jit: {e!r}')
                    if self.verbose:
                        print(f'prewarm_eval failed ({e!r}); eval will '
                              f'compile in the foreground')
                    return
        self.prewarm_error = None
        self._prewarm_thread = threading.Thread(target=compile_all,
                                                daemon=True)
        self._prewarm_thread.start()

    def _run_eval_step(self, params, batch, acc):
        if self._prewarm_thread is not None:
            self._prewarm_thread.join()
            self._prewarm_thread = None
        compiled = self._eval_compiled.get(self._batch_sig(batch))
        if compiled is not None:
            fwd_c, dec_c = compiled
            logits, lsize, m = fwd_c(params, batch)
            return dec_c(logits, lsize, batch, acc, m)
        logits, lsize, m = self._eval_fwd(params, batch)
        return self._eval_decode(logits, lsize, batch, acc, m)

    def evaluate(self, loader, return_transcripts=0):
        """Run eval over a loader; returns {'ctc_loss', 'wer', 'ler'} ratios.

        ``return_transcripts=N`` additionally decodes the first N
        utterances of the first batch to phoneme sentences (hypothesis and
        reference), mirroring the reference's in-eval sentence decoding
        (``training/tf/trainer.py:493-500``); returns ``(ratios, list of
        (hyp_sentence, ref_sentence))``.
        """
        acc = zeros_like_metrics()
        transcripts = []
        for batch in loader:
            batch = self._put_batch(batch)
            if return_transcripts and not transcripts:
                transcripts = self.transcribe(batch, limit=return_transcripts)
            acc = self._run_eval_step(self.state.params, batch, acc)
        if return_transcripts:
            return ratios(acc), transcripts
        return ratios(acc)

    def transcribe(self, batch, limit=None):
        """Decode a batch to (hypothesis, reference) phoneme sentences."""
        batch = self._put_batch(batch)
        if self._decode_step is None:
            model = self.model

            def decode_step(params, batch):
                feats, fsize = self._features(batch)
                logits = model.apply(self._variables(params), feats, fsize,
                                     train=False)
                lsize = logits_length(fsize, feats.shape[1], logits.shape[1])
                if self.eval_decoder == 'beam':
                    return beam_search_decode(logits, lsize,
                                              beam_width=self.beam_width)
                return greedy_decode(logits, lsize)

            self._decode_step = self._jit_decode_step(decode_step)
        hyp, hyp_len = jax.device_get(
            self._decode_step(self.state.params, batch))
        out = []
        n = len(hyp) if limit is None else min(limit, len(hyp))
        for b in range(n):
            if not float(batch['valid'][b]):
                continue
            hyp_ids = hyp[b][:int(hyp_len[b])]
            ref_ids = np.asarray(batch['labels'][b][:int(batch['label_size'][b])])
            out.append((self.encoder.decode_to_sentence(hyp_ids),
                        self.encoder.decode_to_sentence(ref_ids)))
        return out

    def step(self, batch, training=True, lr=1e-4):
        """Single step on a batch (reference Trainer.step contract)."""
        batch = self._put_batch(batch)
        if training:
            self.state = self._train_step(self.state, batch, jnp.float32(lr))
            return ratios(self.state.metrics)
        return ratios(self._run_eval_step(self.state.params, batch,
                                          zeros_like_metrics()))

    # -- checkpointing (weights + optimizer, auto-resume) ---------------

    def save(self, path, **meta):
        path = pathlib.Path(path)
        payload = {'params': self.state.params, 'opt_state': self.state.opt_state,
                   'step': self.state.step, 'rng': self.state.rng}
        path.write_bytes(serialization.to_bytes(payload))
        path.with_suffix(path.suffix + '.json').write_text(json.dumps(meta))

    def load(self, path):
        path = pathlib.Path(path)
        target = {'params': self.state.params, 'opt_state': self.state.opt_state,
                  'step': self.state.step, 'rng': self.state.rng}
        restored = serialization.from_bytes(target, path.read_bytes())
        self.state = self.state.replace(
            params=restored['params'], opt_state=restored['opt_state'],
            step=jnp.asarray(restored['step']), rng=jnp.asarray(restored['rng']))
        meta_file = path.with_suffix(path.suffix + '.json')
        return json.loads(meta_file.read_text()) if meta_file.exists() else {}

    def remember_best(self):
        self._best_weights = jax.tree_util.tree_map(np.asarray, self.state.params)

    def recall_best(self):
        if self._best_weights is not None:
            self.state = self.state.replace(
                params=jax.tree_util.tree_map(jnp.asarray, self._best_weights))


def get_trainer(dataloaders, loss=None, devices=None, save_dir=None,
                verbose=True, **kwargs):
    return Trainer(dataloaders, loss, devices=devices, save_dir=save_dir,
                   verbose=verbose, **kwargs)

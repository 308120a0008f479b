"""Batched streaming inference: exact chunked execution of the ASR model.

Green-field serving layer (the reference ships no serving path; its
latency tables were one-shot full-utterance timings, ``README.md:61``).
Design goals, TPU-first:

- **Fixed shapes.** Every device call processes one fixed-size feature
  window ``[B, hl + C + hr, 80]`` and emits ``C // ts`` logit frames, so
  the whole server runs on exactly one compiled executable regardless of
  stream length.
- **Exactness.** The emitted logits are bit-identical (up to float
  reassociation) to the offline ``model.apply`` on the utterance
  zero-padded to ``Tp = max(ceil(F_max / C) * C, hl + C + hr)`` frames
  with the true ``feature_size`` mask.  (Offline logits near the end of
  an utterance depend on the batch pad length — the masked-zero tail
  feeds the convs' look-ahead — so exactness is always *w.r.t. a pad
  length*; ``Tp`` is the streaming-canonical one.)  The conv encoder has
  a finite receptive field, so a window extended by the
  :func:`~nbasr_tpu.parallel.seqparallel.encoder_halo` margin computes
  the global result on its interior, and final windows are clipped at
  ``Tp`` exactly like the sequence-parallel runner clips at the array
  edge.  The LSTM head is made exact by threading its (c, h) carry
  between chunks (``ASRModel`` ``stage='head'`` / ``rnn_carry``).
- **Batched streams.** ``B`` independent audio streams advance in
  lockstep; per-row validity masks let rows end at different times while
  staying in the batch (mask semantics identical to the offline padded
  batch, including frozen mean-variance normalisation).

Algorithmic latency is a property of the *architecture*, not the server:
every cell conv looks ahead up to FUTURE_CONTEXT=4 frames (reference
``model/tf/ops.py:3,16-21``) and 18 stacked cells compound that to a
right halo of several hundred input frames (~5 s for the flagship arch).
``StreamingASR.latency_frames`` reports it; low-latency serving wants a
small-``hr`` architecture, which the search space contains (e.g. pure
``linear``/``zero`` cells have hr == block-conv lookahead only).
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp

from .models.asr import logits_length
from .ops.frontend import FrontendConfig, log_mel_spectrogram, num_frames
from .parallel.seqparallel import encoder_halo

__all__ = ['StreamingASR', 'StreamingGreedyDecoder']


class StreamingGreedyDecoder:
    """Incremental CTC greedy decode over emitted logit chunks.

    Dedup state (the previous non-blank-or-not label) carries across chunk
    boundaries, so the concatenated emission equals
    :func:`nbasr_tpu.ops.decode.greedy_decode` on the full logits.
    """

    def __init__(self, batch_size, blank=0):
        self.blank = blank
        self._prev = np.full(batch_size, -1, np.int64)
        self.tokens = [[] for _ in range(batch_size)]

    def push(self, logits, valid_len):
        """logits [B, n, V]; valid_len [B] valid frames of this chunk."""
        ids = np.asarray(jnp.argmax(logits, axis=-1))
        for b in range(ids.shape[0]):
            for t in range(int(valid_len[b])):
                tok = ids[b, t]
                if tok != self.blank and tok != self._prev[b]:
                    self.tokens[b].append(int(tok))
                self._prev[b] = tok
        return self.tokens


class StreamingASR:
    """Exact chunked streaming runner for an :class:`ASRModel`.

    Parameters
    ----------
    model, variables:
        The model (inference mode: dropout ignored) and its variables.
    chunk_frames:
        Feature frames emitted per device call; must be a multiple of the
        model's total time reduction.  Throughput/latency knob.
    batch_size:
        Number of lockstep streams.
    frontend:
        :class:`FrontendConfig`; defaults to the TIMIT recipe (10 ms hop).

    Usage::

        s = StreamingASR(model, variables, chunk_frames=240, batch_size=B)
        for audio_block in stream:            # [B, S] int16/float arrays
            for logits, valid in s.push(audio_block, n_valid):
                decoder.push(logits, valid)
        for logits, valid in s.flush():
            decoder.push(logits, valid)
    """

    def __init__(self, model, variables, chunk_frames=240, batch_size=1,
                 frontend=None, dtype=jnp.float32, quantize=False):
        self.model = model
        if quantize:
            # weights-only int8 PTQ (quant.py): the serving executable's
            # resident weight buffers are the int8 tree + per-channel
            # scales; dequantization happens inside the jitted step
            from .quant import quantize_tree
            variables = {**{k: v for k, v in variables.items()
                            if k != 'params'},
                         '_qparams': quantize_tree(variables['params'])}
        self.variables = variables
        self.frontend = frontend or FrontendConfig()
        self.ts = int(np.prod(model.block_strides))
        if chunk_frames % self.ts:
            raise ValueError(f'chunk_frames={chunk_frames} must be a '
                             f'multiple of the time reduction {self.ts}')
        self.C = chunk_frames
        self.Co = chunk_frames // self.ts
        self.hl, self.hr = encoder_halo(model)
        self.Wf = self.hl + self.C + self.hr
        self.B = batch_size
        self.dtype = dtype

        cfg = self.frontend
        self._mel = None  # built lazily inside the jitted featurizer
        # --- host stream state ---
        self._samples = np.zeros((batch_size, 0), np.float32)
        self._sample_base = 0          # global sample index of _samples[:, 0]
        self._valid_samples = np.zeros(batch_size, np.int64)
        self._feats = np.zeros((batch_size, 0, cfg.num_mel_bins), np.float32)
        self._feat_base = 0            # global frame index of _feats[:, 0]
        self._next_chunk = 0
        self._flushed = False

        self._featurize = jax.jit(
            lambda a: log_mel_spectrogram(a, self.frontend))
        self._step = jax.jit(functools.partial(self._device_step, model))

    # ------------------------------------------------------------------
    @property
    def latency_frames(self):
        """Algorithmic look-ahead + chunking latency, in feature frames."""
        return self.hr + self.C

    @property
    def latency_seconds(self):
        return self.latency_frames * self.frontend.hop / self.frontend.sample_rate

    # ------------------------------------------------------------------
    def _device_step(self, model, variables, window, mask, trim_off, carry):
        """One fixed-shape inference step: window [B, Wf, F] -> logits
        [B, Co, V] for output frames [trim_off, trim_off + Co) of the
        window's encoder output, advancing the LSTM carry."""
        if '_qparams' in variables:
            from .quant import dequantize_tree
            variables = {**{k: v for k, v in variables.items()
                            if k != '_qparams'},
                         'params': dequantize_tree(variables['_qparams'])}
        enc = model.apply(variables, window.astype(self.dtype), mask=mask,
                          stage='encode')
        enc = jax.lax.dynamic_slice_in_dim(enc, trim_off, self.Co, axis=1)
        logits, carry = model.apply(variables, enc, stage='head',
                                    rnn_carry=carry, return_rnn_carry=True)
        return logits, carry

    def _init_carry(self):
        if not self.model.use_rnn:
            return None
        H = self.model.rnn_units
        z = jnp.zeros((self.B, H), self.dtype)
        return (z, z)

    # ------------------------------------------------------------------
    def push(self, audio, n_valid=None):
        """Feed ``audio [B, S]`` samples; returns ready (logits, valid) chunks.

        ``n_valid [B]`` marks how many of this block's samples are real
        per row (default: all).  Rows whose stream has ended keep getting
        zero blocks with ``n_valid 0`` until the batch flushes — their
        masks freeze, matching the offline padded batch exactly.
        """
        if self._flushed:
            raise RuntimeError('push() after flush()')
        audio = np.asarray(audio, np.float32)
        if audio.ndim == 1:
            audio = audio[None, :]
        if audio.shape[0] != self.B:
            raise ValueError(f'expected batch {self.B}, got {audio.shape[0]}')
        n_valid = (np.full(self.B, audio.shape[1], np.int64)
                   if n_valid is None else np.asarray(n_valid, np.int64))
        base = self._sample_base + self._samples.shape[1]
        # Only rows with new valid samples advance their valid end: a block
        # with n_valid == 0 says nothing about validity up to `base` (the
        # stream already ended), it must not extend the mask.
        self._valid_samples = np.where(
            n_valid > 0, np.maximum(self._valid_samples, base + n_valid),
            self._valid_samples)
        self._samples = np.concatenate([self._samples, audio], axis=1)

        cfg = self.frontend
        have = self._samples.shape[1]
        n_new = max((have - cfg.window) // cfg.hop + 1, 0)
        if n_new:
            used = self._samples[:, :(n_new - 1) * cfg.hop + cfg.window]
            new = np.asarray(self._featurize(jnp.asarray(used)))
            self._feats = np.concatenate([self._feats, new], axis=1)
            drop = n_new * cfg.hop
            self._samples = self._samples[:, drop:]
            self._sample_base += drop
        return self._drain(final=False)

    def flush(self):
        """End all streams: process the tail (zero-padded, masked) chunks.

        Returns the remaining (logits, valid) pairs; afterwards
        ``logit_lengths`` gives the per-row total valid logit frames.
        """
        self._flushed = True
        return self._drain(final=True)

    @property
    def frames_valid(self):
        """Per-row true feature-frame counts seen so far."""
        return np.asarray(num_frames(self._valid_samples, self.frontend))

    @property
    def logit_lengths(self):
        """Per-row valid logit frames (same rule the trainer uses)."""
        f = self.frames_valid
        t_in = max(int(f.max()), 1) if f.size else 1
        t_in = -(-t_in // self.ts) * self.ts
        return np.asarray(logits_length(jnp.asarray(f), t_in, t_in // self.ts))

    # ------------------------------------------------------------------
    def _tp_bound(self):
        """Canonical padded stream length (a lower bound until flush;
        exact once all valid samples are in): max(ceil(F_max/C)*C, Wf)."""
        f_max = int(self.frames_valid.max()) if self.B else 0
        return max(-(-f_max // self.C) * self.C, self.Wf)

    def _emit(self, c, tp=None):
        """Run chunk ``c`` (output frames [c*Co, (c+1)*Co)).  ``tp`` set
        (flush) clips the window at the canonical padded end, where the
        model's own zero padding coincides with the offline computation."""
        w = max(c * self.C - self.hl, 0)       # global window start (mult of ts)
        if tp is not None:
            w = min(w, tp - self.Wf)
        lo = w - self._feat_base
        assert lo >= 0, 'window start fell off the retained feature buffer'
        win = self._feats[:, lo:lo + self.Wf]
        pad = self.Wf - win.shape[1]
        if pad > 0:
            win = np.pad(win, ((0, 0), (0, pad), (0, 0)))
        pos = w + np.arange(self.Wf)
        mask = pos[None, :] < self.frames_valid[:, None]
        trim = (c * self.C - w) // self.ts
        logits, self._carry = self._step(
            self.variables, jnp.asarray(win), jnp.asarray(mask),
            trim, self._carry)
        valid = np.clip(self.logit_lengths - c * self.Co, 0, self.Co)
        return logits, valid

    def _drain(self, final):
        if not hasattr(self, '_carry'):
            self._carry = self._init_carry()
        out = []
        while True:
            c = self._next_chunk
            need = c * self.C + self.C + self.hr      # frames to emit chunk c
            have = self._feats.shape[1] + self._feat_base
            f_max = int(self.frames_valid.max()) if self.B else 0
            if final:
                if c * self.C >= f_max:               # all valid frames emitted
                    return out
            elif have < need:
                return out
            out.append(self._emit(c, tp=self._tp_bound() if final else None))
            self._next_chunk += 1
            # Retain every frame a future window can still touch: window
            # starts are nondecreasing in c but flush-time clipping can
            # pull them back to tp - Wf, and tp only grows as valid
            # samples arrive — bound with the current tp lower bound.
            keep_from = max(0, min((c + 1) * self.C - self.hl,
                                   self._tp_bound() - self.Wf))
            drop = keep_from - self._feat_base
            if drop > 0:
                self._feats = self._feats[:, drop:]
                self._feat_base = keep_from

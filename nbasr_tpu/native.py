"""ctypes bindings for the native host runtime (native/nbasr_native.cpp).

Builds the shared library with ``g++ -O3`` on first use (cached next to
the sources) and degrades gracefully when the toolchain or the build is
unavailable — every consumer has a pure-python/JAX fallback:

  - :func:`parse_wav`      — data/timit.read_wav fast path,
  - :func:`levenshtein`    — host oracle for ops/edit_distance,
  - :func:`beam_search`    — host decoder (ctcdecode equivalent).
"""

import ctypes
import pathlib
import subprocess
import threading

import numpy as np

__all__ = ['available', 'parse_wav', 'levenshtein', 'beam_search']

_SRC = pathlib.Path(__file__).parent.parent / 'native' / 'nbasr_native.cpp'
_LIB_PATH = _SRC.parent / 'libnbasr_native.so'
_lock = threading.Lock()
_lib = None
_tried = False


def _build():
    cmd = ['g++', '-O3', '-march=native', '-shared', '-fPIC', '-std=c++17',
           str(_SRC), '-o', str(_LIB_PATH)]
    subprocess.run(cmd, check=True, capture_output=True)


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            if not _LIB_PATH.exists() or _LIB_PATH.stat().st_mtime < _SRC.stat().st_mtime:
                _build()
            lib = ctypes.CDLL(str(_LIB_PATH))
        except (OSError, subprocess.CalledProcessError, FileNotFoundError):
            return None

        lib.parse_wav_info.restype = ctypes.c_int
        lib.parse_wav_info.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32)]
        lib.parse_wav_fill.restype = ctypes.c_int
        lib.parse_wav_fill.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            np.ctypeslib.ndpointer(np.float32, flags='C_CONTIGUOUS')]
        lib.levenshtein_batch.restype = None
        lib.levenshtein_batch.argtypes = [
            np.ctypeslib.ndpointer(np.int32, flags='C_CONTIGUOUS'),
            np.ctypeslib.ndpointer(np.int32, flags='C_CONTIGUOUS'),
            np.ctypeslib.ndpointer(np.int32, flags='C_CONTIGUOUS'),
            np.ctypeslib.ndpointer(np.int32, flags='C_CONTIGUOUS'),
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            np.ctypeslib.ndpointer(np.float32, flags='C_CONTIGUOUS')]
        lib.ctc_beam_search.restype = None
        lib.ctc_beam_search.argtypes = [
            np.ctypeslib.ndpointer(np.float32, flags='C_CONTIGUOUS'),
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32,
            np.ctypeslib.ndpointer(np.int32, flags='C_CONTIGUOUS'),
            np.ctypeslib.ndpointer(np.int32, flags='C_CONTIGUOUS')]
        _lib = lib
        return _lib


def available():
    """True when the native library is built and loadable."""
    return _load() is not None


def parse_wav(data):
    """bytes (RIFF or SPHERE) -> (float32 audio in [-1,1], sample_rate).

    Raises ValueError on malformed input; returns None if the native
    library is unavailable (callers fall back to the python parser).
    """
    lib = _load()
    if lib is None:
        return None
    n = ctypes.c_int64()
    rate = ctypes.c_int32()
    rc = lib.parse_wav_info(data, len(data), ctypes.byref(n), ctypes.byref(rate))
    if rc != 0:
        raise ValueError(f'Malformed wav data (native rc={rc})')
    out = np.empty(n.value, np.float32)
    rc = lib.parse_wav_fill(data, len(data), out)
    if rc != 0:
        raise ValueError(f'Malformed wav data (native rc={rc})')
    return out, rate.value


def levenshtein(hyp, hyp_len, ref, ref_len):
    """Batched edit distance on the host; [B] float32 (or None if unavailable)."""
    lib = _load()
    if lib is None:
        return None
    hyp = np.ascontiguousarray(hyp, np.int32)
    ref = np.ascontiguousarray(ref, np.int32)
    hyp_len = np.ascontiguousarray(hyp_len, np.int32)
    ref_len = np.ascontiguousarray(ref_len, np.int32)
    B, M = hyp.shape
    N = ref.shape[1]
    out = np.empty(B, np.float32)
    lib.levenshtein_batch(hyp, hyp_len, ref, ref_len, B, M, N, out)
    return out


def beam_search(log_probs, logit_len=None, beam_width=12, blank=0, max_len=None):
    """Host CTC prefix beam search.

    ``log_probs``: [T, V] (one utterance) or [B, T, V].  Returns
    (labels, lengths) with labels 0-padded, or None if unavailable.
    """
    lib = _load()
    if lib is None:
        return None
    lp = np.ascontiguousarray(log_probs, np.float32)
    if lp.ndim == 2:
        lp = lp[None]
        logit_len = [lp.shape[1]] if logit_len is None else [int(logit_len)]
        squeeze = True
    else:
        squeeze = False
        if logit_len is None:
            logit_len = [lp.shape[1]] * lp.shape[0]
    B, T, V = lp.shape
    max_len = max_len or T
    labels = np.zeros((B, max_len), np.int32)
    lengths = np.zeros(B, np.int32)
    for b in range(B):
        out_len = np.zeros(1, np.int32)
        row = np.ascontiguousarray(lp[b, :int(logit_len[b])])
        lib.ctc_beam_search(row, int(logit_len[b]), V, beam_width, blank,
                            max_len, labels[b], out_len)
        lengths[b] = out_len[0]
    if squeeze:
        return labels[0], int(lengths[0])
    return labels, lengths

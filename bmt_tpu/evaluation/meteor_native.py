'''ctypes bindings to the native METEOR alignment engine
(native/meteor_align.cc).

The reference's METEOR scoring runs inside a persistent Java VM
(reference: evaluation/evaluate.py:19,61 — meteor-1.5.jar -stdio); this
framework's pure-Python METEOR 1.5 spends nearly all scoring time in
candidate generation + the Aligner beam search. The native library runs
exactly that per-pair work — batched (one call per scoring request, not
per segment: per-pair ctypes chatter measured SLOWER than pure Python on
realistic captions) and threaded (independent pairs over a C++ pool).
Python keeps what it owns: tokenization, the nltk stemmer, the optional
synonym table, the METEOR parameters and score formula. Alignments are
bit-identical to the Python aligner (generation order + stable sort
replicate list.sort tie-breaking; verified differentially in
tests/test_evaluation.py).

``BMT_METEOR_NATIVE=0`` disables the native path;
``BMT_METEOR_THREADS`` caps the C++ pool (default: hardware
concurrency, capped at 16). Loading mirrors bmt_tpu/data/native.py:
build once per process via ``make -C native``, memoize the outcome, and
treat a stale .so (older than its source) as missing so old code never
serves silently.
'''
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, 'native')
_SO_PATH = os.path.join(_NATIVE_DIR, 'libbmt_meteor.so')
_SRC_PATH = os.path.join(_NATIVE_DIR, 'meteor_align.cc')

N_OUT = 14  # per-pair int32 stats: tmc[3] tmf[3] rmc[3] rmf[3] matches chunks

_lib = None
_lib_lock = threading.Lock()
_build_result = None   # None = not attempted; True/False = build outcome


def _so_stale() -> bool:
    try:
        return os.path.getmtime(_SO_PATH) < os.path.getmtime(_SRC_PATH)
    except OSError:
        return True


def _try_build() -> bool:
    global _build_result
    if _build_result is not None:
        return _build_result
    try:
        subprocess.run(['make', '-C', _NATIVE_DIR, '-s'], check=True,
                       capture_output=True, timeout=120)
        _build_result = os.path.exists(_SO_PATH) and not _so_stale()
    except Exception:
        _build_result = False
    return _build_result


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        if (not os.path.exists(_SO_PATH) or _so_stale()) and \
                not _try_build():
            return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
        except OSError:
            return None
        i32p = ctypes.POINTER(ctypes.c_int32)
        lib.bmt_meteor_batch_stats.argtypes = [
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            i32p, i32p, ctypes.POINTER(ctypes.c_uint8),
            i32p, i32p, ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int32, i32p, i32p, i32p,
            ctypes.c_int32, ctypes.c_int32, i32p, i32p,
        ]
        lib.bmt_meteor_batch_stats.restype = ctypes.c_int
        _lib = lib
        return _lib


def enabled() -> bool:
    if os.environ.get('BMT_METEOR_NATIVE', '1') == '0':
        return False
    return get_lib() is not None


def _i32(buf: List[int]) -> np.ndarray:
    return np.asarray(buf if buf else [0], np.int32)


def batch_stats(pairs: Sequence[Tuple[Sequence[str], Sequence[str]]],
                stem: Callable[[str], str], func_words,
                synonyms: Optional[Dict[str, frozenset]], beam: int,
                n_threads: int = 0):
    '''Alignment statistics for a batch of (hyp_tokens, ref_tokens)
    pairs in ONE native call.

    Returns ``(stats, status)``: ``stats`` is (n_pairs, 14) int32 —
    tmc[3], tmf[3], rmc[3], rmf[3], matches, chunks per pair; pairs with
    ``status[p] != 0`` were not served (reference beyond the native
    128-token cap) and must be aligned by the caller's Python fallback.
    Returns None if the native library is unavailable.
    '''
    lib = get_lib()
    if lib is None:
        return None
    n_pairs = len(pairs)
    if n_pairs == 0:
        return (np.zeros((0, N_OUT), np.int32), np.zeros(0, np.int32))

    intern: Dict[str, int] = {}

    def iid(w: str) -> int:
        v = intern.get(w)
        if v is None:
            v = intern[w] = len(intern)
        return v

    syn_active = synonyms is not None
    syn_intern: Dict = {}
    syn_ids: List[int] = []

    def pack_side(toks_per_pair):
        off = np.empty(n_pairs + 1, np.int64)
        ex: List[int] = []
        st: List[int] = []
        fn: List[int] = []
        s_off: List[int] = [] if syn_active else None
        off[0] = 0
        for p, toks in enumerate(toks_per_pair):
            for w in toks:
                ex.append(iid(w))
                st.append(iid('\x00s\x00' + stem(w)))
                fn.append(1 if w in func_words else 0)
                if syn_active:
                    s_off.append(len(syn_ids))
                    ids = synonyms.get(w)
                    if ids:
                        row = []
                        for sid in ids:
                            v = syn_intern.get(sid)
                            if v is None:
                                v = syn_intern[sid] = len(syn_intern)
                            row.append(v)
                        syn_ids.extend(sorted(row))
            off[p + 1] = len(ex)
        if syn_active:
            s_off.append(len(syn_ids))
        return (off, _i32(ex), _i32(st),
                np.asarray(fn if fn else [0], np.uint8),
                _i32(s_off) if syn_active else _i32([]))

    h_off, h_ex, h_st, h_fn, h_so = pack_side([p[0] for p in pairs])
    r_off, r_ex, r_st, r_fn, r_so = pack_side([p[1] for p in pairs])

    if n_threads <= 0:
        n_threads = int(os.environ.get('BMT_METEOR_THREADS', '0') or 0)

    stats = np.zeros((n_pairs, N_OUT), np.int32)
    status = np.zeros(n_pairs, np.int32)

    def P(a, t):
        return a.ctypes.data_as(ctypes.POINTER(t))

    lib.bmt_meteor_batch_stats(
        n_pairs, P(h_off, ctypes.c_int64), P(r_off, ctypes.c_int64),
        P(h_ex, ctypes.c_int32), P(h_st, ctypes.c_int32),
        P(h_fn, ctypes.c_uint8),
        P(r_ex, ctypes.c_int32), P(r_st, ctypes.c_int32),
        P(r_fn, ctypes.c_uint8),
        1 if syn_active else 0,
        P(h_so, ctypes.c_int32), P(r_so, ctypes.c_int32),
        P(_i32(syn_ids), ctypes.c_int32),
        beam, n_threads,
        P(stats, ctypes.c_int32), P(status, ctypes.c_int32))
    return stats, status

'''ctypes bindings to the native IO runtime (native/bmt_io.cc).

Loads ``libbmt_io.so`` if built (``make -C native``), auto-building it once
when a compiler is available. Falls back to the numpy path transparently —
callers use :func:`batch_load` and never see which backend served it.

The native path mmaps npy files, crops/pads in a C++ thread pool and writes
straight into one contiguous (B, L, D) float32 buffer, replacing the
reference's per-file numpy loads + torch pad_sequence
(reference: datasets/load_features.py, captioning_dataset.py:106-107).
'''
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, 'native')
_SO_PATH = os.path.join(_NATIVE_DIR, 'libbmt_io.so')

_lib = None
_lib_lock = threading.Lock()
_build_result = None   # None = not attempted; True/False = build outcome


def _try_build() -> bool:
    '''One build attempt per process, memoizing the OUTCOME (not ".so
    exists"): a failed rebuild must not let a stale binary load on the
    next call — that is exactly the silent-old-code case the staleness
    check exists to prevent.'''
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


def _so_stale() -> bool:
    cc = os.path.join(_NATIVE_DIR, 'bmt_io.cc')
    try:
        return os.path.getmtime(_SO_PATH) < os.path.getmtime(cc)
    except OSError:
        return True


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        # rebuild when the source is newer than the binary, not only when
        # the binary is missing (stale .so would silently serve old code)
        if (not os.path.exists(_SO_PATH) or _so_stale()) and \
                not _try_build():
            return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
        except OSError:
            return None
        lib.bmt_npy_shape.argtypes = [ctypes.c_char_p,
                                      ctypes.POINTER(ctypes.c_int64)]
        lib.bmt_npy_shape.restype = ctypes.c_int
        lib.bmt_batch_load.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_double, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
        ]
        lib.bmt_batch_load.restype = ctypes.c_int
        _lib = lib
        return _lib


def native_available() -> bool:
    return get_lib() is not None


def npy_shape(path: str):
    '''Shape of a 2-d .npy. EVERY unreadable-file failure (missing,
    truncated, corrupt header, wrong rank) raises FileNotFoundError on
    BOTH backends — the native library maps all parse failures to one
    error code, so the fallback must not leak np.load's ValueError to
    callers that only catch the missing-file case.'''
    lib = get_lib()
    if lib is None:
        try:
            a = np.load(path, mmap_mode='r')
            if a.ndim != 2:
                raise ValueError(f'expected 2-d array, got rank {a.ndim}')
            return tuple(a.shape)
        except FileNotFoundError:
            raise
        except Exception as e:
            raise FileNotFoundError(f'{path}: unreadable npy ({e})') from e
    shape = (ctypes.c_int64 * 2)()
    if lib.bmt_npy_shape(path.encode(), shape) != 0:
        raise FileNotFoundError(path)
    return (shape[0], shape[1])


def batch_load(paths: List[str], starts, ends, durations, full_flags,
               pad_value: float, out_len: int, cols: int,
               use_native: Optional[bool] = None):
    '''Load B features into a (B, out_len, cols) float32 batch.

    Per item: crop [start, end]/duration proportionally (reference
    crop_a_segment semantics) or take the full stack when full_flags[i];
    missing files / empty crops become one zero row (reference
    fill_missing_features('zero')). Returns (batch, status) where
    status[i] == 1 marks a zero-filled item.
    '''
    B = len(paths)
    out = np.empty((B, out_len, cols), np.float32)
    status = np.zeros(B, np.int32)

    lib = get_lib() if use_native is not False else None
    if lib is not None:
        c_paths = (ctypes.c_char_p * B)(*[p.encode() for p in paths])
        starts = np.ascontiguousarray(starts, np.float64)
        ends = np.ascontiguousarray(ends, np.float64)
        durations = np.ascontiguousarray(durations, np.float64)
        full = np.ascontiguousarray(full_flags, np.int32)
        rc = lib.bmt_batch_load(
            c_paths, B,
            starts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            ends.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            durations.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            full.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            float(pad_value), out_len, cols,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            status.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        if rc == 0:
            return out, status

    # numpy fallback. Unreadable files of ANY kind (missing, truncated,
    # corrupt header, wrong rank/width, permissions) take the zero-fill
    # path — matching the native library, which treats every parse/open
    # failure as missing (bmt_io.cc open_npy), so crash behavior cannot
    # differ by backend.
    from bmt_tpu.data.features import crop_a_segment
    for i, p in enumerate(paths):
        try:
            arr = np.load(p, allow_pickle=False).astype(np.float32)
            if arr.ndim != 2 or arr.shape[1] != cols:
                raise ValueError(f'{p}: expected (n, {cols}) f32, '
                                 f'got {arr.shape}')
            if arr.shape[0] == 0:
                # an empty stack must zero-fill with status 1 on the FULL
                # load path too (the native backend does; status drives
                # the paired rgb/flow zero-fill in the dataset)
                raise ValueError(f'{p}: empty feature stack')
            if not full_flags[i]:
                arr = crop_a_segment(arr, starts[i], ends[i], durations[i])
            if arr is None:
                raise ValueError(f'{p}: empty crop')
            n = min(arr.shape[0], out_len)
            out[i, :n] = arr[:n]
            out[i, n:] = pad_value
            status[i] = 0
        except Exception:
            out[i, 0] = 0.0
            out[i, 1:] = pad_value
            status[i] = 1
    return out, status

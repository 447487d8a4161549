"""Native (C++) runtime kernels — build + ctypes bindings.

The sequential host stages (greedy limb assignment, person-subset merging)
are implemented in C++ (native/grouping.cpp) and called through ctypes on
whole batches; the numpy implementations in islx.ops.grouping remain as the
reference semantics and fallback. The library is compiled on first use with
the system g++ and cached next to the sources.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libislx.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> Optional[str]:
    src = os.path.join(_NATIVE_DIR, "grouping.cpp")
    if not os.path.exists(src):
        return None
    if (os.path.exists(_LIB_PATH)
            and os.path.getmtime(_LIB_PATH) >= os.path.getmtime(src)):
        return _LIB_PATH
    try:
        subprocess.check_call(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", src,
             "-o", _LIB_PATH + ".tmp"],
            stderr=subprocess.DEVNULL)
        os.replace(_LIB_PATH + ".tmp", _LIB_PATH)
        return _LIB_PATH
    except (subprocess.CalledProcessError, OSError):
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        path = _build()
        if path is None:
            _build_failed = True
            return None
        lib = ctypes.CDLL(path)
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
        lib.islx_assemble_batch.restype = ctypes.c_int
        lib.islx_assemble_batch.argtypes = [
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int,
            i32p, f32p, i32p, i32p, f32p, u8p, i32p,
            ctypes.c_int, ctypes.c_int,
            f64p, i32p, f64p, i32p,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    import os

    if os.environ.get("ISLX_NO_NATIVE"):   # force the numpy fallback paths
        return False
    return get_lib() is not None


def assemble_batch(xy: np.ndarray, score: np.ndarray, count: np.ndarray,
                   pair: np.ndarray, cscore: np.ndarray, cok: np.ndarray,
                   k: int, limb_seq: np.ndarray, njoint: int,
                   max_subset: int = 512
                   ) -> List[Tuple[np.ndarray, np.ndarray]]:
    """Batched native grouping: same outputs as per-frame
    islx.ops.grouping.assemble_sorted.

    xy [B,C,K,2] i32, score [B,C,K] f32, count [B,C] i32,
    pair/cscore/cok [B,L,M], limb_seq [L,2].
    """
    lib = get_lib()
    assert lib is not None, "native library unavailable"
    b, c, kk, _ = xy.shape
    l, m = pair.shape[1], pair.shape[2]
    max_cand = c * kk
    cols = njoint + 1

    xy = np.ascontiguousarray(xy, np.int32)
    score = np.ascontiguousarray(score, np.float32)
    count = np.ascontiguousarray(count, np.int32)
    pair = np.ascontiguousarray(pair, np.int32)
    cscore = np.ascontiguousarray(cscore, np.float32)
    cok = np.ascontiguousarray(cok.astype(np.uint8))
    limb_seq = np.ascontiguousarray(limb_seq, np.int32)

    cand_out = np.zeros((b, max_cand, 4), np.float64)
    n_cand = np.zeros((b,), np.int32)
    subset_out = np.zeros((b, max_subset, cols), np.float64)
    n_subset = np.zeros((b,), np.int32)

    ret = lib.islx_assemble_batch(
        b, c, kk, l, m, njoint, xy, score, count, pair, cscore, cok,
        limb_seq, max_cand, max_subset, cand_out, n_cand, subset_out,
        n_subset)
    assert ret == 0, ret
    return [(cand_out[i, :n_cand[i]].copy(),
             subset_out[i, :n_subset[i]].copy()) for i in range(b)]

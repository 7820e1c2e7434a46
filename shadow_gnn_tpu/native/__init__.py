"""ctypes loader + build-on-demand for the native host engine."""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libshadow_native.so")
_SRC = os.path.join(_DIR, "ppr.cpp")
_lib = None


def _build():
    cmd = ["g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
           "-o", _SO, _SRC, "-lpthread"]
    # SHADOW_NATIVE_TSAN=1 builds with ThreadSanitizer for concurrency
    # checks of the multi-threaded push (per-target outputs are disjoint
    # slots; the work queue is a single atomic counter)
    if os.environ.get("SHADOW_NATIVE_TSAN") == "1":
        cmd.insert(1, "-fsanitize=thread")
        cmd.insert(1, "-g")
    subprocess.run(cmd, check=True, capture_output=True)


# Self-test script run in a THROWAWAY subprocess before loading the .so
# in-process: a stale binary built with -march=native on another machine
# would raise SIGILL on first call, which is uncatchable in-process.  The
# subprocess exercises an actual push call so illegal instructions surface
# as a non-zero exit status instead of killing the caller.
_SELFTEST = """
import ctypes, numpy as np, sys
lib = ctypes.CDLL(sys.argv[1])
lib.shadow_ppr_push.restype = ctypes.c_int
indptr = np.array([0, 1, 2], np.int64)
indices = np.array([1, 0], np.int32)
targets = np.array([0], np.int64)
out_n = np.empty((1, 2), np.int32)
out_s = np.empty((1, 2), np.float32)
rc = lib.shadow_ppr_push(
    indptr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    ctypes.c_int64(2),
    indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    ctypes.c_int64(2),
    targets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    ctypes.c_int64(1),
    ctypes.c_int(2), ctypes.c_float(0.85), ctypes.c_float(1e-4),
    ctypes.c_int(1), ctypes.c_int(0),
    out_n.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    out_s.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
sys.exit(0 if rc == 0 else 1)
"""


def _stamp_path() -> str:
    return _SO + ".ok"


def _stamp_value() -> str:
    import platform
    return (f"{os.path.getmtime(_SO)}:{os.path.getsize(_SO)}:"
            f"{platform.machine()}:{platform.node()}")


def _stamp_fresh() -> bool:
    try:
        with open(_stamp_path()) as f:
            return f.read() == _stamp_value()
    except OSError:
        return False


def _selftest_ok() -> bool:
    """Probe the .so in a THROWAWAY subprocess (a stale -march=native
    binary dies with SIGILL, uncatchable in-process).  A stamp file
    records a successful probe of this exact binary on this machine so
    later processes skip the ~100ms fork+exec."""
    import sys
    if _stamp_fresh():
        return True
    r = subprocess.run([sys.executable, "-c", _SELFTEST, _SO],
                       capture_output=True)
    if r.returncode == 0:
        try:
            with open(_stamp_path(), "w") as f:
                f.write(_stamp_value())
        except OSError:
            pass            # read-only fs: just re-probe next process
        return True
    return False


def get_lib():
    global _lib
    if _lib is not None:
        return _lib
    if (not os.path.isfile(_SO)
            or os.path.getmtime(_SO) < os.path.getmtime(_SRC)
            or not _selftest_ok()):
        _build()
        if not _selftest_ok():
            raise OSError("native self-test failed after rebuild")
    lib = ctypes.CDLL(_SO)
    lib.shadow_ppr_push.restype = ctypes.c_int
    lib.shadow_ppr_push.argtypes = [
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.c_int, ctypes.c_float, ctypes.c_float, ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
    ]
    lib.shadow_ragged_offsets.restype = ctypes.c_int
    lib.shadow_ragged_offsets.argtypes = [
        ctypes.POINTER(ctypes.c_uint32), ctypes.c_int64, ctypes.c_uint32,
        ctypes.POINTER(ctypes.c_int64),
    ]
    _lib = lib
    return lib


def _auto_dense(n_nodes: int, n_threads: int) -> int:
    """Pick dense vs map push state from available memory: dense costs
    9 bytes/node/thread (pi + residue f32 + pending byte) and is several
    times faster; take it whenever it fits in half of free RAM."""
    if n_threads <= 0:
        n_threads = os.cpu_count() or 1
    try:
        free = os.sysconf("SC_AVPHYS_PAGES") * os.sysconf("SC_PAGE_SIZE")
    except (ValueError, OSError):
        return 0                      # fall back to the reference's 5M rule
    return 1 if 9 * n_nodes * n_threads < free // 2 else 2


def ppr_push_native(indptr: np.ndarray, indices: np.ndarray,
                    targets: np.ndarray, k: int, alpha_int: float,
                    epsilon: float, n_threads: int = 0,
                    as_dense: bool = False):
    """Multi-threaded forward-push PPR; same output contract as
    ppr_push_host (per-target descending top-k lists), or the raw
    [T, k] padded tables when ``as_dense`` (pad id=-1, score=0)."""
    lib = get_lib()
    indptr64 = np.ascontiguousarray(indptr, dtype=np.int64)
    indices32 = np.ascontiguousarray(indices, dtype=np.int32)
    targets64 = np.ascontiguousarray(targets, dtype=np.int64)
    nt = targets64.size
    out_n = np.empty((nt, k), dtype=np.int32)
    out_s = np.empty((nt, k), dtype=np.float32)
    ret = lib.shadow_ppr_push(
        indptr64.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        indptr64.size - 1,
        indices32.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        indices32.size,
        targets64.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), nt,
        k, ctypes.c_float(alpha_int), ctypes.c_float(epsilon), n_threads,
        _auto_dense(indptr64.size - 1, n_threads),
        out_n.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        out_s.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    assert ret == 0
    if as_dense:
        return out_n, out_s
    neighs = [row[row >= 0] for row in out_n]
    scores = [s[:n.size] for n, s in zip(neighs, out_s)]
    return neighs, scores


def ragged_offsets(buf_u4: np.ndarray, cnt: int) -> np.ndarray:
    """Positions of the per-row length words in a reference ragged bin
    buffer (native sequential scan; raises on truncated files)."""
    lib = get_lib()
    buf = np.ascontiguousarray(buf_u4, dtype=np.uint32)
    out = np.empty(cnt, dtype=np.int64)
    ret = lib.shadow_ragged_offsets(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        ctypes.c_int64(buf.size), ctypes.c_uint32(cnt),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    if ret != 0:
        raise ValueError("truncated ragged bin buffer")
    return out

"""Native (C++) host-runtime components, bound via ctypes (SURVEY.md §3.3:
the epoch planner is the one hot *host* loop; everything device-side is
Pallas/XLA).

The shared library is built on first use with the system compiler and
cached next to this file; every entry point has a pure-NumPy fallback, so
the framework works without a toolchain (tests cover both paths).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from pathlib import Path

import numpy as np

__all__ = ["get_lib", "available", "conflict_free_rounds", "plan_sweeps_native"]

_HERE = Path(__file__).parent
_SRC = _HERE / "planner.cpp"
_lock = threading.Lock()
_lib = None
_tried = False


def _lib_path() -> Path:
    """Library filename keyed by a content hash of the source, so an edited
    planner.cpp can never silently run against a stale binary (mtimes are
    unreliable after checkout), and no binary ships in version control."""
    digest = hashlib.sha256(_SRC.read_bytes()).hexdigest()[:12]
    return _HERE / f"_libmfxplanner-{digest}.so"

_I64 = ctypes.c_int64
_P_I32 = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
_P_I64 = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
_P_F32 = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")


def _build(lib_path: Path) -> bool:
    cxx = os.environ.get("CXX", "g++")
    cmd = [cxx, "-O3", "-shared", "-fPIC", "-std=c++17",
           str(_SRC), "-o", str(lib_path)]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except (OSError, subprocess.SubprocessError):
        return False
    # sweep stale binaries from earlier source versions (best-effort)
    for old in _HERE.glob("_libmfxplanner*.so"):
        if old != lib_path:
            try:
                old.unlink()
            except OSError:
                pass
    return True


def get_lib():
    """The loaded ctypes library, or None (NumPy fallback)."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("MFX_NO_NATIVE"):
            return None
        lib_path = _lib_path()
        if not lib_path.exists():
            if not _build(lib_path):
                return None
        try:
            lib = ctypes.CDLL(str(lib_path))
        except OSError:
            return None
        lib.mfx_plan_count.restype = ctypes.c_int
        lib.mfx_plan_count.argtypes = [
            _I64, _P_I32, _P_I32, _P_F32, _P_I64, _I64, _I64,
            _I64, _I64, _I64, _I64, _I64,
            _P_I64, _P_I64, _P_I64,
            _P_I32, _P_I32, _P_I32, _P_I32, _P_I32,
        ]
        lib.mfx_plan_fill_sweep.restype = ctypes.c_int
        lib.mfx_plan_fill_sweep.argtypes = [
            _I64, _P_I32, _P_I32, _P_I32, _P_I32, _P_I32, _I64, _I64,
            _I64, _I64, _I64, _I64, _I64, _I64,
            _P_I64, _P_I64, _P_I64, _P_I32, _P_I32, _P_I32, _I64,
        ]
        lib.mfx_conflict_free_rounds.restype = ctypes.c_int
        lib.mfx_conflict_free_rounds.argtypes = [
            _I64, _P_I32, _P_I32, _P_I64, _I64, _I64,
            _P_I32, _P_I32, _P_I32,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def conflict_free_rounds(
    user: np.ndarray, item: np.ndarray, perm: np.ndarray,
    num_users: int, num_items: int,
) -> tuple[np.ndarray, int]:
    """Greedy O(n) conflict-free round per rating (perm order). Returns
    (rounds int32[n], num_rounds). Requires the native library."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native planner unavailable")
    n = len(perm)
    rounds = np.empty(n, np.int32)
    next_u = np.empty(num_users, np.int32)
    next_i = np.empty(num_items, np.int32)
    nr = lib.mfx_conflict_free_rounds(
        n, np.ascontiguousarray(user, np.int32),
        np.ascontiguousarray(item, np.int32),
        np.ascontiguousarray(perm, np.int64),
        num_users, num_items, next_u, next_i, rounds,
    )
    return rounds, int(nr)


def plan_sweeps_native(
    user, item, rating, perm, num_users, num_items, su, si, tile, tpg, nwin
):
    """Native build of the DSGD sweep plans; returns a list of dicts with
    sa/tc/tl/win0/nwin/n_real matching blocked_host.SweepPlan fields, or
    None when the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    user = np.ascontiguousarray(user, np.int32)
    item = np.ascontiguousarray(item, np.int32)
    rating = np.ascontiguousarray(rating, np.float32)
    perm = np.ascontiguousarray(perm, np.int64)
    n = len(perm)
    A = -(-num_users // su)
    C = -(-num_items // si)
    S = -(-C // nwin)
    counts = np.empty(A * C, np.int64)
    nt = np.empty(S, np.int64)
    ng = np.empty(S, np.int64)
    a_ord = np.empty(n, np.int32)
    c_ord = np.empty(n, np.int32)
    ul = np.empty(n, np.int32)
    il = np.empty(n, np.int32)
    rb = np.empty(n, np.int32)
    rc = lib.mfx_plan_count(
        n, user, item, rating, perm, num_users, num_items,
        su, si, tile, tpg, nwin, counts, nt, ng,
        a_ord, c_ord, ul, il, rb,
    )
    if rc != 0:
        return None
    out = []
    for s in range(S):
        w0 = s * nwin
        nw = min(nwin, C - w0)
        sa = np.empty(int(ng[s]), np.int32)
        tc = np.empty(int(nt[s]), np.int32)
        tl = np.empty((int(nt[s]), 3, tile), np.int32)
        base = np.empty(A * nw, np.int64)
        pos = np.empty(A * nw, np.int64)
        rc = lib.mfx_plan_fill_sweep(
            n, a_ord, c_ord, ul, il, rb, num_users, num_items,
            su, si, tile, tpg, nwin, s,
            counts, base, pos, sa, tc, tl.reshape(-1), int(nt[s]),
        )
        if rc != 0:
            return None
        n_real = int(
            counts.reshape(A, C)[:, w0 : w0 + nw].sum()
        )
        out.append(
            dict(sa=sa, tc=tc, tl=tl, win0=w0, nwin=nw, n_real=n_real)
        )
    return out

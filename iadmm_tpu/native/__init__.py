"""Native (C++) runtime components, exposed via ctypes.

``qp_oracle.cpp`` is the first-party replacement for the reference's
third-party OSQP C solver (reference: generate_data.py:78-83): a dense
condensed-KKT Cholesky ADMM solver, OpenMP-parallel across a batch of
instances.  The shared library is compiled on first use with the in-image
g++ and cached beside the source keyed by a source hash; when no toolchain
is available everything degrades to the pure-Python oracle.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "qp_oracle.cpp")
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_BUILD_ERROR: Optional[str] = None


def _lib_path() -> str:
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    return os.path.join(os.path.dirname(_SRC),
                        f"libqp_oracle-{digest}.so")


def _build(path: str) -> None:
    cmd = ["g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
           "-o", path, _SRC]
    subprocess.run(cmd, check=True, capture_output=True, text=True)


def load_library() -> Optional[ctypes.CDLL]:
    """Compile (once) and load the native library; None if unavailable."""
    global _LIB, _BUILD_ERROR
    with _LOCK:
        if _LIB is not None or _BUILD_ERROR is not None:
            return _LIB
        path = _lib_path()
        try:
            if not os.path.exists(path):
                _build(path)
            lib = ctypes.CDLL(path)
        except Exception as e:  # pragma: no cover - no toolchain
            _BUILD_ERROR = str(e)
            return None
        d = ctypes.POINTER(ctypes.c_double)
        i = ctypes.POINTER(ctypes.c_int)
        lib.iadmm_solve_qp_batch.restype = ctypes.c_int
        lib.iadmm_solve_qp_batch.argtypes = [
            d, d, d, d, d,                        # P q A zl zu
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_double, ctypes.c_double, ctypes.c_int,
            ctypes.c_double, ctypes.c_double, ctypes.c_double,
            d, d, i, i, ctypes.c_int]
        _LIB = lib
        return _LIB


def available() -> bool:
    return load_library() is not None


def solve_qp_batch(P: np.ndarray, q: np.ndarray, A: np.ndarray,
                   zl: np.ndarray, zu: np.ndarray,
                   eps_abs: float = 1e-4, eps_rel: float = 1e-4,
                   max_iter: int = 20000, sigma: float = 1e-6,
                   alpha: float = 1.6, rho0: float = 0.1,
                   num_threads: int = 0
                   ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Solve a batch of box-constrained QPs with the native ADMM solver.

    ``P`` is the full (doubled) Hessian.  ``P/q/A`` may be a single shared
    instance (ndim 2/1/2) with per-instance ``zl/zu`` — the QP_RHS layout.
    Returns (x (N,n), y (N,m), iters (N,), status (N,)); status 0 = solved,
    1 = max_iter, 2 = factorisation failure, 3 = primal infeasible,
    4 = dual infeasible (unbounded) — 3/4 are OSQP-style certificate exits,
    matching the reference oracle's skip-on-unsolved protocol
    (reference: generate_data.py:93-94, 227-228).
    """
    lib = load_library()
    if lib is None:
        raise RuntimeError(f"native oracle unavailable: {_BUILD_ERROR}")
    zl = np.ascontiguousarray(zl, np.float64)
    zu = np.ascontiguousarray(zu, np.float64)
    if zl.ndim == 1:
        zl = zl[None]
        zu = zu[None]
    N, m = zl.shape
    shared = int(P.ndim == 2)
    n = P.shape[-1]
    P = np.ascontiguousarray(P, np.float64)
    q = np.ascontiguousarray(q, np.float64)
    A = np.ascontiguousarray(A, np.float64)
    if not shared:
        assert P.shape[0] == N and q.shape[0] == N and A.shape[0] == N
    x = np.zeros((N, n), np.float64)
    y = np.zeros((N, m), np.float64)
    iters = np.zeros(N, np.int32)
    status = np.zeros(N, np.int32)

    def ptr(a, t=ctypes.c_double):
        return a.ctypes.data_as(ctypes.POINTER(t))

    lib.iadmm_solve_qp_batch(
        ptr(P), ptr(q), ptr(A), ptr(zl), ptr(zu),
        n, m, N, shared, eps_abs, eps_rel, max_iter, sigma, alpha, rho0,
        ptr(x), ptr(y),
        iters.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        num_threads)
    return x, y, iters, status

"""Native (C++) host runtime: loader and ctypes bindings.

The TPU compute path is JAX/XLA (idto_tpu/ops, idto_tpu/optimizer); this
package holds the *host-side* runtime pieces that the reference implements
in C++ and that run between device solves:

  * block penta-diagonal Thomas factor/solve — the cross-check oracle for
    the device solver (reference: optimizer/penta_diagonal_solver.h) and a
    CPU fallback,
  * cubic-Hermite stored-trajectory evaluation + MPC warm-start shifting
    (reference: examples/mpc_controller.cc:87-178).

The shared library is compiled on first use with g++ -O3 and cached next
to the sources; everything degrades gracefully (``available() -> False``)
if no toolchain is present, and all device-side code paths are pure JAX.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_LOCK = threading.Lock()
_LIB = None
_TRIED = False

_SRC_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_SOURCES = ["penta.cc", "trajectory_store.cc"]
_SO_NAME = "libidto_native.so"


def _build_and_load():
    src_dir = os.path.abspath(_SRC_DIR)
    so_path = os.path.join(src_dir, _SO_NAME)
    srcs = [os.path.join(src_dir, s) for s in _SOURCES]
    if not all(os.path.exists(s) for s in srcs):
        return None
    newest_src = max(os.path.getmtime(s) for s in srcs)
    if not os.path.exists(so_path) or os.path.getmtime(so_path) < newest_src:
        # Compile to a per-process temp file and rename() into place so
        # concurrent processes (pytest-xdist, parallel jobs) can't observe
        # a partially written .so (rename is atomic within a filesystem).
        tmp_path = f"{so_path}.{os.getpid()}.tmp"
        cmd = [
            "g++", "-O3", "-march=native", "-shared", "-fPIC",
            "-std=c++17", "-o", tmp_path, *srcs,
        ]
        try:
            subprocess.run(
                cmd, check=True, capture_output=True, timeout=120
            )
            os.replace(tmp_path, so_path)
        except (subprocess.SubprocessError, FileNotFoundError, OSError):
            if os.path.exists(tmp_path):
                try:
                    os.remove(tmp_path)
                except OSError:
                    pass
            return None
    try:
        lib = ctypes.CDLL(so_path)
    except OSError:
        return None

    dp = ctypes.POINTER(ctypes.c_double)
    ip = ctypes.POINTER(ctypes.c_int)
    lib.idto_penta_factorize.restype = ctypes.c_int
    lib.idto_penta_factorize.argtypes = [
        ctypes.c_int, ctypes.c_int, dp, dp, dp, dp, dp,
        dp, ip, dp, dp, dp, dp,
    ]
    lib.idto_penta_solve.restype = ctypes.c_int
    lib.idto_penta_solve.argtypes = [
        ctypes.c_int, ctypes.c_int, dp, ip, dp, dp, dp, dp, dp,
    ]
    lib.idto_penta_matvec.restype = None
    lib.idto_penta_matvec.argtypes = [
        ctypes.c_int, ctypes.c_int, dp, dp, dp, dp, dp, dp, dp,
    ]
    for name in ("idto_spline_eval", "idto_spline_eval_deriv"):
        fn = getattr(lib, name)
        fn.restype = None
        fn.argtypes = [
            ctypes.c_int, ctypes.c_int, ctypes.c_double, ctypes.c_double,
            dp, dp, ctypes.c_int, dp, dp,
        ]
    lib.idto_warmstart_shift.restype = None
    lib.idto_warmstart_shift.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.c_double, ctypes.c_double,
        dp, dp, ctypes.c_double, dp,
    ]
    return lib


def _get():
    global _LIB, _TRIED
    with _LOCK:
        if not _TRIED:
            _LIB = _build_and_load()
            _TRIED = True
        return _LIB


def available() -> bool:
    return _get() is not None


def _c64(a):
    return np.ascontiguousarray(a, dtype=np.float64)


def _dp(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


class PentaFactorizationNative:
    """Host factorization of a block penta-diagonal matrix.

    Mirrors the device-side ops.penta API on numpy arrays.  Bands are
    (n, k, k) with the reference's zero-padding convention.
    """

    def __init__(self, A, B, C, D, E):
        lib = _get()
        if lib is None:
            raise RuntimeError("native library unavailable")
        A, B, C, D, E = map(_c64, (A, B, C, D, E))
        n, k, _ = C.shape
        self.n, self.k = n, k
        self.lu = np.empty((n, k, k))
        self.piv = np.empty((n, k), dtype=np.int32)
        self.L1 = np.empty((n, k, k))
        self.L2 = np.empty((n, k, k))
        self.Dp = np.empty((n, k, k))
        self.Ep = np.empty((n, k, k))
        status = lib.idto_penta_factorize(
            n, k, _dp(A), _dp(B), _dp(C), _dp(D), _dp(E),
            _dp(self.lu),
            self.piv.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            _dp(self.L1), _dp(self.L2), _dp(self.Dp), _dp(self.Ep),
        )
        if status != 0:
            raise np.linalg.LinAlgError(
                "penta-diagonal factorization failed (singular block)"
            )

    def solve(self, b):
        lib = _get()
        x = _c64(b).copy().reshape(self.n, self.k)
        lib.idto_penta_solve(
            self.n, self.k, _dp(self.lu),
            self.piv.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            _dp(self.L1), _dp(self.L2), _dp(self.Dp), _dp(self.Ep), _dp(x),
        )
        return x


def penta_solve(A, B, C, D, E, b):
    """One-shot host solve H x = b."""
    return PentaFactorizationNative(A, B, C, D, E).solve(b)


def penta_matvec(A, B, C, D, E, x):
    lib = _get()
    if lib is None:
        raise RuntimeError("native library unavailable")
    A, B, C, D, E = map(_c64, (A, B, C, D, E))
    n, k, _ = C.shape
    x = _c64(x).reshape(n, k)
    y = np.empty_like(x)
    lib.idto_penta_matvec(
        n, k, _dp(A), _dp(B), _dp(C), _dp(D), _dp(E), _dp(x), _dp(y)
    )
    return y


class StoredTrajectoryNative:
    """Cubic-Hermite stored trajectory (reference: StoredTrajectory,
    examples/mpc_controller.cc:99-138) evaluated by the C++ runtime."""

    def __init__(self, t0: float, dt: float, y, yd):
        if _get() is None:
            raise RuntimeError("native library unavailable")
        self.y = _c64(y)
        self.yd = _c64(yd)
        self.T = self.y.shape[0] - 1
        self.d = self.y.shape[1]
        self.t0 = float(t0)
        self.dt = float(dt)

    def value(self, ts):
        lib = _get()
        ts = np.atleast_1d(_c64(ts))
        out = np.empty((ts.shape[0], self.d))
        lib.idto_spline_eval(
            self.T, self.d, self.t0, self.dt, _dp(self.y), _dp(self.yd),
            ts.shape[0], _dp(ts), _dp(out),
        )
        return out

    def derivative(self, ts):
        lib = _get()
        ts = np.atleast_1d(_c64(ts))
        out = np.empty((ts.shape[0], self.d))
        lib.idto_spline_eval_deriv(
            self.T, self.d, self.t0, self.dt, _dp(self.y), _dp(self.yd),
            ts.shape[0], _dp(ts), _dp(out),
        )
        return out

    def warmstart_shift(self, t_now: float):
        """Resample at t_now + i*dt (reference UpdateInitialGuess,
        mpc_controller.cc:87-97)."""
        lib = _get()
        out = np.empty((self.T + 1, self.d))
        lib.idto_warmstart_shift(
            self.T, self.d, self.t0, self.dt, _dp(self.y), _dp(self.yd),
            float(t_now), _dp(out),
        )
        return out

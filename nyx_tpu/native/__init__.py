"""Native (C++) host-side kernels, compiled on demand.

The TPU owns the device compute path (JAX/XLA/Pallas); these are the native
runtime pieces for host-side data movement where a Python loop would
dominate — the counterpart of the reference's compiled Rust host code.
Currently: whole-ensemble trajectory interpolation (hermite.cpp), used by
`mc.Results` time-history queries and ensemble parquet export.

Build: `g++ -O3 -shared -fPIC -fopenmp` into `_build/` next to this file at
first use (rebuilt when the source is newer than the library). Every entry
point has a pure-numpy fallback, so the package works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_HERE = Path(__file__).resolve().parent
_BUILD = _HERE / "_build"
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _compile() -> Optional[Path]:
    src = _HERE / "hermite.cpp"
    out = _BUILD / "libnyxnative.so"
    if out.exists() and out.stat().st_mtime >= src.stat().st_mtime:
        return out
    _BUILD.mkdir(exist_ok=True)
    for flags in (["-fopenmp"], []):  # openmp when available
        cmd = ["g++", "-O3", "-shared", "-fPIC", *flags, str(src), "-o", str(out)]
        try:
            r = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
        except (OSError, subprocess.TimeoutExpired):
            return None
        if r.returncode == 0:
            return out
    return None


def lib() -> Optional[ctypes.CDLL]:
    """The native library, or None when no toolchain is available."""
    global _LIB, _TRIED
    if _LIB is None and not _TRIED:
        _TRIED = True
        if os.environ.get("NYX_NO_NATIVE"):
            return None
        path = _compile()
        if path is not None:
            _LIB = ctypes.CDLL(str(path))
            _LIB.hermite_interp_ensemble.argtypes = [
                ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_double),
                ctypes.c_double, ctypes.c_double, ctypes.c_double,
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ]
            _LIB.hermite_interp_ensemble.restype = None
    return _LIB


def hermite_interp_ensemble(traj_t, traj_y, traj_len, t_grid, mu=0.0,
                            j2=0.0, re=0.0):
    """[B, G, N] ensemble states at grid times (quintic Hermite with
    two-body+J2 end accelerations when mu > 0), or None if unavailable."""
    L = lib()
    if L is None:
        return None
    traj_t = np.ascontiguousarray(traj_t, dtype=np.float64)
    traj_y = np.ascontiguousarray(traj_y, dtype=np.float64)
    traj_len = np.ascontiguousarray(traj_len, dtype=np.int32)
    t_grid = np.ascontiguousarray(t_grid, dtype=np.float64)
    B, K = traj_t.shape
    N = traj_y.shape[2]
    G = t_grid.shape[0]
    out = np.empty((B, G, N), dtype=np.float64)

    def p(a, ty):
        return a.ctypes.data_as(ctypes.POINTER(ty))

    L.hermite_interp_ensemble(
        p(traj_t, ctypes.c_double), p(traj_y, ctypes.c_double),
        p(traj_len, ctypes.c_int32), p(t_grid, ctypes.c_double),
        p(out, ctypes.c_double), float(mu), float(j2), float(re), B, K, N, G,
    )
    return out

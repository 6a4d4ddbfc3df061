"""Native host runtime (C++ via ctypes).

The reference's entire native surface is the closed-source desilofhe C++
engine (/root/reference/engine_context.py:6).  In this framework the device
compute path is JAX/XLA/Pallas; this module is the native HOST runtime for
the legs that should never touch the XLA compiler: keygen NTTs (dozens of
shape-specialized jit compiles otherwise), Montgomery conversion, and
inverse transforms on host-resident data.

The shared library is compiled from hostkernels.cpp on first use with g++
(no external deps) and cached next to the source.  Every entry point
degrades to None when native is unavailable (AESFHE_NO_NATIVE=1, no g++, or
load failure), so all callers keep a pure-JAX fallback.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

_HERE = Path(__file__).resolve().parent
_SRC = _HERE / "hostkernels.cpp"
_SO = _HERE / "libaesfhe_host.so"
_lib = None          # None = not tried, False = unavailable


def _build() -> bool:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-fopenmp",
           str(_SRC), "-o", str(_SO) + ".tmp"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except Exception:
        # retry without OpenMP (missing libgomp etc.)
        try:
            subprocess.run([c for c in cmd if c != "-fopenmp"],
                           check=True, capture_output=True, timeout=120)
        except Exception:
            return False
    os.replace(str(_SO) + ".tmp", _SO)
    return True


def _u32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32))


def get_lib():
    """Load (building if needed) the native library; False if unavailable."""
    global _lib
    if _lib is not None:
        return _lib
    if os.environ.get("AESFHE_NO_NATIVE"):
        _lib = False
        return _lib
    try:
        if (not _SO.exists()
                or _SO.stat().st_mtime < _SRC.stat().st_mtime):
            if not _build():
                _lib = False
                return _lib
        lib = ctypes.CDLL(str(_SO))
        u32p = ctypes.POINTER(ctypes.c_uint32)
        i64 = ctypes.c_int64
        lib.aesfhe_to_eval_batch.argtypes = [u32p, i64, i64, u32p, u32p,
                                             u32p, u32p, u32p]
        lib.aesfhe_ntt_fwd_batch.argtypes = [u32p, i64, i64, u32p, u32p, u32p]
        lib.aesfhe_ntt_inv_batch.argtypes = [u32p, i64, i64, u32p, u32p,
                                             u32p, u32p, u32p]
        lib.aesfhe_from_mont_batch.argtypes = [u32p, i64, i64, u32p, u32p]
        for f in (lib.aesfhe_to_eval_batch, lib.aesfhe_ntt_fwd_batch,
                  lib.aesfhe_ntt_inv_batch, lib.aesfhe_from_mont_batch):
            f.restype = None
        _lib = lib
    except Exception:
        _lib = False
    return _lib


def _prep(x: np.ndarray) -> np.ndarray:
    out = np.ascontiguousarray(x, dtype=np.uint32)
    if out is x:                       # never mutate the caller's array
        out = out.copy()
    return out


def _rows(a: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(a, dtype=np.uint32)


def to_eval_batch(x, q, qinv_neg, r2, w, wsh):
    """Plain coeff residues [L, n] -> Montgomery eval order; None if the
    native library is unavailable."""
    lib = get_lib()
    if not lib:
        return None
    x = _prep(x)
    L, n = x.shape
    lib.aesfhe_to_eval_batch(_u32p(x), L, n, _u32p(_rows(q)),
                             _u32p(_rows(qinv_neg)), _u32p(_rows(r2)),
                             _u32p(_rows(w)), _u32p(_rows(wsh)))
    return x


def ntt_fwd_batch(x, q, w, wsh):
    lib = get_lib()
    if not lib:
        return None
    x = _prep(x)
    L, n = x.shape
    lib.aesfhe_ntt_fwd_batch(_u32p(x), L, n, _u32p(_rows(q)),
                             _u32p(_rows(w)), _u32p(_rows(wsh)))
    return x


def ntt_inv_batch(x, q, wi, wish, ninv, ninv_sh):
    lib = get_lib()
    if not lib:
        return None
    x = _prep(x)
    L, n = x.shape
    lib.aesfhe_ntt_inv_batch(_u32p(x), L, n, _u32p(_rows(q)),
                             _u32p(_rows(wi)), _u32p(_rows(wish)),
                             _u32p(_rows(ninv)), _u32p(_rows(ninv_sh)))
    return x


def from_mont_batch(x, q, qinv_neg):
    lib = get_lib()
    if not lib:
        return None
    x = _prep(x)
    L, n = x.shape
    lib.aesfhe_from_mont_batch(_u32p(x), L, n, _u32p(_rows(q)),
                               _u32p(_rows(qinv_neg)))
    return x

"""Optional native inner loop for the MinHash hot path.

The (t x n) NumPy formulation writes ~12 MB of temporaries per 5 KB
document; the fused C loop keeps the shingle set in L1 and computes the
per-function minimum in one pass (~8x). Compiled on first use with the
system cc into a per-user cache dir; silently falls back to NumPy when no
compiler is available. Semantics are identical (tests assert bit-equality):
h = (a*x + b) wrapped mod 2**64, minus p when >= p (valid since 2**64 < 2p),
min per function; empty set handled by the caller.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

import numpy as np

_C_SRC = r"""
#include <stdint.h>

void minhash_axb(const uint64_t *xs, long n, const uint64_t *a,
                 const uint64_t *b, long t, uint64_t p, uint64_t *out) {
    for (long j = 0; j < t; ++j) {
        uint64_t aj = a[j], bj = b[j], mn = ~(uint64_t)0;
        for (long i = 0; i < n; ++i) {
            uint64_t h = aj * xs[i] + bj;   /* wraps mod 2^64 like C++/NumPy */
            if (h >= p) h -= p;             /* 2^64 < 2p: single subtract */
            if (h < mn) mn = h;
        }
        out[j] = mn;
    }
}
"""

_lib = None
_tried = False


def _cache_dir() -> str:
    """Genuinely per-user cache dir: tempfile.gettempdir() is shared on
    multi-user hosts, so suffix with the uid and create mode 0700 — another
    user cannot pre-plant a malicious .so at a predictable path."""
    base = os.environ.get("XDG_CACHE_HOME") or os.path.expanduser("~/.cache")
    if not os.path.isdir(os.path.dirname(base) or "/"):
        base = tempfile.gettempdir()
    uid = os.getuid() if hasattr(os, "getuid") else 0
    return os.path.join(base,
                        f"mhs_native_u{uid}_{hashlib.sha1(_C_SRC.encode()).hexdigest()[:12]}")


def _build() -> "ctypes.CDLL | None":
    cache = _cache_dir()
    so = os.path.join(cache, "libminhash.so")
    if not os.path.exists(so):
        os.makedirs(cache, mode=0o700, exist_ok=True)
        src = os.path.join(cache, f"minhash_{os.getpid()}.c")
        tmp_so = os.path.join(cache, f"lib_{os.getpid()}.so")
        with open(src, "w") as f:
            f.write(_C_SRC)
        for cc in ("cc", "gcc", "clang"):
            try:
                subprocess.run([cc, "-O3", "-shared", "-fPIC", "-o", tmp_so, src],
                               check=True, capture_output=True, timeout=120)
                os.replace(tmp_so, so)  # atomic: concurrent workers never
                break                   # dlopen a half-written library
            except Exception:
                continue
        else:
            return None
    try:
        # refuse a library some other principal wrote into our cache path
        st = os.stat(so)
        if hasattr(os, "getuid") and st.st_uid != os.getuid():
            return None
        lib = ctypes.CDLL(so)
        lib.minhash_axb.argtypes = [
            ctypes.POINTER(ctypes.c_uint64), ctypes.c_long,
            ctypes.POINTER(ctypes.c_uint64), ctypes.POINTER(ctypes.c_uint64),
            ctypes.c_long, ctypes.c_uint64, ctypes.POINTER(ctypes.c_uint64),
        ]
        lib.minhash_axb.restype = None
        return lib
    except Exception:
        return None


def native_minhash(xs: np.ndarray, a: np.ndarray, b: np.ndarray, p: int):
    """Returns (t,) uint64 minima, or None when the native lib is absent."""
    global _lib, _tried
    if not _tried:
        _tried = True
        if os.environ.get("MHS_DISABLE_NATIVE") != "1":
            _lib = _build()
    if _lib is None:
        return None
    xs = np.ascontiguousarray(xs, dtype=np.uint64)
    out = np.empty(a.shape[0], dtype=np.uint64)
    u64p = ctypes.POINTER(ctypes.c_uint64)
    _lib.minhash_axb(xs.ctypes.data_as(u64p), xs.shape[0],
                     a.ctypes.data_as(u64p), b.ctypes.data_as(u64p),
                     a.shape[0], ctypes.c_uint64(p), out.ctypes.data_as(u64p))
    return out

"""Native (C++) runtime components, loaded via ctypes.

Currently: the generalized-Halton sampler core (``halton.cpp``), replacing
the reference's ``ghalton`` C++ dependency.  The library is compiled on
first use with the system toolchain and cached next to the source; import
degrades gracefully (callers fall back to the numpy implementation in
``ops/sampling.py``, which is bit-identical).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "halton.cpp")
_LIB = os.path.join(_DIR, "libm3p2i_halton.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _LIB],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except (subprocess.SubprocessError, FileNotFoundError, OSError):
        return False


def load_halton_lib() -> Optional[ctypes.CDLL]:
    """The compiled sampler library, building it on first call; None if the
    toolchain is unavailable (callers must fall back to numpy)."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(
            _SRC
        ):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None
        lib.halton_fill.argtypes = [
            ctypes.c_int64,
            ctypes.c_int64,
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        ]
        lib.halton_fill.restype = None
        _lib = lib
        return _lib


def native_halton(
    num_samples: int, bases: np.ndarray, perms: list
) -> Optional[np.ndarray]:
    """[num_samples, ndims] generalized-Halton points via the C++ core.

    ``perms[d]`` is the digit permutation for ``bases[d]`` (or None for
    identity).  Returns None when the native library is unavailable.
    """
    lib = load_halton_lib()
    if lib is None:
        return None
    bases = np.ascontiguousarray(np.asarray(bases, dtype=np.int64))
    ndims = bases.shape[0]
    if ndims == 0:
        return np.empty((num_samples, 0), dtype=np.float64)
    flat, offsets = [], np.zeros(ndims, dtype=np.int64)
    pos = 0
    for d in range(ndims):
        p = (
            np.arange(int(bases[d]), dtype=np.int64)
            if perms[d] is None
            else np.asarray(perms[d], dtype=np.int64)
        )
        offsets[d] = pos
        flat.append(p)
        pos += p.shape[0]
    perms_flat = np.ascontiguousarray(np.concatenate(flat))
    out = np.empty((num_samples, ndims), dtype=np.float64)
    lib.halton_fill(num_samples, ndims, bases, perms_flat, offsets, out)
    return out

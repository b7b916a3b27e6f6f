"""Native C++ components, loaded via ctypes (no pybind dependency).

Currently: the exact maximum-clique solver backing the PMC baseline
(reference: prebuilt utils/libpmc.so + ctypes wrapper utils/max_clique.py).
The library auto-builds on first use via `make` if the .so is missing.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np
from numpy.ctypeslib import ndpointer

_NATIVE_DIR = os.path.dirname(os.path.abspath(__file__))
_SO_PATH = os.path.join(_NATIVE_DIR, "libpmc_tpu.so")
_LIB = None


def _load_library():
    global _LIB
    if _LIB is not None:
        return _LIB
    if not os.path.exists(_SO_PATH):
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True, capture_output=True)
    lib = ctypes.cdll.LoadLibrary(_SO_PATH)
    lib.max_clique.restype = ctypes.c_int32
    lib.max_clique.argtypes = [
        ctypes.c_int32,
        ndpointer(ctypes.c_int32, flags="C_CONTIGUOUS"),
        ndpointer(ctypes.c_int32, flags="C_CONTIGUOUS"),
        ctypes.c_int32,
        ctypes.c_int32,
        ndpointer(ctypes.c_int32, flags="C_CONTIGUOUS"),
    ]
    _LIB = lib
    return lib


def max_clique(ei: np.ndarray, ej: np.ndarray, num_nodes: int) -> np.ndarray:
    """Exact maximum clique of the undirected graph given as an edge list.

    API mirror of the reference `pmc()` wrapper (utils/max_clique.py:14-40).

    Args:
        ei, ej: int arrays of edge endpoints (0-based).
        num_nodes: number of vertices.

    Returns:
        int32 array of clique member vertex indices.
    """
    lib = _load_library()
    ei = np.ascontiguousarray(ei, dtype=np.int32)
    ej = np.ascontiguousarray(ej, dtype=np.int32)
    outsize = max(num_nodes, 1)
    output = np.zeros(outsize, dtype=np.int32)
    size = lib.max_clique(len(ei), ei, ej, 0, outsize, output)
    return output[:size].copy()

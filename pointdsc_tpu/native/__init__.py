"""Native C++ components, loaded via ctypes (no pybind dependency).

- exact maximum-clique solver backing the PMC baseline (reference: prebuilt
  utils/libpmc.so + ctypes wrapper utils/max_clique.py)
- exact s-t mincut (Dinic) backing GC-RANSAC's coherent labeling (the
  reference's pygcransac performs a true graph cut; our device-side ICM is
  verified against — and optionally replaced by — this exact minimizer)

Each library auto-builds on first use via `make` if the .so is missing.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np
from numpy.ctypeslib import ndpointer

_NATIVE_DIR = os.path.dirname(os.path.abspath(__file__))
_SO_PATH = os.path.join(_NATIVE_DIR, "libpmc_tpu.so")
_MAXFLOW_SO_PATH = os.path.join(_NATIVE_DIR, "libmaxflow_tpu.so")
_LIB = None
_MAXFLOW_LIB = None


def _build_if_missing(path):
    if not os.path.exists(path):
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True, capture_output=True)


def _load_library():
    global _LIB
    if _LIB is not None:
        return _LIB
    _build_if_missing(_SO_PATH)
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


def _load_maxflow_library():
    global _MAXFLOW_LIB
    if _MAXFLOW_LIB is not None:
        return _MAXFLOW_LIB
    _build_if_missing(_MAXFLOW_SO_PATH)
    lib = ctypes.cdll.LoadLibrary(_MAXFLOW_SO_PATH)
    lib.mincut_labels.restype = ctypes.c_double
    lib.mincut_labels.argtypes = [
        ctypes.c_int32,
        ctypes.c_int32,
        ndpointer(ctypes.c_int32, flags="C_CONTIGUOUS"),
        ndpointer(ctypes.c_int32, flags="C_CONTIGUOUS"),
        ndpointer(ctypes.c_double, flags="C_CONTIGUOUS"),
        ndpointer(ctypes.c_double, flags="C_CONTIGUOUS"),
        ndpointer(ctypes.c_double, flags="C_CONTIGUOUS"),
        ndpointer(ctypes.c_uint8, flags="C_CONTIGUOUS"),
    ]
    _MAXFLOW_LIB = lib
    return lib


def mincut_labels(ei, ej, w, c_in, c_out, num_nodes):
    """Global minimum of the binary Potts MRF energy

        E(L) = sum_i [ L_i * c_in[i] + (1-L_i) * c_out[i] ]
             + sum_k w[k] * [L_{ei[k]} != L_{ej[k]}]

    via an exact s-t mincut (Dinic, native/maxflow.cpp). Duplicate edges
    accumulate; non-finite or >=1e15 unary costs clamp (inf c_in forces
    L_i = 0). Returns (energy: float, labels: bool [num_nodes])."""
    lib = _load_maxflow_library()
    ei = np.ascontiguousarray(ei, dtype=np.int32)
    ej = np.ascontiguousarray(ej, dtype=np.int32)
    w = np.ascontiguousarray(w, dtype=np.float64)
    c_in = np.ascontiguousarray(c_in, dtype=np.float64)
    c_out = np.ascontiguousarray(c_out, dtype=np.float64)
    labels = np.zeros(max(num_nodes, 1), dtype=np.uint8)
    energy = lib.mincut_labels(num_nodes, len(ei), ei, ej, w, c_in, c_out, labels)
    return float(energy), labels[:num_nodes].astype(bool)


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

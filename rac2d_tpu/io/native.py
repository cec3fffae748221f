"""ctypes bindings for the native host-side geometry kernels.

Builds native/pathtrace.cpp on first use (g++, cached as a .so next to
the package).  Falls back to the pure-Python implementations in
ops/columns.py if no compiler is available.
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess

import numpy as np

_SRC = pathlib.Path(__file__).parent.parent.parent / "native" / "pathtrace.cpp"
_SO = pathlib.Path(__file__).parent.parent / "data" / "libpathtrace.so"

_lib = None


def get_lib():
    global _lib
    if _lib is not None:
        return _lib
    if not _SO.exists() or (_SRC.exists()
                            and _SRC.stat().st_mtime > _SO.stat().st_mtime):
        if not _SRC.exists():
            return None
        try:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", str(_SRC),
                 "-o", str(_SO)],
                check=True, capture_output=True)
        except (subprocess.CalledProcessError, FileNotFoundError):
            return None
    lib = ctypes.CDLL(str(_SO))
    lib.trace_path_matrix.restype = ctypes.c_int64
    lib.find_neighbors.restype = ctypes.c_int64
    _lib = lib
    return lib


def _p(a, t):
    return a.ctypes.data_as(ctypes.POINTER(t))


def trace_path_matrix(grid, gi_host, to_ism: bool, max_entries=None):
    """COO (rows, cols, w_AU) of per-cell rays toward the star or the ISM.

    Returns None if the native library is unavailable.
    """
    lib = get_lib()
    if lib is None:
        return None
    n = grid.n_cells
    if max_entries is None:
        max_entries = 64 * n + 100000
    r_edges = np.ascontiguousarray(np.asarray(gi_host.r_edges), dtype=np.float64)
    z_edges = np.ascontiguousarray(np.asarray(gi_host.z_edges), dtype=np.float64)
    cell_of = np.ascontiguousarray(np.asarray(gi_host.cell_of), dtype=np.int32)
    rows = np.empty(max_entries, dtype=np.int64)
    cols = np.empty(max_entries, dtype=np.int64)
    w = np.empty(max_entries, dtype=np.float64)
    um = np.ascontiguousarray(grid.using, dtype=np.uint8)
    args = [
        ctypes.c_int64(n),
        _p(np.ascontiguousarray(grid.rmin), ctypes.c_double),
        _p(np.ascontiguousarray(grid.rmax), ctypes.c_double),
        _p(np.ascontiguousarray(grid.zmin), ctypes.c_double),
        _p(np.ascontiguousarray(grid.zmax), ctypes.c_double),
        _p(um, ctypes.c_uint8),
        _p(r_edges, ctypes.c_double), _p(z_edges, ctypes.c_double),
        _p(cell_of, ctypes.c_int32),
        ctypes.c_int64(z_edges.shape[0]),
        ctypes.c_int64(cell_of.shape[1]),
        ctypes.c_double(float(gi_host.rmin_dom)),
        ctypes.c_double(float(gi_host.rmax_dom)),
        ctypes.c_double(float(gi_host.zmax_dom)),
        ctypes.c_double(0.0), ctypes.c_double(0.0),
        ctypes.c_int32(1 if to_ism else 0),
        ctypes.c_int64(max_entries),
        _p(rows, ctypes.c_int64), _p(cols, ctypes.c_int64),
        _p(w, ctypes.c_double),
    ]
    n_out = lib.trace_path_matrix(*args)
    if n_out < 0:
        return trace_path_matrix(grid, gi_host, to_ism, max_entries * 4)
    return rows[:n_out], cols[:n_out], w[:n_out]

"""ctypes bridge to native/libekio.so — the C++ I/O fast paths.

Importing this module raises if the shared library is absent or unbuildable;
callers (tecplot.py, checkpoint.py) catch and fall back to pure Python.
Build: `make -C native` at the repo root (plain g++, no dependencies).
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..", "native")
)
_SO = os.path.join(_NATIVE_DIR, "libekio.so")

_i64 = ctypes.c_int64
_dp = ctypes.POINTER(ctypes.c_double)
_dpp = ctypes.POINTER(_dp)


def _load():
    if not os.path.exists(_SO) and os.environ.get("EKPNP_NO_NATIVE_BUILD") != "1":
        if os.path.exists(os.path.join(_NATIVE_DIR, "ekio.cpp")):
            subprocess.run(
                ["make", "-C", _NATIVE_DIR],
                check=True,
                capture_output=True,
                timeout=120,
            )
    lib = ctypes.CDLL(_SO)
    lib.ekio_format_tecplot.restype = ctypes.c_void_p
    lib.ekio_format_tecplot.argtypes = [_dpp, _i64, ctypes.POINTER(_i64)]
    lib.ekio_format_table.restype = ctypes.c_void_p
    lib.ekio_format_table.argtypes = [_dpp, _i64, _i64, ctypes.POINTER(_i64)]
    lib.ekio_parse_floats.restype = _i64
    lib.ekio_parse_floats.argtypes = [ctypes.c_char_p, _i64, _dp, _i64]
    lib.ekio_free.restype = None
    lib.ekio_free.argtypes = [ctypes.c_void_p]
    return lib


_lib = _load()


def _col_ptrs(cols):
    """Contiguous float64 views + a C array of their data pointers."""
    arrs = [np.ascontiguousarray(np.asarray(c).ravel(), np.float64) for c in cols]
    ptrs = (_dp * len(arrs))(*[a.ctypes.data_as(_dp) for a in arrs])
    return arrs, ptrs


def _take(ptr, length) -> str:
    try:
        return ctypes.string_at(ptr, length.value).decode("ascii")
    finally:
        _lib.ekio_free(ptr)


def format_tecplot(cols) -> str:
    """cols: 14 flat float64 arrays -> reference tecplot body string
    (8 '%g' + 6 '%10.6f' columns, LBM.cu:2555-2562)."""
    assert len(cols) == 14
    arrs, ptrs = _col_ptrs(cols)
    n = arrs[0].size
    length = _i64()
    ptr = _lib.ekio_format_tecplot(ptrs, n, ctypes.byref(length))
    if not ptr:
        raise MemoryError("ekio_format_tecplot")
    return _take(ptr, length)


def format_table(cols) -> str:
    """cols: list of flat float64 arrays (or an (n, ncols) table) ->
    all-'%10.6f' rows (data_end.dat layout, LBM.cu:2613-2624)."""
    if isinstance(cols, np.ndarray) and cols.ndim == 2:
        cols = [cols[:, j] for j in range(cols.shape[1])]
    arrs, ptrs = _col_ptrs(cols)
    n = arrs[0].size
    length = _i64()
    ptr = _lib.ekio_format_table(ptrs, n, len(arrs), ctypes.byref(length))
    if not ptr:
        raise MemoryError("ekio_format_table")
    return _take(ptr, length)


def parse_table(text: str, rows: int, cols: int) -> np.ndarray:
    """Parse a whitespace-separated float table (fast np.loadtxt)."""
    raw = text.encode("ascii")
    out = np.empty(rows * cols, dtype=np.float64)
    k = _lib.ekio_parse_floats(raw, len(raw), out.ctypes.data_as(_dp), out.size)
    if k != rows * cols:
        raise ValueError(f"expected {rows * cols} values, parsed {k}")
    return out.reshape(rows, cols)

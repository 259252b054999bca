"""ctypes bindings for the native C++ runtime pieces.

Builds ``libtranscar_native.so`` on first use (g++ via the Makefile) and
exposes:
  * ``lapjv``         — single rectangular assignment solve
  * ``lapjv_batched`` — batched solves without Python round-trips
Falls back cleanly (raises ImportError) when no compiler is available;
callers (ops/hungarian.py) degrade to scipy.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libtranscar_native.so")
_lib: Optional[ctypes.CDLL] = None


def _load() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO):
        subprocess.run(["make", "-C", _DIR], check=True,
                       capture_output=True)
    lib = ctypes.CDLL(_SO)
    lib.lapjv_solve.restype = ctypes.c_int
    lib.lapjv_solve.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int)]
    lib.lapjv_solve_batched.restype = ctypes.c_int
    lib.lapjv_solve_batched.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int),
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int)]
    _lib = lib
    return lib


def lapjv(cost: np.ndarray, n_rows: Optional[int] = None) -> np.ndarray:
    """cost: [R, C] float32 (R ≤ C).  Returns col4row [R] int32."""
    lib = _load()
    cost = np.ascontiguousarray(cost, np.float32)
    r, c = cost.shape
    n = r if n_rows is None else int(n_rows)
    out = np.full((r,), -1, np.int32)
    rc = lib.lapjv_solve(
        cost.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n, c,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
    if rc != 0:
        raise RuntimeError(f"lapjv_solve failed with code {rc}")
    return out


def lapjv_batched(costs: np.ndarray, n_rows_per: np.ndarray) -> np.ndarray:
    """costs: [B, R, C] float32; n_rows_per: [B] int32 → [B, R] int32."""
    lib = _load()
    costs = np.ascontiguousarray(costs, np.float32)
    n_rows_per = np.ascontiguousarray(n_rows_per, np.int32)
    b, r, c = costs.shape
    out = np.full((b, r), -1, np.int32)
    rc = lib.lapjv_solve_batched(
        costs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n_rows_per.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        b, r, c, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
    if rc != 0:
        raise RuntimeError(f"lapjv_solve_batched failed with code {rc}")
    return out

"""ctypes bindings for the native C++ runtime pieces.

Builds ``libtranscar_native.so`` on first use (g++ via the Makefile) and
exposes:
  * ``lapjv``           — single rectangular assignment solve
  * ``lapjv_batched``   — batched solves without Python round-trips
  * ``radar_featurize`` — the 36-dim radar tokenizer hot path
Falls back cleanly (raises on load failure) when no compiler is available;
callers (ops/hungarian.py, data/radar.py) degrade to scipy/numpy.
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


def _needs_build() -> bool:
    """mtime dependency check: rebuild when any source/Makefile is newer
    than the .so.  An exists-only check once left a stale build missing
    newer symbols (silently demoting the native JPEG path to PIL); pure
    mtime tracking keeps that guarantee WITHOUT forking `make` on every
    cold start — in a compilerless production image a fresh prebuilt .so
    loads with no subprocess at all."""
    if not os.path.exists(_SO):
        return True
    so_m = os.path.getmtime(_SO)
    return any(
        os.path.getmtime(os.path.join(_DIR, f)) > so_m
        for f in os.listdir(_DIR)
        if f.endswith((".cpp", ".cc", ".h")) or f == "Makefile")


def _load() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if _needs_build():
        try:
            subprocess.run(["make", "-C", _DIR], check=True,
                           capture_output=True)
        except (OSError, subprocess.CalledProcessError):
            if not os.path.exists(_SO):
                raise            # no compiler AND no prebuilt library
            # stale prebuilt: load it anyway — missing newer symbols
            # surface as AttributeError here and callers degrade
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


def radar_featurize(per_channel, rotations, ref_rot,
                    num_tokens: int = 1500, pad_value: float = 500.0,
                    point_range=(-51.2, -51.2, -5.0, 51.2, 51.2, 3.0)
                    ) -> np.ndarray:
    """Native counterpart of data.radar.build_radar_tokens.

    Args:
      per_channel: ordered list of (points [18, N] float32, times [1, N])
        per radar channel.
      rotations: matching list of [3, 3] float64 radar rotations.
      ref_rot: [3, 3] float64 LIDAR_TOP rotation.
    Returns:
      [num_tokens, 36] float32 token buffer.
    """
    lib = _load()
    if not hasattr(lib, "_radar_sig"):
        lib.radar_featurize.restype = ctypes.c_int
        lib.radar_featurize.argtypes = [
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_int), ctypes.c_int,
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_float), ctypes.c_float, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float)]
        lib._radar_sig = True

    n_ch = len(per_channel)
    pts = [np.ascontiguousarray(p, np.float32) for p, _ in per_channel]
    tms = [np.ascontiguousarray(t.reshape(-1), np.float32)
           for _, t in per_channel]
    counts = np.asarray([p.shape[1] for p in pts], np.int32)
    rots = np.ascontiguousarray(
        np.stack([np.asarray(r, np.float64) for r in rotations]).reshape(-1))
    refr = np.ascontiguousarray(np.asarray(ref_rot, np.float64).reshape(-1))
    rng6 = np.asarray(point_range, np.float32)
    out = np.empty((num_tokens, 36), np.float32)

    fptr = ctypes.POINTER(ctypes.c_float)
    pts_arr = (fptr * n_ch)(*[p.ctypes.data_as(fptr) for p in pts])
    tms_arr = (fptr * n_ch)(*[t.ctypes.data_as(fptr) for t in tms])
    lib.radar_featurize(
        pts_arr, tms_arr,
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), n_ch,
        rots.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        refr.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        rng6.ctypes.data_as(fptr), ctypes.c_float(pad_value), num_tokens,
        out.ctypes.data_as(fptr))
    return out


def decode_jpeg_multiview(datas, pad_h: int, pad_w: int) -> "np.ndarray":
    """Decode N JPEG byte strings into one pre-padded uint8 BGR stack.

    Returns ([N, pad_h, pad_w, 3] uint8, (h, w) of the first image).
    One native pass per image: libjpeg-turbo writes BGR scanlines
    directly into the padded slot (no flip/pad/stack copies — see
    jpeg_decode.cpp).  Raises on decode failure or images larger than
    the padded buffer; callers fall back to the PIL route."""
    lib = _load()
    if not hasattr(lib, "_jpeg_sig"):
        lib.jpeg_decode_bgr.restype = ctypes.c_int
        lib.jpeg_decode_bgr.argtypes = [
            ctypes.POINTER(ctypes.c_ubyte), ctypes.c_ulong,
            ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
        lib._jpeg_sig = True
    n = len(datas)
    out = np.zeros((n, pad_h, pad_w, 3), np.uint8)
    gh = ctypes.c_int(0)
    gw = ctypes.c_int(0)
    hw = None
    uptr = ctypes.POINTER(ctypes.c_ubyte)
    for i, data in enumerate(datas):
        buf = np.frombuffer(data, np.uint8)
        rc = lib.jpeg_decode_bgr(
            buf.ctypes.data_as(uptr), ctypes.c_ulong(len(data)),
            out[i].ctypes.data_as(uptr), pad_h, pad_w,
            ctypes.byref(gh), ctypes.byref(gw))
        if rc != 0:
            raise RuntimeError(f"jpeg_decode_bgr failed with code {rc}")
        if hw is None:
            hw = (gh.value, gw.value)
        elif hw != (gh.value, gw.value):
            raise RuntimeError("multi-view images disagree on size: "
                               f"{hw} vs {(gh.value, gw.value)}")
    return out, hw

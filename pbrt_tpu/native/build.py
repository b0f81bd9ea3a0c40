"""Compile + load the native helpers (ctypes, no pybind11 dependency).

The .so is built once into ~/.cache/pbrt_tpu (or alongside the source if
writable) and reloaded afterward; failures fall back to the pure-Python
implementations silently (the builders are drop-in equivalent).
"""

from __future__ import annotations

import ctypes
import hashlib
import logging
import os
import subprocess

import numpy as np

log = logging.getLogger("pbrt_tpu")
_SRC_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB = None
_TRIED = False


def _cache_dir():
    d = os.environ.get("PBRT_TPU_CACHE",
                       os.path.join(os.path.expanduser("~"), ".cache",
                                    "pbrt_tpu"))
    os.makedirs(d, exist_ok=True)
    return d


def load():
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    src = os.path.join(_SRC_DIR, "bvh_builder.cc")
    try:
        with open(src, "rb") as f:
            tag = hashlib.sha256(f.read()).hexdigest()[:16]
        out = os.path.join(_cache_dir(), f"libpbrt_native_{tag}.so")
        if not os.path.exists(out):
            cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                   "-std=c++17", src, "-o", out]
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        lib = ctypes.CDLL(out)
        lib.build_bvh_native.restype = ctypes.c_int64
        lib.build_bvh_native.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.c_int64, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32)]
        _LIB = lib
    except Exception as e:  # pragma: no cover - toolchain-dependent
        log.info("native helpers unavailable (%s); using numpy fallback", e)
        _LIB = None
    return _LIB


def build_bvh_native(prim_lo, prim_hi, max_leaf):
    """Returns (packed [N,8] f32, hit [8,N] i32, miss [8,N] i32,
    prim_order [P] i32) or None if the native library is unavailable."""
    lib = load()
    if lib is None:
        return None
    plo = np.ascontiguousarray(prim_lo, np.float64)
    phi = np.ascontiguousarray(prim_hi, np.float64)
    P = plo.shape[0]
    max_nodes = 2 * P + 2
    packed = np.zeros((max_nodes, 8), np.float32)
    hit = np.zeros(8 * max_nodes, np.int32)
    miss = np.zeros(8 * max_nodes, np.int32)
    order = np.zeros(P, np.int32)
    cptr = lambda a, t: a.ctypes.data_as(ctypes.POINTER(t))
    N = lib.build_bvh_native(
        cptr(plo, ctypes.c_double), cptr(phi, ctypes.c_double),
        ctypes.c_int64(P), ctypes.c_int(max_leaf),
        cptr(packed, ctypes.c_float), cptr(hit, ctypes.c_int32),
        cptr(miss, ctypes.c_int32), cptr(order, ctypes.c_int32))
    if N <= 0:
        return None
    # link tables were written with stride N (the real node count)
    hit = hit[:8 * N].reshape(8, N).copy()
    miss = miss[:8 * N].reshape(8, N).copy()
    return packed[:N].copy(), hit, miss, order


_EXR_LIB = None
_EXR_TRIED = False


def load_exr():
    """Compile + load the OpenEXR reader shim (native/exr_reader.cc).

    Links the system OpenEXR 3.1 — the same library the reference uses
    for ALL its EXR io (imageio.cpp:124+) — so PIZ/PXR24/B44/DWA files
    read natively; returns None (silent fallback) when the toolchain or
    the library is absent."""
    global _EXR_LIB, _EXR_TRIED
    if _EXR_LIB is not None or _EXR_TRIED:
        return _EXR_LIB
    _EXR_TRIED = True
    src = os.path.join(_SRC_DIR, "exr_reader.cc")
    try:
        with open(src, "rb") as f:
            tag = hashlib.sha256(f.read()).hexdigest()[:16]
        out = os.path.join(_cache_dir(), f"libpbrt_exr_{tag}.so")
        if not os.path.exists(out):
            cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
                   "-I/usr/include/OpenEXR", "-I/usr/include/Imath",
                   src, "-o", out, "-lOpenEXR-3_1", "-lIex-3_1",
                   "-lImath-3_1", "-lIlmThread-3_1", "-pthread"]
            subprocess.run(cmd, check=True, capture_output=True,
                           timeout=120)
        lib = ctypes.CDLL(out)
        lib.pbrt_exr_size.restype = ctypes.c_int
        lib.pbrt_exr_size.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int)]
        lib.pbrt_exr_read_rgba.restype = ctypes.c_int
        lib.pbrt_exr_read_rgba.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float)]
        _EXR_LIB = lib
    except Exception as e:  # pragma: no cover - toolchain-dependent
        log.info("native EXR reader unavailable (%s)", e)
        _EXR_LIB = None
    return _EXR_LIB


def read_exr_native(path):
    """[H,W,4] float32 RGBA via OpenEXR, or None if unavailable."""
    lib = load_exr()
    if lib is None:
        return None
    w = ctypes.c_int()
    h = ctypes.c_int()
    if lib.pbrt_exr_size(path.encode(), ctypes.byref(w),
                         ctypes.byref(h)) != 0:
        return None
    out = np.zeros((h.value, w.value, 4), np.float32)
    if lib.pbrt_exr_read_rgba(
            path.encode(),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float))) != 0:
        return None
    return out

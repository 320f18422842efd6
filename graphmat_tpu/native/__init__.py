"""Native (C++/OpenMP) runtime components, loaded via ctypes.

The compute path is JAX/XLA/Pallas; the *graph build* — sorting, greedy row
formation, chunk packing — is native, like the reference's header-only C++
tile constructors.  The shared library compiles lazily from the shipped
source with g++ on first use and is cached next to the source; everything
falls back to the pure-python implementations when no compiler is
available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "planner.cpp")
_LIB = os.path.join(_HERE, "libgmplanner.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
           _SRC, "-o", _LIB]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
        return True
    except Exception:
        return False


def load_planner():
    """Return the ctypes lib with argtypes configured, or None."""
    global _lib, _tried
    with _lock:
        if _lib is not None:
            return _lib
        if _tried:
            return None
        _tried = True
        if not os.path.exists(_LIB) or (
                os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        lib.gm_plan_create.restype = ctypes.c_void_p
        lib.gm_plan_create.argtypes = [
            i32p, i32p, f32p, ctypes.c_int64, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int64)]
        lib.gm_plan_fill.restype = None
        lib.gm_plan_fill.argtypes = [ctypes.c_void_p, i32p, i32p, i32p, i32p,
                                     f32p, f32p]
        lib.gm_plan_destroy.restype = None
        lib.gm_plan_destroy.argtypes = [ctypes.c_void_p]
        lib.gm_plan2_create.restype = ctypes.c_void_p
        lib.gm_plan2_create.argtypes = [
            i32p, i32p, f32p, ctypes.c_int64, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, i32p,
            ctypes.c_int32, ctypes.c_int64, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int64)]
        lib.gm_plan2_fill.restype = None
        lib.gm_plan2_fill.argtypes = [ctypes.c_void_p, i32p, i32p, i32p,
                                      i32p, i32p, i32p, f32p]
        lib.gm_plan2_destroy.restype = None
        lib.gm_plan2_destroy.argtypes = [ctypes.c_void_p]
        if hasattr(lib, "gm_plan2_eidx"):
            lib.gm_plan2_eidx.restype = None
            lib.gm_plan2_eidx.argtypes = [ctypes.c_void_p, i32p]
        if hasattr(lib, "gm_plan2m_eidx"):
            lib.gm_plan2m_eidx.restype = None
            lib.gm_plan2m_eidx.argtypes = [ctypes.c_void_p, i32p]
        if hasattr(lib, "gm_argsort_i64"):
            i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
            lib.gm_argsort_i64.restype = None
            lib.gm_argsort_i64.argtypes = [i64p, ctypes.c_int64, i64p]
        if hasattr(lib, "gm_plan2u_gspan"):
            lib.gm_plan2u_gspan.restype = None
            lib.gm_plan2u_gspan.argtypes = [ctypes.c_void_p, i32p, i32p]
        if hasattr(lib, "gm_plan2u_create"):
            lib.gm_plan2u_create.restype = ctypes.c_void_p
            i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
            lib.gm_plan2u_create.argtypes = [
                i32p, i32p, f32p, ctypes.c_int64, ctypes.c_int32,
                ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, i32p,
                ctypes.c_int32, i64p, i32p, ctypes.c_int32,
                ctypes.c_int32, ctypes.POINTER(ctypes.c_int64)]
            lib.gm_plan2u_fill.restype = None
            lib.gm_plan2u_fill.argtypes = [ctypes.c_void_p, i32p, i32p,
                                           i32p, i32p, f32p]
            lib.gm_plan2u_eidx.restype = None
            lib.gm_plan2u_eidx.argtypes = [ctypes.c_void_p, i32p]
            lib.gm_plan2u_destroy.restype = None
            lib.gm_plan2u_destroy.argtypes = [ctypes.c_void_p]
        lib.gm_plan2m_create.restype = ctypes.c_void_p
        lib.gm_plan2m_create.argtypes = [
            i32p, i32p, f32p, ctypes.c_int64, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, i32p,
            ctypes.c_int32, ctypes.c_int64, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int64)]
        lib.gm_plan2m_fill.restype = None
        lib.gm_plan2m_fill.argtypes = [ctypes.c_void_p, i32p, i32p, i32p,
                                       i32p, i32p, i32p, f32p]
        lib.gm_plan2m_destroy.restype = None
        lib.gm_plan2m_destroy.argtypes = [ctypes.c_void_p]
        lib.gm_planv_create.restype = ctypes.c_void_p
        lib.gm_planv_create.argtypes = [
            i32p, i32p, f32p, ctypes.c_int64, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, i32p,
            ctypes.c_int32, ctypes.c_int64, ctypes.c_int32,
            ctypes.c_int32, ctypes.POINTER(ctypes.c_int64)]
        lib.gm_planv_fill2.restype = None
        lib.gm_planv_fill2.argtypes = [ctypes.c_void_p, i32p, i32p, i32p,
                                       i32p, i32p, f32p, i32p]
        lib.gm_planv_destroy.restype = None
        lib.gm_planv_destroy.argtypes = [ctypes.c_void_p]
        lib.gm_tri_create.restype = ctypes.c_void_p
        lib.gm_tri_create.argtypes = [i32p, i32p, ctypes.c_int64,
                                      ctypes.c_int32,
                                      ctypes.POINTER(ctypes.c_int64)]
        lib.gm_tri_fill.restype = None
        lib.gm_tri_fill.argtypes = [ctypes.c_void_p, i32p, i32p, i32p,
                                    i32p]
        lib.gm_tri_destroy.restype = None
        lib.gm_tri_destroy.argtypes = [ctypes.c_void_p]
        if hasattr(lib, "gm_tc_create"):
            u32p = np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS")
            lib.gm_tc_create.restype = ctypes.c_void_p
            lib.gm_tc_create.argtypes = [
                i32p, i32p, ctypes.c_int64, ctypes.c_int32,
                ctypes.c_int32, ctypes.c_int32,
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int32)]
            lib.gm_tc_fill.restype = None
            lib.gm_tc_fill.argtypes = [ctypes.c_void_p, i32p, i32p, i32p,
                                       i32p, u32p, i32p, i32p, i32p,
                                       i32p, i32p]
            lib.gm_tc_destroy.restype = None
            lib.gm_tc_destroy.argtypes = [ctypes.c_void_p]
        if hasattr(lib, "gm_rmat_gen"):
            lib.gm_rmat_gen.restype = ctypes.c_int64
            lib.gm_rmat_gen.argtypes = [
                ctypes.c_int32, ctypes.c_int64, ctypes.c_double,
                ctypes.c_double, ctypes.c_double, ctypes.c_uint64,
                ctypes.c_int32, ctypes.c_int32, i32p, i32p, i32p]
        if hasattr(lib, "gm_glibc_square_mapping"):
            lib.gm_glibc_square_mapping.restype = None
            lib.gm_glibc_square_mapping.argtypes = [
                ctypes.c_int64, ctypes.c_uint32, i32p]
        if hasattr(lib, "gm_parse_text_edges"):
            lib.gm_parse_text_edges.restype = ctypes.c_int64
            lib.gm_parse_text_edges.argtypes = [
                ctypes.c_char_p, ctypes.c_int64, ctypes.c_int32, i32p,
                i32p, ctypes.c_void_p]
        _lib = lib
        return _lib


def native_available() -> bool:
    return load_planner() is not None

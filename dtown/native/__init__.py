"""ctypes binding for the native (C++) map compiler.

Auto-builds native/libdtown_mapc.so on first use (g++, no external
deps); falls back cleanly if the toolchain is unavailable — the python
compiler in dtown/map_loader.py remains the reference implementation and
tests cross-check the two (tests/test_native.py).
"""
from __future__ import annotations

import ctypes
import functools
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_SO = os.path.join(_NATIVE_DIR, "libdtown_mapc.so")

MAXG = 32
MAXC = 12
MAXO = 64
BANK = 2048
MAXW = (MAXG * MAXG + 3) // 4


class CMap(ctypes.Structure):
    _fields_ = [
        ("H", ctypes.c_int32),
        ("W", ctypes.c_int32),
        ("n_objects", ctypes.c_int32),
        ("max_objects", ctypes.c_int32),
        ("tile_size", ctypes.c_double),
        ("tile_kind", ctypes.c_int32 * (MAXG * MAXG)),
        ("tile_angle", ctypes.c_int32 * (MAXG * MAXG)),
        ("drivable", ctypes.c_uint8 * (MAXG * MAXG)),
        ("curves", ctypes.c_double * (MAXG * MAXG * MAXC * 4 * 3)),
        ("curve_mask", ctypes.c_uint8 * (MAXG * MAXG * MAXC)),
        ("obj_pos", ctypes.c_double * (MAXO * 3)),
        ("obj_y_rot", ctypes.c_double * MAXO),
        ("obj_scale", ctypes.c_double * MAXO),
        ("obj_height", ctypes.c_double * MAXO),
        ("obj_halfdims", ctypes.c_double * (MAXO * 2)),
        ("obj_corners", ctypes.c_double * (MAXO * 4 * 2)),
        ("obj_norms", ctypes.c_double * (MAXO * 2 * 2)),
        ("obj_safety_rad", ctypes.c_double * MAXO),
        ("obj_kind", ctypes.c_int32 * MAXO),
        ("obj_mask", ctypes.c_uint8 * MAXO),
        ("obj_optional", ctypes.c_uint8 * MAXO),
        ("obj_dynamic", ctypes.c_uint8 * MAXO),
        ("obj_walk_dist", ctypes.c_double * MAXO),
        ("spawn_pos", ctypes.c_double * (BANK * 3)),
        ("spawn_angle", ctypes.c_double * BANK),
        ("spawn_lane_deg", ctypes.c_double * BANK),
        ("spawn_mask", ctypes.c_uint8 * BANK),
        ("n_words", ctypes.c_int32),
        ("tile_words", ctypes.c_int32 * MAXW),
        ("obj_sincos", ctypes.c_double * (MAXO * 2)),
        ("obj_lmodel", ctypes.c_double * (MAXO * 3)),
        ("obj_bound_rad", ctypes.c_double * MAXO),
    ]


N_OBJ_KINDS = 21
P_MAX = 4


class CPrims(ctypes.Structure):
    _fields_ = [
        ("type", ctypes.c_int32 * (N_OBJ_KINDS * P_MAX)),
        ("center", ctypes.c_double * (N_OBJ_KINDS * P_MAX * 3)),
        ("param", ctypes.c_double * (N_OBJ_KINDS * P_MAX * 3)),
        ("color", ctypes.c_double * (N_OBJ_KINDS * P_MAX * 3)),
        ("mask", ctypes.c_uint8 * (N_OBJ_KINDS * P_MAX)),
        ("phase", ctypes.c_uint8 * (N_OBJ_KINDS * P_MAX)),
    ]


ABI_VERSION = 3


def _rebuild() -> bool:
    try:
        subprocess.run(
            ["sh", os.path.join(_NATIVE_DIR, "build.sh")],
            check=True, capture_output=True,
        )
        return True
    except Exception:
        return False


def _try_load() -> Optional[ctypes.CDLL]:
    """Load + bind + ABI-check the .so; None on any mismatch (a stale
    binary from a branch switch must degrade to the python compiler,
    never crash the import)."""
    try:
        lib = ctypes.CDLL(_SO)
        lib.dtown_compile_map.argtypes = [ctypes.c_char_p,
                                          ctypes.POINTER(CMap)]
        lib.dtown_compile_map.restype = ctypes.c_int
        lib.dtown_mapc_sizeof.restype = ctypes.c_int
        lib.dtown_mapc_abi_version.restype = ctypes.c_int
        lib.dtown_prim_tables.argtypes = [ctypes.POINTER(CPrims)]
        lib.dtown_prim_tables.restype = ctypes.c_int
        lib.dtown_prims_sizeof.restype = ctypes.c_int
    except (OSError, AttributeError):
        return None
    checks = {
        "CMap sizeof": (lib.dtown_mapc_sizeof(), ctypes.sizeof(CMap)),
        "CPrims sizeof": (lib.dtown_prims_sizeof(), ctypes.sizeof(CPrims)),
        "abi version": (lib.dtown_mapc_abi_version(), ABI_VERSION),
    }
    bad = {k: v for k, v in checks.items() if v[0] != v[1]}
    if bad:
        import logging

        logging.getLogger("dtown").warning(
            "native library ABI mismatch, rebuilding: %s", bad
        )
        return None
    return lib


@functools.lru_cache(maxsize=1)
def _lib() -> Optional[ctypes.CDLL]:
    stale = not os.path.exists(_SO) or (
        os.path.getmtime(_SO)
        < os.path.getmtime(os.path.join(_NATIVE_DIR, "mapc.cpp"))
    )
    if stale and not _rebuild():
        return None
    lib = _try_load()
    if lib is None and not stale:
        # mtime said fresh but symbols/ABI disagree (e.g. checkout order
        # gave the committed .so a newer mtime): force one rebuild
        if _rebuild():
            lib = _try_load()
    return lib


def available() -> bool:
    return _lib() is not None


def compile_map_native(path: str) -> dict:
    """Compile a map yaml with the C++ compiler -> dict of numpy arrays
    (unpadded to the map's actual H, W, max_objects)."""
    lib = _lib()
    if lib is None:
        raise RuntimeError("native map compiler unavailable")
    out = CMap()
    rc = lib.dtown_compile_map(path.encode(), ctypes.byref(out))
    if rc != 0:
        raise ValueError(f"native map compile failed (rc={rc}) for {path}")
    H, W, M = out.H, out.W, out.max_objects

    def arr(field, shape, dtype, crop):
        a = np.ctypeslib.as_array(getattr(out, field)).astype(dtype)
        a = a.reshape(shape)
        return a[crop].copy()

    g = (slice(0, H), slice(0, W))
    return dict(
        H=H, W=W, max_objects=M, n_objects=out.n_objects,
        tile_size=float(out.tile_size),
        tile_kind=arr("tile_kind", (MAXG, MAXG), np.int32, g),
        tile_angle=arr("tile_angle", (MAXG, MAXG), np.int32, g),
        drivable=arr("drivable", (MAXG, MAXG), bool, g),
        curves=arr("curves", (MAXG, MAXG, MAXC, 4, 3), np.float64, g),
        curve_mask=arr("curve_mask", (MAXG, MAXG, MAXC), bool, g),
        obj_pos=arr("obj_pos", (MAXO, 3), np.float64, slice(0, M)),
        obj_y_rot=arr("obj_y_rot", (MAXO,), np.float64, slice(0, M)),
        obj_scale=arr("obj_scale", (MAXO,), np.float64, slice(0, M)),
        obj_height=arr("obj_height", (MAXO,), np.float64, slice(0, M)),
        obj_halfdims=arr("obj_halfdims", (MAXO, 2), np.float64, slice(0, M)),
        obj_corners=arr("obj_corners", (MAXO, 4, 2), np.float64, slice(0, M)),
        obj_norms=arr("obj_norms", (MAXO, 2, 2), np.float64, slice(0, M)),
        obj_safety_rad=arr("obj_safety_rad", (MAXO,), np.float64, slice(0, M)),
        obj_kind=arr("obj_kind", (MAXO,), np.int32, slice(0, M)),
        obj_mask=arr("obj_mask", (MAXO,), bool, slice(0, M)),
        obj_optional=arr("obj_optional", (MAXO,), bool, slice(0, M)),
        obj_dynamic=arr("obj_dynamic", (MAXO,), bool, slice(0, M)),
        obj_walk_dist=arr("obj_walk_dist", (MAXO,), np.float64,
                          slice(0, M)),
        spawn_pos=arr("spawn_pos", (BANK, 3), np.float64, slice(None)),
        spawn_angle=arr("spawn_angle", (BANK,), np.float64, slice(None)),
        spawn_lane_deg=arr("spawn_lane_deg", (BANK,), np.float64, slice(None)),
        spawn_mask=arr("spawn_mask", (BANK,), bool, slice(None)),
        n_words=int(out.n_words),
        tile_words=arr("tile_words", (MAXW,), np.int32,
                       slice(0, out.n_words)),
        obj_sincos=arr("obj_sincos", (MAXO, 2), np.float64, slice(0, M)),
        obj_lmodel=arr("obj_lmodel", (MAXO, 3), np.float64, slice(0, M)),
        obj_bound_rad=arr("obj_bound_rad", (MAXO,), np.float64,
                          slice(0, M)),
    )


def prim_tables_native() -> dict:
    """Primitive render-model tables baked by the native compiler
    (mirrors dtown/render/meshes.py::prim_tables; cross-checked by
    tests/test_native.py)."""
    lib = _lib()
    if lib is None:
        raise RuntimeError("native map compiler unavailable")
    out = CPrims()
    rc = lib.dtown_prim_tables(ctypes.byref(out))
    if rc != 0:
        raise ValueError(f"native prim table bake failed (rc={rc})")

    def arr(field, shape, dtype):
        return np.ctypeslib.as_array(getattr(out, field)).astype(
            dtype
        ).reshape(shape).copy()

    K, P = N_OBJ_KINDS, P_MAX
    return dict(
        type=arr("type", (K, P), np.int32),
        center=arr("center", (K, P, 3), np.float64),
        param=arr("param", (K, P, 3), np.float64),
        color=arr("color", (K, P, 3), np.float64),
        mask=arr("mask", (K, P), bool),
        phase=arr("phase", (K, P), bool),
    )

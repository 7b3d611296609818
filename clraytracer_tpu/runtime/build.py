"""On-demand compilation + ctypes bindings for the native runtime."""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
from pathlib import Path

from clraytracer_tpu.utils.logging import get_logger

_NATIVE_DIR = Path(__file__).parent / "native"
_SOURCES = ["objparse.cpp", "bvh_native.cpp", "qlz.cpp"]

_lib: ctypes.CDLL | None = None
_tried = False


def _cache_path() -> Path:
    h = hashlib.sha256()
    for src in _SOURCES:
        h.update((_NATIVE_DIR / src).read_bytes())
    cache_dir = Path(
        os.environ.get("CLRT_NATIVE_CACHE", Path(tempfile.gettempdir()) / "clrt_native")
    )
    cache_dir.mkdir(parents=True, exist_ok=True)
    return cache_dir / f"libclrt_{h.hexdigest()[:16]}.so"


def _compile() -> Path | None:
    out = _cache_path()
    if out.exists():
        return out
    srcs = [str(_NATIVE_DIR / s) for s in _SOURCES]
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        "-pthread", "-o", str(out), *srcs,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return out
    except (OSError, subprocess.SubprocessError) as exc:
        get_logger().warning("native runtime build failed (%s); using Python fallbacks", exc)
        return None


def native_lib() -> ctypes.CDLL | None:
    """The compiled native library, or None when unavailable."""
    global _lib, _tried
    if _lib is None and not _tried:
        _tried = True
        if os.environ.get("CLRT_DISABLE_NATIVE"):
            return None
        so = _compile()
        if so is not None:
            lib = ctypes.CDLL(str(so))
            c_long_p = ctypes.POINTER(ctypes.c_long)
            c_f32_p = ctypes.POINTER(ctypes.c_float)
            c_i32_p = ctypes.POINTER(ctypes.c_int32)
            lib.clrt_obj_count.restype = ctypes.c_int
            lib.clrt_obj_count.argtypes = [ctypes.c_char_p, ctypes.c_long, c_long_p]
            lib.clrt_obj_parse.restype = ctypes.c_int
            lib.clrt_obj_parse.argtypes = [
                ctypes.c_char_p, ctypes.c_long,
                c_f32_p, c_f32_p, c_f32_p,
                c_i32_p, c_i32_p, c_i32_p, c_i32_p,
            ]
            lib.clrt_build_bvh.restype = ctypes.c_long
            lib.clrt_build_bvh.argtypes = [
                c_f32_p, c_f32_p, c_f32_p, ctypes.c_long,
                c_long_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                c_f32_p, c_f32_p, c_i32_p, c_i32_p, c_i32_p, c_i32_p,
                ctypes.c_long,
            ]
            _lib = lib
    return _lib


def native_available() -> bool:
    return native_lib() is not None

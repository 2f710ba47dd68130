"""Native (C++) host-side runtime components, loaded via ctypes.

The TPU compute path is JAX/Pallas; the host-side graph stages around it
(track building, keyframe assignment — the role COLMAP's C++ internals and
the reference's Python state machine play, see sfm/tracks.py) run as native
code. Sources live next to this file and are compiled on demand with g++
into a per-version cached .so; every entry point has a pure-Python fallback
so the framework works without a toolchain.
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
from pathlib import Path

_SRC_DIR = Path(__file__).parent
_LIB = None
_LIB_TRIED = False


def _build_and_load() -> ctypes.CDLL | None:
    src = _SRC_DIR / "trackgraph.cc"
    tag = hashlib.sha256(src.read_bytes()).hexdigest()[:16]
    cache_dir = Path(
        os.environ.get("OPST_NATIVE_CACHE", Path.home() / ".cache" / "onepose_st_tpu")
    )
    cache_dir.mkdir(parents=True, exist_ok=True)
    so_path = cache_dir / f"trackgraph_{tag}.so"
    if not so_path.exists():
        with tempfile.TemporaryDirectory() as td:
            tmp_so = Path(td) / so_path.name
            cmd = [
                "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                "-march=native", str(src), "-o", str(tmp_so),
            ]
            subprocess.run(cmd, check=True, capture_output=True)
            os.replace(tmp_so, so_path)  # atomic publish
    return ctypes.CDLL(str(so_path))


def get_lib() -> ctypes.CDLL | None:
    """The compiled library, or None if unavailable (no g++, build error)."""
    global _LIB, _LIB_TRIED
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    if os.environ.get("OPST_DISABLE_NATIVE"):
        return None
    try:
        lib = _build_and_load()
    except Exception:
        return None
    c = ctypes
    lib.opst_process.restype = c.c_void_p
    lib.opst_process.argtypes = [
        c.c_int, c.c_int, c.c_void_p, c.c_void_p, c.c_void_p, c.c_void_p,
        c.c_void_p, c.c_double, c.c_int, c.c_int,
    ]
    lib.opst_n_kpts.restype = c.c_int64
    lib.opst_n_kpts.argtypes = [c.c_void_p, c.c_int]
    lib.opst_get_kpts.argtypes = [c.c_void_p, c.c_int, c.c_void_p, c.c_void_p]
    lib.opst_n_match_rows.restype = c.c_int64
    lib.opst_n_match_rows.argtypes = [c.c_void_p]
    lib.opst_get_match_rows.argtypes = [c.c_void_p, c.c_void_p]
    lib.opst_n_tracks.restype = c.c_int64
    lib.opst_n_tracks.argtypes = [c.c_void_p]
    lib.opst_n_keyframes.restype = c.c_int
    lib.opst_n_keyframes.argtypes = [c.c_void_p]
    lib.opst_get_assigned.argtypes = [c.c_void_p] + [c.c_void_p] * 8
    lib.opst_free.argtypes = [c.c_void_p]
    _LIB = lib
    return _LIB


def available() -> bool:
    return get_lib() is not None

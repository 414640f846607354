"""ctypes binding for the native CSV parser (csrc/fast_csv.cpp).

Builds the shared library on first use (g++ -O3, cached beside the
package) and falls back to pandas transparently if the toolchain or
binary is unavailable.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Dict, Optional, Tuple

import numpy as np

_SRC = Path(__file__).resolve().parents[2] / "csrc" / "fast_csv.cpp"
_SO = Path(__file__).resolve().parent / "_fast_csv.so"

_lib = None
_build_failed = False


class _CsvResult(ctypes.Structure):
    _fields_ = [
        ("n_rows", ctypes.c_int64),
        ("n_objects", ctypes.c_int64),
        ("time", ctypes.POINTER(ctypes.c_double)),
        ("flux", ctypes.POINTER(ctypes.c_double)),
        ("flux_err", ctypes.POINTER(ctypes.c_double)),
        ("band", ctypes.POINTER(ctypes.c_int32)),
        ("obj_idx", ctypes.POINTER(ctypes.c_int32)),
        ("ids", ctypes.POINTER(ctypes.c_char)),  # null-SEPARATED, not a C string
        ("ids_len", ctypes.c_int64),
        ("error", ctypes.c_char_p),
    ]


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    if not _SO.exists() or (_SRC.exists()
                            and _SRC.stat().st_mtime > _SO.stat().st_mtime):
        if not _SRC.exists():
            _build_failed = True
            return None
        try:
            # temp-compile + atomic os.replace: a concurrent process must
            # never CDLL a partially written .so
            import os
            tmp = _SO.with_suffix(f".tmp{os.getpid()}.so")
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                 str(_SRC), "-o", str(tmp)],
                check=True, capture_output=True, timeout=120)
            os.replace(tmp, _SO)
        except Exception:
            _build_failed = True
            return None
    try:
        lib = ctypes.CDLL(str(_SO))
        lib.parse_lightcurves.restype = ctypes.POINTER(_CsvResult)
        lib.parse_lightcurves.argtypes = [ctypes.c_char_p]
        lib.free_result.argtypes = [ctypes.POINTER(_CsvResult)]
        _lib = lib
        return lib
    except OSError:
        _build_failed = True
        return None


def available() -> bool:
    return _load() is not None


def parse_lightcurves(path) -> Optional[Dict[str, np.ndarray]]:
    """Parse one lightcurve CSV natively. Returns dict with object_ids
    (str array), object_index, time, flux, flux_err, band — or None when
    the native path is unavailable."""
    lib = _load()
    if lib is None:
        return None
    res = lib.parse_lightcurves(str(path).encode())
    try:
        r = res.contents
        if r.error:
            raise ValueError(f"fast_csv: {r.error.decode()} ({path})")
        n = r.n_rows
        out = {
            "time": np.ctypeslib.as_array(r.time, (n,)).copy(),
            "flux": np.ctypeslib.as_array(r.flux, (n,)).copy(),
            "flux_err": np.ctypeslib.as_array(r.flux_err, (n,)).copy(),
            "band": np.ctypeslib.as_array(r.band, (n,)).copy(),
            "object_index": np.ctypeslib.as_array(r.obj_idx, (n,)).copy(),
        }
        raw = ctypes.string_at(r.ids, r.ids_len) if r.ids_len else b""
        ids = raw.decode().split("\0")[:-1]
        out["object_ids"] = np.array(ids)
        return out
    finally:
        lib.free_result(res)

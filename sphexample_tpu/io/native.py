"""ctypes bindings for the native C++ runtime components (native/).

The shared library is built on demand with g++ (cached next to the sources);
all callers fall back to pure-Python paths when the toolchain or library is
unavailable, so the framework works without a compiler.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libfastcsv.so"))
_SRC_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "fastcsv.cpp"))

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", _LIB_PATH, _SRC_PATH],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        # rebuild when the source is newer than the cached .so - an
        # existence-only check would silently keep serving a stale parser
        # after a fastcsv.cpp fix
        have_src = os.path.exists(_SRC_PATH)
        stale = (
            not os.path.exists(_LIB_PATH)
            or (have_src
                and os.path.getmtime(_SRC_PATH) > os.path.getmtime(_LIB_PATH))
        )
        if stale and (not have_src or not _build()):
            if not os.path.exists(_LIB_PATH):
                return None  # nothing to load; callers fall back to numpy
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        lib.fastcsv_header.argtypes = [ctypes.c_char_p, ctypes.c_char_p, ctypes.c_long]
        lib.fastcsv_header.restype = ctypes.c_int
        lib.fastcsv_count_rows.argtypes = [ctypes.c_char_p]
        lib.fastcsv_count_rows.restype = ctypes.c_long
        lib.fastcsv_read_columns.argtypes = [
            ctypes.c_char_p,
            np.ctypeslib.ndpointer(dtype=np.int32, flags="C_CONTIGUOUS"),
            ctypes.c_int,
            np.ctypeslib.ndpointer(dtype=np.float64, flags="C_CONTIGUOUS"),
            ctypes.c_long,
        ]
        lib.fastcsv_read_columns.restype = ctypes.c_long
        _lib = lib
        return _lib


def read_csv_columns(path: str, columns: List[str]) -> Optional[np.ndarray]:
    """Read the named columns as a [nrows, ncols] float64 array via the native
    parser; None if the native path is unavailable or a column is missing."""
    lib = get_lib()
    if lib is None:
        return None
    buf = ctypes.create_string_buffer(1 << 16)
    ncols_file = lib.fastcsv_header(path.encode(), buf, len(buf))
    if ncols_file <= 0:
        return None
    names = [n.decode() for n in buf.raw.split(b"\x00")[:ncols_file]]
    try:
        idx = np.asarray([names.index(c) for c in columns], dtype=np.int32)
    except ValueError:
        return None
    nrows = lib.fastcsv_count_rows(path.encode())
    if nrows < 0:
        return None
    out = np.empty((nrows, len(columns)), dtype=np.float64)
    got = lib.fastcsv_read_columns(path.encode(), idx, len(columns), out, nrows)
    if got < 0:
        return None
    return out[:got]

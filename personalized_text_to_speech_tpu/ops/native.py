"""ctypes bindings for the native C++/OpenMP host kernels (``native/``).

The on-device JAX/Pallas kernels are the production path; the native library
serves host-side tooling (offline alignment extraction on CPU machines) and
is an independent oracle for tests.  The library auto-builds with ``make``
on first use if a toolchain is present; everything degrades gracefully to
the numpy implementations otherwise.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libptts_mas.so")

_lib: Optional[ctypes.CDLL] = None
_load_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    try:
        if not os.path.exists(_LIB_PATH):
            subprocess.run(
                ["make", "-C", _NATIVE_DIR], check=True,
                capture_output=True, text=True,
            )
        lib = ctypes.CDLL(_LIB_PATH)
        lib.ptts_maximum_path.argtypes = [
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
        ]
        lib.ptts_maximum_path.restype = None
        _lib = lib
    except Exception:
        _load_failed = True
    return _lib


def native_available() -> bool:
    return _load() is not None


def maximum_path_native(
    neg_cent: np.ndarray,
    text_lengths: np.ndarray,
    spec_lengths: np.ndarray,
) -> np.ndarray:
    """Batched host MAS via the C++ kernel; same contract as
    :func:`personalized_text_to_speech_tpu.ops.mas.maximum_path_numpy`."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native MAS library unavailable (no toolchain?)")
    values = np.ascontiguousarray(neg_cent, dtype=np.float32).copy()
    b, t_y, t_x = values.shape
    paths = np.zeros((b, t_y, t_x), dtype=np.int32)
    t_ys = np.ascontiguousarray(spec_lengths, dtype=np.int32)
    t_xs = np.ascontiguousarray(text_lengths, dtype=np.int32)
    lib.ptts_maximum_path(
        paths.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        values.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        t_ys.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        t_xs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        b,
        t_y,
        t_x,
    )
    return paths.astype(np.float32)

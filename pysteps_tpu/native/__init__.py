"""
Native (C++/OpenMP) decode kernels for the IO data plane, bound via ctypes.

The library builds lazily on first use with the system g++; all callers
fall back to the NumPy path when the toolchain or binary is unavailable.
"""

import ctypes

import numpy as np

_lib = None
_tried = False


def get_lib():
    """Load (building if needed) the native decoder library, or None."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    from pysteps_tpu.native.build import build

    path = build()
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(path)
        lib.radolan_decode.argtypes = [
            ctypes.POINTER(ctypes.c_uint16), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.c_float,
        ]
        lib.pgm_decode.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.c_int, ctypes.c_float, ctypes.c_float,
            ctypes.c_float,
        ]
        lib.lut_apply_u8.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ]
        lib.calibrate_u16.argtypes = [
            ctypes.POINTER(ctypes.c_uint16), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.c_float, ctypes.c_float, ctypes.c_float,
            ctypes.c_float, ctypes.c_float,
        ]
        lib.omp_thread_count.restype = ctypes.c_int
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def radolan_decode(raw_u16, size, precision=0.1):
    """Native RADOLAN decode; returns float32 (size, size) or None if the
    native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    raw = np.ascontiguousarray(raw_u16[: size * size], dtype=np.uint16)
    out = np.empty((size, size), dtype=np.float32)
    lib.radolan_decode(
        raw.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        size, ctypes.c_float(precision),
    )
    return out


def pgm_decode(raw_bytes, n_pixels, bytes_per_px, nodata, offset, gain):
    """Native PGM payload decode; returns float32 1-D array or None."""
    lib = get_lib()
    if lib is None:
        return None
    raw = np.frombuffer(raw_bytes, dtype=np.uint8)
    out = np.empty(n_pixels, dtype=np.float32)
    lib.pgm_decode(
        raw.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n_pixels, bytes_per_px, ctypes.c_float(nodata),
        ctypes.c_float(offset), ctypes.c_float(gain),
    )
    return out


def calibrate_u16(raw_u16, gain, offset, nodata, undetect, undetect_value=0.0):
    """Native ODIM-style linear calibration; returns float32 array or None."""
    lib = get_lib()
    if lib is None:
        return None
    raw = np.ascontiguousarray(raw_u16, dtype=np.uint16)
    out = np.empty(raw.shape, dtype=np.float32)
    lib.calibrate_u16(
        raw.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        raw.size, ctypes.c_float(gain), ctypes.c_float(offset),
        ctypes.c_float(nodata), ctypes.c_float(undetect),
        ctypes.c_float(undetect_value),
    )
    return out

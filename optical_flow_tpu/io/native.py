"""ctypes binding to libofio.so (native libav decoder + libjpeg encoder).

The shared library is built from native/ofio.cpp; if missing it is built
on first import via make (g++ + pkg-config, both baked into the image).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libofio.so")

_lock = threading.Lock()
_lib = None


def _build() -> None:
    subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                   capture_output=True, text=True)


def get_lib() -> ctypes.CDLL:
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        src = os.path.join(_NATIVE_DIR, "ofio.cpp")
        if (not os.path.exists(_SO_PATH)
                or (os.path.exists(src)
                    and os.path.getmtime(src) > os.path.getmtime(_SO_PATH))):
            _build()
        lib = ctypes.CDLL(_SO_PATH)
        lib.ofio_open.argtypes = [ctypes.c_char_p]
        lib.ofio_open.restype = ctypes.c_void_p
        lib.ofio_props.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int)]
        lib.ofio_props.restype = ctypes.c_int
        lib.ofio_read_frame.argtypes = [
            ctypes.c_void_p, ctypes.c_double, ctypes.POINTER(ctypes.c_uint8)]
        lib.ofio_read_frame.restype = ctypes.c_int
        lib.ofio_meta.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_int)]
        lib.ofio_meta.restype = ctypes.c_int
        lib.ofio_close.argtypes = [ctypes.c_void_p]
        lib.ofio_close.restype = None
        lib.ofio_jpeg_write.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
            ctypes.c_int, ctypes.c_int]
        lib.ofio_jpeg_write.restype = ctypes.c_int
        _lib = lib
        return _lib

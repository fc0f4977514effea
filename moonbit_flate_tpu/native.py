"""ctypes bindings for the native host codec (native/flate_native.c).

Builds the shared library on first use (gcc -O3); falls back cleanly if a
compiler is unavailable — callers check ``available()`` and use the pure
Python oracle instead.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_LOCK = threading.Lock()
_LIB = None
_TRIED = False

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libflate_native.so")


def _load():
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        src = os.path.join(_NATIVE_DIR, "flate_native.c")
        try:
            if (not os.path.exists(_SO_PATH)
                    or os.path.getmtime(_SO_PATH) < os.path.getmtime(src)):
                subprocess.run(
                    ["make", "-C", _NATIVE_DIR, "all"],
                    check=True, capture_output=True,
                )
            lib = ctypes.CDLL(_SO_PATH)
        except (OSError, subprocess.CalledProcessError):
            return None
        lib.mf_deflate_fast.restype = ctypes.c_long
        lib.mf_deflate_fast.argtypes = [
            ctypes.c_char_p, ctypes.c_long, ctypes.c_char_p, ctypes.c_long]
        lib.mf_inflate.restype = ctypes.c_long
        lib.mf_inflate.argtypes = [
            ctypes.c_char_p, ctypes.c_long, ctypes.c_char_p, ctypes.c_long]
        lib.mf_inflate_dict.restype = ctypes.c_long
        lib.mf_inflate_dict.argtypes = [
            ctypes.c_char_p, ctypes.c_long, ctypes.c_char_p, ctypes.c_long,
            ctypes.c_char_p, ctypes.c_long]
        _LIB = lib
        return _LIB


def available() -> bool:
    return _load() is not None


def compress(data: bytes, dictionary: bytes | None = None) -> bytes:
    """Exact reference-policy BestSpeed compression (native fast path).

    Writer-dict prepend semantics (SURVEY §2.9.3): with a dictionary, the
    stream is compress(dict[-32K:] + data) — byte-identical to the
    reference's Writer::new_dict behavior for one-shot use.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native codec unavailable")
    if dictionary:
        data = bytes(dictionary)[-32768:] + bytes(data)
    data = bytes(data)
    cap = len(data) + (len(data) >> 3) + 1024
    out = ctypes.create_string_buffer(cap)
    res = lib.mf_deflate_fast(data, len(data), out, cap)
    if res < 0:
        raise RuntimeError(f"native deflate failed: {res}")
    return out.raw[:res]


def decompress(data: bytes, dictionary: bytes = b"",
               max_output: int | None = None) -> bytes:
    """Fast native raw-DEFLATE decode with reader-style preset dict."""
    from .utils.errors import CorruptInputError, UnexpectedEOFError

    lib = _load()
    if lib is None:
        raise RuntimeError("native codec unavailable")
    data = bytes(data)
    cap = max_output if max_output is not None else max(1024, len(data) * 4)
    while True:
        out = ctypes.create_string_buffer(cap)
        res = lib.mf_inflate_dict(data, len(data), out, cap,
                                  bytes(dictionary), len(dictionary))
        if res == -5 and max_output is None:  # output buffer too small
            cap *= 4
            continue
        if res == -4:
            raise UnexpectedEOFError()
        if res < 0:
            raise CorruptInputError(-1)
        return out.raw[:res]

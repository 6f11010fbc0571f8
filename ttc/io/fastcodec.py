"""ctypes bindings for the native fastcodec library.

Multithreaded deflate + uint16/float32 codecs for the host IO path
(native/fastcodec.cpp). Loads lazily; every caller has a pure-Python
fallback, so the library is an accelerator, never a requirement.
Build with tools/build_native.sh.

NB: the dev container exposes a single CPU core, so parallel speedups
only materialize on production hosts; parity is tested everywhere.
"""
from __future__ import annotations

import ctypes
import os
import zlib

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "..", "..",
                         "native", "build", "libfastcodec.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.fc_deflate_strips.restype = ctypes.c_int
    lib.fc_deflate_strips.argtypes = [
        ctypes.c_void_p, ctypes.c_size_t, ctypes.c_int, ctypes.c_void_p,
        ctypes.c_size_t, ctypes.POINTER(ctypes.c_size_t), ctypes.c_int,
        ctypes.c_int]
    lib.fc_inflate_strips.restype = ctypes.c_int
    lib.fc_inflate_strips.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_size_t),
        ctypes.POINTER(ctypes.c_size_t), ctypes.c_int, ctypes.c_void_p,
        ctypes.c_size_t, ctypes.c_int]
    lib.fc_u16_to_f32.restype = None
    lib.fc_u16_to_f32.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                  ctypes.c_size_t, ctypes.c_int]
    lib.fc_f32_to_u16.restype = None
    lib.fc_f32_to_u16.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                  ctypes.c_size_t, ctypes.c_int]
    if hasattr(lib, "fc_encode_s2_compact"):
        lib.fc_encode_s2_compact.restype = None
        lib.fc_encode_s2_compact.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def deflate_strips(data: bytes | np.ndarray, n_strips: int,
                   level: int = 6, n_threads: int | None = None) -> list[bytes]:
    """Compress `data` as n_strips equal strips (last strip handled by
    the caller splitting evenly). Falls back to serial zlib."""
    n_threads = n_threads or os.cpu_count() or 1
    buf = np.frombuffer(data, np.uint8) if isinstance(data, bytes) \
        else np.ascontiguousarray(data).view(np.uint8).ravel()
    if len(buf) % n_strips:
        raise ValueError("data length must divide n_strips")
    strip_len = len(buf) // n_strips
    lib = _load()
    if lib is None:
        return [zlib.compress(
            buf[i * strip_len:(i + 1) * strip_len].tobytes(), level)
            for i in range(n_strips)]

    cap = strip_len + strip_len // 1000 + 64
    out = np.empty(n_strips * cap, np.uint8)
    lens = (ctypes.c_size_t * n_strips)()
    rc = lib.fc_deflate_strips(
        buf.ctypes.data_as(ctypes.c_void_p), strip_len, n_strips,
        out.ctypes.data_as(ctypes.c_void_p), cap, lens, level, n_threads)
    if rc != 0:
        raise RuntimeError(f"fc_deflate_strips failed: {rc}")
    return [out[i * cap:i * cap + lens[i]].tobytes()
            for i in range(n_strips)]


def inflate_strips(strips: list[bytes], strip_len: int,
                   n_threads: int | None = None) -> bytes:
    n_threads = n_threads or os.cpu_count() or 1
    lib = _load()
    if lib is None:
        return b"".join(zlib.decompress(s) for s in strips)
    n = len(strips)
    blob = b"".join(strips)
    src = np.frombuffer(blob, np.uint8)
    offsets = (ctypes.c_size_t * n)()
    in_lens = (ctypes.c_size_t * n)()
    off = 0
    for i, s in enumerate(strips):
        offsets[i] = off
        in_lens[i] = len(s)
        off += len(s)
    dst = np.empty(n * strip_len, np.uint8)
    rc = lib.fc_inflate_strips(
        src.ctypes.data_as(ctypes.c_void_p), offsets, in_lens, n,
        dst.ctypes.data_as(ctypes.c_void_p), strip_len, n_threads)
    if rc != 0:
        raise RuntimeError(f"fc_inflate_strips failed: {rc}")
    return dst.tobytes()


def u16_to_f32(arr: np.ndarray, n_threads: int | None = None) -> np.ndarray:
    n_threads = n_threads or os.cpu_count() or 1
    arr = np.ascontiguousarray(arr, np.uint16)
    lib = _load()
    if lib is None:
        return (arr / 65535.0).astype(np.float32)
    out = np.empty(arr.shape, np.float32)
    lib.fc_u16_to_f32(arr.ctypes.data_as(ctypes.c_void_p),
                      out.ctypes.data_as(ctypes.c_void_p), arr.size,
                      n_threads)
    return out


def encode_s2_compact_native(stack_u16: np.ndarray,
                             n_threads: int | None = None):
    """Native compact-wire S2 encode (see ttc/io/wire.py for the
    format contract and the encoder-equivalence note). Returns
    (data, sc) like wire.encode_s2_compact, or None when the library
    isn't built (callers fall back to numpy). The fused C++ pass
    replaces ~1.9 s/tile of numpy temporaries with ~0.4 s at
    production geometry on the 1-core host."""
    lib = _load()
    if lib is None or not hasattr(lib, "fc_encode_s2_compact"):
        return None
    n_threads = n_threads or os.cpu_count() or 1
    stack = np.ascontiguousarray(stack_u16, np.uint16)
    t, h, w, b = stack.shape
    if t > 64 or b > 64:
        return None                      # fixed native scratch bound
    data = np.empty((t + 1, h, w, b), np.int8)
    sc = np.empty((t + 2, b), np.float32)
    lib.fc_encode_s2_compact(
        stack.ctypes.data_as(ctypes.c_void_p), t, h, w, b,
        data.ctypes.data_as(ctypes.c_void_p),
        sc.ctypes.data_as(ctypes.c_void_p), n_threads)
    return data, sc


def f32_to_u16(arr: np.ndarray, n_threads: int | None = None) -> np.ndarray:
    n_threads = n_threads or os.cpu_count() or 1
    arr = np.ascontiguousarray(arr, np.float32)
    lib = _load()
    if lib is None:
        return np.trunc(np.clip(arr, 0, 1) * 65535).astype(np.uint16)
    out = np.empty(arr.shape, np.uint16)
    lib.fc_f32_to_u16(arr.ctypes.data_as(ctypes.c_void_p),
                      out.ctypes.data_as(ctypes.c_void_p), arr.size,
                      n_threads)
    return out

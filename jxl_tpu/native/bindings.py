"""ctypes bindings for the native host core (native/jxt_native.cpp).

The library is built on demand (one g++ invocation, no deps); every entry
point degrades gracefully when the toolchain is unavailable — the JAX
implementations are always the source of truth, the native core is the
host-side fast path + cross-implementation conformance check.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_LIB = None
_LOCK = threading.Lock()
_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libjxt_native.so")


def _load():
    global _LIB
    with _LOCK:
        if _LIB is not None:
            return _LIB
        if not os.path.exists(_SO_PATH):
            try:
                subprocess.run(
                    ["sh", os.path.join(_NATIVE_DIR, "build.sh")],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
            except Exception:
                _LIB = False
                return _LIB
        try:
            lib = ctypes.CDLL(_SO_PATH)
        except OSError:
            _LIB = False
            return _LIB

        u16p = np.ctypeslib.ndpointer(np.uint16, flags="C_CONTIGUOUS")
        u32p = np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        i64 = ctypes.c_int64
        i32 = ctypes.c_int32

        i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        lib.rans_encode.restype = ctypes.c_int
        lib.rans_encode.argtypes = [i32p, i32p, i64, u32p, u32p, i32, i32, i64, u16p, i64p, u32p]
        lib.rans_decode.restype = ctypes.c_int
        lib.rans_decode.argtypes = [u16p, i64, u32p, i64, i32p, u32p, u32p, i32, i32, i32p]
        lib.pack_bits.restype = None
        lib.pack_bits.argtypes = [i32p, u32p, i64, u32p, i64]
        lib.unpack_bits.restype = None
        lib.unpack_bits.argtypes = [i32p, u32p, i64, u32p]
        _LIB = lib
        return _LIB


def available() -> bool:
    return _load() is not False


def rans_encode_native(tokens, ctx, freq, cum, lanes: int):
    """Host rANS encode; returns (words_flat [cap] u16, n_words, states)
    with the same consumption-order layout as entropy.rans.rans_encode."""
    lib = _load()
    assert lib, "native core unavailable"
    tokens = np.ascontiguousarray(tokens, np.int32)
    ctx = np.ascontiguousarray(ctx, np.int32)
    freq = np.ascontiguousarray(freq, np.uint32)
    cum = np.ascontiguousarray(cum, np.uint32)
    n = tokens.shape[0]
    cap = max(1, -(-n // lanes)) * lanes
    words = np.zeros(cap, np.uint16)
    n_words = np.zeros(1, np.int64)
    states = np.zeros(lanes, np.uint32)
    rc = lib.rans_encode(
        tokens, ctx, n, freq.reshape(-1), cum.reshape(-1), freq.shape[1], lanes, cap, words, n_words, states
    )
    assert rc == 0, f"native rans_encode failed rc={rc}"
    return words, int(n_words[0]), states


def rans_decode_native(words_flat, n_words, states, ctx, freq, cum, n: int, lanes: int):
    lib = _load()
    assert lib, "native core unavailable"
    words_flat = np.ascontiguousarray(words_flat, np.uint16)
    states = np.ascontiguousarray(states, np.uint32)
    ctx = np.ascontiguousarray(ctx, np.int32)
    freq = np.ascontiguousarray(freq, np.uint32)
    cum = np.ascontiguousarray(cum, np.uint32)
    out = np.zeros(n, np.int32)
    rc = lib.rans_decode(
        words_flat, int(n_words), states, n, ctx, freq.reshape(-1), cum.reshape(-1), freq.shape[1], lanes, out
    )
    assert rc == 0, f"native rans_decode failed rc={rc}"
    return out


def pack_bits_native(nbits, mantissa, n_words: int):
    lib = _load()
    assert lib, "native core unavailable"
    nbits = np.ascontiguousarray(nbits, np.int32)
    mantissa = np.ascontiguousarray(mantissa, np.uint32)
    out = np.zeros(n_words, np.uint32)
    lib.pack_bits(nbits, mantissa, nbits.shape[0], out, n_words)
    return out


def unpack_bits_native(nbits, words):
    lib = _load()
    assert lib, "native core unavailable"
    nbits = np.ascontiguousarray(nbits, np.int32)
    words = np.ascontiguousarray(words, np.uint32)
    out = np.zeros(nbits.shape[0], np.uint32)
    lib.unpack_bits(nbits, words, nbits.shape[0], out)
    return out

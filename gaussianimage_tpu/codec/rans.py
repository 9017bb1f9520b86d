"""rANS entropy coder — Python binding to the C++ coder (csrc/rans.cpp) with a
bit-exact NumPy fallback. Native replacement for the reference's constriction
Rust wheel (usage contract at reference quantize.py:152-180): stack ANS over a
categorical model, 16-bit quantized frequencies, 16-bit renorm words.

The C extension is built on first use with g++ into csrc/librans.so (cached);
if no compiler is available the NumPy implementation is used. Both produce an
identical bitstream (tests/test_codec.py checks cross-decoding).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_SCALE_BITS = 16
_M = 1 << _SCALE_BITS
_CSRC = os.path.join(os.path.dirname(__file__), "..", "csrc")
_LIB: Optional[ctypes.CDLL] = None
_LIB_TRIED = False


def _build_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _LIB_TRIED
    if _LIB is not None or _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    src = os.path.join(_CSRC, "rans.cpp")
    so = os.path.join(_CSRC, "librans.so")
    try:
        if (not os.path.exists(so)
                or os.path.getmtime(so) < os.path.getmtime(src)):
            subprocess.run(
                ["g++", "-O2", "-shared", "-fPIC", "-o", so, src],
                check=True, capture_output=True)
        lib = ctypes.CDLL(so)
        lib.rans_encode.restype = ctypes.c_int
        lib.rans_decode.restype = ctypes.c_int
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def quantize_freqs(counts: np.ndarray) -> np.ndarray:
    """Quantize symbol counts to frequencies summing to exactly 2^16, every
    occurring symbol >= 1. Deterministic (shared by encoder and decoder)."""
    counts = np.asarray(counts, np.float64)
    assert counts.ndim == 1 and (counts > 0).all(), "drop zero-count symbols first"
    probs = counts / counts.sum()
    freqs = np.maximum(1, np.round(probs * _M)).astype(np.int64)
    # repair the sum by walking the largest entries
    diff = int(_M - freqs.sum())
    order = np.argsort(-freqs)
    i = 0
    while diff != 0:
        j = order[i % len(order)]
        step = 1 if diff > 0 else -1
        if freqs[j] + step >= 1:
            freqs[j] += step
            diff -= step
        i += 1
    return freqs.astype(np.uint32)


def _tables(freqs: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    freqs = np.asarray(freqs, np.uint32)
    cum = np.zeros_like(freqs)
    cum[1:] = np.cumsum(freqs)[:-1].astype(np.uint32)
    return freqs, cum


def _encode_numpy(symbols, freqs, cum) -> np.ndarray:
    out = []
    x = 1 << 16
    for s in symbols:
        f = int(freqs[s])
        c = int(cum[s])
        while x >= (f << 16):
            out.append(x & 0xFFFF)
            x >>= 16
        x = ((x // f) << 16) + (x % f) + c
    out.append(x & 0xFFFF)
    out.append(x >> 16)
    return np.asarray(out, np.uint16)


def _decode_numpy(words, freqs, cum, n) -> np.ndarray:
    lookup = np.zeros(_M, np.int32)
    for s, (c, f) in enumerate(zip(cum, freqs)):
        lookup[int(c):int(c) + int(f)] = s
    pos = len(words)
    x = int(words[pos - 1]) << 16 | int(words[pos - 2])
    pos -= 2
    out = np.empty(n, np.int32)
    for i in range(n):
        slot = x & 0xFFFF
        s = int(lookup[slot])
        out[i] = s
        x = int(freqs[s]) * (x >> 16) + slot - int(cum[s])
        while x < (1 << 16):
            pos -= 1
            x = (x << 16) | int(words[pos])
    return out


def encode(symbols: np.ndarray, freqs: np.ndarray,
           use_native: Optional[bool] = None) -> np.ndarray:
    """Encode int32 symbol indices with the given quantized frequency table.
    Symbols are encoded in reverse (stack semantics) so ``decode`` returns
    them in forward order. Returns uint16 words."""
    symbols = np.ascontiguousarray(symbols, np.int32)[::-1].copy()
    freqs, cum = _tables(freqs)
    n = len(symbols)
    if n == 0:
        return np.zeros(0, np.uint16)
    lib = _build_lib() if use_native in (None, True) else None
    if lib is not None and use_native is not False:
        cap = 2 * n + 64
        out = np.empty(cap, np.uint16)
        written = lib.rans_encode(
            symbols.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), n,
            freqs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            cum.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), len(freqs),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)), cap)
        if written > 0:
            return out[:written].copy()
    return _encode_numpy(symbols, freqs, cum)


def decode(words: np.ndarray, freqs: np.ndarray, n: int,
           use_native: Optional[bool] = None) -> np.ndarray:
    """Decode n symbols (forward order)."""
    if n == 0:
        return np.zeros(0, np.int32)
    words = np.ascontiguousarray(words, np.uint16)
    freqs, cum = _tables(freqs)
    lib = _build_lib() if use_native in (None, True) else None
    if lib is not None and use_native is not False:
        out = np.empty(n, np.int32)
        rc = lib.rans_decode(
            words.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)), len(words),
            freqs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            cum.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), len(freqs),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), n)
        if rc == 0:
            return out
    return _decode_numpy(words, freqs, cum, n)


def native_available() -> bool:
    return _build_lib() is not None

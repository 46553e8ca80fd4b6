"""ctypes bindings for the native host codec runtime (native/kzg_host.cpp).

The reference's host-side point serde is native code (blst FFI,
src/curves.rs:99-183); this module is the equivalent boundary here: batched
48-byte G1 compressed-point parse/validate/compress and Fr byte codecs
operating directly on the framework's (24, n)/(16, n) uint32 limb layouts.

All callers degrade gracefully to the pure-Python hostmath paths when the
shared library has not been built (`make -C native`); an auto-build is
attempted once per process (a few seconds, silent on failure).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libkzg_host.so")

_LIB: ctypes.CDLL | None | bool = None  # None = not tried, False = unavailable


def _load() -> ctypes.CDLL | None:
    global _LIB
    if _LIB is None:
        if os.environ.get("KZG_TPU_NO_NATIVE"):
            _LIB = False
        else:
            if not os.path.exists(_SO_PATH):
                try:  # one silent build attempt
                    subprocess.run(
                        ["make", "-C", _NATIVE_DIR],
                        capture_output=True,
                        timeout=120,
                        check=True,
                    )
                except Exception:
                    pass
            try:
                lib = ctypes.CDLL(_SO_PATH)
                if lib.kzg_selftest() != 0:
                    raise OSError("kzg_host selftest failed")
                lib.kzg_g1_parse_batch.restype = ctypes.c_long
                lib.kzg_g2_parse_batch.restype = ctypes.c_long
                lib.kzg_g1_decompress_batch.restype = ctypes.c_long
                lib.kzg_g1_compress_batch.restype = ctypes.c_long
                lib.kzg_fr_from_le_bytes_batch.restype = ctypes.c_long
                lib.kzg_fr_to_le_bytes_batch.restype = ctypes.c_long
                _LIB = lib
            except (OSError, AttributeError):
                # missing library, failed selftest, or a stale .so without a
                # newer symbol — treat all as unavailable
                _LIB = False
    return _LIB or None


def available() -> bool:
    return _load() is not None


def _u8(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _u32(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32))


def g1_parse_batch(blob: bytes, n: int):
    """48n compressed bytes -> (x std-limbs (24, n) u32, sign (n,), inf (n,)).

    Returns None if the native library is unavailable; raises ValueError with
    the failing point index on malformed input (same validation rules as
    ops/codec.parse_g1_compressed)."""
    lib = _load()
    if lib is None:
        return None
    data = np.frombuffer(blob, dtype=np.uint8)
    x = np.empty((24, n), dtype=np.uint32)
    sign = np.empty(n, dtype=np.uint8)
    inf = np.empty(n, dtype=np.uint8)
    rc = lib.kzg_g1_parse_batch(_u8(data), ctypes.c_size_t(n), _u32(x), _u8(sign), _u8(inf))
    if rc != 0:
        raise ValueError(f"malformed compressed G1 point at index {rc - 1}")
    return x, sign.astype(bool), inf.astype(bool)


def g2_parse_batch(blob: bytes, n: int):
    """96n compressed G2 bytes -> (x std-limbs (24, 2, n) u32, sign (n,),
    inf (n,)). Component axis holds (c0, c1). Returns None if the native
    library is unavailable; raises ValueError with the failing point index on
    malformed input (same validation rules as ops/codec.parse_g2_compressed)."""
    lib = _load()
    if lib is None:
        return None
    data = np.frombuffer(blob, dtype=np.uint8)
    x = np.empty((24, 2, n), dtype=np.uint32)
    sign = np.empty(n, dtype=np.uint8)
    inf = np.empty(n, dtype=np.uint8)
    rc = lib.kzg_g2_parse_batch(_u8(data), ctypes.c_size_t(n), _u32(x), _u8(sign), _u8(inf))
    if rc != 0:
        raise ValueError(f"malformed compressed G2 point at index {rc - 1}")
    return x, sign.astype(bool), inf.astype(bool)


def g1_decompress_batch(blob: bytes, n: int):
    """Full host-side decompression (native Fp sqrt): returns
    (x, y std-limbs (24, n), inf (n,)) or None if unavailable. Raises
    ValueError (with index) on malformed/not-on-curve points."""
    lib = _load()
    if lib is None:
        return None
    data = np.frombuffer(blob, dtype=np.uint8)
    x = np.empty((24, n), dtype=np.uint32)
    y = np.empty((24, n), dtype=np.uint32)
    inf = np.empty(n, dtype=np.uint8)
    rc = lib.kzg_g1_decompress_batch(_u8(data), ctypes.c_size_t(n), _u32(x), _u32(y), _u8(inf))
    if rc != 0:
        raise ValueError(f"invalid compressed G1 point at index {rc - 1}")
    return x, y, inf.astype(bool)


def g1_compress_batch(x_limbs: np.ndarray, y_limbs: np.ndarray, inf_mask) -> bytes | None:
    """std-form affine limb arrays (24, n) + inf mask -> 48n compressed bytes,
    or None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    x = np.ascontiguousarray(x_limbs, dtype=np.uint32)
    y = np.ascontiguousarray(y_limbs, dtype=np.uint32)
    n = x.shape[1]
    inf = (
        np.ascontiguousarray(inf_mask, dtype=np.uint8)
        if inf_mask is not None
        else np.zeros(n, dtype=np.uint8)
    )
    out = np.empty(48 * n, dtype=np.uint8)
    rc = lib.kzg_g1_compress_batch(_u32(x), _u32(y), _u8(inf), ctypes.c_size_t(n), _u8(out))
    if rc != 0:
        raise ValueError(f"coordinate out of range at index {rc - 1}")
    return out.tobytes()


def g1_on_curve_batch(x_limbs: np.ndarray, y_limbs: np.ndarray, inf_mask) -> np.ndarray | None:
    lib = _load()
    if lib is None:
        return None
    x = np.ascontiguousarray(x_limbs, dtype=np.uint32)
    y = np.ascontiguousarray(y_limbs, dtype=np.uint32)
    n = x.shape[1]
    inf = (
        np.ascontiguousarray(inf_mask, dtype=np.uint8)
        if inf_mask is not None
        else np.zeros(n, dtype=np.uint8)
    )
    ok = np.empty(n, dtype=np.uint8)
    lib.kzg_g1_on_curve_batch(_u32(x), _u32(y), _u8(inf), ctypes.c_size_t(n), _u8(ok))
    return ok.astype(bool)


def fr_from_le_bytes_batch(blob: bytes, n: int) -> np.ndarray | None:
    """32n little-endian scalar bytes -> (16, n) u32 limbs (no reduction)."""
    lib = _load()
    if lib is None:
        return None
    data = np.frombuffer(blob, dtype=np.uint8)
    limbs = np.empty((16, n), dtype=np.uint32)
    lib.kzg_fr_from_le_bytes_batch(_u8(data), ctypes.c_size_t(n), _u32(limbs))
    return limbs


def fr_to_le_bytes_batch(limbs: np.ndarray) -> bytes | None:
    lib = _load()
    if lib is None:
        return None
    arr = np.ascontiguousarray(limbs, dtype=np.uint32)
    n = arr.shape[1]
    out = np.empty(32 * n, dtype=np.uint8)
    lib.kzg_fr_to_le_bytes_batch(_u32(arr), ctypes.c_size_t(n), _u8(out))
    return out.tobytes()

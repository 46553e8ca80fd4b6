"""Batched point decompression on TPU (ZCash convention, G1).

The reference decompresses points one at a time through blst
(src/curves.rs:112-183). For bulk SRS loading (2^20-point setups) the square
root must run on device: y = (x^3 + 4)^((P+1)/4) — one batched constant-
exponent power — then the lexicographic sign select. Byte parsing and flag
checks stay on the host (cheap, data-dependent error paths).

Subgroup checks for bulk loads use the batched scalar ladder ([r]P == O)
behind a flag — O(256) batched point ops for the whole batch.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .field import FP
from . import curve as cv
from . import limbs as lb
from ..utils import hostmath as hm
from ..errors import SerializationError

_FLAG_COMPRESSED = 0x80
_FLAG_INFINITY = 0x40
_FLAG_SIGN = 0x20

_HALF_P_LIMBS = lb.int_to_limbs((hm.P - 1) // 2, FP.L)


def parse_g1_compressed(blobs: list[bytes]):
    """Host-side parse: flags + x field elements -> (x std-limbs (24, n),
    sign bits (n,), inf mask (n,)). Raises on malformed encodings.

    Large batches route through the native codec runtime (native/kzg_host.cpp
    via utils.native) — same validation rules, no Python-bignum loop; on any
    native-side rejection we fall through to the Python path so error
    messages stay identical."""
    n = len(blobs)
    if n >= 64 and all(len(b) == 48 for b in blobs):
        from ..utils import native as nat

        if nat.available():
            try:
                x, sign, inf = nat.g1_parse_batch(b"".join(bytes(b) for b in blobs), n)
            except ValueError:
                pass  # re-parse below for the precise SerializationError
            else:
                return jnp.asarray(x), jnp.asarray(sign), jnp.asarray(inf)
    xs, signs, infs = [], [], []
    for data in blobs:
        if len(data) != 48:
            raise SerializationError(f"Invalid length, expected 48, got {len(data)}")
        flags = data[0]
        if not flags & _FLAG_COMPRESSED:
            raise SerializationError("Expected compressed encoding")
        if flags & _FLAG_INFINITY:
            if flags & _FLAG_SIGN or any(data[1:]) or flags & 0x1F:
                raise SerializationError("Malformed infinity encoding")
            xs.append(0)
            signs.append(False)
            infs.append(True)
            continue
        x = int.from_bytes(bytes([flags & 0x1F]) + data[1:], "big")
        if x >= hm.P:
            raise SerializationError("x coordinate not in field")
        xs.append(x)
        signs.append(bool(flags & _FLAG_SIGN))
        infs.append(False)
    return (
        jnp.asarray(lb.ints_to_limbs(xs, FP.L)),
        jnp.asarray(np.array(signs)),
        jnp.asarray(np.array(infs)),
    )


@jax.jit
def _decompress_kernel(x_std, signs, infs):
    x = FP.to_mont(x_std)
    four = FP.const(FP.to_limbs(4), x)
    rhs = FP.add(FP.mul(FP.square(x), x), four)  # x^3 + 4
    y = FP.pow_const(rhs, (hm.P + 1) // 4)  # candidate sqrt (P = 3 mod 4)
    on_curve = FP.eq(FP.square(y), rhs)
    # lexicographically-largest convention: sign set iff y_std > (P-1)/2
    y_std = FP.from_mont(y)
    is_big = ~lb.geq(FP.const(jnp.asarray(_HALF_P_LIMBS), y_std), y_std)
    flip = is_big != signs
    y = FP.select(flip, FP.neg(y), y)
    one = jnp.broadcast_to(FP.one(x), x.shape)
    zero = jnp.zeros_like(x)
    jac = (
        FP.select(infs, zero, x),
        FP.select(infs, zero, y),
        FP.select(infs, zero, one),
    )
    return jac, jnp.logical_or(on_curve, infs)


def g1_decompress_batch(blobs: list[bytes], subgroup_check: bool = False):
    """Decompress many 48-byte G1 blobs in one device batch.

    Returns a device Jacobian triple. Raises SerializationError if any point
    is off-curve (and, when subgroup_check, outside the r-order subgroup)."""
    x_std, signs, infs = parse_g1_compressed(blobs)
    jac, ok = _decompress_kernel(x_std, signs, infs)
    if not bool(jnp.all(ok)):
        raise SerializationError("Point not on curve")
    if subgroup_check:
        r_limbs = jnp.asarray(lb.int_to_limbs(hm.R, 16))[:, None]
        prod = cv.G1.mul_scalar(jac, r_limbs, nbits=256)
        if not bool(jnp.all(cv.G1.is_inf(prod))):
            raise SerializationError("Point not in the prime-order subgroup")
    return jac

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


def parse_g2_compressed(blobs: list[bytes]):
    """Host-side parse of 96-byte ZCash-compressed G2 blobs: flags + x in Fp2
    -> (x std-limbs (24, 2, n), sign bits (n,), inf mask (n,)). Byte layout is
    x1 (imaginary) then x0, big-endian, mirroring the reference's blst codec
    (src/curves.rs:287-303) / utils.hostmath.g2_decompress.

    Large batches route through the native codec runtime (native/kzg_host.cpp)
    — same validation rules, no Python-bignum loop; on any native-side
    rejection we fall through to the Python path so error messages stay
    identical."""
    n = len(blobs)
    if n >= 64 and all(len(b) == 96 for b in blobs):
        from ..utils import native as nat

        if nat.available():
            try:
                x, sign, inf = nat.g2_parse_batch(b"".join(bytes(b) for b in blobs), n)
            except ValueError:
                pass  # re-parse below for the precise SerializationError
            else:
                return jnp.asarray(x), jnp.asarray(sign), jnp.asarray(inf)
    xs0, xs1, signs, infs = [], [], [], []
    for data in blobs:
        if len(data) != 96:
            raise SerializationError(f"Invalid length, expected 96, got {len(data)}")
        flags = data[0]
        if not flags & _FLAG_COMPRESSED:
            raise SerializationError("Expected compressed encoding")
        if flags & _FLAG_INFINITY:
            if flags & _FLAG_SIGN or any(data[1:]) or flags & 0x1F:
                raise SerializationError("Malformed infinity encoding")
            xs0.append(0)
            xs1.append(0)
            signs.append(False)
            infs.append(True)
            continue
        x1 = int.from_bytes(bytes([flags & 0x1F]) + data[1:48], "big")
        x0 = int.from_bytes(data[48:], "big")
        if x0 >= hm.P or x1 >= hm.P:
            raise SerializationError("x coordinate not in field")
        xs0.append(x0)
        xs1.append(x1)
        signs.append(bool(flags & _FLAG_SIGN))
        infs.append(False)
    x = np.stack(
        [lb.ints_to_limbs(xs0, FP.L), lb.ints_to_limbs(xs1, FP.L)], axis=1
    )  # (L, 2, n)
    return jnp.asarray(x), jnp.asarray(np.array(signs)), jnp.asarray(np.array(infs))


def _fp2_pow_const(a, e: int):
    """a^e in Fp2 for a static python-int exponent (fori bit loop, small trace)."""
    from jax import lax
    from . import fp2

    if e == 0:
        return jnp.broadcast_to(jnp.asarray(fp2.one(a)), a.shape)
    bits = np.array([(e >> i) & 1 for i in range(e.bit_length())], np.uint32)

    def body(i, state):
        acc, base = state
        bit = jnp.asarray(bits)[i]
        new_acc = fp2.select(bit == 1, fp2.mul(acc, base), acc)
        return new_acc, fp2.square(base)

    acc0 = jnp.broadcast_to(jnp.asarray(fp2.one(a)), a.shape)
    acc, _ = lax.fori_loop(0, len(bits), body, (acc0, a))
    return acc


def _fp2_sign_dev(y_std):
    """Lexicographic sign of standard-form Fp2 limbs (L, 2, n): compare the
    imaginary part to (P-1)/2, falling back to the real part when it is zero
    (utils.hostmath._fp2_sign)."""
    half = jnp.asarray(_HALF_P_LIMBS)[:, None]
    y0, y1 = y_std[:, 0], y_std[:, 1]
    big0 = ~lb.geq(jnp.broadcast_to(half, y0.shape), y0)
    big1 = ~lb.geq(jnp.broadcast_to(half, y1.shape), y1)
    y1_zero = jnp.all(y1 == 0, axis=0)
    return jnp.where(y1_zero, big0, big1)


@jax.jit
def _g2_decompress_kernel(x_std, signs, infs):
    """Batched G2 decompression: y = sqrt(x^3 + 4(1+u)) in Fp2 via the
    p = 3 mod 4 method (Adj/Rodriguez-Henriquez): a1 = r^((p-3)/4),
    x0 = a1*r, alpha = a1*x0; if alpha == -1 the root is u*x0, else
    (1+alpha)^((p-1)/2) * x0. Returns (jacobian (L, 2, n) triple, ok mask)."""
    from . import fp2

    x = FP.to_mont(x_std)
    b = fp2.from_ints(hm.B_G2)
    rhs = fp2.add(fp2.mul(fp2.square(x), x), jnp.asarray(b)[..., None])
    a1 = _fp2_pow_const(rhs, (hm.P - 3) // 4)
    x0 = fp2.mul(a1, rhs)
    alpha = fp2.mul(a1, x0)
    # u * x0 = (-x0_1, x0_0)
    ux0 = jnp.stack([FP.neg(x0[:, 1]), x0[:, 0]], axis=1)
    one2 = jnp.broadcast_to(jnp.asarray(fp2.one(alpha)), alpha.shape)
    neg_one = jnp.stack([FP.neg(one2[:, 0]), one2[:, 1]], axis=1)
    is_neg1 = fp2.eq(alpha, neg_one)
    bpow = _fp2_pow_const(fp2.add(alpha, one2), (hm.P - 1) // 2)
    y = fp2.select(is_neg1, ux0, fp2.mul(bpow, x0))
    on_curve = fp2.eq(fp2.square(y), rhs)
    flip = _fp2_sign_dev(FP.from_mont(y)) != signs
    y = fp2.select(flip, fp2.neg(y), y)
    one = jnp.broadcast_to(jnp.asarray(fp2.one(x)), x.shape)
    one = jnp.stack([one[:, 0], jnp.zeros_like(one[:, 1])], axis=1)
    zero = jnp.zeros_like(x)
    jac = (
        fp2.select(infs, zero, x),
        fp2.select(infs, zero, y),
        fp2.select(infs, zero, one),
    )
    return jac, jnp.logical_or(on_curve, infs)


def g2_decompress_batch(blobs: list[bytes], subgroup_check: bool = False):
    """Decompress many 96-byte G2 blobs in one device batch.

    Returns a device Jacobian triple over Fp2 ((L, 2, n) coords). Raises
    SerializationError if any point is off-curve (and, when subgroup_check,
    outside the r-order subgroup)."""
    x_std, signs, infs = parse_g2_compressed(blobs)
    jac, ok = _g2_decompress_kernel(x_std, signs, infs)
    if not bool(jnp.all(ok)):
        raise SerializationError("Point not on curve")
    if subgroup_check:
        r_limbs = jnp.asarray(lb.int_to_limbs(hm.R, 16))[:, None]
        prod = cv.G2.mul_scalar(jac, r_limbs, nbits=256)
        if not bool(jnp.all(cv.G2.is_inf(prod))):
            raise SerializationError("Point not in the prime-order subgroup")
    return jac


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

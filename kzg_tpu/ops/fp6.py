"""Fp6 = Fp2[v]/(v^3 - XI), XI = 1 + u, on TPU.

An Fp6 element is a tuple of three Fp2 arrays (c0, c1, c2) — pytree-friendly
for lax loops. Multiplication is the Toom/Karatsuba interpolation form (6 Fp2
products), with all six products stacked into ONE batched Fp2 multiply so the
underlying 24-limb Fp kernel sees a wide lane batch.

Device counterpart of the oracle tower in utils/hostmath.py (fp6_*); feeds the
pairing (reference src/curves.rs:355-371 uses blst's fp6 internally).
"""

from __future__ import annotations

import jax.numpy as jnp

from . import fp2
from .field import FP

ZERO2 = None  # placeholder; use zeros_like helpers


def add(a, b):
    return tuple(fp2.add(x, y) for x, y in zip(a, b))


def sub(a, b):
    return tuple(fp2.sub(x, y) for x, y in zip(a, b))


def neg(a):
    return tuple(fp2.neg(x) for x in a)


def dbl(a):
    return tuple(fp2.dbl(x) for x in a)


def _mul_operands(a):
    """Stack the 6 Toom operand slots [a0, a1, a2, a1+a2, a0+a1, a0+a2] with a
    SINGLE batched Fp2 add (keeps traces small: adds dominate tower op counts)."""
    a0, a1, a2 = a
    base = jnp.stack([a0, a1, a2], axis=2)
    sums = fp2.add(jnp.stack([a1, a0, a0], axis=2), jnp.stack([a2, a1, a2], axis=2))
    return jnp.concatenate([base, sums], axis=2)


def _mul_combine(p):
    """Recombine the 6 products (stacked on axis 2) into (c0, c1, c2)."""
    t0, t1, t2 = p[:, :, 0], p[:, :, 1], p[:, :, 2]
    m12, m01, m02 = p[:, :, 3], p[:, :, 4], p[:, :, 5]
    c0 = fp2.add(t0, fp2.mul_by_xi(fp2.sub(m12, fp2.add(t1, t2))))
    c1 = fp2.add(fp2.sub(m01, fp2.add(t0, t1)), fp2.mul_by_xi(t2))
    c2 = fp2.add(fp2.sub(m02, fp2.add(t0, t2)), t1)
    return (c0, c1, c2)


def mul(a, b):
    """6 Fp2 products, one stacked Fp2 multiply (batch axis after component)."""
    p = fp2.mul(_mul_operands(a), _mul_operands(b))
    return _mul_combine(p)


def mul_many(pairs):
    """K independent Fp6 products in ONE stacked Fp2 multiply (6K products).

    pairs: list of (a, b) Fp6 tuples -> list of Fp6 results. Collapsing the
    whole Fp12 multiply into a single wide Fp kernel keeps XLA traces compact
    and the VPU lanes full."""
    lhs = jnp.concatenate([_mul_operands(a) for a, _ in pairs], axis=2)
    rhs = jnp.concatenate([_mul_operands(b) for _, b in pairs], axis=2)
    p = fp2.mul(lhs, rhs)
    return [_mul_combine(p[:, :, 6 * i : 6 * i + 6]) for i in range(len(pairs))]


def square(a):
    return mul(a, a)


def mul_by_v(a):
    """(c0, c1, c2) -> (XI*c2, c0, c1)."""
    return (fp2.mul_by_xi(a[2]), a[0], a[1])


def mul_by_fp2(a, k):
    """Scale all three coefficients by one Fp2 element (stacked, 3 products)."""
    lhs = jnp.stack(a, axis=2)
    kk = jnp.broadcast_to(k[:, :, None], lhs.shape)
    p = fp2.mul(lhs, kk)
    return (p[:, :, 0], p[:, :, 1], p[:, :, 2])


def inv(a):
    a0, a1, a2 = a
    t0 = fp2.sub(fp2.square(a0), fp2.mul_by_xi(fp2.mul(a1, a2)))
    t1 = fp2.sub(fp2.mul_by_xi(fp2.square(a2)), fp2.mul(a0, a1))
    t2 = fp2.sub(fp2.square(a1), fp2.mul(a0, a2))
    denom = fp2.add(
        fp2.mul(a0, t0),
        fp2.mul_by_xi(fp2.add(fp2.mul(a2, t1), fp2.mul(a1, t2))),
    )
    f = fp2.inv(denom)
    return (fp2.mul(t0, f), fp2.mul(t1, f), fp2.mul(t2, f))


def select(mask, a, b):
    return tuple(fp2.select(mask, x, y) for x, y in zip(a, b))


def zeros_like(a):
    return tuple(jnp.zeros_like(x) for x in a)


def is_zero(a):
    return jnp.logical_and(jnp.logical_and(fp2.is_zero(a[0]), fp2.is_zero(a[1])), fp2.is_zero(a[2]))


def eq(a, b):
    return jnp.logical_and(
        jnp.logical_and(fp2.eq(a[0], b[0]), fp2.eq(a[1], b[1])), fp2.eq(a[2], b[2])
    )

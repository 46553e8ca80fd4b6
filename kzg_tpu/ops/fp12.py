"""Fp12 = Fp6[w]/(w^2 - v) on TPU. Elements: (c0, c1) tuples of Fp6 tuples.

Device counterpart of the oracle fp12_* in utils/hostmath.py. Includes the
Frobenius maps (constant Montgomery coefficient tables baked at import) and a
constant-exponent power loop used by the final exponentiation.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax

from . import fp2, fp6
from ..utils import hostmath as hm


def add(a, b):
    return (fp6.add(a[0], b[0]), fp6.add(a[1], b[1]))


def sub(a, b):
    return (fp6.sub(a[0], b[0]), fp6.sub(a[1], b[1]))


def mul(a, b):
    """Karatsuba over Fp6: 3 Fp6 products, ONE stacked Fp multiply."""
    a0, a1 = a
    b0, b1 = b
    t0, t1, tm = fp6.mul_many(
        [(a0, b0), (a1, b1), (fp6.add(a0, a1), fp6.add(b0, b1))]
    )
    c0 = fp6.add(t0, fp6.mul_by_v(t1))
    c1 = fp6.sub(tm, fp6.add(t0, t1))
    return (c0, c1)


def square(a):
    """Complex squaring over Fp6: 2 Fp6 products, ONE stacked Fp multiply."""
    a0, a1 = a
    t, s = fp6.mul_many([(a0, a1), (fp6.add(a0, a1), fp6.add(a0, fp6.mul_by_v(a1)))])
    c0 = fp6.sub(fp6.sub(s, t), fp6.mul_by_v(t))
    c1 = fp6.dbl(t)
    return (c0, c1)


def conj(a):
    """Conjugation = Frobenius^6 (unitary inverse for cyclotomic elements)."""
    return (a[0], fp6.neg(a[1]))


def inv(a):
    a0, a1 = a
    denom = fp6.sub(fp6.square(a0), fp6.mul_by_v(fp6.square(a1)))
    f = fp6.inv(denom)
    return (fp6.mul(a0, f), fp6.neg(fp6.mul(a1, f)))


def select(mask, a, b):
    return (fp6.select(mask, a[0], b[0]), fp6.select(mask, a[1], b[1]))


def eq(a, b):
    return jnp.logical_and(fp6.eq(a[0], b[0]), fp6.eq(a[1], b[1]))


def one_like(a):
    """Fp12 one with a's batch shape."""
    ref = a[0][0]
    o = jnp.asarray(fp2.from_ints((1, 0)))
    o = o.reshape(o.shape + (1,) * (ref.ndim - o.ndim))
    o = jnp.broadcast_to(o, ref.shape)
    z = jnp.zeros_like(ref)
    return ((o, z, z), (z, z, z))


# -- host <-> device ---------------------------------------------------------


def from_ints(v):
    """Oracle fp12 tuple-of-ints -> device element (no batch)."""
    return tuple(tuple(jnp.asarray(fp2.from_ints(c2)) for c2 in c6) for c6 in v)


def to_ints(a):
    return tuple(tuple(fp2.to_ints(np.asarray(c2)) for c2 in c6) for c6 in a)


# -- Frobenius (constant tables, Montgomery form) ------------------------------

_F6, _F12 = hm._frob_tables()
_FROB6_DEV = {k: [fp2.from_ints(g) for g in _F6[k]] for k in (1, 2, 3)}
_FROB12_DEV = {k: fp2.from_ints(_F12[k]) for k in (1, 2, 3)}


def _lift2(c, ref):
    c = jnp.asarray(c)
    return c.reshape(c.shape + (1,) * (ref.ndim - c.ndim))


def _fp2_frob(a, k):
    return fp2.conj(a) if k % 2 == 1 else a


def _fp6_frob(a, k):
    g = _FROB6_DEV[k]
    return (
        _fp2_frob(a[0], k),
        fp2.mul(_fp2_frob(a[1], k), _lift2(g[0], a[1])),
        fp2.mul(_fp2_frob(a[2], k), _lift2(g[1], a[2])),
    )


def frobenius(a, k: int):
    """a^(p^k), k in 1..3 (tables as in oracle fp12_frobenius)."""
    g = _FROB12_DEV[k]
    c0 = _fp6_frob(a[0], k)
    c1 = _fp6_frob(a[1], k)
    c1 = tuple(fp2.mul(x, _lift2(g, x)) for x in c1)
    return (c0, c1)


# -- constant-exponent power ---------------------------------------------------


def pow_const(a, e: int):
    """a^e for a static python-int exponent via an on-device bit loop."""
    if e == 0:
        return one_like(a)
    nbits = e.bit_length()
    bits = np.array([(e >> i) & 1 for i in range(nbits)], np.uint32)

    def body(i, state):
        acc, base = state
        bit = jnp.asarray(bits)[i]
        new_acc = select(bit == 1, mul(acc, base), acc)
        new_base = square(base)
        return new_acc, new_base

    acc0 = one_like(a)
    acc, _ = lax.fori_loop(0, nbits, body, (acc0, a))
    return acc

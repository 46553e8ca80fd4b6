"""Fp2 = Fp[u]/(u^2+1) on TPU, component axis interleaved after the limb axis.

An Fp2 element is a uint32 array of shape (L, 2, *batch) — limbs first, then the
(c0, c1) component axis, then batch. Linear ops (add/sub/neg/double/half/select)
are *directly* the Fp kernels (they broadcast over every trailing axis); only
multiplication needs component shuffling, and it runs as ONE batched Fp multiply
over a stacked component axis (Karatsuba: 3 products), so a large G2/pairing batch
keeps the VPU lanes full.

Replaces blst's fp2 tower (behind reference src/curves.rs G2 ops).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .field import FP
from . import limbs as lb


def from_ints(c: tuple[int, int]) -> np.ndarray:
    """(c0, c1) python ints -> (L, 2) Montgomery limbs."""
    return np.stack([FP.to_limbs(c[0]), FP.to_limbs(c[1])], axis=1)


def many_from_ints(cs) -> np.ndarray:
    """Iterable of (c0, c1) -> (L, 2, n)."""
    return np.stack([from_ints(c) for c in cs], axis=-1)


def to_ints(a) -> tuple[int, int]:
    arr = np.asarray(a)
    return (FP.from_limbs(arr[:, 0]), FP.from_limbs(arr[:, 1]))


# Linear ops come straight from Fp (broadcast over the component axis).
add = FP.add
sub = FP.sub
neg = FP.neg
dbl = FP.dbl
half = FP.half


def mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Karatsuba: v0=a0b0, v1=a1b1, v2=(a0+a1)(b0+b1); c0=v0-v1, c1=v2-v0-v1."""
    a0, a1 = a[:, 0], a[:, 1]
    b0, b1 = b[:, 0], b[:, 1]
    s1 = jnp.stack([a0, a1, FP.add(a0, a1)], axis=1)
    s2 = jnp.stack([b0, b1, FP.add(b0, b1)], axis=1)
    p = FP.mul(s1, s2)
    v0, v1, v2 = p[:, 0], p[:, 1], p[:, 2]
    c0 = FP.sub(v0, v1)
    c1 = FP.sub(v2, FP.add(v0, v1))
    return jnp.stack([c0, c1], axis=1)


def square(a: jnp.ndarray) -> jnp.ndarray:
    """Complex squaring: c0 = (a0+a1)(a0-a1), c1 = 2 a0 a1 — one batched Fp mul."""
    a0, a1 = a[:, 0], a[:, 1]
    s1 = jnp.stack([FP.add(a0, a1), FP.dbl(a0)], axis=1)
    s2 = jnp.stack([FP.sub(a0, a1), a1], axis=1)
    p = FP.mul(s1, s2)
    return jnp.stack([p[:, 0], p[:, 1]], axis=1)


def mul_by_fp(a: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """Multiply both components by an Fp element k of shape (L, *batch)."""
    return FP.mul(a, k[:, None])


def conj(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.stack([a[:, 0], FP.neg(a[:, 1])], axis=1)


def mul_by_xi(a: jnp.ndarray) -> jnp.ndarray:
    """Multiply by the sextic non-residue XI = 1 + u: (c0 - c1, c0 + c1)."""
    a0, a1 = a[:, 0], a[:, 1]
    return jnp.stack([FP.sub(a0, a1), FP.add(a0, a1)], axis=1)


def inv(a: jnp.ndarray) -> jnp.ndarray:
    """1/(a0 + a1 u) = (a0 - a1 u) / (a0^2 + a1^2). One Fp inversion."""
    a0, a1 = a[:, 0], a[:, 1]
    p = FP.mul(jnp.stack([a0, a1], axis=1), jnp.stack([a0, a1], axis=1))
    norm = FP.add(p[:, 0], p[:, 1])
    ninv = FP.inv(norm)
    return jnp.stack([FP.mul(a0, ninv), FP.neg(FP.mul(a1, ninv))], axis=1)


def is_zero(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.all(a == 0, axis=(0, 1))


def eq(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    a, b = lb.align(a, b)
    return jnp.all(a == b, axis=(0, 1))


def select(mask: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    a, b = lb.align(a, b)
    return jnp.where(mask[None, None], a, b)


def zeros(*batch) -> jnp.ndarray:
    return jnp.zeros((FP.L, 2) + tuple(batch), jnp.uint32)


def one(ref: jnp.ndarray | None = None) -> np.ndarray:
    o = from_ints((1, 0))
    if ref is not None:
        o = o.reshape(o.shape + (1,) * (ref.ndim - 2))
    return o

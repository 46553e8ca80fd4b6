"""Polynomial kernels over Fr on TPU: evaluation, synthetic division, powers.

The reference's polynomial layer is serial: evaluation recomputes x^i per term
(src/polynomial.rs:112-123), synthetic division is a top-down data-dependent
loop (src/polynomial.rs:150-195), and s^k powers are an iterator
(src/trusted_setup.rs:50-77). On TPU all three become parallel-prefix
computations with log-depth: powers via an associative scan of Fr products,
evaluation as powers + batched multiply + tree sum, and synthetic division as
an associative scan over affine maps (the linear recurrence
q_i = p_{i+1} + root * q_{i+1} composed in parallel).

All arrays are Montgomery-form Fr limbs of shape (16, D) unless noted.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from .field import FR


def powers(x: jnp.ndarray, n: int) -> jnp.ndarray:
    """[1, x, x^2, ..., x^(n-1)] as (16, n) Montgomery limbs. x: (16,)."""
    if n <= 0:
        return FR.zeros(0)
    one = jnp.asarray(FR.ONE_MONT)[:, None]
    if n == 1:
        return one
    xs = jnp.broadcast_to(x[:, None], (FR.L, n - 1))
    elems = jnp.concatenate([one, xs], axis=1)
    return lax.associative_scan(lambda a, b: FR.mul(a, b), elems, axis=1)


def tree_sum(terms: jnp.ndarray) -> jnp.ndarray:
    """Sum (16, N) Fr elements along the batch axis in log2(N) batched adds."""
    n = terms.shape[1]
    if n == 0:
        return jnp.zeros((FR.L,), jnp.uint32)
    while n > 1:
        half = n // 2
        s = FR.add(terms[:, :half], terms[:, half : 2 * half])
        if n % 2:
            s = jnp.concatenate([s, terms[:, 2 * half :]], axis=1)
            n = half + 1
        else:
            n = half
        terms = s
    return terms[:, 0]


@partial(jax.jit, static_argnums=(2,))
def evaluate(coeffs: jnp.ndarray, x: jnp.ndarray, n: int) -> jnp.ndarray:
    """P(x) = sum_i coeffs[:, i] * x^i. coeffs: (16, n), x: (16,) -> (16,).

    Same field result as the reference's term-by-term loop
    (src/polynomial.rs:112-123) — Fr arithmetic is exact.
    """
    if n == 0:
        return jnp.zeros((FR.L,), jnp.uint32)
    pw = powers(x, n)
    return tree_sum(FR.mul(coeffs, pw))


@partial(jax.jit, static_argnums=(2,))
def synthetic_divide(coeffs: jnp.ndarray, root: jnp.ndarray, n: int):
    """Divide P (coeffs (16, n), ascending, n >= 2) by (x - root).

    Returns (quotient (16, n-1) ascending, rebuilt_constant (16,)) where
    rebuilt_constant = -root * q_0 must equal coeffs[:, 0] for exact division
    (the reference's constant-term check, src/polynomial.rs:183-192).

    Parallel form of the recurrence u_k = root * u_{k-1} + b_k over the
    reversed high coefficients b_k = p_{n-1-k}: an associative scan over affine
    maps (a, b) ~ x -> a*x + b with composition (a1,b1)*(a2,b2) = later-applied
    (a2*a1, a2*b1 + b2).
    """
    d = n - 1  # degree
    b = coeffs[:, ::-1][:, :d]  # p_d, p_{d-1}, ..., p_1
    a = jnp.broadcast_to(root[:, None], (FR.L, d))
    # First element is the constant map x -> b_0 (a_0 = 0).
    a = a.at[:, 0].set(0)

    def combine(e1, e2):
        a1, b1 = e1
        a2, b2 = e2
        return FR.mul(a1, a2), FR.add(FR.mul(b1, a2), b2)

    _, u = lax.associative_scan(combine, (a, b), axis=1)
    quotient = u[:, ::-1]  # q_0 ... q_{d-1}, ascending
    rebuilt_constant = FR.neg(FR.mul(root, quotient[:, 0]))
    return quotient, rebuilt_constant


@partial(jax.jit, static_argnums=(1,))
def power_sequence(s: jnp.ndarray, n: int) -> jnp.ndarray:
    """[s^0, s^1, ..., s^(n-1)] — the trusted-setup power ladder, parallel-prefix."""
    return powers(s, n)


def _tree_sum_axis(terms: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Log-depth Fr sum along `axis`, batched over every other axis."""
    n = terms.shape[axis]
    if n == 0:
        shape = list(terms.shape)
        del shape[axis]
        return jnp.zeros(shape, jnp.uint32)
    while n > 1:
        half = n // 2
        lo = lax.slice_in_dim(terms, 0, half, axis=axis)
        hi = lax.slice_in_dim(terms, half, 2 * half, axis=axis)
        s = FR.add(lo, hi)
        if n % 2:
            tail = lax.slice_in_dim(terms, 2 * half, n, axis=axis)
            terms = jnp.concatenate([s, tail], axis=axis)
            n = half + 1
        else:
            terms, n = s, half
    return jnp.squeeze(terms, axis=axis)


@partial(jax.jit, static_argnums=(2,))
def evaluate_many(coeffs: jnp.ndarray, xs: jnp.ndarray, n: int) -> jnp.ndarray:
    """P(x_j) for a batch of points in ONE device program.

    coeffs: (16, n) Montgomery; xs: (16, k) Montgomery -> (16, k).
    The i128-exact batched analog of the reference's per-point evaluate loop
    (src/polynomial.rs:112-123) over many query points at once."""
    k = xs.shape[1]
    if n == 0:
        return jnp.zeros((FR.L, k), jnp.uint32)
    one = jnp.broadcast_to(jnp.asarray(FR.ONE_MONT)[:, None, None], (FR.L, 1, k))
    xb = jnp.broadcast_to(xs[:, None, :], (FR.L, n - 1, k)) if n > 1 else None
    elems = one if n == 1 else jnp.concatenate([one, xb], axis=1)
    pw = lax.associative_scan(lambda a, b: FR.mul(a, b), elems, axis=1)  # (16, n, k)
    return _tree_sum_axis(FR.mul(coeffs[:, :, None], pw), axis=1)


@partial(jax.jit, static_argnums=(2,))
def synthetic_divide_many(coeffs: jnp.ndarray, roots: jnp.ndarray, n: int):
    """Divide P (coeffs (16, n), n >= 2) by (x - root_j) for a batch of roots.

    Returns (quotients (16, n-1, k) ascending, remainders (16, k)) where
    remainder_j = P(root_j) — so (P - P(root_j)) / (x - root_j) = quotient_j
    exactly (the subtraction only changes the constant term, which the
    quotient never depends on). One associative scan, batched over roots."""
    d = n - 1
    k = roots.shape[1]
    b = jnp.broadcast_to(coeffs[:, ::-1][:, :d, None], (FR.L, d, k))
    a = jnp.broadcast_to(roots[:, None, :], (FR.L, d, k))
    a = a.at[:, 0].set(0)

    def combine(e1, e2):
        a1, b1 = e1
        a2, b2 = e2
        return FR.mul(a1, a2), FR.add(FR.mul(b1, a2), b2)

    _, u = lax.associative_scan(combine, (a, b), axis=1)
    quotients = u[:, ::-1]  # (16, d, k) ascending
    # remainder P(root) = p_0 + root * q_0
    rem = FR.add(coeffs[:, 0, None], FR.mul(roots, quotients[:, 0]))
    return quotients, rem

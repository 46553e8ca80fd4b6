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

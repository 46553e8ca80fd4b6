"""Number-theoretic transform over Fr on TPU (radix-2, power-of-two domains).

BLS12-381's Fr has 2-adicity 32 (r - 1 = 2^32 * odd), so NTT domains up to
2^32 exist. The reference has no NTT — its evaluation/quotient loops are
serial per-degree (src/polynomial.rs:112-123,150-195); this is the TPU-native
degree-scaling engine (SURVEY.md §2.3/§5 long-context row): log2(n) stages,
each ONE batched butterfly over the whole domain (mul + add + sub on the VPU),
with twiddle factors baked as Montgomery constants.

Layout: coefficients (16, n) Montgomery limbs. Stage s (half-width h) views
the array as (16, n/2h, 2, h): slot 0/1 = butterfly partners — contiguous
because inputs are bit-reverse permuted first (one constant gather).
"""

from __future__ import annotations

from functools import lru_cache, partial

import numpy as np
import jax
import jax.numpy as jnp

from .field import FR
from ..utils import hostmath as hm

TWO_ADICITY = 32
# generator of Fr* is 7; W has exact order 2^32
ROOT_OF_UNITY = pow(7, (hm.R - 1) >> TWO_ADICITY, hm.R)


@lru_cache(maxsize=None)
def _domain_root(k: int) -> int:
    """Primitive 2^k-th root of unity (exact int)."""
    if not 0 <= k <= TWO_ADICITY:
        raise ValueError(f"domain 2^{k} exceeds the 2-adicity of Fr")
    return pow(ROOT_OF_UNITY, 1 << (TWO_ADICITY - k), hm.R)


@lru_cache(maxsize=None)
def _stage_twiddles(k: int, inverse: bool) -> tuple:
    """Montgomery twiddle arrays per stage: stage with half-width h = 2^(s-1)
    uses [w_{2h}^j for j < h]."""
    out = []
    for s in range(1, k + 1):
        h = 1 << (s - 1)
        w = _domain_root(s)  # order 2h
        if inverse:
            w = pow(w, -1, hm.R)
        tw = [pow(w, j, hm.R) for j in range(h)]
        out.append(FR.many_to_limbs(tw))
    return tuple(out)


@lru_cache(maxsize=None)
def _bitrev(k: int) -> np.ndarray:
    n = 1 << k
    idx = np.arange(n)
    rev = np.zeros(n, np.int32)
    for b in range(k):
        rev |= ((idx >> b) & 1) << (k - 1 - b)
    return rev


def _ntt_core(coeffs: jnp.ndarray, k: int, inverse: bool) -> jnp.ndarray:
    """Batched NTT along axis 1; trailing axes (if any) are independent lanes."""
    n = 1 << k
    batch = coeffs.shape[2:]
    nb = len(batch)
    a = jnp.take(coeffs, jnp.asarray(_bitrev(k)), axis=1)
    for s, tw in enumerate(_stage_twiddles(k, inverse), start=1):
        h = 1 << (s - 1)
        v = a.reshape((FR.L, n // (2 * h), 2, h) + batch)
        lo, hi = v[:, :, 0], v[:, :, 1]
        twd = jnp.asarray(tw).reshape((FR.L, 1, h) + (1,) * nb)
        t = FR.mul(hi, twd)  # (16, blocks, h, *batch)
        a = jnp.stack([FR.add(lo, t), FR.sub(lo, t)], axis=2).reshape((FR.L, n) + batch)
    return a


@partial(jax.jit, static_argnums=(1,))
def ntt(coeffs: jnp.ndarray, k: int) -> jnp.ndarray:
    """Forward NTT: coefficients (16, 2^k) -> evaluations on the 2^k domain
    [w^0, w^1, ..., w^(n-1)] (natural order), all in Montgomery form."""
    return _ntt_core(coeffs, k, inverse=False)


@partial(jax.jit, static_argnums=(1,))
def intt(evals: jnp.ndarray, k: int) -> jnp.ndarray:
    """Inverse NTT: evaluations -> coefficients (scaled by n^-1)."""
    a = _ntt_core(evals, k, inverse=True)
    n_inv = FR.to_limbs(pow(1 << k, -1, hm.R))
    return FR.mul(a, jnp.asarray(n_inv)[:, None])


def domain(k: int) -> list[int]:
    """The evaluation domain [w^j] as exact ints (host-side helper)."""
    w = _domain_root(k)
    out = [1]
    for _ in range((1 << k) - 1):
        out.append(out[-1] * w % hm.R)
    return out


@partial(jax.jit, static_argnums=(1,))
def evaluate_on_domain(coeffs: jnp.ndarray, k: int) -> jnp.ndarray:
    """Evaluate a polynomial (degree < 2^k, zero-padded) on the 2^k domain."""
    n = 1 << k
    pad = n - coeffs.shape[1]
    if pad < 0:
        raise ValueError("polynomial degree exceeds the domain")
    if pad:
        coeffs = jnp.pad(coeffs, [(0, 0), (0, pad)])
    return ntt(coeffs, k)


@partial(jax.jit, static_argnums=(1,))
def interpolate(evals: jnp.ndarray, k: int) -> jnp.ndarray:
    """Coefficients of the unique degree < 2^k polynomial with these domain values."""
    return intt(evals, k)

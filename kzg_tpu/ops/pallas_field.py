"""Fused Pallas TPU kernel for Montgomery multiplication over limb vectors.

The XLA path executes a 381-bit Montgomery multiply as ~60 separate HLO ops
(outer product, skew reshapes, carry circuits) — each a kernel launch with HBM
round-trips, which dominates wall time inside scan bodies. This kernel fuses
the ENTIRE multiply (schoolbook wide product + REDC + carry normalization +
conditional subtract) into one Pallas program: all intermediates live in
VMEM/registers, one launch per block of lanes.

Everything is expressed as unrolled static-index loops over (T,) lane vectors
with python-int scalar constants (modulus / N'), the most Mosaic-friendly
formulation (no reshapes, no gathers, no dynamic indexing).

Used by Field.mul when running on TPU with large batches; the XLA path remains
the reference implementation (and the CPU/test path).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK16 = np.uint32(0xFFFF)


def _limbs_of(value: int, n: int):
    return tuple((value >> (16 * i)) & 0xFFFF for i in range(n))


def _wide_product_cols(a_rows, b_rows, L: int, out_len: int):
    """Column sums of the schoolbook product of two limb-row lists.

    a_rows/b_rows: length-L lists of (T,) u32 vectors (or python ints for
    constants). Column k < out_len gets sum_i lo(a_i b_{k-i}) + hi(a_i b_{k-1-i});
    every column < 24 * 2^17 << 2^32.
    """
    cols = []
    for k in range(out_len):
        acc = None
        for i in range(max(0, k - L + 1), min(L, k + 1)):
            p = a_rows[i] * b_rows[k - i]
            t = p & MASK16
            acc = t if acc is None else acc + t
        for i in range(max(0, k - L), min(L, k)):
            p = a_rows[i] * b_rows[k - 1 - i]
            t = p >> 16
            acc = t if acc is None else acc + t
        cols.append(acc)
    return cols


def _carry_rows(cols, nrows: int):
    """Kogge-Stone carry normalization over a list of (T,) column vectors.
    Returns (rows in [0, 2^16), carry_out)."""
    # pass 1: bring carries below 2^16
    s = [cols[0] & MASK16]
    for k in range(1, nrows):
        s.append((cols[k] & MASK16) + (cols[k - 1] >> 16))
    c1 = cols[nrows - 1] >> 16
    # pass 2: carries to {0, 1}
    s2 = [s[0] & MASK16]
    for k in range(1, nrows):
        s2.append((s[k] & MASK16) + (s[k - 1] >> 16))
    c2 = s[nrows - 1] >> 16
    # Kogge-Stone on 0/1 carries
    g = [v >> 16 for v in s2]
    p = [((v & MASK16) == MASK16).astype(jnp.uint32) for v in s2]
    d = 1
    while d < nrows:
        g = [g[k] | (p[k] & g[k - d]) if k >= d else g[k] for k in range(nrows)]
        p = [p[k] & p[k - d] if k >= d else jnp.zeros_like(p[k]) for k in range(nrows)]
        d *= 2
    rows = [(s2[0]) & MASK16] + [(s2[k] + g[k - 1]) & MASK16 for k in range(1, nrows)]
    carry = c1 + c2 + g[nrows - 1]
    return rows, carry


def _sub_n_rows(rows, n_limbs, L: int):
    """rows - N via complement add; returns (diff rows, borrow_out in {0,1})."""
    cols = [rows[0] + (n_limbs[0] ^ 0xFFFF) + 1]
    cols += [rows[k] + (n_limbs[k] ^ 0xFFFF) for k in range(1, L)]
    s = [cols[0] & MASK16]
    for k in range(1, L):
        s.append((cols[k] & MASK16) + (cols[k - 1] >> 16))
    c1 = cols[L - 1] >> 16
    g = [v >> 16 for v in s]
    p = [((v & MASK16) == MASK16).astype(jnp.uint32) for v in s]
    d = 1
    while d < L:
        g = [g[k] | (p[k] & g[k - d]) if k >= d else g[k] for k in range(L)]
        p = [p[k] & p[k - d] if k >= d else jnp.zeros_like(p[k]) for k in range(L)]
        d *= 2
    diff = [s[0] & MASK16] + [(s[k] + g[k - 1]) & MASK16 for k in range(1, L)]
    borrow = ((c1 + g[L - 1]) == 0).astype(jnp.uint32)
    return diff, borrow


def mont_mul_block(a, b, modulus: int, n_prime: int, L: int):
    """Fused Montgomery multiply on (L, T) blocks (pure jnp; runs inside the
    Pallas kernel but is also directly traceable for testing)."""
    N = _limbs_of(modulus, L)
    NP = _limbs_of(n_prime, L)
    a_rows = [a[i] for i in range(L)]
    b_rows = [b[i] for i in range(L)]

    # t = a * b (2L columns)
    t_cols = _wide_product_cols(a_rows, b_rows, L, 2 * L)
    t_rows, _ = _carry_rows(t_cols, 2 * L)
    # m = (t mod R) * N' mod R (low L columns only)
    m_cols = _wide_product_cols(t_rows[:L], NP, L, L)
    m_rows, _ = _carry_rows(m_cols, L)
    # u = m * N (2L columns); s = t + u; out = s / R, cond-subtract N
    u_cols = _wide_product_cols(m_rows, N, L, 2 * L)
    s_cols = [t_rows[k] + u_cols[k] for k in range(2 * L)]
    s_rows, carry = _carry_rows(s_cols, 2 * L)
    hi = s_rows[L:]
    diff, borrow = _sub_n_rows(hi, N, L)
    take = jnp.logical_or(carry > 0, borrow == 0)
    out = [jnp.where(take, diff[k], hi[k]) for k in range(L)]
    return jnp.stack(out, axis=0)


def _mont_mul_kernel(a_ref, b_ref, o_ref, *, modulus: int, n_prime: int, L: int):
    o_ref[:] = mont_mul_block(a_ref[:], b_ref[:], modulus, n_prime, L)


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5))
def mont_mul_pallas(a: jnp.ndarray, b: jnp.ndarray, modulus: int, n_prime: int,
                    L: int, block: int = 1024) -> jnp.ndarray:
    """Batched Montgomery multiply via the fused kernel.

    a, b: (L, B) canonical Montgomery limbs (B padded to a block multiple by
    the caller). Grid over lane blocks; each program multiplies (L, block).
    """
    B = a.shape[1]
    assert B % block == 0, "batch must be a block multiple"
    kernel = functools.partial(_mont_mul_kernel, modulus=modulus, n_prime=n_prime, L=L)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((L, B), jnp.uint32),
        grid=(B // block,),
        in_specs=[
            pl.BlockSpec((L, block), lambda i: (0, i)),
            pl.BlockSpec((L, block), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((L, block), lambda i: (0, i)),
    )(a, b)

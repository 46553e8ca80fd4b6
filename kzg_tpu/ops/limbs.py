"""Base-2^16 limb arithmetic on uint32 JAX arrays, limb-major layout.

The TPU-native representation of big integers: an element is a ``uint32`` array of
shape ``(n_limbs, *batch)`` holding base-2^16 digits, least-significant limb first.
Putting the limb axis FIRST means the *batch* occupies the trailing (lane) axes of
the 8x128 VPU, so every field operation is automatically data-parallel over
arbitrarily large batches without vmap. Products of two 16-bit limbs fit exactly in
uint32, and accumulation columns carry >10 bits of headroom, so schoolbook
multiplication needs no intermediate carry propagation.

This replaces the reference's blst C/asm bignum layer (the `blst_fr_*`/`blst_fp_*`
calls behind src/scalar.rs and src/curves.rs) with pure XLA-compiled vector code.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax

MASK16 = np.uint32(0xFFFF)


# ---------------------------------------------------------------------------
# Host <-> device conversion helpers (numpy / python int; not hot-path)
# ---------------------------------------------------------------------------


def int_to_limbs(value: int, n_limbs: int) -> np.ndarray:
    """Python int -> (n_limbs,) uint32 base-2^16 digits (LSB first)."""
    if value < 0 or value >= 1 << (16 * n_limbs):
        raise ValueError(f"value out of range for {n_limbs} limbs")
    return np.array([(value >> (16 * i)) & 0xFFFF for i in range(n_limbs)], dtype=np.uint32)


def ints_to_limbs(values, n_limbs: int) -> np.ndarray:
    """Iterable of ints -> (n_limbs, len(values)) uint32 array."""
    return np.stack([int_to_limbs(v, n_limbs) for v in values], axis=-1)


def limbs_to_int(limbs) -> int:
    """(n_limbs,) array -> python int."""
    limbs = np.asarray(limbs, dtype=np.uint64)
    return sum(int(d) << (16 * i) for i, d in enumerate(limbs))


def limbs_to_ints(limbs) -> list[int]:
    """(n_limbs, N) array -> list of N python ints."""
    arr = np.asarray(limbs)
    flat = arr.reshape(arr.shape[0], -1)
    return [limbs_to_int(flat[:, j]) for j in range(flat.shape[1])]


# ---------------------------------------------------------------------------
# Shape utilities
# ---------------------------------------------------------------------------


def align(a: jnp.ndarray, b: jnp.ndarray):
    """Insert batch axes right after the limb axis so both operands share ndim.

    Batch shapes broadcast numpy-style (right-aligned) on the trailing axes.
    """
    nd = max(a.ndim, b.ndim)
    if a.ndim < nd:
        a = a.reshape(a.shape[:1] + (1,) * (nd - a.ndim) + a.shape[1:])
    if b.ndim < nd:
        b = b.reshape(b.shape[:1] + (1,) * (nd - b.ndim) + b.shape[1:])
    return a, b


def bcast_const(c: np.ndarray, ref: jnp.ndarray) -> jnp.ndarray:
    """Lift an (L,) constant to the batch rank of `ref` ((L, 1, ..., 1))."""
    return jnp.asarray(c).reshape(c.shape[:1] + (1,) * (ref.ndim - 1))


# ---------------------------------------------------------------------------
# Carry machinery (exact, scan-based; the scan is over the tiny limb axis, every
# step is one fused VPU op over the whole batch)
# ---------------------------------------------------------------------------


def _shift_up(x: jnp.ndarray, d: int = 1) -> jnp.ndarray:
    """Move limb i to position i+d (zero-fill at the bottom)."""
    pad = [(d, 0)] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, pad)[: x.shape[0]]


def carry_reduce(cols: jnp.ndarray):
    """Normalize accumulation columns to canonical u16 limbs — LOG-DEPTH.

    cols: (K, *batch) uint32, each column < 2^32 - 2^16 (slack for the carry).
    Returns (limbs, carry_out): limbs (K, *batch) in [0, 2^16), carry_out (*batch,).

    A sequential lax.scan ripple costs K tiny loop iterations per field op
    (milliseconds per point-add on TPU); instead: two local carry passes bring
    every carry to 0/1, then a Kogge-Stone generate/propagate network resolves
    the remaining ripple in log2(K) full-width vector steps.
    """
    K = cols.shape[0]
    # pass 1: col < 2^32 -> limbs < 2^17 (carry < 2^16)
    s = (cols & MASK16) + _shift_up(cols >> 16)
    c1_top = cols[-1] >> 16  # would-be carry out of the top from pass 1
    # pass 2: limbs < 2^17 -> value <= 2^16, carries in {0,1}
    s = (s & MASK16) + _shift_up(s >> 16)
    c2_top = s[-1] >> 16
    # Kogge-Stone on 0/1 carries: g = carry generated, p = propagates (0xffff)
    g = s >> 16
    p = ((s & MASK16) == MASK16).astype(jnp.uint32)
    d = 1
    while d < K:
        g = g | (p & _shift_up(g, d))
        p = p & _shift_up(p, d)
        d *= 2
    carry_in = _shift_up(g)  # carry INTO limb i (from limbs < i)
    limbs = (s + carry_in) & MASK16
    carry_out = c1_top + c2_top + g[-1]
    return limbs, carry_out


def sub_borrow(a: jnp.ndarray, b: jnp.ndarray):
    """a - b over u16 limbs with borrow chain (log-depth via complement add).

    Returns (diff, borrow_out) where diff = (a - b) mod 2^(16K) as u16 limbs
    and borrow_out (*batch,) is 1 where a < b.
    """
    a, b = align(a, b)
    shape = jnp.broadcast_shapes(a.shape, b.shape)
    a = jnp.broadcast_to(a, shape)
    b = jnp.broadcast_to(b, shape)
    K = a.shape[0]
    # a - b = a + ~b + 1 (mod 2^(16K)); columns <= 2*0xffff + 1 < 2^17
    comp = b ^ MASK16
    cols = a + comp
    cols = cols.at[0].add(1)
    s = (cols & MASK16) + _shift_up(cols >> 16)
    c1_top = cols[-1] >> 16
    g = s >> 16
    p = ((s & MASK16) == MASK16).astype(jnp.uint32)
    d = 1
    while d < K:
        g = g | (p & _shift_up(g, d))
        p = p & _shift_up(p, d)
        d *= 2
    diff = (s + _shift_up(g)) & MASK16
    carry_out = c1_top + g[-1]
    borrow = (carry_out == 0).astype(jnp.uint32)
    return diff, borrow


def geq(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """a >= b elementwise over the batch (both canonical u16 limbs)."""
    _, borrow = sub_borrow(a, b)
    return borrow == 0


# ---------------------------------------------------------------------------
# Wide / low multiplication (schoolbook over columns, no inner carries)
# ---------------------------------------------------------------------------


def _skew_rows(m: jnp.ndarray, width: int) -> jnp.ndarray:
    """Shift row i of m right by i positions into an (L, width) frame.

    Pure pad/reshape/slice (zero compile cost, fusion-friendly): padding each
    row of an (L, W) matrix to W' = width + 1 and re-reading the flat buffer
    with row stride `width` lands element (i, j) at (i, i + j).
    Requires width >= W + L - 1.
    """
    L, W = m.shape[0], m.shape[1]
    batch = m.shape[2:]
    pad = [(0, 0), (0, width + 1 - W)] + [(0, 0)] * len(batch)
    flat = jnp.pad(m, pad).reshape((L * (width + 1),) + batch)
    return flat[: L * width].reshape((L, width) + batch)


def _mul_cols(a: jnp.ndarray, b: jnp.ndarray, out_len: int) -> jnp.ndarray:
    """Schoolbook column sums of a*b, truncated to out_len digits.

    ONE outer product + two reshape-skews + one reduction — a tiny trace that
    XLA compiles quickly (scatter chains, concat chains and gather indexing
    all stall the algebraic simplifier inside large kernels). Column
    accumulators stay < L * 2^17, far under the 2^32 - 2^16 carry_reduce slack.
    """
    L = a.shape[0]
    a, b = align(a, b)
    p = a[:, None] * b[None, :]  # (L, L, *batch); exact: operands < 2^16
    lo = _skew_rows(p & MASK16, 2 * L)  # lo[i, i+j] = (a_i b_j) & 0xffff
    hi = _skew_rows(p >> 16, 2 * L)
    cols = lo.sum(axis=0) + jnp.pad(hi, [(0, 0), (1, 0)] + [(0, 0)] * (hi.ndim - 2))[:, :-1].sum(axis=0)
    return cols[:out_len]


def mul_wide(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Full product of two L-limb numbers -> 2L canonical u16 limbs."""
    L = a.shape[0]
    cols = _mul_cols(a, b, 2 * L)
    limbs, _carry = carry_reduce(cols)  # product < 2^(32L): carry always zero
    return limbs


def mul_low(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Low L limbs of the product (i.e. a*b mod 2^(16L))."""
    L = a.shape[0]
    cols = _mul_cols(a, b, L)
    limbs, _ = carry_reduce(cols)  # dropping the carry == mod 2^(16L)
    return limbs


def select(mask: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Branchless limb select; mask has the batch shape (no limb axis)."""
    a, b = align(a, b)
    return jnp.where(mask[None], a, b)

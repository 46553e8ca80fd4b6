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


# ---------------------------------------------------------------------------
# Stacked (sublane-vectorized) formulation
#
# The row-wise helpers above express every limb operation on (T,) row slices:
# each op occupies ONE sublane of the 8x128 VPU, wasting 7/8 of the machine,
# and the schoolbook double loop issues ~1150 such row products per multiply.
# The stacked helpers below keep whole (R, T) limb blocks as single 2-D
# arrays: carries become static sublane shifts (pad/slice on axis 0), the
# Kogge-Stone circuit runs on full blocks, and the schoolbook column
# reduction becomes TWO constant-matrix matmuls on the MXU (the 16-bit
# lo/hi product halves are exact in fp32: column sums stay < 2^22 < 2^24).
# Same interfaces and bit-identical results; selected via KZG_TPU_ROWWISE=1
# fallback (stacked is the default).
# ---------------------------------------------------------------------------


def _shift_rows_down(x, k: int):
    """Row i -> row i+k (zeros enter at the top); static k, pad+slice only."""
    if k == 0:
        return x
    R = x.shape[0]
    return jnp.pad(x, ((k, 0),) + ((0, 0),) * (x.ndim - 1))[:R]


def _carry_stack(cols, R: int):
    """Stacked carry normalization: (R, T) columns < 2^32 -> (rows in
    [0, 2^16), carry_out (T,)). Same canonical output as _carry_rows (the
    normalized digit representation is unique)."""
    s1 = (cols & MASK16) + _shift_rows_down(cols >> 16, 1)
    c1 = cols[R - 1] >> 16
    if int(R) <= 64:
        # Every call site bounds its columns < 2^22 (schoolbook column sums
        # of <= 2*24 16-bit product halves, or 2-3-term adds < 2^18), so one
        # normalization pass leaves carries already in {0, 1}: the second
        # pass of the general circuit is dead. Kogge-Stone resolves the
        # {0,1}-carry chains directly on s1 (propagate = low half == 0xFFFF,
        # generate = s1 >> 16).
        g = s1 >> 16
        p = ((s1 & MASK16) == MASK16).astype(jnp.uint32)
        d = 1
        while d < R:
            g = g | (p & _shift_rows_down(g, d))
            p = p & _shift_rows_down(p, d)
            d *= 2
        rows = (s1 + _shift_rows_down(g, 1)) & MASK16
        carry = c1 + g[R - 1]
        return rows, carry
    s2 = (s1 & MASK16) + _shift_rows_down(s1 >> 16, 1)
    c2 = s1[R - 1] >> 16
    g = s2 >> 16
    p = ((s2 & MASK16) == MASK16).astype(jnp.uint32)
    d = 1
    while d < R:
        g = g | (p & _shift_rows_down(g, d))
        p = p & _shift_rows_down(p, d)
        d *= 2
    rows = (s2 + _shift_rows_down(g, 1)) & MASK16
    carry = c1 + c2 + g[R - 1]
    return rows, carry


def _sub_n_stack(rows, n_limbs, L: int):
    """rows - N via complement add; returns (diff rows, borrow_out in {0,1}).
    Bit-identical to _sub_n_rows."""
    ncomp = _const_col([v ^ 0xFFFF for v in n_limbs], rows)
    one_r0 = _const_col([1] + [0] * (L - 1), rows)  # complement subtract's +1
    cols = rows + ncomp + one_r0
    s = (cols & MASK16) + _shift_rows_down(cols >> 16, 1)
    c1 = cols[L - 1] >> 16
    g = s >> 16
    p = ((s & MASK16) == MASK16).astype(jnp.uint32)
    d = 1
    while d < L:
        g = g | (p & _shift_rows_down(g, d))
        p = p & _shift_rows_down(p, d)
        d *= 2
    diff = (s + _shift_rows_down(g, 1)) & MASK16
    borrow = ((c1 + g[L - 1]) == 0).astype(jnp.uint32)
    return diff, borrow


def _const_col(values, like):
    """Per-limb integer constant as an (R, *like.shape[1:]) array, built from
    scalar fulls (Pallas kernels may not capture constant arrays)."""
    return jnp.stack(
        [jnp.full(like.shape[1:], np.uint32(v), jnp.uint32) for v in values], axis=0
    )


def _sel_matrices(L: int, out_len: int):
    """fp32 selection matrices for the schoolbook column reduction, built
    from 2-D iota (no captured constant arrays in Pallas kernels):
    S_lo[k, i*L+j] = [i+j == k], S_hi[k, i*L+j] = [i+j+1 == k]."""
    from jax import lax

    r = lax.broadcasted_iota(jnp.int32, (out_len, L * L), 0)
    c = lax.broadcasted_iota(jnp.int32, (out_len, L * L), 1)
    ij = c // L + c % L
    return (ij == r).astype(jnp.float32), (ij + 1 == r).astype(jnp.float32)


def _mul_cols_dot(a, b, L: int, out_len: int):
    """Schoolbook column sums on the MXU: one exact u32 outer product, 16-bit
    lo/hi split (each half exact in fp32), two constant-matrix matmuls."""
    T = a.shape[-1]
    p = a[:, None, :] * b[None, :, :]  # (L, L, T), exact: operands < 2^16
    # Mosaic has no direct u32<->f32 casts; both halves are < 2^16 so an
    # int32 hop is exact in both directions
    p_lo = (p & MASK16).astype(jnp.int32).astype(jnp.float32).reshape(L * L, T)
    p_hi = (p >> 16).astype(jnp.int32).astype(jnp.float32).reshape(L * L, T)
    s_lo, s_hi = _sel_matrices(L, out_len)
    # HIGHEST precision: the default f32 matmul truncates inputs to bf16
    # (8-bit mantissa), destroying the 16-bit product halves; the bf16x6
    # decomposition is exact for integers < 2^24
    hp = jax.lax.Precision.HIGHEST
    cols = jnp.dot(s_lo, p_lo, preferred_element_type=jnp.float32, precision=hp)
    cols = cols + jnp.dot(s_hi, p_hi, preferred_element_type=jnp.float32, precision=hp)
    # column sums < 2*24*2^16 < 2^22: exact in fp32 and within int32 range
    return cols.astype(jnp.int32).astype(jnp.uint32)


def _pad_rows_to(x, k: int, h: int):
    """Row j -> row j+k, zero-padded/truncated to h rows (static shapes)."""
    R = x.shape[0]
    if k > 0:
        x = jnp.pad(x, ((k, 0),) + ((0, 0),) * (x.ndim - 1))
        R += k
    if R < h:
        x = jnp.pad(x, ((0, h - R),) + ((0, 0),) * (x.ndim - 1))
    elif R > h:
        x = x[:h]
    return x


def _mul_cols_stack(a, b, L: int, out_len: int):
    """Schoolbook column sums via paired-offset plane adds + a log-depth
    merge tree — pure u32 (no MXU, no float converts).

    The outer product p[i, j] = a_i * b_j contributes its 16-bit lo half to
    column i+j and its hi half to column i+j+1, so lo-plane i and hi-plane
    i-1 cover the SAME column span [i, i+L): they add with zero padding.
    That one pass collapses the 2L split planes to L+1 aligned planes before
    the pairwise merge tree runs — ~2.5x less plane-add volume than merging
    all 2L planes (the round-4 kernel's dominant cost). Products whose column
    lands at or beyond out_len are never computed (the m-generation call only
    needs the low L columns). Column sums stay < 2*L*2^16 < 2^22, far under
    u32; truncated-out_len sums only shed terms, never grow."""
    planes = []  # (rows, column offset), offsets strictly increasing by 1
    prev_hi = None
    for i in range(L):
        jmax = min(L, out_len - i)  # b-rows whose lo half lands < out_len
        if jmax <= 0:
            break
        pi = a[i][None, :] * b[:jmax]  # (jmax, T), exact: operands < 2^16
        lo_i = pi & MASK16
        hj = min(jmax, out_len - i - 1)  # rows whose hi half lands < out_len
        hi_i = (pi[:hj] >> 16) if hj > 0 else None
        # prev_hi covers columns [i, i + hj_{i-1}) — same offset as lo_i,
        # and hj_{i-1} = min(L, out_len - i) = jmax, so shapes line up
        planes.append((lo_i if prev_hi is None else lo_i + prev_hi, i))
        prev_hi = hi_i
    if prev_hi is not None:
        planes.append((prev_hi, planes[-1][1] + 1))
    while len(planes) > 1:
        nxt = []
        for k in range(0, len(planes) - 1, 2):
            pa, oa = planes[k]
            pb, ob = planes[k + 1]
            d = ob - oa
            h = min(out_len - oa, max(pa.shape[0], pb.shape[0] + d))
            nxt.append((_pad_rows_to(pa, 0, h) + _pad_rows_to(pb, d, h), oa))
        if len(planes) % 2:
            nxt.append(planes[-1])
        planes = nxt
    arr, off = planes[0]
    return _pad_rows_to(arr, off, out_len)


# Column-sum engine inside the fused kernels: the VPU merge tree
# (_mul_cols_stack, default) or the MXU selection-matrix matmuls
# (_mul_cols_dot, opt-in via KZG_TPU_MXU_MUL=1). Both produce bit-identical
# u32 columns (the dot path is exact: 16-bit product halves and < 2^22 column
# sums are exact in f32 under HIGHEST precision). The dot path is NOT the
# default because Mosaic's compile of the matmul-bearing scan kernel ran
# > 20 minutes on the tunneled v5e backend (round-4 A/B attempt) — revisit
# when kernel compiles are local.
import os as _os

_USE_DOT_COLS = _os.environ.get("KZG_TPU_MXU_MUL") == "1"


def _mul_cols(a, b, L: int, out_len: int):
    if _USE_DOT_COLS:
        return _mul_cols_dot(a, b, L, out_len)
    return _mul_cols_stack(a, b, L, out_len)


def mont_mul_stack(a, b, modulus: int, n_prime: int, L: int):
    """Fused Montgomery multiply on (L, T) blocks, sublane-vectorized.
    Bit-identical results to mont_mul_block."""
    N = _limbs_of(modulus, L)
    NP = _limbs_of(n_prime, L)
    t_cols = _mul_cols(a, b, L, 2 * L)
    t_rows, _ = _carry_stack(t_cols, 2 * L)
    m_cols = _mul_cols(t_rows[:L], _const_col(NP, a), L, L)
    m_rows, _ = _carry_stack(m_cols, L)
    u_cols = _mul_cols(m_rows, _const_col(N, a), L, 2 * L)
    s_cols = t_rows + u_cols
    s_rows, carry = _carry_stack(s_cols, 2 * L)
    hi = s_rows[L:]
    diff, borrow = _sub_n_stack(hi, N, L)
    take = jnp.logical_or(carry > 0, borrow == 0)
    return jnp.where(take[None], diff, hi)


def _mont_mul_kernel(a_ref, b_ref, o_ref, *, modulus: int, n_prime: int, L: int):
    import os

    if os.environ.get("KZG_TPU_ROWWISE") == "1":
        o_ref[:] = mont_mul_block(a_ref[:], b_ref[:], modulus, n_prime, L)
    elif os.environ.get("KZG_TPU_MXU_REDC", "1") == "1":
        o_ref[:] = mont_mul_stack_mxu(a_ref[:], b_ref[:], modulus, n_prime, L)
    else:
        o_ref[:] = mont_mul_stack(a_ref[:], b_ref[:], modulus, n_prime, L)


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
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(a, b)


# ---------------------------------------------------------------------------
# MXU-offloaded Montgomery reduction (KZG_TPU_MXU_REDC=1)
#
# Of the three limb products in a Montgomery multiply, two are by CONSTANTS:
# m = (t mod R) * N' mod R and u = m * N. A constant multiplication is a
# Toeplitz-matrix product over the limb axis — a true matmul the MXU can run.
# With both operands split to 8-bit bytes, the products (< 2^16) and column
# sums (< 48 * 255^2 < 2^22) are EXACT in a plain bf16 x bf16 -> f32 MXU pass
# (bytes are exact in bf16; no HIGHEST-precision 6-pass decomposition, which
# is what made the round-4 MXU attempt uncompilable). Only the a*b schoolbook
# product (both operands variable) stays on the VPU.
# ---------------------------------------------------------------------------


def _bytes_of(value: int, n: int):
    return tuple((value >> (8 * i)) & 0xFF for i in range(n))


def _toeplitz_bytes_bf16(byte_vals, rows: int, cols: int, row_scale: int = 1,
                         row_off: int = 0, col_perm_half: int = 0):
    """W[k, i] = byte_vals[row_scale*k + row_off - byteidx(i)], built from
    iota (Pallas kernels may not capture constant arrays); tiny trace.

    byteidx(i) = i normally; with col_perm_half = L the columns address the
    CONCATENATED byte layout [lo_0..lo_{L-1} | hi_0..hi_{L-1}] (byte 2i for
    the first half, 2i+1 for the second) — the layout a sublane concat
    produces without any Mosaic-unsupported interleaving reshape."""
    from jax import lax

    r = lax.broadcasted_iota(jnp.int32, (rows, cols), 0)
    c = lax.broadcasted_iota(jnp.int32, (rows, cols), 1)
    if col_perm_half:
        h = col_perm_half
        bidx = jnp.where(c < h, 2 * c, 2 * (c - h) + 1)
    else:
        bidx = c
    d = row_scale * r + row_off - bidx
    acc = jnp.zeros((rows, cols), jnp.float32)
    for dd, v in enumerate(byte_vals):
        if v:
            acc = acc + jnp.where(d == dd, np.float32(v), np.float32(0.0))
    return acc.astype(jnp.bfloat16)


MASK8 = np.uint32(0xFF)


def _carry_stack8(cols, R: int):
    """Base-256 carry normalization: (R, T) byte columns < 2^22 -> rows in
    [0, 2^8). Carry-out beyond the top row is discarded (callers reduce
    mod 2^(8R))."""
    s1 = (cols & MASK8) + _shift_rows_down(cols >> 8, 1)
    s2 = (s1 & MASK8) + _shift_rows_down(s1 >> 8, 1)
    g = s2 >> 8
    p = ((s2 & MASK8) == MASK8).astype(jnp.uint32)
    d = 1
    while d < R:
        g = g | (p & _shift_rows_down(g, d))
        p = p & _shift_rows_down(p, d)
        d *= 2
    return (s2 + _shift_rows_down(g, 1)) & MASK8


def _bf16(x):
    # values < 2^8: exact through the int32 -> f32 -> bf16 hops
    return x.astype(jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)


def mont_mul_stack_mxu(a, b, modulus: int, n_prime: int, L: int):
    """Montgomery multiply with the REDC half on the MXU. Bit-identical
    results to mont_mul_stack (same canonical output).

    Formulated reshape-free for Mosaic: the byte split is a sublane CONCAT
    ([lo bytes | hi bytes]) addressed by a column-permuted Toeplitz matrix,
    and the byte->16-bit recombine is folded into the second matmul as a
    lo/hi matrix pair. Falls back to the VPU path for >2-D operands (the
    small Hillis-Steele scan kernels)."""
    if a.ndim != 2:
        return mont_mul_stack(a, b, modulus, n_prime, L)
    N = _limbs_of(modulus, L)
    t_cols = _mul_cols(a, b, L, 2 * L)
    t_rows, _ = _carry_stack(t_cols, 2 * L)

    t_lo = t_rows[:L]
    t8p = jnp.concatenate([t_lo & MASK8, t_lo >> 8], axis=0)  # (2L, T)
    np_bytes = _bytes_of(n_prime, 2 * L)
    w_np = _toeplitz_bytes_bf16(np_bytes, 2 * L, 2 * L, col_perm_half=L)
    m8_cols = jnp.dot(w_np, _bf16(t8p), preferred_element_type=jnp.float32)
    m8_cols = m8_cols.astype(jnp.int32).astype(jnp.uint32)  # exact, < 2^22
    m8 = _carry_stack8(m8_cols, 2 * L)  # canonical bytes of m = t*N' mod R
    m8f = _bf16(m8)

    # u = m * N in 16-bit columns directly: column k takes byte products
    # landing at byte 2k (weight 1) and 2k+1 (weight 256)
    n_bytes = _bytes_of(modulus, 2 * L)
    w_lo = _toeplitz_bytes_bf16(n_bytes, 2 * L, 2 * L, row_scale=2)
    w_hi = _toeplitz_bytes_bf16(n_bytes, 2 * L, 2 * L, row_scale=2, row_off=1)
    u_lo = jnp.dot(w_lo, m8f, preferred_element_type=jnp.float32)
    u_hi = jnp.dot(w_hi, m8f, preferred_element_type=jnp.float32)
    u16 = u_lo.astype(jnp.int32).astype(jnp.uint32) + (
        u_hi.astype(jnp.int32).astype(jnp.uint32) << 8
    )  # < 2^30

    s_cols = t_rows + u16
    s_rows, carry = _carry_stack(s_cols, 2 * L)
    hi = s_rows[L:]
    diff, borrow = _sub_n_stack(hi, N, L)
    take = jnp.logical_or(carry > 0, borrow == 0)
    return jnp.where(take[None], diff, hi)

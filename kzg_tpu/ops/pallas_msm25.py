"""Lazy-reduction (25-limb) Pallas TPU kernels for the MSM bucket scan.

The 24-limb kernels (pallas_msm/pallas_curve) spend ~40% of their VPU ops in
Kogge-Stone carry circuits and conditional subtracts: with R = 2^384 and
p < 2^381 there is no headroom (R/p = 8), so every field op must renormalize
to canonical form. This module re-does the scan's point arithmetic over
**25 limbs** (R' = 2^400, p/R' ~ 1.5e-6), which buys enough headroom for
classic lazy reduction while KEEPING 16-bit limbs (so the byte-aligned MXU
Montgomery reduction still applies):

  - values are REDUNDANT (bounded by small multiples of p, tracked statically
    per formula site — see the bound table at _madd25_fast); limbs stay
    strict (< 2^16) so u32 limb products remain exact
  - Montgomery REDC output < 1.01p needs NO conditional subtract
    (correctness: out = (ab + m'N)/R' < ab/R' + N; with operands <= 82N,
    ab/R' <= 82^2 * N * (N/R') < 0.011 N)
  - subtraction is an UNCONDITIONAL complement-add: a - b1 - .. - bk + K*N
    with a static K*N >= the subtrahends' bound; the 2^400 carry-out of the
    complement identity is dropped by the (exact) carry circuit
  - doubling is a pure 1-bit limb shift (strict in, strict out) — no adder
  - the schoolbook product t = a*b needs only ONE carry pass (no KS): its
    semi-normalized limbs (< 2^16 + 2^6) feed the MXU m-generation as THREE
    byte rows per limb (lo8, hi8, top<=2^6 — all bf16-exact)
  - m = t*N' mod R' stays in raw byte columns (< 2^22, never carried); the
    u = m*N matmul consumes it as three bf16-exact byte splits
  - ONE full Kogge-Stone per multiply remains (the s = t + m*N stage, which
    must produce exactly-zero low limbs to divide by R') — that is the floor

Net: ~1.8x fewer VPU ops per madd than the 24-limb kernel. Downstream stages
convert the few values they touch (bucket boundaries + chunk totals) back to
canonical 24-limb Montgomery form: carry-normalize, subtract multiples of p,
then multiply by mont(2^-16) to undo the R'/R scale (tables are pre-scaled by
mont(2^16) so in-kernel values are x * 2^400 mod p).

Replaces the hot loop of the reference commit (src/polynomial.rs:207-214)
with identical group results after canonicalization.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_field import _carry_stack, _mul_cols_stack, _shift_rows_down
from ..utils import hostmath as hm

L24 = 24
L25 = 25
_P = hm.P
_R25 = 1 << (16 * L25)
_NP25 = (-pow(_P, -1, _R25)) % _R25
MASK16 = np.uint32(0xFFFF)
MASK8 = np.uint32(0xFF)

_N_BYTES = tuple((_P >> (8 * i)) & 0xFF for i in range(2 * L25))
_NP_BYTES = tuple((_NP25 >> (8 * i)) & 0xFF for i in range(2 * L25))


def _limbs25(v: int):
    return tuple((v >> (16 * i)) & 0xFFFF for i in range(L25))


_N_LIMBS25 = _limbs25(_P)
_ONE_MONT25 = _limbs25(_R25 % _P)
# K*N constants for the unconditional subtract sites (K >= subtrahend bound)
_KN = {k: _limbs25(k * _P) for k in (4, 8, 16, 24, 32, 40)}


def _const_col25(values, like):
    return jnp.stack(
        [jnp.full(like.shape[1:], np.uint32(v), jnp.uint32) for v in values], axis=0
    )


def _pass1(cols):
    """One carry pass: rows semi-normalized (< 2^16 + cols.max>>16)."""
    return (cols & MASK16) + _shift_rows_down(cols >> 16, 1)


def _ks_drop(cols, R: int):
    """Full normalization, top carry discarded (callers guarantee the true
    value is < 2^(16R), making the mod-2^(16R) result exact)."""
    rows, _ = _carry_stack(cols, R)
    return rows


# -- MXU REDC (2^400 domain) --------------------------------------------------


def _toeplitz_gen_bf16(byte_vals, out_rows: int, n_cols: int, pos_fn,
                       out_scale: int = 1, out_off: int = 0):
    """W[k, c] = byte_vals[out_scale*k + out_off - pos(c)] (0 outside range),
    built from iota only (Pallas kernels may not capture constant arrays).
    pos_fn maps a column-index iota array to its byte position."""
    r = lax.broadcasted_iota(jnp.int32, (out_rows, n_cols), 0)
    c = lax.broadcasted_iota(jnp.int32, (out_rows, n_cols), 1)
    d = out_scale * r + out_off - pos_fn(c)
    acc = jnp.zeros((out_rows, n_cols), jnp.float32)
    for dd, v in enumerate(byte_vals):
        if v:
            acc = acc + jnp.where(d == dd, np.float32(v), np.float32(0.0))
    return acc.astype(jnp.bfloat16)


def _bf16(x):
    # values <= 2^8: exact through int32 -> f32 -> bf16
    return x.astype(jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)


def _split3(rows):
    """(R, T) u32 rows < 2^22.3 -> (3R, T) byte rows [lo8 | hi8 | top6],
    every entry <= 255 (bf16-exact)."""
    return jnp.concatenate([rows & MASK8, (rows >> 8) & MASK8, rows >> 16], axis=0)


def _mont_mul25(a, b):
    """Lazy Montgomery multiply over (25, T) strict u32 limb blocks.

    Inputs: strict limbs, values <= 82N (see bound table). Output: strict
    limbs, value < 1.02N, == a*b*2^-400 mod p. No conditional subtract."""
    t_cols = _mul_cols_stack(a, b, L25, 2 * L25)  # (50, T) < 2^21.7
    t = _pass1(t_cols)  # semi rows, value == a*b exactly
    # m = t*N' mod 2^400 in raw byte columns (only t mod 2^400 matters)
    tb = _split3(t[:L25])  # (75, T)
    w_np = _toeplitz_gen_bf16(
        _NP_BYTES, 2 * L25, 3 * L25, lambda c: 2 * (c % L25) + (c // L25)
    )
    m8 = jnp.dot(w_np, _bf16(tb), preferred_element_type=jnp.float32)
    m8 = m8.astype(jnp.int32).astype(jnp.uint32)  # exact: col sums < 2^22.2
    # Two base-256 passes (no KS): raw byte columns represent m with value up
    # to 2^14 * 2^400 (each column < 2^22); every pass divides the excess by
    # 2^8, so two leave value(m) < 1.33 * 2^400 with rows < 2^8.4 — the
    # 3-split below stays bf16-exact and the REDC bound gains only +0.33N.
    m8 = (m8 & MASK8) + _shift_rows_down(m8 >> 8, 1)
    m8 = (m8 & MASK8) + _shift_rows_down(m8 >> 8, 1)
    # u = m*N in 16-bit columns; m consumed as raw-byte 3-splits (no carry)
    mb = _split3(m8)  # (150, T)
    pos2 = lambda c: (c % (2 * L25)) + (c // (2 * L25))
    w_lo = _toeplitz_gen_bf16(_N_BYTES, 2 * L25, 6 * L25, pos2, out_scale=2)
    w_hi = _toeplitz_gen_bf16(_N_BYTES, 2 * L25, 6 * L25, pos2, out_scale=2, out_off=1)
    mbf = _bf16(mb)
    u_lo = jnp.dot(w_lo, mbf, preferred_element_type=jnp.float32)
    u_hi = jnp.dot(w_hi, mbf, preferred_element_type=jnp.float32)
    # exact: col sums < 150*255^2 < 2^24 (f32-exact integer range)
    u16 = u_lo.astype(jnp.int32).astype(jnp.uint32) + (
        u_hi.astype(jnp.int32).astype(jnp.uint32) << 8
    )  # < 2^31.4
    s_cols = t + u16
    s_rows = _ks_drop(s_cols, 2 * L25)  # low 25 rows == 0 (s divisible by R')
    return s_rows[L25:]


def _mul_cols25_vpu(a, b):
    """Pure-VPU fallback multiply (KZG_TPU_NO_MXU25=1): same REDC structure
    with the two constant products on the VPU. Equal mod p (not bitwise —
    the m representative differs); canonicalization makes results exact."""
    t_cols = _mul_cols_stack(a, b, L25, 2 * L25)
    t = _pass1(t_cols)
    np_c = _const_col25(_limbs25(_NP25), a)
    # strict m: _mul_cols_stack operands must be < 2^16 for exact u32 products
    t_lo = _ks_drop(t[:L25], L25)
    m_cols = _mul_cols_stack(t_lo, np_c, L25, L25)
    m = _ks_drop(m_cols, L25)
    n_c = _const_col25(_N_LIMBS25, a)
    u_cols = _mul_cols_stack(m, n_c, L25, 2 * L25)
    s_rows = _ks_drop(t + u_cols, 2 * L25)
    return s_rows[L25:]


import os as _os

_NO_MXU25 = _os.environ.get("KZG_TPU_NO_MXU25") == "1"


def _mul(a, b):
    if _NO_MXU25:
        return _mul_cols25_vpu(a, b)
    return _mont_mul25(a, b)


def _sub(a, subs, kn_limbs):
    """a - sum(subs) + K*N, unconditional: complement-add with the 2^400
    carry-out dropped. Requires strict subs (complement identity) and
    K >= sum of the subtrahends' bounds (result >= 0); result < 2^400."""
    kn = list(kn_limbs)
    kn[0] += len(subs)  # the complement identity's +1 per subtrahend
    cols = a + _const_col25(kn, a)
    for s in subs:
        cols = cols + (s ^ MASK16)
    return _ks_drop(cols, L25)


def _dblshift(a, bits: int):
    """2^bits * a as a pure limb shift (strict in -> strict out, exact while
    value * 2^bits < 2^400)."""
    return ((a << bits) & MASK16) | _shift_rows_down(a >> (16 - bits), 1)


def _addks(a, b):
    """Strict-output add (rare path only)."""
    return _ks_drop(a + b, L25)


def _is0orN(v):
    """value(v) == 0 mod p for strict v < 2N: v in {0, N}. Mosaic lacks
    unsigned reductions; rows < 2^16 are exact in int32."""
    eq0 = jnp.max(v.astype(jnp.int32), axis=0) == 0
    nc = _const_col25(_N_LIMBS25, v)
    eqn = jnp.max((v ^ nc).astype(jnp.int32), axis=0) == 0
    return jnp.logical_or(eq0, eqn)


def _sel(mask, a, b):
    return jnp.where(mask[None], a, b)


def _sel_pt(mask, p, q):
    return tuple(_sel(mask, x, y) for x, y in zip(p, q))


def _one25(like):
    return _const_col25(_ONE_MONT25, like)


# Bound table (units of N; mu' = N/2^400 ~ 1.5e-6, mul(a,b) <= a*b*mu' + 1):
#   state in: X1 <= 33 (exact-path X3), Y1 <= 17, Z1 <= 1.01
#   H = U2 - X1 + 40N <= 41.1        twoH <= 82.1     I, J, V, r2 <= 1.02
#   rr = S2 - Y1 + 24N <= 25.1       r <= 50.1
#   X3 = r2 - J - 2V + 8N <= 9.1     VX = V - X3 + 16N <= 17.1
#   Y3 = rVX - 2YJ + 8N <= 9.1       Z3 <= 1.01
#   exact path: XB <= 34, Dh <= 5.1, 4Dh <= 20.1, X3d = F - 4Dh + 24N <= 25.1
#   DX = D - X3d + 32N <= 42.2, eightC <= 8.1, Y3d <= 17.1
# Max operand value 82.1N < 2^388; max product 82^2 N^2 < 2^774 < 2^800. All
# subtract results >= 0 by K >= subtrahend bound; all < 2^400 by miles.


def _madd25_core(p, q_affine):
    X1, Y1, Z1 = p
    X2, Y2 = q_affine
    Z1Z1 = _mul(Z1, Z1)
    U2 = _mul(X2, Z1Z1)
    S2 = _mul(Y2, _mul(Z1, Z1Z1))
    H = _sub(U2, (X1,), _KN[40])
    twoH = _dblshift(H, 1)
    I = _mul(twoH, twoH)
    J = _mul(H, I)
    rr = _sub(S2, (Y1,), _KN[24])
    r = _dblshift(rr, 1)
    V = _mul(X1, I)
    r2 = _mul(r, r)
    X3 = _sub(r2, (J, V, V), _KN[8])
    VX = _sub(V, (X3,), _KN[16])
    rVX = _mul(r, VX)
    YJ = _mul(Y1, J)
    Y3 = _sub(rVX, (YJ, YJ), _KN[8])
    Z3 = _mul(twoH, Z1)

    z1_inf = _is0orN(Z1)
    same_x = jnp.logical_and(_is0orN(Z3), ~z1_inf)
    same_y = _is0orN(r2)
    inf = tuple(jnp.zeros_like(X3) for _ in range(3))
    out = _sel_pt(jnp.logical_and(same_x, ~same_y), inf, (X3, Y3, Z3))
    out = _sel_pt(z1_inf, (X2, Y2, _one25(X2)), out)
    return out, jnp.logical_and(same_x, same_y)


def _madd25_fast(p, q_affine):
    """Mixed add, lazy form; returns (out, needs_double). Lanes with P == Q
    (needs_double) hold garbage and MUST be recomputed by the exact kernel.
    All other exceptional lanes (P == -Q -> infinity, P == inf -> Q) are
    exact. Same group semantics as pallas_curve._madd_pt_fast."""
    return _madd25_core(p, q_affine)


def _double25(p):
    """dbl-2009-l in lazy form (rare path: only runs when a scan hits
    P == Q). Same group semantics as pallas_curve._double_pt."""
    X1, Y1, Z1 = p
    A = _mul(X1, X1)
    B = _mul(Y1, Y1)
    Cc = _mul(B, B)
    XB = _addks(X1, B)
    t2 = _mul(XB, XB)
    Dh = _sub(t2, (A, Cc), _KN[4])
    E = _addks(_dblshift(A, 1), A)
    F = _mul(E, E)
    X3 = _sub(F, (_dblshift(Dh, 2),), _KN[24])
    D = _dblshift(Dh, 1)
    DX = _sub(D, (X3,), _KN[32])
    EDX = _mul(E, DX)
    Y3 = _sub(EDX, (_dblshift(Cc, 3),), _KN[16])
    Z3 = _mul(_dblshift(Y1, 1), Z1)
    return (X3, Y3, Z3)


def _madd25_exact(p, q_affine):
    """Mixed add with the P == Q doubling handled inline (the fallback kernel
    when the fast scan flags a lane)."""
    out, needs_double = _madd25_core(p, q_affine)
    return _sel_pt(needs_double, _double25(p), out)


# -- scan kernels -------------------------------------------------------------


def _pad25(v):
    return jnp.concatenate([v, jnp.zeros_like(v[:1])], axis=0)


def _scan25_kernel_fast(p_ref, ox_ref, oy_ref, oz_ref, flag_ref, ax, ay, az):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        ax[...] = jnp.zeros_like(ax)
        ay[...] = jnp.zeros_like(ay)
        az[...] = jnp.zeros_like(az)
        flag_ref[...] = jnp.zeros_like(flag_ref)

    w = p_ref[0]
    q = (_pad25(w & MASK16), _pad25(w >> 16))
    (nx, ny, nz), needs_double = _madd25_fast((ax[...], ay[...], az[...]), q)
    ax[...], ay[...], az[...] = nx, ny, nz
    ox_ref[0], oy_ref[0], oz_ref[0] = nx, ny, nz
    flag_ref[...] = flag_ref[...] | jnp.broadcast_to(
        needs_double.astype(jnp.uint32)[None, :], flag_ref.shape
    )


def _scan25_kernel_exact(p_ref, ox_ref, oy_ref, oz_ref, ax, ay, az):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        ax[...] = jnp.zeros_like(ax)
        ay[...] = jnp.zeros_like(ay)
        az[...] = jnp.zeros_like(az)

    w = p_ref[0]
    q = (_pad25(w & MASK16), _pad25(w >> 16))
    nx, ny, nz = _madd25_exact((ax[...], ay[...], az[...]), q)
    ax[...], ay[...], az[...] = nx, ny, nz
    ox_ref[0], oy_ref[0], oz_ref[0] = nx, ny, nz


def _blk_of(C: int, blk: int) -> int:
    blk = min(blk, C)
    while C % blk:
        blk //= 2
    return blk


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def scan25_fast(pk, m: int, blk: int = 1024, interpret: bool = False):
    """Chunked prefix-sum scan of a packed x|y<<16 stream, lazy 25-limb
    arithmetic. pk: (m, 24, C). Returns (runs: 3 x (m, 25, C) in the 2^400
    Montgomery domain (redundant values), needs-double flag)."""
    C = pk.shape[2]
    blk = _blk_of(C, blk)
    in_spec = pl.BlockSpec((1, L24, blk), lambda i, j: (j, 0, i))
    out_spec = pl.BlockSpec((1, L25, blk), lambda i, j: (j, 0, i))
    fspec = pl.BlockSpec((8, blk), lambda i, j: (0, i))
    out = pl.pallas_call(
        _scan25_kernel_fast,
        grid=(C // blk, m),
        in_specs=[in_spec],
        out_specs=[out_spec, out_spec, out_spec, fspec],
        out_shape=[jax.ShapeDtypeStruct((m, L25, C), jnp.uint32)] * 3
        + [jax.ShapeDtypeStruct((8, C), jnp.uint32)],
        scratch_shapes=[pltpu.VMEM((L25, blk), jnp.uint32)] * 3,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(pk)
    return tuple(out[:3]), jnp.max(out[3])


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def scan25_exact(pk, m: int, blk: int = 1024, interpret: bool = False):
    """Exact-fallback scan (inline doubling); same output layout/domain as
    scan25_fast."""
    C = pk.shape[2]
    blk = _blk_of(C, blk)
    in_spec = pl.BlockSpec((1, L24, blk), lambda i, j: (j, 0, i))
    out_spec = pl.BlockSpec((1, L25, blk), lambda i, j: (j, 0, i))
    out = pl.pallas_call(
        _scan25_kernel_exact,
        grid=(C // blk, m),
        in_specs=[in_spec],
        out_specs=[out_spec] * 3,
        out_shape=[jax.ShapeDtypeStruct((m, L25, C), jnp.uint32)] * 3,
        scratch_shapes=[pltpu.VMEM((L25, blk), jnp.uint32)] * 3,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(pk)
    return tuple(out)


# -- window-fold kernel (trusted-setup ceremony hot loop) ---------------------


def _fold25_kernel(p_ref, ox_ref, oy_ref, oz_ref, ax, ay, az, *, steps: int):
    """acc <- acc + q_w over W gathered window entries, lazy arithmetic with
    the inline-doubling exact madd (T[w][d] collisions with partial sums are
    adversarially possible). Digit-0 entries are the (0, 0) sentinel — not a
    point — and keep the old state. Mirrors pallas_msm._fold_madd_kernel."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        ax[...] = jnp.zeros_like(ax)
        ay[...] = jnp.zeros_like(ay)
        az[...] = jnp.zeros_like(az)

    w = p_ref[0]
    qx, qy = _pad25(w & MASK16), _pad25(w >> 16)
    run = (ax[...], ay[...], az[...])
    nx, ny, nz = _madd25_exact(run, (qx, qy))
    skip = jnp.logical_and(
        jnp.max(qx.astype(jnp.int32), axis=0) == 0,
        jnp.max(qy.astype(jnp.int32), axis=0) == 0,
    )
    sel = skip[None, :]
    ax[...] = jnp.where(sel, run[0], nx)
    ay[...] = jnp.where(sel, run[1], ny)
    az[...] = jnp.where(sel, run[2], nz)

    @pl.when(j == steps - 1)
    def _():
        ox_ref[...], oy_ref[...], oz_ref[...] = ax[...], ay[...], az[...]


@functools.partial(jax.jit, static_argnums=(1, 2))
def fold25_packed(pk, blk: int = 1024, interpret: bool = False):
    """Fold W packed lazy-domain affine entries per lane into one Jacobian
    point (2^400 domain, redundant — canonicalize with to_mont16).
    pk: (W, 24, C) x|y<<16 words; (0, 0) sentinel lanes are skipped."""
    W, _, C = pk.shape
    blk = _blk_of(C, blk)
    spec = pl.BlockSpec((1, L24, blk), lambda i, j: (j, 0, i))
    ospec = pl.BlockSpec((L25, blk), lambda i, j: (0, i))
    out = pl.pallas_call(
        functools.partial(_fold25_kernel, steps=W),
        grid=(C // blk, W),
        in_specs=[spec],
        out_specs=[ospec] * 3,
        out_shape=[jax.ShapeDtypeStruct((L25, C), jnp.uint32)] * 3,
        scratch_shapes=[pltpu.VMEM((L25, blk), jnp.uint32)] * 3,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(pk)
    return tuple(out)


# -- canonical conversion (XLA side, used by the extraction stage) ------------


def _cond_sub25(v, c_int: int):
    """v - c if v >= c else v, over (25, *batch) strict rows (plain jnp)."""
    comp = np.array(
        [(x ^ 0xFFFF) for x in _limbs25(c_int)], np.uint32
    ).reshape((L25,) + (1,) * (v.ndim - 1))
    cols = v + jnp.asarray(comp)
    cols = cols.at[0].add(np.uint32(1))
    rows, carry = _carry_stack(cols, L25)
    return jnp.where((carry > 0)[None], rows, v)


def to_mont16(v25):
    """Redundant 25-limb 2^400-domain value (semi rows, value < 48N) ->
    canonical 24-limb 2^384-domain Montgomery limbs. Inverts the table
    pre-scale: out represents value(v25) * 2^-16 mod p."""
    from .field import FP

    rows, _ = _carry_stack(v25, L25)
    for k in (32, 16, 8, 4, 2, 1):
        rows = _cond_sub25(rows, k * _P)
    v24 = rows[:L24]  # canonical < N < 2^384 => row 24 is zero
    inv16 = FP.to_limbs(pow(1 << 16, -1, _P))
    shape = (L24,) + (1,) * (v24.ndim - 1)
    return FP.mul(v24, jnp.asarray(inv16).reshape(shape))

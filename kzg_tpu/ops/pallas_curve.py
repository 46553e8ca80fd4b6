"""Fused Pallas TPU kernels for whole Jacobian point operations.

One XLA-composed point op costs ~90 kernel launches (each field op is several
HLO kernels with HBM round-trips); these kernels run the ENTIRE group-law
formula — every Montgomery multiply, carry circuit and exceptional-case select
— inside a single Pallas program with VMEM-resident intermediates.

Provides madd (mixed add, the MSM hot op), add, and double for G1 (Fp blocks
of shape (24, T)). The formulas and exceptional-lane handling mirror
ops/curve.py exactly (same results lane-for-lane).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os

from .pallas_field import (
    MASK16,
    _carry_rows,
    _carry_stack,
    _const_col,
    _limbs_of,
    _shift_rows_down,
    _sub_n_rows,
    _sub_n_stack,
    mont_mul_block,
    mont_mul_stack,
)
from ..utils import hostmath as hm

L = 24
_P = hm.P
_NP = (-pow(_P, -1, 1 << (16 * L))) % (1 << (16 * L))
_N_LIMBS = _limbs_of(_P, L)
_ONE_MONT = _limbs_of((1 << (16 * L)) % _P, L)

# The MXU-offloaded REDC engine is the default (measured 1.27x end-to-end on
# the 2^16 commit MSM, bit-identical results); KZG_TPU_MXU_REDC=0 falls back
# to the pure-VPU stacked formulation, KZG_TPU_ROWWISE=1 to the row-wise
# reference.
_ROWWISE = os.environ.get("KZG_TPU_ROWWISE") == "1"
_MXU_REDC = os.environ.get("KZG_TPU_MXU_REDC", "1") == "1"


def _mul(a, b):
    if _ROWWISE:
        return mont_mul_block(a, b, _P, _NP, L)
    if _MXU_REDC:
        from .pallas_field import mont_mul_stack_mxu

        return mont_mul_stack_mxu(a, b, _P, _NP, L)
    return mont_mul_stack(a, b, _P, _NP, L)


def _add_rowwise(a, b):
    cols = [a[k] + b[k] for k in range(L)]
    rows, carry = _carry_rows(cols, L)
    diff, borrow = _sub_n_rows(rows, _N_LIMBS, L)
    take = jnp.logical_or(carry > 0, borrow == 0)
    return jnp.stack([jnp.where(take, diff[k], rows[k]) for k in range(L)], axis=0)


def _add(a, b):
    if _ROWWISE:
        return _add_rowwise(a, b)
    rows, carry = _carry_stack(a + b, L)
    diff, borrow = _sub_n_stack(rows, _N_LIMBS, L)
    take = jnp.logical_or(carry > 0, borrow == 0)
    return jnp.where(take[None], diff, rows)


def _sub_rowwise(a, b):
    # a - b: complement subtract; if it borrows, add N back
    comp = [(b[k] ^ 0xFFFF) for k in range(L)]
    cols = [a[k] + comp[k] for k in range(L)]
    cols[0] = cols[0] + 1
    rows, carry = _carry_rows(cols, L)
    borrowed = carry == 0
    cols2 = [rows[k] + _N_LIMBS[k] for k in range(L)]
    rows2, _ = _carry_rows(cols2, L)
    return jnp.stack(
        [jnp.where(borrowed, rows2[k], rows[k]) for k in range(L)], axis=0
    )


def _sub(a, b):
    if _ROWWISE:
        return _sub_rowwise(a, b)
    one_r0 = _const_col([1] + [0] * (L - 1), a)
    rows, carry = _carry_stack(a + (b ^ jnp.uint32(0xFFFF)) + one_r0, L)
    borrowed = carry == 0
    rows2, _ = _carry_stack(rows + _const_col(_N_LIMBS, a), L)
    return jnp.where(borrowed[None], rows2, rows)


def _dbl_f(a):
    return _add(a, a)


def _is_zero(a):
    if _ROWWISE:
        z = a[0]
        for k in range(1, L):
            z = z | a[k]
        return z == 0
    # Mosaic lacks unsigned reductions; rows are < 2^16 so int32 is exact
    return jnp.max(a.astype(jnp.int32), axis=0) == 0


def _sel(mask, a, b):
    return jnp.where(mask[None], a, b)


def _sel_pt(mask, p, q):
    return tuple(_sel(mask, x, y) for x, y in zip(p, q))


def _double_pt(p):
    """dbl-2009-l, identical to JacobianCurve.double."""
    X, Y, Z = p
    A = _mul(X, X)
    B = _mul(Y, Y)
    C = _mul(B, B)
    t = _mul(_add(X, B), _add(X, B))
    D = _dbl_f(_sub(_sub(t, A), C))
    E = _add(_dbl_f(A), A)
    Fq = _mul(E, E)
    X3 = _sub(Fq, _dbl_f(D))
    eightC = _dbl_f(_dbl_f(_dbl_f(C)))
    Y3 = _sub(_mul(E, _sub(D, X3)), eightC)
    Z3 = _dbl_f(_mul(Y, Z))
    return (X3, Y3, Z3)


def _madd_pt(p, q_affine):
    """madd-2007-bl with exceptional lanes, identical to JacobianCurve.madd."""
    X1, Y1, Z1 = p
    X2, Y2 = q_affine
    Z1Z1 = _mul(Z1, Z1)
    U2 = _mul(X2, Z1Z1)
    S2 = _mul(Y2, _mul(Z1, Z1Z1))
    H = _sub(U2, X1)
    I = _mul(_dbl_f(H), _dbl_f(H))
    J = _mul(H, I)
    r = _dbl_f(_sub(S2, Y1))
    V = _mul(X1, I)
    X3 = _sub(_sub(_mul(r, r), J), _dbl_f(V))
    Y3 = _sub(_mul(r, _sub(V, X3)), _dbl_f(_mul(Y1, J)))
    Z3 = _mul(_dbl_f(H), Z1)
    out = (X3, Y3, Z3)

    same_x = _is_zero(H)
    same_y = _is_zero(_sub(S2, Y1))
    out = _sel_pt(jnp.logical_and(same_x, same_y), _double_pt(p), out)
    inf = tuple(jnp.zeros_like(X3) for _ in range(3))
    out = _sel_pt(jnp.logical_and(same_x, ~same_y), inf, out)
    # Montgomery one, built from scalar constants (pallas kernels may not
    # capture traced constant arrays)
    one = jnp.stack(
        [jnp.full_like(X2[0], np.uint32(_ONE_MONT[k])) for k in range(L)], axis=0
    )
    out = _sel_pt(_is_zero(Z1), (X2, Y2, one), out)
    return out


def _madd_pt_fast(p, q_affine):
    """madd-2007-bl WITHOUT the inline doubling fallback: 11 Fp muls instead
    of 18. The P == Q lane (which needs a doubling) is astronomically rare in
    an MSM prefix scan over distinct table points, so instead of computing the
    double for every lane on every step, the kernel RETURNS a needs_double
    mask; the caller re-runs the exact kernel (_madd_pt) iff any lane flags.
    All cheap exceptional lanes (P == -Q -> infinity, P == inf -> Q) are
    handled here, bit-identically to _madd_pt."""
    X1, Y1, Z1 = p
    X2, Y2 = q_affine
    Z1Z1 = _mul(Z1, Z1)
    U2 = _mul(X2, Z1Z1)
    S2 = _mul(Y2, _mul(Z1, Z1Z1))
    H = _sub(U2, X1)
    I = _mul(_dbl_f(H), _dbl_f(H))
    J = _mul(H, I)
    r = _dbl_f(_sub(S2, Y1))
    V = _mul(X1, I)
    X3 = _sub(_sub(_mul(r, r), J), _dbl_f(V))
    Y3 = _sub(_mul(r, _sub(V, X3)), _dbl_f(_mul(Y1, J)))
    Z3 = _mul(_dbl_f(H), Z1)
    out = (X3, Y3, Z3)

    same_x = _is_zero(H)
    same_y = _is_zero(_sub(S2, Y1))
    z1_inf = _is_zero(Z1)
    inf = tuple(jnp.zeros_like(X3) for _ in range(3))
    out = _sel_pt(jnp.logical_and(same_x, ~same_y), inf, out)
    one = jnp.stack(
        [jnp.full_like(X2[0], np.uint32(_ONE_MONT[k])) for k in range(L)], axis=0
    )
    out = _sel_pt(z1_inf, (X2, Y2, one), out)
    needs_double = jnp.logical_and(jnp.logical_and(same_x, same_y), ~z1_inf)
    return out, needs_double


def _add_pt(p, q):
    """add-2007-bl with exceptional lanes, identical to JacobianCurve.add."""
    X1, Y1, Z1 = p
    X2, Y2, Z2 = q
    Z1Z1 = _mul(Z1, Z1)
    Z2Z2 = _mul(Z2, Z2)
    U1 = _mul(X1, Z2Z2)
    U2 = _mul(X2, Z1Z1)
    S1 = _mul(Y1, _mul(Z2, Z2Z2))
    S2 = _mul(Y2, _mul(Z1, Z1Z1))
    H = _sub(U2, U1)
    I = _mul(_dbl_f(H), _dbl_f(H))
    J = _mul(H, I)
    r = _dbl_f(_sub(S2, S1))
    V = _mul(U1, I)
    X3 = _sub(_sub(_mul(r, r), J), _dbl_f(V))
    Y3 = _sub(_mul(r, _sub(V, X3)), _dbl_f(_mul(S1, J)))
    Z3 = _mul(_mul(Z1, Z2), _dbl_f(H))
    out = (X3, Y3, Z3)

    same_x = _is_zero(H)
    same_y = _is_zero(_sub(S2, S1))
    out = _sel_pt(jnp.logical_and(same_x, same_y), _double_pt(p), out)
    inf = tuple(jnp.zeros_like(X3) for _ in range(3))
    out = _sel_pt(jnp.logical_and(same_x, ~same_y), inf, out)
    out = _sel_pt(_is_zero(Z1), q, out)
    out = _sel_pt(_is_zero(Z2), p, out)
    return out


# -- pallas wrappers -----------------------------------------------------------


def _wrap3in(point_fn, n_in: int):
    def kernel(*refs):
        ins = [r[:] for r in refs[:n_in]]
        outs = refs[n_in:]
        if n_in == 5:  # madd: (X1, Y1, Z1, x2, y2)
            res = point_fn((ins[0], ins[1], ins[2]), (ins[3], ins[4]))
        elif n_in == 6:  # add: two jacobians
            res = point_fn((ins[0], ins[1], ins[2]), (ins[3], ins[4], ins[5]))
        else:  # double: one jacobian
            res = point_fn((ins[0], ins[1], ins[2]))
        for o, r in zip(outs, res):
            o[:] = r

    return kernel


@functools.partial(jax.jit, static_argnums=(1, 2))
def _run_point_kernel(args, which: str, block: int):
    B = args[0].shape[1]
    n_in = len(args)
    fn = {"madd": _madd_pt, "add": _add_pt, "double": _double_pt}[which]
    kernel = _wrap3in(fn, n_in)
    spec = pl.BlockSpec((L, block), lambda i: (0, i))
    return pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((L, B), jnp.uint32)] * 3,
        grid=(B // block,),
        in_specs=[spec] * n_in,
        out_specs=[spec] * 3,
        compiler_params=pltpu.CompilerParams(
            # the stacked multiply keeps (L, L, block) outer-product halves
            # plus 6-pass f32 dot buffers live; the 16M default scoped-VMEM
            # cap is too small at block=1024
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(*args)


def _flatten_batch(arrs):
    shape = arrs[0].shape
    batch = int(np.prod(shape[1:], dtype=np.int64))
    return [a.reshape(L, batch) for a in arrs], shape, batch


def _pad_block(arrs, batch, block):
    pad = (-batch) % block
    if pad:
        arrs = [jnp.pad(a, [(0, 0), (0, pad)]) for a in arrs]
    return arrs, pad


def _run(which: str, arrs, block: int | None = None):
    flat, shape, batch = _flatten_batch(arrs)
    if block is None:
        block = min(1024, max(128, 1 << (batch - 1).bit_length()))
    flat, _ = _pad_block(flat, batch, block)
    out = _run_point_kernel(tuple(flat), which, block)
    return tuple(o[:, :batch].reshape(shape) for o in out)


def madd(p, q_affine, block: int | None = None):
    """Fused mixed add on (24, *batch) coordinate arrays (same-shape operands)."""
    return _run("madd", [p[0], p[1], p[2], q_affine[0], q_affine[1]], block)


def add(p, q, block: int | None = None):
    return _run("add", [*p, *q], block)


def double(p, block: int | None = None):
    return _run("double", list(p), block)

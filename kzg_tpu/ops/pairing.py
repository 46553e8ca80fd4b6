"""Optimal ate pairing on TPU — the device replacement for blst's
``blst_miller_loop`` + ``blst_final_exp`` (reference src/curves.rs:355-371).

Miller loop: Q iterates in Jacobian coordinates on the twist E'(Fp2); line
evaluations are derived for the tower Fp12 = Fp6[w]/(w^2-v), Fp6 = Fp2[v]/(v^3-XI)
with the untwist (x, y) -> (x w^-2, y w^-3). Each step's line is scaled by an
Fp2 factor only (killed by the final exponentiation), giving the sparse form

    l = a + b*w^3 + c*w^5,   a, b, c in Fp2

i.e. fp12 ((a,0,0), (0,b,c)). The loop runs under lax.fori_loop with the
BLS parameter bits as a constant table (6 set bits -> lax.cond skips the
addition step at runtime on the zero bits).

Final exponentiation: easy part via conj/inv/frobenius; hard part computes the
CANONICAL f^((p^4-p^2+1)/r) (blst-identical GT values) via the exact
Hayashida-Hayasaka-Teruya style decomposition

    (p^4-p^2+1)/r = (z-1)^2/3 * (z+p) * (z^2+p^2-1) + 1

which is integral for BLS12-381 (3 | (z-1)^2; verified in tests against the
exact integer identity). Round 2 shipped the 3d variant (e(P,Q)^3, avoiding
the /3); the canonical form costs the same — one 126-bit cyclotomic
exponentiation replaces two 64-bit ones — and makes the public bilinear_map
value externally comparable to blst's.

Infinity semantics match blst: e(O, Q) = e(P, O) = 1.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from . import fp2, fp6, fp12
from .field import FP
from ..utils import hostmath as hm

_X_BITS = np.array([(hm.BLS_X >> i) & 1 for i in range(hm.BLS_X.bit_length())], np.uint32)

# (z-1)^2/3 with z = -BLS_X: the non-sparse factor of the canonical hard part
_E_HARD = (hm.BLS_X + 1) ** 2 // 3
assert (hm.BLS_X + 1) ** 2 % 3 == 0
_E_BITS = np.array([(_E_HARD >> i) & 1 for i in range(_E_HARD.bit_length())], np.uint32)


def _line_to_fp12(a, b, c):
    z = jnp.zeros_like(a)
    return ((a, z, z), (z, b, c))


def _dbl_step(T, xP, yP):
    """Double T (Jacobian, twist) and evaluate the tangent line at P.

    Line (scaled by 2 y' XI Z^6, all Fp2): a = 2 XI Y Z^3 yP,
    b = 3X^3 - 2Y^2, c = -3 X^2 Z^2 xP.
    """
    X, Y, Z = T
    XX = fp2.square(X)
    YY = fp2.square(Y)
    ZZ = fp2.square(Z)
    YZ = fp2.mul(Y, Z)

    a = fp2.mul_by_fp(fp2.mul_by_xi(fp2.dbl(fp2.mul(YZ, ZZ))), yP)
    XXX = fp2.mul(X, XX)
    b = fp2.sub(fp2.add(fp2.dbl(XXX), XXX), fp2.dbl(YY))
    t = fp2.mul_by_fp(fp2.mul(XX, ZZ), xP)
    c = fp2.neg(fp2.add(fp2.dbl(t), t))  # -3 X^2 Z^2 xP

    # dbl-2009-l reusing A = XX, B = YY
    C = fp2.square(YY)
    D = fp2.dbl(fp2.sub(fp2.sub(fp2.square(fp2.add(X, YY)), XX), C))
    E = fp2.add(fp2.dbl(XX), XX)
    F = fp2.square(E)
    X3n = fp2.sub(F, fp2.dbl(D))
    Y3n = fp2.sub(fp2.mul(E, fp2.sub(D, X3n)), fp2.dbl(fp2.dbl(fp2.dbl(C))))
    Z3n = fp2.dbl(YZ)
    return (X3n, Y3n, Z3n), _line_to_fp12(a, b, c)


def _add_step(T, Q, xP, yP):
    """Mixed-add Q (affine twist) into T and evaluate the chord line at P.

    With n = Y - y2 Z^3, h = X - x2 Z^2 (so d = h Z), line scaled by -Z^3:
    a = XI h Z yP, b = n x2 - h Z y2, c = -n xP.
    """
    X, Y, Z = T
    x2, y2 = Q
    ZZ = fp2.square(Z)
    Z3 = fp2.mul(Z, ZZ)
    U2 = fp2.mul(x2, ZZ)
    S2 = fp2.mul(y2, Z3)
    h = fp2.sub(X, U2)  # note: -H of the usual madd convention
    n = fp2.sub(Y, S2)
    hZ = fp2.mul(h, Z)

    a = fp2.mul_by_fp(fp2.mul_by_xi(hZ), yP)
    b = fp2.sub(fp2.mul(n, x2), fp2.mul(hZ, y2))
    c = fp2.neg(fp2.mul_by_fp(n, xP))

    # madd-2007-bl with H = U2 - X = -h, r = 2(S2 - Y) = -2n
    H = fp2.neg(h)
    rr = fp2.neg(fp2.dbl(n))
    I = fp2.square(fp2.dbl(H))
    J = fp2.mul(H, I)
    V = fp2.mul(X, I)
    X3 = fp2.sub(fp2.sub(fp2.square(rr), J), fp2.dbl(V))
    Y3 = fp2.sub(fp2.mul(rr, fp2.sub(V, X3)), fp2.dbl(fp2.mul(Y, J)))
    Z3n = fp2.mul(fp2.dbl(H), Z)
    return (X3, Y3, Z3n), _line_to_fp12(a, b, c)


def miller_loop(p_affine, q_affine):
    """f_{|x|,Q}(P) in Fp12 (conjugated for the negative BLS parameter by the
    caller). p_affine = (xP, yP) Fp arrays; q_affine = (x2, y2) Fp2 arrays.
    Batched over trailing axes (both operands same batch shape).
    """
    xP, yP = p_affine
    x2, y2 = q_affine

    one2 = jnp.asarray(fp2.from_ints((1, 0)))
    one2 = one2.reshape(one2.shape + (1,) * (x2.ndim - 2))
    Z0 = jnp.broadcast_to(one2, x2.shape)
    T0 = (x2, y2, Z0)

    z6 = fp6.zeros_like((x2, x2, x2))
    f0 = fp12.one_like((z6, z6))

    nbits = len(_X_BITS)

    def body(j, state):
        f, T = state
        f = fp12.square(f)
        T, line = _dbl_step(T, xP, yP)
        f = fp12.mul(f, line)
        i = nbits - 2 - j
        bit = jnp.asarray(_X_BITS)[i]

        def with_add(op):
            ff, TT = op
            TT, l2 = _add_step(TT, (x2, y2), xP, yP)
            return fp12.mul(ff, l2), TT

        f, T = lax.cond(bit == 1, with_add, lambda op: op, (f, T))
        return f, T

    f, _T = lax.fori_loop(0, nbits - 1, body, (f0, T0))
    return f


@jax.jit
def _exp_by_z(f):
    """f^z for the BLS parameter z = -|x| on a cyclotomic element: square-and-
    multiply over the 6 set bits of |x|, then conjugate (cyclotomic inverse).

    Jitted standalone: the hard part calls it FIVE times, and as a separate
    program it compiles once and is reused (one inlined mega-program was the
    single largest compile in the framework — XLA:CPU codegen and the TPU AOT
    helper both scale superlinearly with module size)."""
    nbits = hm.BLS_X.bit_length()

    def body(j, acc):
        acc = fp12.square(acc)
        bit = jnp.asarray(_X_BITS)[nbits - 2 - j]
        return lax.cond(bit == 1, lambda a: fp12.mul(a, f), lambda a: a, acc)

    out = lax.fori_loop(0, nbits - 1, body, f)
    return fp12.conj(out)  # z < 0


@jax.jit
def _final_exp_easy(f):
    """Easy part (p^6-1)(p^2+1): conj/inv/frobenius -> cyclotomic element."""
    fc = fp12.conj(f)
    fi = fp12.inv(f)
    f = fp12.mul(fc, fi)  # f^(p^6 - 1)
    return fp12.mul(fp12.frobenius(f, 2), f)  # ^(p^2 + 1)


@jax.jit
def _exp_by_e(f):
    """f^e for the fixed positive constant e = (z-1)^2/3 (126 bits): plain
    square-and-multiply with the bits as an embedded table (lax.cond skips
    the multiply on zero bits at runtime)."""
    nbits = len(_E_BITS)

    def body(j, acc):
        acc = fp12.square(acc)
        bit = jnp.asarray(_E_BITS)[nbits - 2 - j]
        return lax.cond(bit == 1, lambda a: fp12.mul(a, f), lambda a: a, acc)

    return lax.fori_loop(0, nbits - 1, body, f)


@jax.jit
def _mul_frob1(a, b):
    return fp12.mul(a, fp12.frobenius(b, 1))  # a * b^p


@jax.jit
def _g4_combine(g3zz, g3, f):
    g4 = fp12.mul(fp12.mul(g3zz, fp12.frobenius(g3, 2)), fp12.conj(g3))
    return fp12.mul(g4, f)


def final_exponentiation(f):
    """CANONICAL reduced pairing power: easy part (p^6-1)(p^2+1), then the
    hard part f^((p^4-p^2+1)/r) via the exact chain

        d = (z-1)^2/3 * (z+p) * (z^2+p^2-1) + 1

    (integral for BLS12-381: 3 | (z-1)^2). Produces blst-identical GT values
    — external comparisons of bilinear_map against other BLS12-381 stacks
    match bit-for-bit (reference exposes the raw pairing publicly,
    src/curves.rs:355-371).

    Composed from small jitted programs (not one inlined trace): the three
    z-exponentiations share ONE compiled program per batch shape.
    """
    f = _final_exp_easy(f)
    g2 = _exp_by_e(f)  # f^((z-1)^2 / 3)
    g3 = _mul_frob1(_exp_by_z(g2), g2)  # ^(z+p)
    return _g4_combine(_exp_by_z(_exp_by_z(g3)), g3, f)  # ^(z^2+p^2-1) * f


@jax.jit
def _miller_conj(p_affine, q_affine):
    return fp12.conj(miller_loop(p_affine, q_affine))  # negative BLS parameter


@jax.jit
def _mask_trivial(out, p_inf, q_inf):
    triv = jnp.logical_or(p_inf, q_inf)
    return fp12.select(triv, fp12.one_like(out), out)


def pairing(p_affine, p_inf, q_affine, q_inf):
    """Reduced optimal ate pairing, batched. `p_inf`/`q_inf` mask infinity
    lanes (result 1, matching blst). BLS x < 0: Miller value conjugated.

    Composed from separately-jitted stages (Miller loop, shared z-exponent
    program, small combines) — ~same runtime, a fraction of the compile."""
    f = _miller_conj(p_affine, q_affine)
    out = final_exponentiation(f)
    return _mask_trivial(out, p_inf, q_inf)


def pairing_points(p1, p2):
    """Pairing of API-level points (kzg_tpu.curves.G1Point, G2Point) ->
    host-comparable fp12 ints tuple."""
    (x1, y1), inf1 = p1._curve.to_affine(p1.jac)
    (x2, y2), inf2 = p2._curve.to_affine(p2.jac)
    out = pairing((x1, y1), inf1, (x2, y2), inf2)
    return fp12.to_ints(out)


def pairing_pair_equal(pa1, pa2, pb1, pb2) -> bool:
    """e(pa1, pa2) == e(pb1, pb2), both pairings in ONE batched device call
    (the verification shape, reference src/polynomial.rs:282-293)."""
    (xa, ya), infa = pa1._curve.to_affine(pa1.jac)
    (x2a, y2a), inf2a = pa2._curve.to_affine(pa2.jac)
    (xb, yb), infb = pb1._curve.to_affine(pb1.jac)
    (x2b, y2b), inf2b = pb2._curve.to_affine(pb2.jac)
    xP = jnp.stack([xa, xb], axis=-1)
    yP = jnp.stack([ya, yb], axis=-1)
    pinf = jnp.stack([infa, infb], axis=-1)
    xQ = jnp.stack([x2a, x2b], axis=-1)
    yQ = jnp.stack([y2a, y2b], axis=-1)
    qinf = jnp.stack([inf2a, inf2b], axis=-1)
    out = pairing((xP, yP), pinf, (xQ, yQ), qinf)
    eq01 = _fp12_batch_eq01(out)
    return bool(eq01)


@jax.jit
def _fp12_batch_eq01(out):
    flat = jnp.stack([jnp.stack(c6, axis=2) for c6 in out], axis=2)  # (L,2,2,3,B)
    return jnp.all(flat[..., 0] == flat[..., 1])

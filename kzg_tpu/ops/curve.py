"""Batched short-Weierstrass Jacobian curve arithmetic on TPU.

One generic ``JacobianCurve`` covers both BLS12-381 groups: G1 instantiates it
over Fp (element shape ``(24, *batch)``), G2 over Fp2 (``(24, 2, *batch)``).
Points are ``(X, Y, Z)`` triples of field elements (Jacobian coordinates,
``Z == 0`` marks infinity); the whole API is data-parallel over trailing batch
axes and branchless — exceptional cases of the addition law (P == Q, P == -Q,
P or Q at infinity) are folded in with lane masks, the natural formulation for
the 8x128 VPU.

This layer replaces blst's `blst_p1_*`/`blst_p2_*` point kernels used by the
reference (src/curves.rs:19-97 for G1, src/curves.rs:186-250 for G2): add,
double, and MSB-first double-and-add scalar multiplication (the reference's
`mult` is blst's 256-bit double-and-add, src/curves.rs:90-96).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from .field import FP, FR
from . import fp2
from ..utils import hostmath as hm


class JacobianCurve:
    """Generic Jacobian-coordinate group law over a field-ops namespace.

    `F` must expose: add, sub, neg, dbl, mul, square, select, is_zero, eq —
    all batched over trailing axes with masks of batch shape.
    """

    def __init__(self, F, name: str):
        self.F = F
        self.name = name

    # -- basic predicates -----------------------------------------------------

    def is_inf(self, p):
        return self.F.is_zero(p[2])

    def select(self, mask, p, q):
        F = self.F
        return tuple(F.select(mask, a, b) for a, b in zip(p, q))

    def inf_like(self, p):
        """Point at infinity with p's batch shape: (0, 0, 0).

        (X=Y=0 is fine: every consumer checks Z first.)
        """
        return tuple(jnp.zeros_like(c) for c in p)

    @staticmethod
    def lift(a, ndim: int):
        """Append trailing singleton batch axes (limb/component axes lead)."""
        a = jnp.asarray(a)
        return a.reshape(a.shape + (1,) * (ndim - a.ndim)) if a.ndim < ndim else a

    def lift_point(self, p, ndim: int):
        return tuple(self.lift(c, ndim) for c in p)

    # -- group law ------------------------------------------------------------

    def _pallas_ok(self, p) -> bool:
        """Fused whole-point Pallas kernels: G1 on TPU with enough lanes."""
        if self.F is not FP:
            return False
        from .field import _use_pallas, _PALLAS_MIN_BATCH

        if not _use_pallas():
            return False
        import numpy as _np

        batch = int(_np.prod(p[2].shape[1:], dtype=_np.int64)) if p[2].ndim > 1 else 1
        return batch >= _PALLAS_MIN_BATCH

    def double(self, p):
        """dbl-2009-l (a = 0): 2M + 5S. Maps infinity/2-torsion to infinity."""
        if self._pallas_ok(p):
            from . import pallas_curve as pc

            return pc.double(p)
        F = self.F
        X, Y, Z = p
        A = F.square(X)
        B = F.square(Y)
        C = F.square(B)
        t = F.square(F.add(X, B))
        D = F.dbl(F.sub(F.sub(t, A), C))
        E = F.add(F.dbl(A), A)
        Fq = F.square(E)
        X3 = F.sub(Fq, F.dbl(D))
        eightC = F.dbl(F.dbl(F.dbl(C)))
        Y3 = F.sub(F.mul(E, F.sub(D, X3)), eightC)
        Z3 = F.dbl(F.mul(Y, Z))
        return (X3, Y3, Z3)

    def add(self, p, q):
        """add-2007-bl with branchless exceptional-case handling: 11M + 5S."""
        if self._pallas_ok(p) and p[2].shape == q[2].shape:
            from . import pallas_curve as pc

            return pc.add(p, q)
        F = self.F
        X1, Y1, Z1 = p
        X2, Y2, Z2 = q
        Z1Z1 = F.square(Z1)
        Z2Z2 = F.square(Z2)
        U1 = F.mul(X1, Z2Z2)
        U2 = F.mul(X2, Z1Z1)
        S1 = F.mul(Y1, F.mul(Z2, Z2Z2))
        S2 = F.mul(Y2, F.mul(Z1, Z1Z1))
        H = F.sub(U2, U1)
        I = F.square(F.dbl(H))
        J = F.mul(H, I)
        r = F.dbl(F.sub(S2, S1))
        V = F.mul(U1, I)
        X3 = F.sub(F.sub(F.square(r), J), F.dbl(V))
        Y3 = F.sub(F.mul(r, F.sub(V, X3)), F.dbl(F.mul(S1, J)))
        Z3 = F.mul(F.mul(Z1, Z2), F.dbl(H))
        out = (X3, Y3, Z3)

        # Exceptional lanes, applied innermost-first:
        same_x = F.is_zero(H)
        same_y = F.is_zero(F.sub(S2, S1))
        out = self.select(jnp.logical_and(same_x, same_y), self.double(p), out)
        out = self.select(jnp.logical_and(same_x, ~same_y), self.inf_like(out), out)
        out = self.select(self.is_inf(p), q, out)
        out = self.select(self.is_inf(q), p, out)
        return out

    def madd(self, p, q_affine):
        """Mixed add (Z2 = 1 implicit): 7M + 4S. q_affine = (x2, y2) canonical
        affine Montgomery coordinates; q_affine must NOT be a lane at infinity
        (affine has no such encoding) — callers mask those lanes themselves."""
        F = self.F
        X1, Y1, Z1 = p
        X2, Y2 = (self.lift(c, X1.ndim) for c in q_affine)
        if self._pallas_ok(p):
            from . import pallas_curve as pc

            X2b = jnp.broadcast_to(X2, X1.shape)
            Y2b = jnp.broadcast_to(Y2, Y1.shape)
            return pc.madd(p, (X2b, Y2b))
        Z1Z1 = F.square(Z1)
        U2 = F.mul(X2, Z1Z1)
        S2 = F.mul(Y2, F.mul(Z1, Z1Z1))
        H = F.sub(U2, X1)
        I = F.square(F.dbl(H))
        J = F.mul(H, I)
        r = F.dbl(F.sub(S2, Y1))
        V = F.mul(X1, I)
        X3 = F.sub(F.sub(F.square(r), J), F.dbl(V))
        Y3 = F.sub(F.mul(r, F.sub(V, X3)), F.dbl(F.mul(Y1, J)))
        Z3 = F.mul(F.dbl(H), Z1)
        out = (X3, Y3, Z3)

        same_x = F.is_zero(H)
        same_y = F.is_zero(F.sub(S2, Y1))
        out = self.select(jnp.logical_and(same_x, same_y), self.double(p), out)
        out = self.select(jnp.logical_and(same_x, ~same_y), self.inf_like(out), out)
        one = jnp.broadcast_to(self._one_like(X1), X1.shape)
        q_jac = (X2 + jnp.zeros_like(X1), Y2 + jnp.zeros_like(Y1), one)
        out = self.select(self.is_inf(p), q_jac, out)
        return out

    def _one_like(self, ref):
        if self.F is FP:
            return FP.one(ref)
        return self.lift(jnp.asarray(fp2.from_ints((1, 0))), ref.ndim)

    def neg(self, p):
        return (p[0], self.F.neg(p[1]), p[2])

    def sub(self, p, q):
        """p - q (reference G1Point::sub = cneg + add, src/curves.rs:66-74)."""
        return self.add(p, self.neg(q))

    def eq(self, p, q):
        """Projective equality: X1 Z2^2 == X2 Z1^2 and Y1 Z2^3 == Y2 Z1^3."""
        F = self.F
        X1, Y1, Z1 = p
        X2, Y2, Z2 = q
        Z1Z1, Z2Z2 = F.square(Z1), F.square(Z2)
        ex = F.eq(F.mul(X1, Z2Z2), F.mul(X2, Z1Z1))
        ey = F.eq(F.mul(Y1, F.mul(Z2, Z2Z2)), F.mul(Y2, F.mul(Z1, Z1Z1)))
        both_inf = jnp.logical_and(self.is_inf(p), self.is_inf(q))
        one_inf = jnp.logical_xor(self.is_inf(p), self.is_inf(q))
        return jnp.logical_or(both_inf, jnp.logical_and(~one_inf, jnp.logical_and(ex, ey)))

    # -- scalar multiplication -------------------------------------------------

    @staticmethod
    def _scalar_bit(k: jnp.ndarray, i):
        """Bit i (0 = LSB) of standard-form Fr limbs k: (16, *batch) u32."""
        limb = lax.dynamic_index_in_dim(k, i // 16 if isinstance(i, int) else i >> 4, axis=0, keepdims=False)
        shift = (i % 16) if isinstance(i, int) else (i & 15).astype(jnp.uint32)
        return (limb >> shift) & 1

    def mul_scalar(self, p, k, nbits: int = 256):
        """[k] p with k in standard-form Fr limbs (16, *batch_k) u32.

        MSB-first double-and-add under lax.fori_loop (one traced body). Matches
        the reference's 256-bit blst_p1_mult semantics (src/curves.rs:90-96).
        Batch shapes of p and k broadcast.
        """
        cd = self._cdim()
        bshape = jnp.broadcast_shapes(p[2].shape[cd:], k.shape[1:])
        nd = cd + len(bshape)
        p = self.lift_point(p, nd)
        k = self.lift(k, 1 + len(bshape))

        def body(j, acc):
            i = nbits - 1 - j
            acc = self.double(acc)
            bit = self._scalar_bit(k, i)
            return self.select(jnp.broadcast_to(bit == 1, bshape), self.add(acc, p), acc)

        zero = jnp.zeros(p[2].shape[:cd] + bshape, jnp.uint32)
        acc0 = (zero, zero, zero)
        return lax.fori_loop(0, nbits, body, acc0)

    def mul_scalar_affine(self, p_affine, k, nbits: int = 256):
        """[k] p for an affine base point — mixed adds in the ladder (cheaper)."""
        cd = self._cdim()
        x = jnp.asarray(p_affine[0])
        bshape = jnp.broadcast_shapes(x.shape[cd:], k.shape[1:])
        nd = cd + len(bshape)
        p_affine = tuple(self.lift(c, nd) for c in p_affine)
        k = self.lift(k, 1 + len(bshape))

        def body(j, acc):
            i = nbits - 1 - j
            acc = self.double(acc)
            bit = self._scalar_bit(k, i)
            return self.select(jnp.broadcast_to(bit == 1, bshape), self.madd(acc, p_affine), acc)

        zero = jnp.zeros(x.shape[:cd] + bshape, jnp.uint32)
        acc0 = (zero, zero, zero)
        return lax.fori_loop(0, nbits, body, acc0)

    def _cdim(self):
        """Number of leading non-batch axes of a field element."""
        return 1 if self.F is FP else 2

    # -- coordinate conversion --------------------------------------------------

    def to_affine(self, p):
        """Jacobian -> affine on device (one Fermat inversion per lane).

        Infinity lanes return (0, 0) with an `inf` mask.
        """
        F = self.F
        X, Y, Z = p
        inf = self.is_inf(p)
        if self.F is FP:
            safe = FP.select(inf, FP.one(Z) + jnp.zeros_like(Z), Z)
            # batched lanes: Montgomery-trick inversion (one Fermat total)
            zi = FP.inv_batch(safe, -1) if safe.ndim >= 2 else FP.inv(safe)
        else:
            zi = fp2.inv(fp2.select(inf, jnp.asarray(fp2.one(Z)) + jnp.zeros_like(Z), Z))
        zi2 = F.square(zi)
        x = F.mul(X, zi2)
        y = F.mul(Y, F.mul(zi, zi2))
        x = F.select(inf, jnp.zeros_like(x), x)
        y = F.select(inf, jnp.zeros_like(y), y)
        return (x, y), inf


G1 = JacobianCurve(FP, "G1")
G2 = JacobianCurve(fp2, "G2")


# ---------------------------------------------------------------------------
# Host <-> device point conversion (IO boundary only; exact python ints)
# ---------------------------------------------------------------------------


def g1_to_device(p, batch: bool = False):
    """Host affine (x, y) (or None) -> device Jacobian Montgomery triple."""
    pts = p if batch else [p]
    xs, ys, zs = [], [], []
    for pt in pts:
        if pt is None:
            xs.append(0); ys.append(0); zs.append(0)
        else:
            xs.append(pt[0]); ys.append(pt[1]); zs.append(1)
    X = FP.many_to_limbs(xs)
    Y = FP.many_to_limbs(ys)
    Z = FP.many_to_limbs(zs)
    if not batch:
        X, Y, Z = X[:, 0], Y[:, 0], Z[:, 0]
    return (jnp.asarray(X), jnp.asarray(Y), jnp.asarray(Z))


def g1_from_device(p) -> list | tuple | None:
    """Device Jacobian (possibly batched) -> host affine ints (None = infinity)."""
    X, Y, Z = (np.asarray(c) for c in p)
    single = X.ndim == 1
    if single:
        X, Y, Z = X[:, None], Y[:, None], Z[:, None]
    n = int(np.prod(X.shape[1:]))
    Xf, Yf, Zf = (a.reshape(a.shape[0], n) for a in (X, Y, Z))
    out = []
    for j in range(n):
        z = FP.from_limbs(Zf[:, j])
        if z == 0:
            out.append(None)
            continue
        zi = hm.fp_inv(z)
        x = FP.from_limbs(Xf[:, j]) * zi * zi % hm.P
        y = FP.from_limbs(Yf[:, j]) * zi * zi * zi % hm.P
        out.append((x, y))
    return out[0] if single else out


def g2_to_device(p, batch: bool = False):
    """Host affine ((x0,x1),(y0,y1)) (or None) -> device Jacobian Fp2 triple."""
    pts = p if batch else [p]
    xs, ys, zs = [], [], []
    for pt in pts:
        if pt is None:
            xs.append((0, 0)); ys.append((0, 0)); zs.append((0, 0))
        else:
            xs.append(pt[0]); ys.append(pt[1]); zs.append((1, 0))
    X = fp2.many_from_ints(xs)
    Y = fp2.many_from_ints(ys)
    Z = fp2.many_from_ints(zs)
    if not batch:
        X, Y, Z = X[:, :, 0], Y[:, :, 0], Z[:, :, 0]
    return (jnp.asarray(X), jnp.asarray(Y), jnp.asarray(Z))


def g2_from_device(p):
    X, Y, Z = (np.asarray(c) for c in p)
    single = X.ndim == 2
    if single:
        X, Y, Z = X[..., None], Y[..., None], Z[..., None]
    n = int(np.prod(X.shape[2:]))
    Xf, Yf, Zf = (a.reshape(a.shape[0], 2, n) for a in (X, Y, Z))
    out = []
    for j in range(n):
        z = (FP.from_limbs(Zf[:, 0, j]), FP.from_limbs(Zf[:, 1, j]))
        if z == (0, 0):
            out.append(None)
            continue
        zi = hm.fp2_inv(z)
        zi2 = hm.fp2_sq(zi)
        zi3 = hm.fp2_mul(zi, zi2)
        x = hm.fp2_mul((FP.from_limbs(Xf[:, 0, j]), FP.from_limbs(Xf[:, 1, j])), zi2)
        y = hm.fp2_mul((FP.from_limbs(Yf[:, 0, j]), FP.from_limbs(Yf[:, 1, j])), zi3)
        out.append((x, y))
    return out[0] if single else out


# Device-resident generators (affine Montgomery form), as numpy constants.
G1_GEN_DEV = (FP.to_limbs(hm.G1_GEN[0]), FP.to_limbs(hm.G1_GEN[1]))
G2_GEN_DEV = (fp2.from_ints(hm.G2_GEN[0]), fp2.from_ints(hm.G2_GEN[1]))


def fr_to_device(values, batch: bool = False) -> jnp.ndarray:
    """Python int scalar(s) -> standard-form Fr limbs (16,) / (16, n) for mul_scalar."""
    from . import limbs as lb

    vals = values if batch else [values]
    arr = lb.ints_to_limbs([v % hm.R for v in vals], FR.L)
    return jnp.asarray(arr if batch else arr[:, 0])

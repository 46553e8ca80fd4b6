"""Multi-scalar multiplication (MSM) kernels on TPU.

The commit hot loop of the reference is a serial per-coefficient
``setup_point.mult(coefficient)`` + ``add`` (src/polynomial.rs:207-214; each
mult itself a 256-bit double-and-add in blst). Here the whole MSM is one
batched device computation:

``msm_batched``: every point is scalar-multiplied *simultaneously* (one
256-iteration ladder over the full batch) and the results are combined with a
log2(N) tree of batched Jacobian adds. Identical group output to the
reference's loop — parity is on values, not algorithm.

Padding convention: scalars are padded with zeros; zero scalars yield the
point at infinity in the ladder, which the add tree absorbs.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from .field import FR
from .curve import G1, G2, JacobianCurve


def tree_reduce(curve: JacobianCurve, pts, axis: int = -1):
    """Sum a batch of Jacobian points along `axis` in log2(N) levels.

    ONE fori_loop whose body is a single batched add with a dynamic stride
    (trace size is independent of N — an unrolled log-N chain of adds takes
    minutes of XLA compile for large N). Level r adds lane i + 2^r into lane i
    for lanes i ≡ 0 (mod 2^(r+1)); the sum lands in lane 0.
    """
    Z = pts[2]
    ax = axis % Z.ndim
    n = Z.shape[ax]
    if n == 1:
        return tuple(jnp.squeeze(c, axis=ax) for c in pts)
    # pad to a power of two with infinity lanes (Z = 0)
    n2 = 1 << (n - 1).bit_length()
    if n2 != n:
        pad = [(0, 0)] * Z.ndim
        pad[ax] = (0, n2 - n)
        pts = tuple(jnp.pad(c, pad) for c in pts)
    levels = n2.bit_length() - 1
    # lane index along the reduce axis, shaped for batch-mask broadcast
    iota = lax.broadcasted_iota(jnp.uint32, pts[2].shape[curve._cdim():], ax - curve._cdim())

    def body(r, acc):
        shift = jnp.uint32(1) << r.astype(jnp.uint32)
        partner = tuple(jnp.roll(c, -shift.astype(jnp.int32), axis=ax) for c in acc)
        summed = curve.add(acc, partner)
        mask = (iota & (2 * shift - 1)) == 0
        return curve.select(mask, summed, acc)

    out = lax.fori_loop(0, levels, body, pts)
    return tuple(lax.index_in_dim(c, 0, axis=ax, keepdims=False) for c in out)


def msm_batched(curve: JacobianCurve, pts_jac, scalars: jnp.ndarray):
    """MSM over Jacobian points: sum_i scalars_i * pts_i.

    pts_jac: Jacobian triple with one trailing batch axis of size N.
    scalars: (16, N) standard-form Fr limbs.
    """
    prods = curve.mul_scalar(pts_jac, scalars)
    return tree_reduce(curve, prods, axis=-1)


def msm_batched_affine(curve: JacobianCurve, pts_affine, scalars: jnp.ndarray, inf_mask=None):
    """MSM over affine points (cheaper ladder via mixed adds).

    pts_affine: (x, y) with trailing batch axis N — no infinity lanes unless
    inf_mask marks them (those lanes contribute nothing).
    scalars: (16, N) standard-form Fr limbs.
    """
    prods = curve.mul_scalar_affine(pts_affine, scalars)
    if inf_mask is not None:
        prods = curve.select(inf_mask, curve.inf_like(prods), prods)
    return tree_reduce(curve, prods, axis=-1)


@partial(jax.jit, static_argnums=(0,))
def _msm_g1_affine_jit(n: int, x, y, scalars):
    return msm_batched_affine(G1, (x, y), scalars)


def msm_g1(pts_affine, scalars, inf_mask=None):
    """Jitted G1 MSM entry point (affine points)."""
    if inf_mask is not None:
        return msm_batched_affine(G1, pts_affine, scalars, inf_mask)
    x, y = pts_affine
    return _msm_g1_affine_jit(int(scalars.shape[-1]), x, y, scalars)

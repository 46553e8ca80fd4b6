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

from .field import FP, FR
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


# ---------------------------------------------------------------------------
# Pippenger (bucket) MSM
#
# The TPU formulation: per 8-bit window, SORT points by digit, then a chunked
# scan-accumulate-flush pass builds per-(chunk, digit) partial sums with ONE
# mixed add per point per window (the work-optimal bucket accumulation) and
# scatter-SETs each completed run into its bucket (runs are contiguous after
# the sort, so every (chunk, digit) slot is written at most once — no
# read-modify-write races). Cross-chunk partials tree-reduce, the classic
# suffix-sum turns buckets into the window sum, and a Horner ladder combines
# windows. ~32N mixed adds total vs ~256N ladder double+adds for the batched
# naive MSM — and every stage is a compile-once loop body.
# ---------------------------------------------------------------------------

WINDOW_BITS = 8
N_WINDOWS = 32  # 256 / WINDOW_BITS
N_BUCKETS = 1 << WINDOW_BITS


def _scalar_digits(scalars: jnp.ndarray) -> jnp.ndarray:
    """(16, N) u16 limbs -> (32, N) base-256 digits, least significant first."""
    lo = scalars & jnp.uint32(0xFF)
    hi = scalars >> 8
    # interleave: digit[2j] = lo[j], digit[2j+1] = hi[j]
    return jnp.stack([lo, hi], axis=1).reshape(2 * scalars.shape[0], *scalars.shape[1:])


def msm_pippenger_g1(pts_affine, scalars: jnp.ndarray, inf_mask=None, chunk: int = 256):
    """G1 MSM via bucketed windows. pts_affine (x, y): (24, N) canonical
    Montgomery affine; scalars: (16, N) standard-form limbs. Lanes flagged in
    inf_mask (or with zero scalars) contribute nothing."""
    x, y = pts_affine
    n = scalars.shape[-1]
    m = min(chunk, max(8, 1 << (n - 1).bit_length()))
    n_pad = -(-n // m) * m
    if n_pad != n:
        padc = [(0, 0), (0, n_pad - n)]
        x, y = jnp.pad(x, padc), jnp.pad(y, padc)
        scalars = jnp.pad(scalars, padc)
    C = n_pad // m

    digits = _scalar_digits(scalars)  # (32, n_pad)
    if inf_mask is not None:
        inf_mask = jnp.pad(inf_mask, (0, n_pad - n))
        digits = jnp.where(inf_mask[None], 0, digits)
    def per_window(d_w):
        order = jnp.argsort(d_w)
        xs = x[:, order].reshape(FP.L, C, m)
        ys = y[:, order].reshape(FP.L, C, m)
        ds = d_w[order].reshape(C, m)

        zero_pt = jnp.zeros((FP.L, C), jnp.uint32)
        b0 = tuple(jnp.zeros((FP.L, N_BUCKETS, C), jnp.uint32) for _ in range(3))
        one_c = jnp.broadcast_to(jnp.asarray(FP.ONE_MONT)[:, None], (FP.L, C))
        carange = jnp.arange(C)

        def flush(buckets, run, run_d, active):
            idx = jnp.where(active, run_d, jnp.uint32(N_BUCKETS))  # drop inactive
            return tuple(
                b.at[:, idx, carange].set(r, mode="drop") for b, r in zip(buckets, run)
            )

        def step(state, td):
            buckets, run, run_d = state
            pt_x, pt_y, d = td
            same = d == run_d
            added = G1.madd(run, (pt_x, pt_y))
            fresh = (pt_x, pt_y, one_c)
            new_run = G1.select(same, added, fresh)
            # flush completed runs (digit changed; digit 0 contributes nothing)
            buckets = flush(buckets, run, run_d, jnp.logical_and(~same, run_d != 0))
            return (buckets, new_run, d), None

        init_run = (zero_pt, zero_pt, zero_pt)  # infinity (absorbed on first madd)
        init_d = jnp.full((C,), N_BUCKETS, jnp.uint32)  # sentinel: no run yet
        xs_t = jnp.moveaxis(xs, 2, 0)  # (m, L, C)
        ys_t = jnp.moveaxis(ys, 2, 0)
        ds_t = jnp.moveaxis(ds, 1, 0)  # (m, C)
        (buckets, run, run_d), _ = lax.scan(
            step, (b0, init_run, init_d), (xs_t, ys_t, ds_t)
        )
        buckets = flush(buckets, run, run_d, run_d != 0)
        # cross-chunk reduction -> (L, N_BUCKETS) per coordinate
        return tree_reduce(G1, buckets, axis=-1)

    # lax.map compiles per_window ONCE and loops over the 32 windows.
    win_buckets = lax.map(per_window, digits.reshape(N_WINDOWS, n_pad))
    # (32, L, N_BUCKETS) x3 -> suffix-sum over buckets b = B-1 .. 1, batch=windows
    bs = tuple(jnp.moveaxis(b, 0, -1) for b in win_buckets)  # (L, B, 32)
    rev = tuple(b[:, -1:0:-1] for b in bs)  # b = B-1 .. 1: (L, B-1, 32)

    def suffix_step(state, bucket_b):
        running, acc = state
        running = G1.add(running, bucket_b)
        acc = G1.add(acc, running)
        return (running, acc), None

    zero_w = tuple(jnp.zeros((FP.L, N_WINDOWS), jnp.uint32) for _ in range(3))
    rev_t = tuple(jnp.moveaxis(b, 1, 0) for b in rev)  # (B-1, L, 32)
    (_, win_sums), _ = lax.scan(suffix_step, (zero_w, zero_w), rev_t)

    # Horner combine over windows: R = ((S31 * 2^8 + S30) * 2^8 + ...) + S0
    top = tuple(c[:, -1] for c in win_sums)

    def horner(w, acc):
        for _ in range(WINDOW_BITS):
            acc = G1.double(acc)
        s_w = tuple(lax.dynamic_index_in_dim(c, N_WINDOWS - 1 - w, axis=-1, keepdims=False)
                    for c in win_sums)
        return G1.add(acc, s_w)

    return lax.fori_loop(1, N_WINDOWS, horner, top)


PIPPENGER_THRESHOLD = 128  # below this the batched ladder wins (less fixed cost)


@partial(jax.jit, static_argnums=(0,))
def _msm_pip_jit(n: int, x, y, scalars, inf_mask):
    return msm_pippenger_g1((x, y), scalars, inf_mask)


def msm_g1(pts_affine, scalars, inf_mask=None):
    """Jitted G1 MSM entry point (affine points): bucketed Pippenger for large
    batches, batched ladder for small ones. Identical group results."""
    n = int(scalars.shape[-1])
    x, y = pts_affine
    if n >= PIPPENGER_THRESHOLD:
        return _msm_pip_jit(n, x, y, scalars, inf_mask)
    if inf_mask is not None:
        return msm_batched_affine(G1, pts_affine, scalars, inf_mask)
    return _msm_g1_affine_jit(n, x, y, scalars)

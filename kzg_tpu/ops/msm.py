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
# TPU formulation with NO scatter (TPU scatters serialize) and no per-step
# bucket state:
#   per window: SORT points by 8-bit digit, split into C chunks of length m,
#   run ONE lax.scan of m steps whose state is just the current run
#   accumulator per chunk (same digit -> mixed add, new digit -> restart) and
#   whose stacked outputs are the running sums at every step. Because digits
#   are sorted within a chunk, the bucket sum for digit b inside chunk c is
#   simply the running value at the LAST position where the chunk's digit
#   equals b — extracted afterwards with a batched searchsorted + gather.
#   Cross-chunk partials reduce with a shrinking halving tree, buckets reduce
#   with the classic suffix-sum scan (batched over windows), and a Horner
#   ladder combines the 32 windows.
#
# Work: ~32N mixed adds + ~B*C masked adds per window, vs ~256N double+adds
# for the batched naive ladder. Windows are packed into the scan batch
# (lane occupancy) up to a memory cap; lax.map runs the window groups.
# ---------------------------------------------------------------------------

WINDOW_BITS = 8
N_WINDOWS = 32  # 256 / WINDOW_BITS
N_BUCKETS = 1 << WINDOW_BITS


def _scalar_digits(scalars: jnp.ndarray) -> jnp.ndarray:
    """(16, N) u16 limbs -> (32, N) base-256 digits, least significant first."""
    lo = scalars & jnp.uint32(0xFF)
    hi = scalars >> 8
    return jnp.stack([lo, hi], axis=1).reshape(2 * scalars.shape[0], *scalars.shape[1:])


def _halving_tree_reduce(pts, axis: int):
    """Shrinking pairwise reduction (work B*C, trace log2(C) adds)."""
    n = pts[2].shape[axis]
    while n > 1:
        half = n // 2
        lo = tuple(lax.slice_in_dim(c, 0, half, axis=axis) for c in pts)
        hi = tuple(lax.slice_in_dim(c, half, 2 * half, axis=axis) for c in pts)
        s = G1.add(lo, hi)
        if n % 2:
            tail = tuple(lax.slice_in_dim(c, 2 * half, n, axis=axis) for c in pts)
            pts = tuple(jnp.concatenate([a, b], axis=axis) for a, b in zip(s, tail))
            n = half + 1
        else:
            pts, n = s, half
    return tuple(jnp.squeeze(c, axis=axis) for c in pts)


def msm_pippenger_g1(pts_affine, scalars: jnp.ndarray, inf_mask=None, chunk: int | None = None):
    """G1 MSM via bucketed windows. pts_affine (x, y): (24, N) canonical
    Montgomery affine; scalars: (16, N) standard-form limbs. Lanes flagged in
    inf_mask (or with zero scalars) contribute nothing."""
    x, y = pts_affine
    n = scalars.shape[-1]
    n2 = 1 << max(6, (n - 1).bit_length())  # pad to pow2, >= 64
    if chunk is None:
        # scan depth m vs chunk-parallelism C = n2/m: keep depth modest while
        # bounding the B*C bucket-extraction overhead
        chunk = max(32, min(1024, n2 // 32))
    m = min(chunk, n2)
    if n2 != n:
        padc = [(0, 0), (0, n2 - n)]
        x, y = jnp.pad(x, padc), jnp.pad(y, padc)
        scalars = jnp.pad(scalars, padc)
    C = n2 // m

    digits = _scalar_digits(scalars)  # (32, n2)
    if inf_mask is not None:
        inf_mask = jnp.pad(inf_mask, (0, n2 - n))
        digits = jnp.where(inf_mask[None], 0, digits)

    # pack several windows into the scan batch for lane occupancy; cap the
    # gathered-point working set at ~2^21 field elements
    wb = max(1, min(N_WINDOWS, (1 << 21) // n2))
    while N_WINDOWS % wb:
        wb -= 1
    groups = N_WINDOWS // wb

    def per_group(d_g):  # d_g: (wb, n2)
        order = jnp.argsort(d_g, axis=1)  # (wb, n2)
        xs = x[:, order]  # (L, wb, n2)
        ys = y[:, order]
        ds = jnp.take_along_axis(d_g, order, axis=1)  # (wb, n2)
        # chunked views: (L, wb, C, m) -> scan over m with batch (wb, C)
        xs = jnp.moveaxis(xs.reshape(FP.L, wb, C, m), 3, 0)  # (m, L, wb, C)
        ys = jnp.moveaxis(ys.reshape(FP.L, wb, C, m), 3, 0)
        dsc = ds.reshape(wb, C, m)
        dst = jnp.moveaxis(dsc, 2, 0)  # (m, wb, C)

        one_c = jnp.broadcast_to(
            jnp.asarray(FP.ONE_MONT)[:, None, None], (FP.L, wb, C)
        )
        zero_pt = jnp.zeros((FP.L, wb, C), jnp.uint32)

        def step(state, td):
            run, run_d = state
            pt_x, pt_y, d = td
            same = d == run_d
            added = G1.madd(run, (pt_x, pt_y))
            fresh = (pt_x, pt_y, one_c)
            new_run = G1.select(same, added, fresh)
            return (new_run, d), new_run

        init = ((zero_pt, zero_pt, zero_pt), jnp.full((wb, C), N_BUCKETS, jnp.uint32))
        (_, _), runs = lax.scan(step, init, (xs, ys, dst))
        # runs: tuple of 3 arrays (m, L, wb, C)

        # bucket extraction: last position in each sorted chunk with digit b
        bvals = jnp.arange(1, N_BUCKETS, dtype=dsc.dtype)  # skip digit 0
        search = jax.vmap(jax.vmap(lambda a, v: jnp.searchsorted(a, v, side="right")))
        pos = search(dsc, jnp.broadcast_to(bvals, (wb, C, N_BUCKETS - 1))) - 1
        pos = jnp.clip(pos, 0, m - 1)
        hit = jnp.take_along_axis(dsc, pos, axis=2) == bvals  # (wb, C, B-1)
        pos_t = jnp.moveaxis(pos, 2, 0)[:, None]  # (B-1, 1, wb, C)
        buckets = tuple(
            jnp.take_along_axis(r, jnp.broadcast_to(pos_t, (N_BUCKETS - 1,) + r.shape[1:]), axis=0)
            for r in runs
        )  # (B-1, L, wb, C)
        hit_t = jnp.moveaxis(hit, 2, 0)[:, None]  # (B-1, 1, wb, C)
        buckets = tuple(jnp.where(jnp.broadcast_to(hit_t, b.shape), b, 0) for b in buckets)
        # reorder to (L, B-1, wb, C) and reduce chunks
        buckets = tuple(jnp.moveaxis(b, 0, 1) for b in buckets)
        return _halving_tree_reduce(buckets, axis=3)  # (L, B-1, wb)

    grouped = lax.map(per_group, digits.reshape(groups, wb, n2))
    # grouped: tuple (groups, L, B-1, wb) -> (L, B-1, 32)
    bs = tuple(jnp.moveaxis(g, 0, 2).reshape(FP.L, N_BUCKETS - 1, N_WINDOWS) for g in grouped)

    # suffix-sum over buckets b = B-1 .. 1, batched over windows.
    # Pad the window axis to the fused-kernel threshold: 4x waste lanes, but
    # each scan step becomes ~2 kernel launches instead of ~180 HLO ops.
    wpad = 128
    bs_p = tuple(jnp.pad(b, [(0, 0), (0, 0), (0, wpad - N_WINDOWS)]) for b in bs)
    rev_t = tuple(jnp.moveaxis(b[:, ::-1], 1, 0) for b in bs_p)  # (B-1, L, wpad)

    def suffix_step(state, bucket_b):
        running, acc = state
        running = G1.add(running, bucket_b)
        acc = G1.add(acc, running)
        return (running, acc), None

    zero_w = tuple(jnp.zeros((FP.L, wpad), jnp.uint32) for _ in range(3))
    (_, win_sums), _ = lax.scan(suffix_step, (zero_w, zero_w), rev_t)
    win_sums = tuple(c[:, :N_WINDOWS] for c in win_sums)

    # Horner combine over windows: R = ((S31 * 2^8 + S30) * 2^8 + ...) + S0.
    # Run on a 128-wide broadcast so the point ops stay in the fused kernels
    # (wasted lanes, but ~9 launches per iteration instead of ~800 HLO ops).
    top = tuple(jnp.broadcast_to(c[:, -1:], (FP.L, wpad)) for c in win_sums)

    def horner(w, acc):
        for _ in range(WINDOW_BITS):
            acc = G1.double(acc)
        s_w = tuple(
            lax.dynamic_slice_in_dim(c, N_WINDOWS - 1 - w, 1, axis=-1)
            for c in win_sums
        )
        s_w = tuple(jnp.broadcast_to(c, (FP.L, wpad)) for c in s_w)
        return G1.add(acc, s_w)

    out = lax.fori_loop(1, N_WINDOWS, horner, top)
    return tuple(c[:, 0] for c in out)


PIPPENGER_THRESHOLD = 128  # below this the batched ladder wins (less fixed cost)


@partial(jax.jit, static_argnums=(0,))
def _msm_pip_jit(n: int, x, y, scalars, inf_mask):
    return msm_pippenger_g1((x, y), scalars, inf_mask)


@partial(jax.jit, static_argnums=(0,))
def _msm_g1_affine_masked_jit(n: int, x, y, scalars, inf_mask):
    return msm_batched_affine(G1, (x, y), scalars, inf_mask)


def msm_g1(pts_affine, scalars, inf_mask=None):
    """Jitted G1 MSM entry point (affine points): bucketed Pippenger for large
    batches, batched ladder for small ones. Identical group results."""
    n = int(scalars.shape[-1])
    x, y = pts_affine
    if n >= PIPPENGER_THRESHOLD:
        return _msm_pip_jit(n, x, y, scalars, inf_mask)
    if inf_mask is not None:
        return _msm_g1_affine_masked_jit(n, x, y, scalars, inf_mask)
    return _msm_g1_affine_jit(n, x, y, scalars)

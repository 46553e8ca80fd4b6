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


# ---------------------------------------------------------------------------
# Fixed-base MSM with precomputed window tables (prefix-sum bucket extraction)
#
# The SRS is fixed across commits, so the windows' 2^(16w) shifts can be baked
# into precomputed point tables: table[w*n + i] = 2^(16w) * P_i. The MSM then
# collapses to ONE 16-bit-window bucket pass over 16n (point, digit) pairs —
# half the bucket-accumulation work of the 8-bit/32-window online path, and no
# 248-doubling Horner combine at the end.
#
# Bucket accumulation itself is a pure prefix-sum scan over the digit-sorted
# pairs (no restart logic): the bucket sum for digit b is the DIFFERENCE of
# global prefix sums V_b - V_{b-1} at the last position of each digit class
# (group subtraction = add of the negated point, and an empty bucket yields
# V_b == V_{b-1} whose difference is the identity automatically). Chunked
# scan keeps the work at 16n adds while the sequential depth drops to m steps
# (~128-512); per-chunk prefixes are globalized with a log-depth Hillis-Steele
# exclusive scan over the C chunk totals.
#
# The weighted bucket reduction sum_b b*S_b (the classic 2^16-step suffix
# scan) is done in log depth: split b = 2^h*u + v, reduce the (u, v) grid
# along each axis with work-efficient halving trees, and finish with two
# 2^h-element suffix-weighted sums (Hillis-Steele) — ~40 wide launches total.
# ---------------------------------------------------------------------------

FB_WINDOW_BITS = 16
FB_WINDOWS = 16  # 256 / FB_WINDOW_BITS
# below this the per-MSM bucket-stage overhead (~B + extraction work,
# independent of n) outweighs the halved scan work of the 16-bit windows
FIXED_BASE_THRESHOLD = 16384


def _shift_points(pts, d: int, axis: int):
    """Shift point lanes by d along axis (positive = toward higher indices),
    filling vacated lanes with the identity (all-zero coords)."""
    n = pts[2].shape[axis]

    def sh(c):
        pad = [(0, 0)] * c.ndim
        pad[axis] = (d, 0) if d > 0 else (0, -d)
        padded = jnp.pad(c, pad)
        start = 0 if d > 0 else -d
        return lax.slice_in_dim(padded, start, start + n, axis=axis)

    return tuple(sh(c) for c in pts)


def _hs_scan_points(pts, axis: int, reverse: bool = False, exclusive: bool = False):
    """Hillis-Steele prefix (or suffix) sums of points along axis.

    ONE fori_loop whose body is a single batched add with a dynamic roll
    (constant trace size — an unrolled log-N chain of G1 adds makes XLA
    compile time explode). Rolled-around lanes are masked to the identity.

    On TPU, last-axis scans run as ONE fused Pallas kernel instead
    (pallas_msm.hs_scan_points, bit-identical adds in the same order): the
    XLA formulation is launch-bound — log2(n) separate point-add programs
    for tiny point counts."""
    n = pts[2].shape[axis]
    if n == 1:
        return _shift_points(pts, 1, axis) if exclusive else pts
    from .field import _use_pallas

    ax = axis % pts[2].ndim
    # the fused kernel's level-shift where-chain holds log2(n) shifted copies
    # in VMEM — at n = 8192 lanes that exceeds the 128 MB budget (observed
    # OOM at the 2^18-block offsets stage); wide scans use the XLA fori path,
    # whose per-launch point-adds are lane-efficient at these widths anyway
    if _use_pallas() and ax == pts[2].ndim - 1 and n <= 4096:
        from . import pallas_msm

        return pallas_msm.hs_scan_points(
            *pts, reverse=reverse, exclusive=exclusive
        )
    levels = (n - 1).bit_length()
    iota = lax.broadcasted_iota(jnp.uint32, pts[2].shape[G1._cdim():], axis - G1._cdim())

    def body(r, acc):
        shift = jnp.uint32(1) << r.astype(jnp.uint32)
        sgn = -1 if reverse else 1
        rolled = tuple(
            jnp.roll(c, sgn * shift.astype(jnp.int32), axis=axis) for c in acc
        )
        valid = (iota < n - shift) if reverse else (iota >= shift)
        partner = G1.select(valid, rolled, tuple(jnp.zeros_like(c) for c in rolled))
        return G1.add(acc, partner)

    out = lax.fori_loop(0, levels, body, pts)
    if exclusive:
        out = _shift_points(out, -1 if reverse else 1, axis)
    return out


def _tree_reduce_hybrid(pts, axis: int, presteps: int = 3):
    """Axis tree-sum: `presteps` unrolled halving levels (work-efficient, tiny
    trace) then one masked fori tree for the rest (constant trace size).

    On TPU the halving runs ALL the way down (work 2n lane-adds instead of the
    masked fori's n log n — the fori keeps full width at every level, and at
    B = 2^16 buckets that costs ~40% of the whole MSM's scan work); the
    presteps cap only matters on XLA:CPU, where every unrolled add site is
    ~40 s of single-core compile (test/dryrun budget)."""
    from .field import _use_pallas

    if _use_pallas():
        presteps = pts[2].shape[axis].bit_length()
    for _ in range(presteps):
        n = pts[2].shape[axis]
        if n <= 2:
            break
        if n % 2:
            pts = tuple(
                jnp.pad(c, [(0, 0)] * axis + [(0, 1)] + [(0, 0)] * (c.ndim - axis - 1))
                for c in pts
            )
            n += 1
        half = n // 2
        lo = tuple(lax.slice_in_dim(c, 0, half, axis=axis) for c in pts)
        hi = tuple(lax.slice_in_dim(c, half, n, axis=axis) for c in pts)
        pts = G1.add(lo, hi)
    return tree_reduce(G1, pts, axis=axis)


def _suffix_weighted_points(pts, axis: int):
    """sum_k k * P_k along axis (length K), via suffix sums:
    T_j = sum_{k>=j} P_k, then sum_j T_j = sum_k (k+1) P_k, so the answer is
    (tree-sum of T) - T_0. Log-depth, work K log K on <=K lanes."""
    T = _hs_scan_points(pts, axis, reverse=True)
    total = _tree_reduce_hybrid(T, axis, presteps=0)  # sum_j T_j
    t0 = tuple(lax.index_in_dim(c, 0, axis=axis, keepdims=False) for c in T)
    return G1.add(total, G1.neg(t0))


@partial(jax.jit, static_argnums=(3,))
def _advance_window_jit(x, y, z, window_bits: int):
    """One window shift: 2^window_bits * P for every lane (fori of doubles)."""
    return lax.fori_loop(0, window_bits, lambda _, p: G1.double(p), (x, y, z))


@jax.jit
def _tables_to_affine_jit(jx, jy, jz):
    (tx, ty), _inf = G1.to_affine((jx, jy, jz))
    return tx, ty


def _build_tables(x, y, window_bits: int):
    """windows-1 reuses of ONE small jitted window-advance program, then
    per-window reuses of ONE jitted Jacobian->affine conversion.

    The tunneled backend compiles ahead-of-time with cost (and memory) roughly
    proportional to program MLIR size — which scales with the number of fused
    Pallas call sites, each inlining a full Montgomery-multiply kernel. One
    giant fori-of-fori + whole-table program gets the compile helper
    OOM-killed; many reuses of two small fixed-shape programs compile in
    seconds and amortize perfectly."""
    n2 = x.shape[1]
    windows = 256 // window_bits
    one = jnp.broadcast_to(jnp.asarray(FP.ONE_MONT)[:, None], (FP.L, n2))
    cur = (x, y, one)
    affs = [_tables_to_affine_jit(*cur)]
    for _ in range(1, windows):
        cur = _advance_window_jit(*cur, window_bits)
        affs.append(_tables_to_affine_jit(*cur))
    tx = jnp.concatenate([a[0] for a in affs], axis=1)  # index = w*n2 + i
    ty = jnp.concatenate([a[1] for a in affs], axis=1)
    return tx, ty


def precompute_g1_tables_chunked(pts_affine, inf_mask=None,
                                 window_bits: int = FB_WINDOW_BITS,
                                 col_chunk: int = 1 << 16):
    """precompute_g1_tables in fixed-width column slices: each slice reuses
    the ONE (24, col_chunk)-shaped advance/affine program pair (the table
    build is per-lane independent), so a 2^20-point build triggers ZERO new
    AOT compiles beyond the 2^16 build's — a full-width build at 2^20 shapes
    wedged the tunneled backend's remote compiler for >1 h (round 5).

    Returns host numpy arrays (24, W*N2) in the same layout."""
    x, y = pts_affine
    n = x.shape[1]
    n2 = 1 << max(6, (n - 1).bit_length())
    if n2 <= col_chunk:
        t = precompute_g1_tables(pts_affine, inf_mask, window_bits)
        return np.asarray(t[0]), np.asarray(t[1])
    assert n2 % col_chunk == 0
    windows = 256 // window_bits
    out_x = np.empty((FP.L, windows, n2), np.uint32)
    out_y = np.empty((FP.L, windows, n2), np.uint32)
    x = np.asarray(x)
    y = np.asarray(y)
    im = np.asarray(inf_mask) if inf_mask is not None else None
    for lo in range(0, n2, col_chunk):
        hi = min(lo + col_chunk, n)
        if hi > lo:
            xs, ys = x[:, lo:hi], y[:, lo:hi]
            ms = im[lo:hi] if im is not None and lo < im.shape[0] else None
        else:  # pure padding slice: generator lanes, digits forced 0 upstream
            xs = np.zeros((FP.L, 0), np.uint32)
            ys = np.zeros((FP.L, 0), np.uint32)
            ms = None
        # pad the slice to col_chunk inside precompute (it pads to pow2 >= 64)
        if xs.shape[1] < col_chunk:
            pad_n = col_chunk - xs.shape[1]
            from .curve import G1_GEN_DEV

            gx = np.broadcast_to(np.asarray(G1_GEN_DEV[0])[:, None], (FP.L, pad_n))
            gy = np.broadcast_to(np.asarray(G1_GEN_DEV[1])[:, None], (FP.L, pad_n))
            xs = np.concatenate([xs, gx], axis=1)
            ys = np.concatenate([ys, gy], axis=1)
            if ms is not None:
                ms = np.pad(ms, (0, pad_n))
        tsx, tsy = precompute_g1_tables((jnp.asarray(xs), jnp.asarray(ys)), ms,
                                        window_bits)
        out_x[:, :, lo : lo + col_chunk] = np.asarray(tsx).reshape(
            FP.L, windows, col_chunk
        )
        out_y[:, :, lo : lo + col_chunk] = np.asarray(tsy).reshape(
            FP.L, windows, col_chunk
        )
    return out_x.reshape(FP.L, windows * n2), out_y.reshape(FP.L, windows * n2)


def precompute_g1_tables(pts_affine, inf_mask=None, window_bits: int = FB_WINDOW_BITS):
    """Build fixed-base window tables for msm_g1_fixed.

    pts_affine: (x, y) canonical-Montgomery affine, shape (24, N).
    Returns (tx, ty): (24, W*N2) with table[w*N2 + i] = 2^(window_bits*w)*P_i,
    W = 256/window_bits and N2 the pow2-padded count (pad lanes hold the
    generator; their digits are forced to 0 by msm_g1_fixed so they never
    contribute). Lanes flagged in inf_mask are likewise replaced by the
    generator. One-time cost per SRS: ~(256-window_bits) batched doublings +
    one batched inversion.
    """
    x, y = pts_affine
    n = x.shape[1]
    n2 = 1 << max(6, (n - 1).bit_length())
    from .curve import G1_GEN_DEV  # affine Montgomery generator constants

    gx = jnp.broadcast_to(jnp.asarray(G1_GEN_DEV[0])[:, None], (FP.L, n2))
    gy = jnp.broadcast_to(jnp.asarray(G1_GEN_DEV[1])[:, None], (FP.L, n2))
    if n2 != n:
        pad = [(0, 0), (0, n2 - n)]
        real = (jnp.arange(n2) < n)[None]
        x = jnp.where(real, jnp.pad(x, pad), gx)
        y = jnp.where(real, jnp.pad(y, pad), gy)
    if inf_mask is not None:
        im = jnp.pad(jnp.asarray(inf_mask), (0, n2 - inf_mask.shape[0]))
        x = jnp.where(im[None], gx, x)
        y = jnp.where(im[None], gy, y)
    return _build_tables(x, y, window_bits)


def _fb_digits(scalars: jnp.ndarray, window_bits: int) -> jnp.ndarray:
    """(16, N) standard-form limbs -> (W, N) window digits, LSW first."""
    if window_bits == 16:
        return scalars
    if window_bits == 8:
        return _scalar_digits(scalars)
    raise ValueError("window_bits must be 8 or 16")


# The fixed-base MSM runs as a SEQUENCE of small jitted stage programs with
# Python-level glue rather than one fused program: the tunneled backend
# compiles ahead-of-time with memory/latency that grows with program MLIR
# size (every fused point-kernel call site inlines a full Montgomery-multiply
# Pallas kernel), and a single whole-MSM program gets the compile helper
# killed. Each stage below has at most ~3 point-kernel call sites and a fixed
# shape per (n2, window_bits), so stages compile once and are reused.
#
# Signed-digit variant (the production default for 16-bit windows): rewrite
# k = sum_w e_w 2^(16w) with e_w in (-2^15, 2^15], mapping a pair with a
# negative digit to bucket |e| of the NEGATED table point (y -> p - y, one
# elementwise pass). Bucket space shrinks from 2^16 to 2^15 + 1: the
# B-proportional stages (extraction gathers + adds, digit-grid reduction)
# cost half, while sort/scan work is unchanged. The weighted reduction then
# splits b = 2^10 u + 2^5 v + w (u, v, w < 32) into a 3-axis digit grid:
# work-efficient axis tree-sums at 3 * 2^15 lane-adds (vs 2 * 2^16 for the
# unsigned square grid) and a 3-level Horner combine.


def _fb_digits_signed(scalars: jnp.ndarray):
    """(16, N) standard-form u16 limb rows -> (abs, neg): 16 signed window
    digits e_w with |e_w| <= 2^15, sum_w e_w 2^(16w) == k. abs is u32 in
    [0, 2^15], neg marks negative digits. The top window never carries out
    (r < 2^255 keeps d_15 + 1 < 2^15)."""
    W = scalars.shape[0]
    absd, negd = [], []
    carry = jnp.zeros(scalars.shape[1:], jnp.uint32)
    for w in range(W):
        e = scalars[w] + carry  # <= 2^16
        neg = e > jnp.uint32(1 << 15)
        absd.append(jnp.where(neg, jnp.uint32(1 << 16) - e, e))
        negd.append(neg)
        carry = neg.astype(jnp.uint32)
    return jnp.stack(absd, axis=0), jnp.stack(negd, axis=0)


@partial(jax.jit, static_argnums=(4, 5))
def _fbs_sort_jit(tx, ty, absd, negd, nt: int, m: int):
    """Signed sort stage: pairs key-sorted by |digit|, table y negated on
    negative-digit lanes (p - y, exact: table points never have y == 0).

    The point pair is PACKED x | y << 16 into one (L, P) word array before
    the gather (canonical base-2^16 limbs are < 2^16): TPU gathers are
    element-count-bound (~0.7G elem/s measured on v5e), so packing halves
    the dominant sort cost. Returns the scan-layout packed stream (m, L, C)
    plus the sorted digits."""
    P = FB_WINDOWS * nt
    C = P // m
    flat = absd.reshape(P)
    order = jnp.argsort(flat)
    ds = flat[order]
    neg_s = negd.reshape(P)[order]
    pks = (tx | (ty << 16))[:, order]  # ONE packed gather
    ysn = FP.neg(pks >> 16)
    pks = jnp.where(neg_s[None, :], (pks & jnp.uint32(0xFFFF)) | (ysn << 16), pks)
    pk = jnp.moveaxis(pks.reshape(FP.L, C, m), 2, 0)
    return pk, ds


def _fbs_scan_traced(pk, m: int):
    """Packed-stream scan (see _fb_scan_traced): fast Pallas kernel with an
    in-graph exact fallback on TPU; unpack + lax.scan on CPU."""
    C = pk.shape[2]

    from .field import _use_pallas

    if _use_pallas() and C >= 64:
        from . import pallas_msm

        runs, flag = pallas_msm.scan_prefix_madd_fast_packed(pk, m, blk=1024)
        runs = lax.cond(
            flag > 0,
            lambda: pallas_msm.scan_prefix_madd_packed(pk, m, blk=1024),
            lambda: runs,
        )
    else:
        xs = pk & jnp.uint32(0xFFFF)
        ys = pk >> 16

        def step(run, q):
            nr = G1.madd(run, q)
            return nr, nr

        init = tuple(jnp.zeros((FP.L, C), jnp.uint32) for _ in range(3))
        _, runs = lax.scan(step, init, (xs, ys))
    return _fb_runs_reshape(runs, m)


_fbs_scan_jit = jax.jit(_fbs_scan_traced, static_argnums=(1,))


@partial(jax.jit, static_argnums=(3,))
def _fbs_extract_jit(runs_flat, off, ds, m: int):
    """Bucket sums for b in [0, 2^15] from global prefix differences
    (same prefix-difference identity as _fb_extract_jit)."""
    B = (1 << 15) + 1
    lpos = jnp.searchsorted(ds, jnp.arange(B, dtype=ds.dtype), side="right") - 1
    valid = lpos >= 0
    lc = jnp.maximum(lpos, 0).astype(jnp.int32)
    U = tuple(r[:, lc] for r in runs_flat)
    cidx = lc // m
    O = tuple(o[:, cidx] for o in off)
    V = G1.add(U, O)
    V = G1.select(valid, V, G1.inf_like(V))
    return G1.add(V, G1.neg(_shift_points(V, 1, axis=1)))  # (L, 2^15 + 1)


@jax.jit
def _fbs_grid_trees_jit(s0, s1, s2):
    """3-axis digit-grid reduction of the signed bucket array: for
    b = 2^10 u + 2^5 v + w, compute A_u, B_v, C_w (each the grid sum over the
    other two axes) in ONE stacked (L, 3, 32, 1024) tree reduction. The top
    bucket S[2^15] rides along as a 4th stacked row (lane 0 of a padded row)
    so this stage stays a single point-kernel program."""
    S = (s0, s1, s2)
    side = 32
    flat = side * side  # 1024

    def grids(c):
        g = c[:, : 1 << 15].reshape(c.shape[0], side, side, side)  # [u, v, w]
        a = g.reshape(c.shape[0], side, flat)
        b = jnp.swapaxes(g, 1, 2).reshape(c.shape[0], side, flat)
        w = jnp.moveaxis(g, 3, 1).reshape(c.shape[0], side, flat)
        top = jnp.zeros_like(a)
        top = top.at[:, 0, 0].set(c[:, 1 << 15])
        return jnp.stack([a, b, w, top], axis=1)  # (L, 4, 32, 1024)

    both = tuple(grids(c) for c in S)
    return _tree_reduce_hybrid(both, axis=3, presteps=2)  # (L, 4, 32)


@jax.jit
def _fbs_suffix_weighted_jit(w0, w1, w2):
    """sum_k k * row_k for the stacked A/B/C rows; the top-bucket row (index
    3) holds S_top in lane 0 only, and 0 * S_top = identity is then wrong —
    so lane 0 is re-added after the weighted sum to keep S_top itself.

    On TPU the two scans under _suffix_weighted_points run as fused Pallas
    kernels via hs_scan_points (identical results)."""
    ws = _suffix_weighted_points((w0, w1, w2), axis=2)  # (L, 4)
    top = tuple(c[:, 3, 0] for c in (w0, w1, w2))
    fixed_top = G1.add(tuple(c[:, 3] for c in ws), top)
    return tuple(
        jnp.concatenate([c[:, :3], f[:, None]], axis=1)
        for c, f in zip(ws, fixed_top)
    )


@jax.jit
def _fbs_combine_jit(v0, v1, v2):
    """Horner over the 3 grid axes + the top bucket:
    result = ((((S_top * 2^5) + WA) * 2^5 + WB) * 2^5 + WC), i.e.
    2^15 S_top + 2^10 WA + 2^5 WB + WC. Doublings run on a 128-wide
    broadcast so the point ops stay in the fused kernels."""
    ws = (v0, v1, v2)
    wide = 128

    def bcol(j):
        return tuple(jnp.broadcast_to(c[:, j : j + 1], (c.shape[0], wide)) for c in ws)

    acc = bcol(3)  # S_top
    for j in range(3):
        acc = lax.fori_loop(0, 5, lambda _, a: G1.double(a), acc)
        acc = G1.add(acc, bcol(j))
    return tuple(c[:, 0] for c in acc)


def _fbs_buckets(tables, absd, negd, nt: int, chunk: int | None):
    """Signed bucket sums S_b, b in [0, 2^15]: packed sort -> packed scan ->
    offsets -> extract. Returns a Jacobian triple of shape (L, 2^15 + 1)."""
    P = FB_WINDOWS * nt
    m = fb_chunk_size(P, chunk)
    pk, ds = _fbs_sort_jit(tables[0], tables[1], absd, negd, nt, m)
    runs_flat, totals = _fbs_scan_jit(pk, m)
    off = _fb_offsets_jit(*totals)
    return _fbs_extract_jit(runs_flat, off, ds, m)


# ---------------------------------------------------------------------------
# Lazy 25-limb production pipeline (TPU): the scan runs in the 2^400
# Montgomery domain with redundant values (ops/pallas_msm25.py — ~1.8x fewer
# VPU ops per madd). Tables are pre-scaled by mont(2^16) and pre-packed as
# x | y<<16 words with a second NEGATED-y copy, so the signed-digit sort is
# ONE gather with index = order + neg*P (the per-MSM FP.neg pass of the
# 24-limb path disappears). Only bucket boundaries and chunk totals are
# converted back to canonical 24-limb form. Same group results (canonical
# after conversion) as the 24-limb path.
# ---------------------------------------------------------------------------


def pack_tables25(tables, chunk: int = 1 << 20):
    """(tx, ty) canonical-Montgomery fixed-base tables (24, W*nt) ->
    (24, 2*W*nt) packed lazy-domain table: [x|y<<16 | x|(p-y)<<16], each
    coordinate pre-scaled by mont(2^16) (so in-kernel values are x*2^400).
    Host-chunked to bound peak device memory at 2^20-point tables."""
    tx, ty = tables[0], tables[1]
    c16 = jnp.asarray(FP.to_limbs(1 << 16))[:, None]

    @jax.jit
    def _chunk(txc, tyc):
        xs = FP.mul(txc, c16)
        ys = FP.mul(tyc, c16)
        yn = FP.mul(FP.neg(tyc), c16)
        return xs | (ys << 16), xs | (yn << 16)

    W = tx.shape[1]
    pos_parts, neg_parts = [], []
    for lo in range(0, W, chunk):
        p, n = _chunk(tx[:, lo : lo + chunk], ty[:, lo : lo + chunk])
        pos_parts.append(p)
        neg_parts.append(n)
    return jnp.concatenate(pos_parts + neg_parts, axis=1)


@partial(jax.jit, static_argnums=(3, 4))
def _fbs25_sort_jit(packed, absd, negd, nt: int, m: int):
    """Signed sort stage on the pre-packed lazy table: ONE gather selects the
    negated-y copy for negative-digit pairs via index offset P."""
    P = FB_WINDOWS * nt
    C = P // m
    flat = absd.reshape(P)
    order = jnp.argsort(flat)
    ds = flat[order]
    neg_s = negd.reshape(P)[order]
    idx = order + jnp.where(neg_s, jnp.uint32(P), jnp.uint32(0)).astype(order.dtype)
    pks = packed[:, idx]
    pk = jnp.moveaxis(pks.reshape(FP.L, C, m), 2, 0)
    return pk, ds


@partial(jax.jit, static_argnums=(3, 4))
def _fbs25_sort_pm_jit(packed_pm, absd, negd, nt: int, m: int):
    """Point-major variant of _fbs25_sort_jit: the packed table is stored
    (2P, 24) so each gathered point is one contiguous 96-byte row (row
    gathers beat 24 scattered element reads per point on TPU); a transpose
    restores the (m, L, C) scan layout at HBM bandwidth."""
    P = FB_WINDOWS * nt
    C = P // m
    flat = absd.reshape(P)
    order = jnp.argsort(flat)
    ds = flat[order]
    neg_s = negd.reshape(P)[order]
    idx = order + jnp.where(neg_s, jnp.uint32(P), jnp.uint32(0)).astype(order.dtype)
    rows = packed_pm[idx]  # (P, 24)
    pk = jnp.transpose(rows.reshape(C, m, FP.L), (1, 2, 0))
    return pk, ds


def _fbs25_scan_traced(pk, m: int):
    """Lazy-domain scan: fast kernel with an in-graph exact fallback (taken
    only if a lane hits P == Q)."""
    from . import pallas_msm25 as k25

    runs, flag = k25.scan25_fast(pk, m, blk=1024)
    runs = lax.cond(
        flag > 0,
        lambda: k25.scan25_exact(pk, m, blk=1024),
        lambda: runs,
    )
    P = runs[0].shape[0] * runs[0].shape[2]
    totals = tuple(r[-1] for r in runs)  # (25, C)
    runs_flat = tuple(jnp.moveaxis(r, 0, 2).reshape(k25.L25, P) for r in runs)
    return runs_flat, totals


_fbs25_scan_jit = jax.jit(_fbs25_scan_traced, static_argnums=(1,))


@partial(jax.jit, static_argnums=(3,))
def _fbs25_extract_jit(runs_flat, totals, ds, m: int):
    """Offsets + bucket extraction in ONE program: chunk totals and the
    gathered prefix boundaries are converted from the lazy 2^400 domain to
    canonical mont16 form, then combined exactly as _fbs_extract_jit."""
    from .pallas_msm25 import to_mont16

    B = (1 << 15) + 1
    t16 = tuple(to_mont16(t) for t in totals)  # (24, C) canonical
    off = _hs_scan_points(t16, axis=1, exclusive=True)
    lpos = jnp.searchsorted(ds, jnp.arange(B, dtype=ds.dtype), side="right") - 1
    valid = lpos >= 0
    lc = jnp.maximum(lpos, 0).astype(jnp.int32)
    U = tuple(to_mont16(r[:, lc]) for r in runs_flat)
    cidx = lc // m
    O = tuple(o[:, cidx] for o in off)
    V = G1.add(U, O)
    V = G1.select(valid, V, G1.inf_like(V))
    return G1.add(V, G1.neg(_shift_points(V, 1, axis=1)))


def _fbs25_buckets(packed, absd, negd, nt: int, chunk: int | None):
    """Signed bucket sums via the lazy 25-limb pipeline. Returns a canonical
    mont16 Jacobian triple of shape (24, 2^15 + 1)."""
    P = FB_WINDOWS * nt
    m = fb_chunk_size(P, chunk)
    pk, ds = _fbs25_sort_jit(packed, absd, negd, nt, m)
    runs_flat, totals = _fbs25_scan_jit(pk, m)
    return _fbs25_extract_jit(runs_flat, totals, ds, m)


def _fbs_reduce(S):
    W = _fbs_grid_trees_jit(*S)
    ws = _fbs_suffix_weighted_jit(*W)
    return _fbs_combine_jit(*ws)


@partial(jax.jit, static_argnums=(3, 4))
def _fb_sort_jit(tx, ty, digits, nt: int, window_bits: int):
    """Digits -> globally digit-sorted (point, digit) pairs. Data movement
    only (sort + gathers) — no point kernels."""
    windows = 256 // window_bits
    P = windows * nt
    flat = digits.reshape(P)  # pair (w, i) at index w*nt + i — matches tables
    order = jnp.argsort(flat)
    ds = flat[order]
    return tx[:, order], ty[:, order], ds


def _fb_runs_reshape(runs, m: int):
    P = runs[0].shape[0] * runs[0].shape[2]
    totals = tuple(r[-1] for r in runs)  # (L, C) chunk totals
    runs_flat = tuple(jnp.moveaxis(r, 0, 2).reshape(FP.L, P) for r in runs)
    return runs_flat, totals


@partial(jax.jit, static_argnums=(2,))
def _fb_scan_jit(xs_s, ys_s, m: int):
    """Chunked prefix-sum scan: ONE madd per step over C lanes. Returns the
    per-chunk running prefixes, flattened to global positions (L, P).

    On TPU the whole scan runs as a single fused Pallas kernel (grid over
    chunk-blocks x steps with the running prefix in VMEM scratch —
    pallas_msm.scan_prefix_madd); the lax.scan path is the reference
    implementation and the CPU/test path (identical results lane-for-lane)."""
    P = xs_s.shape[1]
    C = P // m
    xs = jnp.moveaxis(xs_s.reshape(FP.L, C, m), 2, 0)  # (m, L, C)
    ys = jnp.moveaxis(ys_s.reshape(FP.L, C, m), 2, 0)

    from .field import _use_pallas

    if _use_pallas() and C >= 64:
        from . import pallas_msm

        # blk=2048 measured best on v5e (scan is lane-throughput-bound; the
        # larger block shaves the residual per-step overhead)
        runs = pallas_msm.scan_prefix_madd(xs, ys, m, blk=2048)
    else:
        def step(run, q):
            nr = G1.madd(run, q)
            return nr, nr

        init = tuple(jnp.zeros((FP.L, C), jnp.uint32) for _ in range(3))
        _, runs = lax.scan(step, init, (xs, ys))  # 3 x (m, L, C)
    return _fb_runs_reshape(runs, m)


@partial(jax.jit, static_argnums=(2,))
def _fb_scan_fast_jit(xs_s, ys_s, m: int):
    """Fast-path scan (TPU only): 11-mul madd steps without the inline
    doubling, plus a scalar needs-double flag. The caller re-runs
    _fb_scan_jit iff the flag is set (P == Q inside a prefix over distinct
    table points — astronomically rare but adversarially possible)."""
    from . import pallas_msm

    P = xs_s.shape[1]
    C = P // m
    xs = jnp.moveaxis(xs_s.reshape(FP.L, C, m), 2, 0)  # (m, L, C)
    ys = jnp.moveaxis(ys_s.reshape(FP.L, C, m), 2, 0)
    runs, flag = pallas_msm.scan_prefix_madd_fast(xs, ys, m, blk=2048)
    runs_flat, totals = _fb_runs_reshape(runs, m)
    return runs_flat, totals, flag


@jax.jit
def _fb_offsets_jit(t0, t1, t2):
    """Exclusive prefix sums of the chunk totals (ONE rolled add body)."""
    return _hs_scan_points((t0, t1, t2), axis=1, exclusive=True)


@partial(jax.jit, static_argnums=(3, 4))
def _fb_extract_jit(runs_flat, off, ds, m: int, window_bits: int):
    """Bucket sums from global prefix differences: S_b = V_b - V_{b-1} with
    V_b the prefix sum at the last sorted position of digit <= b. Empty
    buckets cancel to the identity automatically. Two point-add sites."""
    B = 1 << window_bits
    lpos = jnp.searchsorted(ds, jnp.arange(B, dtype=ds.dtype), side="right") - 1
    valid = lpos >= 0
    lc = jnp.maximum(lpos, 0).astype(jnp.int32)
    U = tuple(r[:, lc] for r in runs_flat)  # within-chunk prefixes at l(b)
    cidx = lc // m
    O = tuple(o[:, cidx] for o in off)
    V = G1.add(U, O)  # global prefix: sum of all pairs with digit <= b
    V = G1.select(valid, V, G1.inf_like(V))
    return G1.add(V, G1.neg(_shift_points(V, 1, axis=1)))  # S, (L, B)


@jax.jit
def _fb_grid_trees_jit(s0, s1, s2):
    """A_u = sum_v S[u,v] and B_v = sum_u S[u,v] in ONE masked fori tree over
    a stacked (L, 2, side, side) grid (single point-add site)."""
    S = (s0, s1, s2)
    B = S[2].shape[1]
    h = (B.bit_length() - 1) // 2
    side = 1 << h
    Sg = tuple(c.reshape(c.shape[0], side, side) for c in S)
    both = tuple(
        jnp.stack([c, jnp.swapaxes(c, 1, 2)], axis=1) for c in Sg
    )  # (L, 2, side, side): [0]=A-grid, [1]=B-grid
    # two unrolled halving levels first: the masked fori tree keeps full
    # width at every level, so work-efficient presteps cut its cost 4x for
    # the price of two extra point-kernel call sites in this program
    return _tree_reduce_hybrid(both, axis=3, presteps=2)  # (L, 2, side)


@jax.jit
def _fb_suffix_weighted_jit(w0, w1, w2):
    """sum_k k * W[:, j, k] for the stacked (L, 2, side) A/B rows."""
    return _suffix_weighted_points((w0, w1, w2), axis=2)  # (L, 2)


@partial(jax.jit, static_argnums=(3,))
def _fb_combine_jit(v0, v1, v2, h: int):
    """result = 2^h * ws[:,0] + ws[:,1], doublings on a 128-wide broadcast."""
    ws = (v0, v1, v2)
    wide = 128
    acc = tuple(jnp.broadcast_to(c[:, 0:1], (c.shape[0], wide)) for c in ws)
    acc = lax.fori_loop(0, h, lambda _, a: G1.double(a), acc)
    wb = tuple(jnp.broadcast_to(c[:, 1:2], (c.shape[0], wide)) for c in ws)
    out = G1.add(acc, wb)
    return tuple(c[:, 0] for c in out)


def _fb_buckets(tables, digits, nt: int, chunk: int | None, window_bits: int):
    """Bucket sums S_b for one table slice: sort -> scan -> offsets ->
    extract. Returns a Jacobian triple of shape (L, B)."""
    tx, ty = tables
    windows = 256 // window_bits
    P = windows * nt
    m = fb_chunk_size(P, chunk)
    xs_s, ys_s, ds = _fb_sort_jit(tx, ty, digits, nt, window_bits)
    runs_flat, totals = _fb_scan_cond_jit(xs_s, ys_s, m)
    off = _fb_offsets_jit(*totals)
    return _fb_extract_jit(runs_flat, off, ds, m, window_bits)


def _fb_reduce(S, window_bits: int):
    """Weighted bucket reduction sum_b b*S_b + window combine (runs ONCE per
    MSM — bucket sums from blocked table slices compose by plain addition)."""
    W = _fb_grid_trees_jit(*S)
    ws = _fb_suffix_weighted_jit(*W)
    return _fb_combine_jit(*ws, window_bits // 2)


@jax.jit
def _fb_bucket_add_jit(a0, a1, a2, b0, b1, b2):
    """Accumulate per-block bucket sums: ONE batched Jacobian add over B lanes."""
    return G1.add((a0, a1, a2), (b0, b1, b2))


import os as _os

# Signed digits are the default for the 16-bit fixed-base path; the unsigned
# pipeline remains for 8-bit windows (sharded/dryrun shapes) and as an
# explicit fallback (KZG_TPU_UNSIGNED_FB=1). KZG_TPU_NO_LAZY25=1 disables the
# lazy 25-limb pipeline (falls back to the 24-limb signed path).
_SIGNED_FB = _os.environ.get("KZG_TPU_UNSIGNED_FB") != "1"
_LAZY25 = _os.environ.get("KZG_TPU_NO_LAZY25") != "1"


@partial(jax.jit, static_argnums=(2,))
def _fbs_digits_nomask_jit(scalars, _unused, nt: int):
    n = scalars.shape[-1]
    absd, negd = _fb_digits_signed(scalars)
    if n < nt:
        absd = jnp.pad(absd, [(0, 0), (0, nt - n)])
        negd = jnp.pad(negd, [(0, 0), (0, nt - n)])
    return absd, negd


@partial(jax.jit, static_argnums=(2,))
def _fbs_digits_mask_jit(scalars, im, nt: int):
    n = scalars.shape[-1]
    absd, negd = _fb_digits_signed(scalars)
    absd = jnp.where(im[None], 0, absd)
    negd = jnp.where(im[None], False, negd)
    if n < nt:
        absd = jnp.pad(absd, [(0, 0), (0, nt - n)])
        negd = jnp.pad(negd, [(0, 0), (0, nt - n)])
    return absd, negd


def _fbs_digit_arrays(scalars, inf_mask, nt: int):
    """Standard-form scalars -> padded (abs, neg) signed window digits (ONE
    jitted program — the 16-window rewrite loop is ~100 eager dispatches
    otherwise, each a tunneled-backend round trip)."""
    if inf_mask is None:
        return _fbs_digits_nomask_jit(scalars, None, nt)
    return _fbs_digits_mask_jit(scalars, jnp.asarray(inf_mask), nt)


def msm_g1_fixed(tables, scalars, inf_mask=None, chunk: int | None = None,
                 window_bits: int = FB_WINDOW_BITS):
    """G1 MSM against precomputed fixed-base tables (precompute_g1_tables).

    scalars: (16, N) standard-form Fr limbs — with the default 16-bit windows
    the limbs ARE the window digits (rewritten to signed digits with half the
    bucket space on the production path). Identical group result to msm_g1 on
    the same points (the window shifts are baked into the tables)."""
    tx, ty = tables[0], tables[1]
    packed25 = tables[2] if len(tables) > 2 else None
    windows = 256 // window_bits
    nt = (
        tx.shape[1] // windows
        if tx is not None
        else packed25.shape[1] // (2 * windows)
    )
    n = scalars.shape[-1]
    if window_bits == 16 and _SIGNED_FB:
        absd, negd = _fbs_digit_arrays(scalars, inf_mask, nt)
        from .field import _use_pallas

        if packed25 is not None and _use_pallas() and _LAZY25:
            S = _fbs25_buckets(packed25, absd, negd, nt, chunk)
        else:
            S = _fbs_buckets((tx, ty), absd, negd, nt, chunk)
        return _fbs_reduce(S)
    digits = _fb_digits(scalars, window_bits)
    if inf_mask is not None:
        digits = jnp.where(jnp.asarray(inf_mask)[None], 0, digits)
    if n < nt:
        digits = jnp.pad(digits, [(0, 0), (0, nt - n)])
    S = _fb_buckets((tx, ty), digits, nt, chunk, window_bits)
    return _fb_reduce(S, window_bits)


def _fb_scan_traced(xs_s, ys_s, m: int):
    """Fully-traced scan (no host sync): on TPU, the fast 11-mul kernel with
    an in-graph lax.cond fallback to the exact kernel (taken only if a lane
    hits P == Q); on CPU, lax.scan. The ONLY scan entry of every MSM path —
    a host `int(flag)` round-trip per invocation (round 2) costs one
    device->host sync per block in the blocked 2^20 commit."""
    P = xs_s.shape[1]
    C = P // m
    xs = jnp.moveaxis(xs_s.reshape(FP.L, C, m), 2, 0)  # (m, L, C)
    ys = jnp.moveaxis(ys_s.reshape(FP.L, C, m), 2, 0)

    from .field import _use_pallas

    if _use_pallas() and C >= 64:
        from . import pallas_msm

        runs, flag = pallas_msm.scan_prefix_madd_fast(xs, ys, m, blk=2048)
        runs = lax.cond(
            flag > 0,
            lambda: pallas_msm.scan_prefix_madd(xs, ys, m, blk=2048),
            lambda: runs,
        )
    else:
        def step(run, q):
            nr = G1.madd(run, q)
            return nr, nr

        init = tuple(jnp.zeros((FP.L, C), jnp.uint32) for _ in range(3))
        _, runs = lax.scan(step, init, (xs, ys))
    return _fb_runs_reshape(runs, m)


_fb_scan_cond_jit = jax.jit(_fb_scan_traced, static_argnums=(2,))


def fb_chunk_size(P: int, chunk: int | None = None) -> int:
    """The scan chunk length m for a P-pair fixed-base pipeline (static)."""
    m = chunk if chunk is not None else min(512, max(64, P // 2048))
    return min(m, P)


def msm_g1_fixed_blocked(tables, scalars, inf_mask=None, block: int = 1 << 18,
                         chunk: int | None = None,
                         window_bits: int = FB_WINDOW_BITS):
    """Memory-bounded fixed-base MSM: the point axis is processed in
    `block`-point table slices and the per-block partial sums are tree-added.

    The single-shot pipeline materializes ~3 full sorted copies of the table
    plus 3 prefix-run arrays — at 2^20 points x 16 windows that exceeds a
    single v5e's HBM. Blocks bound peak device memory at ~block/nt of the
    whole while reusing ONE set of stage programs across blocks (all blocks
    share the same shapes). Same group element as msm_g1_fixed."""
    tx, ty = tables[0], tables[1]
    packed25 = tables[2] if len(tables) > 2 else None
    windows = 256 // window_bits
    nt = (
        tx.shape[1] // windows
        if tx is not None
        else packed25.shape[1] // (2 * windows)
    )
    n = scalars.shape[-1]
    if nt <= block:
        return msm_g1_fixed(tables, scalars, inf_mask, chunk, window_bits)
    if nt % block:
        raise ValueError("block must divide the table width")
    from .field import _use_pallas

    use25 = (
        packed25 is not None
        and _use_pallas()
        and window_bits == 16
        and _SIGNED_FB
        and _LAZY25
    )
    base = np.arange(windows, dtype=np.int64)[:, None] * nt
    if inf_mask is not None:
        # align the mask with the scalar axis: a partially-covering mask must
        # pad with False up to n, or its block slice comes out shorter than
        # the block's scalar slice and shape-mismatches inside msm_g1_fixed
        im = np.asarray(inf_mask)
        if im.shape[0] < n:
            im = np.pad(im, (0, n - im.shape[0]))
    # Per block: bucket sums only (sort/scan/extract). Bucket arrays compose
    # by plain addition across table slices, so the weighted bucket reduction
    # (grid trees + suffix + combine, ~3 stage programs of B-lane point work)
    # runs ONCE for the whole MSM instead of once per block.
    signed = window_bits == 16 and _SIGNED_FB
    S_acc = None
    if use25:
        # the signed digit rewrite is lane-independent: compute it ONCE over
        # the full scalar vector and slice per block (vs one rewrite program
        # dispatch per block)
        full_abs, full_neg = _fbs_digit_arrays(
            scalars, im if inf_mask is not None else None, n
        )
    for lo in range(0, min(n, nt), block):
        hi = min(lo + block, nt)
        if use25:
            # strided slice of the packed table (no gather): both the normal
            # and negated-y halves keep the [half, window, point] layout the
            # sort's index = order + neg*P convention expects
            pb = packed25.reshape(FP.L, 2, windows, nt)[..., lo:hi].reshape(
                FP.L, 2 * windows * (hi - lo)
            )
            # digits may cover fewer lanes than the table slice (n < nt);
            # zero-digit padding contributes nothing (bucket 0, weight 0)
            # digits may cover fewer lanes than the table slice (n < nt);
            # zero-digit padding contributes nothing (bucket 0, weight 0).
            # hi - lo == block always (block | nt), so pb needs no padding.
            absd, negd = full_abs[:, lo:hi], full_neg[:, lo:hi]
            wa = absd.shape[-1]
            if wa < block:
                absd = jnp.pad(absd, [(0, 0), (0, block - wa)])
                negd = jnp.pad(negd, [(0, 0), (0, block - wa)])
            S = _fbs25_buckets(pb, absd, negd, block, chunk)
            S_acc = S if S_acc is None else _fb_bucket_add_jit(*S_acc, *S)
            continue
        kb = scalars[..., lo:hi]
        mb = jnp.asarray(im[lo:hi]) if inf_mask is not None else None
        idx = (base + np.arange(lo, hi, dtype=np.int64)[None, :]).ravel()
        txb, tyb = tx[:, idx], ty[:, idx]
        if signed:
            absd, negd = _fbs_digit_arrays(kb, mb, block)
            S = _fbs_buckets((txb, tyb), absd, negd, block, chunk)
        else:
            digits = _fb_digits(kb, window_bits)
            if mb is not None:
                digits = jnp.where(mb[None], 0, digits)
            if digits.shape[-1] < block:
                digits = jnp.pad(digits, [(0, 0), (0, block - digits.shape[-1])])
            S = _fb_buckets((txb, tyb), digits, block, chunk, window_bits)
        S_acc = S if S_acc is None else _fb_bucket_add_jit(*S_acc, *S)
    return _fbs_reduce(S_acc) if signed else _fb_reduce(S_acc, window_bits)


# ---------------------------------------------------------------------------
# Batched fixed-base MSM: k independent MSMs against the SAME tables in ONE
# bucket pass (the batch-opening shape: k quotient polynomials against one
# SRS). Pairs carry a composite sort key j*B + digit so the single global
# sort/scan/extract pipeline keeps the k MSMs' buckets separate; every stage
# is the single-MSM stage with one extra batch axis. The digit-0 bucket of
# each MSM absorbs the cross-MSM prefix garbage (weight 0 — never read).
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnums=(3, 4, 5))
def _fbm_sort_jit(tx, ty, digits, nt: int, window_bits: int, k: int):
    """digits (W, nt, k) -> globally key-sorted (point, key) pairs, key =
    j * B + digit. Data movement only."""
    windows = 256 // window_bits
    B = 1 << window_bits
    flat_d = digits.reshape(windows * nt, k)
    keys = flat_d.astype(jnp.uint32) + jnp.uint32(B) * jnp.arange(k, dtype=jnp.uint32)[None, :]
    keysf = keys.reshape(windows * nt * k)
    order = jnp.argsort(keysf)
    ks = keysf[order]
    pt_idx = order // k  # pair (wi, j) at flat index wi*k + j -> table index wi
    return tx[:, pt_idx], ty[:, pt_idx], ks


@partial(jax.jit, static_argnums=(3, 4, 5))
def _fbm_extract_jit(runs_flat, off, ks, m: int, window_bits: int, k: int):
    """Bucket sums for all k MSMs from global prefix differences: (L, k, B)."""
    B = 1 << window_bits
    lpos = jnp.searchsorted(ks, jnp.arange(k * B, dtype=ks.dtype), side="right") - 1
    valid = lpos >= 0
    lc = jnp.maximum(lpos, 0).astype(jnp.int32)
    U = tuple(r[:, lc] for r in runs_flat)
    cidx = lc // m
    O = tuple(o[:, cidx] for o in off)
    V = G1.add(U, O)
    V = G1.select(valid, V, G1.inf_like(V))
    S = G1.add(V, G1.neg(_shift_points(V, 1, axis=1)))  # (L, k*B)
    return tuple(c.reshape(FP.L, k, B) for c in S)


@jax.jit
def _fbm_grid_trees_jit(s0, s1, s2):
    """Per-MSM A/B digit-grid reductions, batched over the MSM axis."""
    S = (s0, s1, s2)
    B = S[2].shape[2]
    h = (B.bit_length() - 1) // 2
    side = 1 << h
    Sg = tuple(c.reshape(c.shape[0], c.shape[1], side, side) for c in S)
    both = tuple(jnp.stack([c, jnp.swapaxes(c, 2, 3)], axis=2) for c in Sg)
    return _tree_reduce_hybrid(both, axis=4, presteps=2)  # (L, k, 2, side)


@jax.jit
def _fbm_suffix_weighted_jit(w0, w1, w2):
    return _suffix_weighted_points((w0, w1, w2), axis=3)  # (L, k, 2)


@partial(jax.jit, static_argnums=(3,))
def _fbm_combine_jit(v0, v1, v2, h: int):
    """result_j = 2^h * ws[:, j, 0] + ws[:, j, 1] -> (L, k) triple."""
    ws = (v0, v1, v2)
    acc = tuple(c[:, :, 0] for c in ws)
    acc = lax.fori_loop(0, h, lambda _, a: G1.double(a), acc)
    return G1.add(acc, tuple(c[:, :, 1] for c in ws))


def msm_g1_fixed_many(tables, scalars_many, inf_mask=None, chunk: int | None = None,
                      window_bits: int = FB_WINDOW_BITS):
    """k G1 MSMs against the same precomputed tables in ONE bucket pass.

    scalars_many: (16, N, k) standard-form Fr limbs — column j is the scalar
    vector of MSM j. Returns a Jacobian triple with batch shape (k,), each
    lane bit-identical to msm_g1_fixed(tables, scalars_many[..., j])."""
    tx, ty = tables[0], tables[1]
    windows = 256 // window_bits
    nt = tx.shape[1] // windows
    n, k = scalars_many.shape[-2], scalars_many.shape[-1]
    digits = _fb_digits(scalars_many, window_bits)  # (W, n, k)
    if inf_mask is not None:
        digits = jnp.where(jnp.asarray(inf_mask)[None, :, None], 0, digits)
    if n < nt:
        digits = jnp.pad(digits, [(0, 0), (0, nt - n), (0, 0)])
    wnt = windows * nt  # power of two
    P = wnt * k
    m = chunk if chunk is not None else min(512, max(64, P // 2048))
    m = 1 << (m.bit_length() - 1)  # power of two so m | wnt | P
    m = min(m, wnt)

    xs_s, ys_s, ks = _fbm_sort_jit(tx, ty, digits, nt, window_bits, k)
    runs_flat, totals = _fb_scan_cond_jit(xs_s, ys_s, m)
    off = _fb_offsets_jit(*totals)
    S = _fbm_extract_jit(runs_flat, off, ks, m, window_bits, k)
    W = _fbm_grid_trees_jit(*S)
    ws = _fbm_suffix_weighted_jit(*W)
    return _fbm_combine_jit(*ws, window_bits // 2)


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

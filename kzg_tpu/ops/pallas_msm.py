"""Fused Pallas TPU kernel for the MSM bucket-accumulation scan.

The fixed-base MSM's hot stage is a chunked prefix-sum of digit-sorted
points: for each of C chunks, m sequential mixed-adds. As a lax.scan this
costs m kernel launches (one madd over (L, C) lanes per step) — launch
overhead dominates once the madd itself is fast. Here the WHOLE scan is one
pallas_call: grid (C/blk, m) iterated sequentially with the running prefix
kept in VMEM scratch across the step dimension, Pallas double-buffering the
point stream from HBM. One launch, hardware-pipelined, per-step overhead
gone.

Mirrors ops/msm._fb_scan_jit semantics exactly: runs[j, :, c] = sum of the
first j+1 points of chunk c (Jacobian, identity-initialized).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_curve import L, _add_pt, _double_pt, _madd_pt, _madd_pt_fast


def _scan_prefix_kernel_fast(
    xs_ref, ys_ref, ox_ref, oy_ref, oz_ref, flag_ref, accx, accy, accz
):
    """Fast-path scan step: 11-mul madd without the inline doubling; any lane
    that would need a doubling (P == Q, ~never) ORs into the per-block flag
    accumulator and the caller re-runs the exact kernel.

    The flag output is (8, C) with an (8, blk) block revisited across the step
    axis (index map ignores j) — a per-(step, block) flag row would need an
    illegal (1, blk) block on a (m, C) array (Mosaic requires the
    second-to-last block dim divisible by 8 or equal to the array dim)."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        accx[...] = jnp.zeros_like(accx)
        accy[...] = jnp.zeros_like(accy)
        accz[...] = jnp.zeros_like(accz)
        flag_ref[...] = jnp.zeros_like(flag_ref)

    run = (accx[...], accy[...], accz[...])
    q = (xs_ref[0], ys_ref[0])
    (nx, ny, nz), needs_double = _madd_pt_fast(run, q)
    accx[...], accy[...], accz[...] = nx, ny, nz
    ox_ref[0], oy_ref[0], oz_ref[0] = nx, ny, nz
    flag_ref[...] = flag_ref[...] | jnp.broadcast_to(
        needs_double.astype(jnp.uint32)[None, :], flag_ref.shape
    )


def _scan_prefix_kernel(xs_ref, ys_ref, ox_ref, oy_ref, oz_ref, accx, accy, accz):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        accx[...] = jnp.zeros_like(accx)
        accy[...] = jnp.zeros_like(accy)
        accz[...] = jnp.zeros_like(accz)

    run = (accx[...], accy[...], accz[...])
    q = (xs_ref[0], ys_ref[0])
    nx, ny, nz = _madd_pt(run, q)
    accx[...], accy[...], accz[...] = nx, ny, nz
    ox_ref[0], oy_ref[0], oz_ref[0] = nx, ny, nz


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def scan_prefix_madd_fast(xs, ys, m: int, blk: int = 512, interpret: bool = False):
    """Fast-path variant of scan_prefix_madd: 11-mul madd steps, plus a
    needs-double flag array (m, C). The caller must re-run scan_prefix_madd
    iff any flag is set (results for non-flagged inputs are bit-identical)."""
    C = xs.shape[2]
    blk = min(blk, C)
    while C % blk:
        blk //= 2  # largest power-of-two block dividing the chunk count
    spec = pl.BlockSpec((1, L, blk), lambda i, j: (j, 0, i))
    fspec = pl.BlockSpec((8, blk), lambda i, j: (0, i))
    out = pl.pallas_call(
        _scan_prefix_kernel_fast,
        grid=(C // blk, m),
        in_specs=[spec, spec],
        out_specs=[spec, spec, spec, fspec],
        out_shape=[jax.ShapeDtypeStruct((m, L, C), jnp.uint32)] * 3
        + [jax.ShapeDtypeStruct((8, C), jnp.uint32)],
        scratch_shapes=[pltpu.VMEM((L, blk), jnp.uint32)] * 3,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xs, ys)
    return tuple(out[:3]), jnp.max(out[3])


def _scan_prefix_kernel_fast_packed(
    p_ref, ox_ref, oy_ref, oz_ref, flag_ref, accx, accy, accz
):
    """Packed fast-path scan step: the affine point stream arrives as ONE
    (m, L, C) word array with x in the low 16 bits and y in the high 16
    (canonical base-2^16 limbs are < 2^16, so the pair packs losslessly) —
    half the gather volume upstream and half the stream bandwidth here."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        accx[...] = jnp.zeros_like(accx)
        accy[...] = jnp.zeros_like(accy)
        accz[...] = jnp.zeros_like(accz)
        flag_ref[...] = jnp.zeros_like(flag_ref)

    run = (accx[...], accy[...], accz[...])
    w = p_ref[0]
    q = (w & jnp.uint32(0xFFFF), w >> 16)
    (nx, ny, nz), needs_double = _madd_pt_fast(run, q)
    accx[...], accy[...], accz[...] = nx, ny, nz
    ox_ref[0], oy_ref[0], oz_ref[0] = nx, ny, nz
    flag_ref[...] = flag_ref[...] | jnp.broadcast_to(
        needs_double.astype(jnp.uint32)[None, :], flag_ref.shape
    )


def _scan_prefix_kernel_packed(p_ref, ox_ref, oy_ref, oz_ref, accx, accy, accz):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        accx[...] = jnp.zeros_like(accx)
        accy[...] = jnp.zeros_like(accy)
        accz[...] = jnp.zeros_like(accz)

    run = (accx[...], accy[...], accz[...])
    w = p_ref[0]
    q = (w & jnp.uint32(0xFFFF), w >> 16)
    nx, ny, nz = _madd_pt(run, q)
    accx[...], accy[...], accz[...] = nx, ny, nz
    ox_ref[0], oy_ref[0], oz_ref[0] = nx, ny, nz


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def scan_prefix_madd_fast_packed(pk, m: int, blk: int = 512,
                                 interpret: bool = False):
    """scan_prefix_madd_fast on an x|y<<16 packed point stream (m, L, C)."""
    C = pk.shape[2]
    blk = min(blk, C)
    while C % blk:
        blk //= 2
    spec = pl.BlockSpec((1, L, blk), lambda i, j: (j, 0, i))
    fspec = pl.BlockSpec((8, blk), lambda i, j: (0, i))
    out = pl.pallas_call(
        _scan_prefix_kernel_fast_packed,
        grid=(C // blk, m),
        in_specs=[spec],
        out_specs=[spec, spec, spec, fspec],
        out_shape=[jax.ShapeDtypeStruct((m, L, C), jnp.uint32)] * 3
        + [jax.ShapeDtypeStruct((8, C), jnp.uint32)],
        scratch_shapes=[pltpu.VMEM((L, blk), jnp.uint32)] * 3,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(pk)
    return tuple(out[:3]), jnp.max(out[3])


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def scan_prefix_madd_packed(pk, m: int, blk: int = 512, interpret: bool = False):
    """scan_prefix_madd on an x|y<<16 packed point stream (m, L, C)."""
    C = pk.shape[2]
    blk = min(blk, C)
    while C % blk:
        blk //= 2
    spec = pl.BlockSpec((1, L, blk), lambda i, j: (j, 0, i))
    out = pl.pallas_call(
        _scan_prefix_kernel_packed,
        grid=(C // blk, m),
        in_specs=[spec],
        out_specs=[spec] * 3,
        out_shape=[jax.ShapeDtypeStruct((m, L, C), jnp.uint32)] * 3,
        scratch_shapes=[pltpu.VMEM((L, blk), jnp.uint32)] * 3,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(pk)
    return tuple(out)


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def scan_prefix_madd(xs, ys, m: int, blk: int = 512, interpret: bool = False):
    """xs, ys: (m, L, C) digit-sorted affine points (step-major). Returns the
    Jacobian prefix sums runs: 3 x (m, L, C)."""
    C = xs.shape[2]
    blk = min(blk, C)
    while C % blk:
        blk //= 2  # largest power-of-two block dividing the chunk count
    spec = pl.BlockSpec((1, L, blk), lambda i, j: (j, 0, i))
    out = pl.pallas_call(
        _scan_prefix_kernel,
        grid=(C // blk, m),
        in_specs=[spec, spec],
        out_specs=[spec] * 3,
        out_shape=[jax.ShapeDtypeStruct((m, L, C), jnp.uint32)] * 3,
        scratch_shapes=[pltpu.VMEM((L, blk), jnp.uint32)] * 3,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xs, ys)
    return tuple(out)


# ---------------------------------------------------------------------------
# Fused Hillis-Steele point scans (prefix / suffix) along the last axis.
#
# The XLA formulation of these stages (_hs_scan_points) issues log2(W)
# separate batched point-adds, each ~60 HLO kernel launches — launch overhead
# dominates because the actual point work is tiny (C or side lanes). Here the
# WHOLE scan runs in one pallas_call: grid (row_blocks, levels) iterated
# sequentially with the running state in VMEM scratch; each level is one
# exact Jacobian add against the state shifted by 2^level lanes (shifted-in
# lanes are identity points, absorbed by the group law — no masking needed).
# ---------------------------------------------------------------------------


def _shift_lanes_static(arrs, shift: int, reverse: bool):
    """Shift blocks along the lane axis by a STATIC amount, zero fill.
    reverse=False: lane w reads w - shift (prefix); True: w + shift."""
    W = arrs[0].shape[-1]
    pad = [(0, 0)] * (arrs[0].ndim - 1)
    pad += [(0, shift)] if reverse else [(shift, 0)]
    lo = shift if reverse else 0
    return [jnp.pad(a, pad)[..., lo : lo + W] for a in arrs]


def _shift_lanes_by_level(arrs, j, levels: int, reverse: bool):
    """Shift by 2^j lanes for a TRACED level index j: a where-chain over the
    static power-of-two shifts (Mosaic has no dynamic slice on values; the
    chain costs levels cheap selects against the kernel's ~2000-op add)."""
    res = _shift_lanes_static(arrs, 1, reverse)
    for k in range(1, levels):
        sh = _shift_lanes_static(arrs, 1 << k, reverse)
        res = [jnp.where(j == k, a, b) for a, b in zip(sh, res)]
    return res


def _hs_scan_kernel(x_ref, y_ref, z_ref, ox_ref, oy_ref, oz_ref, sx, sy, sz,
                    *, levels: int, W: int, reverse: bool, exclusive: bool):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        sx[...] = x_ref[...]
        sy[...] = y_ref[...]
        sz[...] = z_ref[...]

    state = (sx[...], sy[...], sz[...])
    partner = _shift_lanes_by_level(state, j, levels, reverse)
    nx, ny, nz = _add_pt(state, tuple(partner))
    sx[...], sy[...], sz[...] = nx, ny, nz

    @pl.when(j == levels - 1)
    def _():
        out = (sx[...], sy[...], sz[...])
        if exclusive:
            out = tuple(_shift_lanes_static(out, 1, reverse))
        ox_ref[...], oy_ref[...], oz_ref[...] = out


@functools.partial(jax.jit, static_argnums=(3, 4, 5))
def hs_scan_points(x, y, z, reverse: bool = False, exclusive: bool = False,
                   interpret: bool = False):
    """Inclusive (or exclusive) Hillis-Steele prefix/suffix sums of Jacobian
    points along the LAST axis, as one fused kernel. x, y, z: (L, *batch, W)
    u32 limb arrays. Mirrors ops/msm._hs_scan_points results exactly."""
    shape = x.shape
    W = shape[-1]
    R = 1
    for d in shape[1:-1]:
        R *= d
    xs = [a.reshape(L, R, W) for a in (x, y, z)]
    levels = max(1, (W - 1).bit_length())
    # row blocking: keep 6 (state+io) copies of (L, rblk, W) under ~6 MB
    rblk = R
    while 6 * L * rblk * W * 4 > 6 * 1024 * 1024 and rblk % 2 == 0:
        rblk //= 2
    spec = pl.BlockSpec((L, rblk, W), lambda i, j: (0, i, 0))
    kernel = functools.partial(
        _hs_scan_kernel, levels=levels, W=W, reverse=reverse, exclusive=exclusive
    )
    out = pl.pallas_call(
        kernel,
        grid=(R // rblk, levels),
        in_specs=[spec] * 3,
        out_specs=[spec] * 3,
        out_shape=[jax.ShapeDtypeStruct((L, R, W), jnp.uint32)] * 3,
        scratch_shapes=[pltpu.VMEM((L, rblk, W), jnp.uint32)] * 3,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*xs)
    return tuple(o.reshape(shape) for o in out)


def _dbl_chain_kernel(x_ref, y_ref, z_ref, ox_ref, oy_ref, oz_ref, sx, sy, sz,
                      *, steps: int):
    """steps doublings of the input, state in VMEM across the grid axis."""
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        sx[...] = x_ref[...]
        sy[...] = y_ref[...]
        sz[...] = z_ref[...]

    nx, ny, nz = _double_pt((sx[...], sy[...], sz[...]))
    sx[...], sy[...], sz[...] = nx, ny, nz

    @pl.when(j == steps - 1)
    def _():
        ox_ref[...], oy_ref[...], oz_ref[...] = sx[...], sy[...], sz[...]


@functools.partial(jax.jit, static_argnums=(3, 4))
def double_chain(x, y, z, steps: int, interpret: bool = False):
    """2^steps * P for a small batch of points, one fused kernel (the MSM
    window-combine shift). x, y, z: (L, W) u32 limbs."""
    W = x.shape[-1]
    spec = pl.BlockSpec((L, W), lambda j: (0, 0))
    out = pl.pallas_call(
        functools.partial(_dbl_chain_kernel, steps=steps),
        grid=(steps,),
        in_specs=[spec] * 3,
        out_specs=[spec] * 3,
        out_shape=[jax.ShapeDtypeStruct((L, W), jnp.uint32)] * 3,
        scratch_shapes=[pltpu.VMEM((L, W), jnp.uint32)] * 3,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x, y, z)
    return tuple(out)


# ---------------------------------------------------------------------------
# Fused window-fold: acc <- acc + q_w over W gathered window entries
# (the fixed-GENERATOR scalar-mult hot loop, ops/genmul.mul_gen). One kernel
# replaces W separate madd launches + digit-0 selects; only the FINAL
# accumulator is written (no prefix stream). Digit-0 table entries are stored
# as (0, 0) — not a curve point — and detected in-kernel as "skip".
# ---------------------------------------------------------------------------


def _fold_madd_kernel(p_ref, ox_ref, oy_ref, oz_ref, accx, accy, accz,
                      *, steps: int):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        accx[...] = jnp.zeros_like(accx)
        accy[...] = jnp.zeros_like(accy)
        accz[...] = jnp.zeros_like(accz)

    run = (accx[...], accy[...], accz[...])
    w = p_ref[0]
    qx, qy = w & jnp.uint32(0xFFFF), w >> 16
    nx, ny, nz = _madd_pt(run, (qx, qy))
    # digit-0 lanes: the (0, 0) sentinel is not a point — keep the old state
    skip = jnp.logical_and(
        jnp.max(qx.astype(jnp.int32), axis=0) == 0,
        jnp.max(qy.astype(jnp.int32), axis=0) == 0,
    )
    sel = skip[None, :]
    accx[...] = jnp.where(sel, run[0], nx)
    accy[...] = jnp.where(sel, run[1], ny)
    accz[...] = jnp.where(sel, run[2], nz)

    @pl.when(j == steps - 1)
    def _():
        ox_ref[...], oy_ref[...], oz_ref[...] = accx[...], accy[...], accz[...]


@functools.partial(jax.jit, static_argnums=(1, 2))
def fold_madd_packed(pk, blk: int = 2048, interpret: bool = False):
    """Fold W packed affine window entries per lane into one Jacobian point.

    pk: (W, L, C) with x | y << 16 packed words; lanes whose entry is the
    (0, 0) sentinel are skipped. Returns the Jacobian triple (L, C) equal to
    sum over non-sentinel entries (madd exceptional lanes handled exactly)."""
    W, _, C = pk.shape
    blk = min(blk, C)
    while C % blk:
        blk //= 2
    spec = pl.BlockSpec((1, L, blk), lambda i, j: (j, 0, i))
    ospec = pl.BlockSpec((L, blk), lambda i, j: (0, i))
    out = pl.pallas_call(
        functools.partial(_fold_madd_kernel, steps=W),
        grid=(C // blk, W),
        in_specs=[spec],
        out_specs=[ospec] * 3,
        out_shape=[jax.ShapeDtypeStruct((L, C), jnp.uint32)] * 3,
        scratch_shapes=[pltpu.VMEM((L, blk), jnp.uint32)] * 3,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(pk)
    return tuple(out)

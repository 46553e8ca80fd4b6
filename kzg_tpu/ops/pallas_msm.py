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

from .pallas_curve import L, _madd_pt, _madd_pt_fast


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

"""Interpret-mode coverage for the fused Pallas kernels (the perf-critical
TPU path) against the XLA reference implementations.

The kernel bodies (pallas_field.mont_mul_stack / mont_mul_block, the
pallas_curve point formulas) are pure jnp and run under plain jit on the CPU
test backend; the full pallas_call scan kernels run via interpret=True. Every
assertion is bit-exactness against the ops/field + ops/curve reference paths
(which are themselves pinned to the python-int oracle elsewhere).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kzg_tpu.ops import pallas_curve as pc
from kzg_tpu.ops import pallas_field as pf
from kzg_tpu.ops import pallas_msm as pm
from kzg_tpu.ops.curve import G1, G1_GEN_DEV
from kzg_tpu.ops.field import FP
from kzg_tpu.utils import hostmath as hm


def _rand_fp(rng, n):
    return jnp.asarray(FP.many_to_limbs([rng.randrange(hm.P) for _ in range(n)]))


def _rand_g1(rng, n):
    """Random affine G1 points as device Montgomery limb arrays (24, n)."""
    pts = [hm.g1_mul(hm.G1_GEN, rng.randrange(1, hm.R)) for _ in range(n)]
    x = jnp.asarray(FP.many_to_limbs([p[0] for p in pts]))
    y = jnp.asarray(FP.many_to_limbs([p[1] for p in pts]))
    return x, y


def test_mont_mul_stack_and_block_match_field_mul(rng):
    n = 8
    a = _rand_fp(rng, n)
    b = _rand_fp(rng, n)
    want = np.asarray(FP.mul(a, b))
    got_stack = np.asarray(
        pf.mont_mul_stack(a, b, FP.modulus, FP.n_prime_int, FP.L)
    )
    got_block = np.asarray(
        pf.mont_mul_block(a, b, FP.modulus, FP.n_prime_int, FP.L)
    )
    np.testing.assert_array_equal(got_stack, want)
    np.testing.assert_array_equal(got_block, want)
    # edge values: 0, 1, P-1 against each other
    edges = jnp.asarray(FP.many_to_limbs([0, 1, hm.P - 1, hm.P - 1]))
    other = jnp.asarray(FP.many_to_limbs([hm.P - 1, hm.P - 1, hm.P - 1, 1]))
    np.testing.assert_array_equal(
        np.asarray(pf.mont_mul_stack(edges, other, FP.modulus, FP.n_prime_int, FP.L)),
        np.asarray(FP.mul(edges, other)),
    )


def test_mont_mul_pallas_call_interpret(rng):
    """The actual pallas_call wrapper, gridded, in interpret mode."""
    import functools

    from jax.experimental import pallas as pl

    n = 256
    a = _rand_fp(rng, n)
    b = _rand_fp(rng, n)
    kernel = functools.partial(
        pf._mont_mul_kernel, modulus=FP.modulus, n_prime=FP.n_prime_int, L=FP.L
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((FP.L, n), jnp.uint32),
        grid=(2,),
        in_specs=[
            pl.BlockSpec((FP.L, n // 2), lambda i: (0, i)),
            pl.BlockSpec((FP.L, n // 2), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((FP.L, n // 2), lambda i: (0, i)),
        interpret=True,
    )(a, b)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(FP.mul(a, b)))


def _exceptional_pairs(rng):
    """(jacobian p, affine q) covering P==Q, P==-Q, P==inf and generic lanes."""
    x, y = _rand_g1(rng, 4)
    one = jnp.broadcast_to(jnp.asarray(FP.ONE_MONT)[:, None], x.shape)
    # p lanes: [q, -q, inf, generic]
    px = jnp.stack([x[:, 0], x[:, 1], jnp.zeros_like(x[:, 2]), x[:, 3]], axis=1)
    py = jnp.stack(
        [y[:, 0], FP.neg(y[:, 1]), jnp.zeros_like(y[:, 2]), y[:, 3]], axis=1
    )
    pz = jnp.stack(
        [one[:, 0], one[:, 1], jnp.zeros_like(one[:, 2]), one[:, 3]], axis=1
    )
    qx, qy = x, y
    # lane 3: generic distinct q
    gx, gy = _rand_g1(rng, 1)
    qx = qx.at[:, 3].set(gx[:, 0])
    qy = qy.at[:, 3].set(gy[:, 0])
    return (px, py, pz), (qx, qy)


def test_pallas_madd_matches_curve_incl_exceptional(rng):
    p, q = _exceptional_pairs(rng)
    want = tuple(np.asarray(c) for c in G1.madd(p, q))
    got = tuple(np.asarray(c) for c in jax.jit(pc._madd_pt)(p, q))
    for w, g in zip(want, got):
        np.testing.assert_array_equal(g, w)


def test_pallas_madd_fast_flags_doubling_lane(rng):
    p, q = _exceptional_pairs(rng)
    out, needs_double = jax.jit(pc._madd_pt_fast)(p, q)
    flags = np.asarray(needs_double)
    assert flags.tolist() == [True, False, False, False]
    want = tuple(np.asarray(c) for c in G1.madd(p, q))
    got = tuple(np.asarray(c) for c in out)
    # non-flagged lanes must be bit-identical to the exact madd
    for w, g in zip(want, got):
        np.testing.assert_array_equal(g[:, 1:], w[:, 1:])


def test_pallas_add_double_match_curve(rng):
    x, y = _rand_g1(rng, 4)
    one = jnp.broadcast_to(jnp.asarray(FP.ONE_MONT)[:, None], x.shape)
    p = (x, y, one)
    x2, y2 = _rand_g1(rng, 4)
    q = (x2, y2, one)
    # add: include P==Q, P==-Q, P==inf lanes
    qx = jnp.stack([x[:, 0], x[:, 1], x2[:, 2], x2[:, 3]], axis=1)
    qy = jnp.stack([y[:, 0], FP.neg(y[:, 1]), y2[:, 2], y2[:, 3]], axis=1)
    pz = jnp.stack(
        [one[:, 0], one[:, 1], jnp.zeros_like(one[:, 2]), one[:, 3]], axis=1
    )
    pp = (x, y, pz)
    qq = (qx, qy, one)
    want = tuple(np.asarray(c) for c in G1.add(pp, qq))
    got = tuple(np.asarray(c) for c in jax.jit(pc._add_pt)(pp, qq))
    for w, g in zip(want, got):
        np.testing.assert_array_equal(g, w)
    want_d = tuple(np.asarray(c) for c in G1.double(p))
    got_d = tuple(np.asarray(c) for c in jax.jit(pc._double_pt)(p))
    for w, g in zip(want_d, got_d):
        np.testing.assert_array_equal(g, w)


def _scan_reference(xs, ys, m):
    from jax import lax

    def step(run, q):
        nr = G1.madd(run, q)
        return nr, nr

    C = xs.shape[2]
    init = tuple(jnp.zeros((FP.L, C), jnp.uint32) for _ in range(3))
    _, runs = lax.scan(step, init, (xs, ys))
    return runs


def test_scan_prefix_madd_interpret_matches_lax_scan(rng):
    m, C = 4, 8
    x, y = _rand_g1(rng, m * C)
    xs = jnp.moveaxis(x.reshape(FP.L, C, m), 2, 0)  # (m, L, C)
    ys = jnp.moveaxis(y.reshape(FP.L, C, m), 2, 0)
    want = tuple(np.asarray(r) for r in _scan_reference(xs, ys, m))
    got = pm.scan_prefix_madd(xs, ys, m, blk=8, interpret=True)
    for w, g in zip(want, got):
        np.testing.assert_array_equal(np.asarray(g), w)


def test_scan_prefix_madd_fast_interpret(rng):
    m, C = 4, 8
    x, y = _rand_g1(rng, m * C)
    xs = jnp.moveaxis(x.reshape(FP.L, C, m), 2, 0)
    ys = jnp.moveaxis(y.reshape(FP.L, C, m), 2, 0)
    want = tuple(np.asarray(r) for r in _scan_reference(xs, ys, m))
    got, flag = pm.scan_prefix_madd_fast(xs, ys, m, blk=8, interpret=True)
    assert int(flag) == 0
    for w, g in zip(want, got):
        np.testing.assert_array_equal(np.asarray(g), w)
    # duplicated point in one chunk => prefix hits P == Q => flag set
    xs2 = xs.at[1, :, 0].set(xs[0, :, 0])
    ys2 = ys.at[1, :, 0].set(ys[0, :, 0])
    _, flag2 = pm.scan_prefix_madd_fast(xs2, ys2, m, blk=8, interpret=True)
    assert int(flag2) != 0


def test_fixed_base_msm_cpu_path_vs_oracle(rng):
    """End-to-end msm_g1_fixed on the CPU path (lax.scan) vs the oracle.

    8-bit windows: the same bucket pipeline as the production 16-bit path, but
    with B = 256 buckets the extraction/reduction stages stay cheap enough for
    the fast CPU gate (B = 65536 takes tens of minutes on one core; that
    configuration is exercised on real hardware by bench.py)."""
    from kzg_tpu.ops import msm as msmops

    n = 64
    ks = [rng.randrange(1, hm.R) for _ in range(n)]
    pts = [hm.g1_mul(hm.G1_GEN, k) for k in ks]
    x = jnp.asarray(FP.many_to_limbs([p[0] for p in pts]))
    y = jnp.asarray(FP.many_to_limbs([p[1] for p in pts]))
    scalars = [rng.randrange(hm.R) for _ in range(n)]
    from kzg_tpu.ops import curve as cv

    sc = cv.fr_to_device(scalars, batch=True)
    tables = msmops.precompute_g1_tables((x, y), window_bits=8)
    out = msmops.msm_g1_fixed(tables, sc, window_bits=8)
    got = cv.g1_from_device(out)
    expected_scalar_pts = [hm.g1_mul(p, s) for p, s in zip(pts, scalars)]
    acc = None
    for p in expected_scalar_pts:
        acc = hm.g1_add(acc, p)
    assert got == acc


def test_scan_prefix_madd_packed_interpret(rng):
    """Packed-stream scan kernels (x | y << 16 words) vs the lax.scan path."""
    m, C = 4, 8
    x, y = _rand_g1(rng, m * C)
    xs = jnp.moveaxis(x.reshape(FP.L, C, m), 2, 0)
    ys = jnp.moveaxis(y.reshape(FP.L, C, m), 2, 0)
    pk = xs | (ys << 16)
    want = tuple(np.asarray(r) for r in _scan_reference(xs, ys, m))
    got = pm.scan_prefix_madd_packed(pk, m, blk=8, interpret=True)
    for w, g in zip(want, got):
        np.testing.assert_array_equal(np.asarray(g), w)
    got_f, flag = pm.scan_prefix_madd_fast_packed(pk, m, blk=8, interpret=True)
    assert int(flag) == 0
    for w, g in zip(want, got_f):
        np.testing.assert_array_equal(np.asarray(g), w)


def test_hs_scan_points_interpret_matches_xla(rng):
    """Fused Hillis-Steele point scan vs ops/msm._hs_scan_points, all modes."""
    from kzg_tpu.ops import msm as msmops

    W = 8
    x, y = _rand_g1(rng, 2 * W)
    one = jnp.broadcast_to(jnp.asarray(FP.ONE_MONT)[:, None], x.shape)
    pts = tuple(c.reshape(FP.L, 2, W) for c in (x, y, one))
    for rev in (False, True):
        for exc in (False, True):
            want = msmops._hs_scan_points(pts, axis=2, reverse=rev, exclusive=exc)
            got = pm.hs_scan_points(*pts, rev, exc, True)
            for w, g in zip(want, got):
                np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_double_chain_interpret(rng):
    x, y = _rand_g1(rng, 8)
    one = jnp.broadcast_to(jnp.asarray(FP.ONE_MONT)[:, None], x.shape)
    acc = (x, y, one)
    for _ in range(5):
        acc = G1.double(acc)
    got = pm.double_chain(x, y, one, 5, True)
    for w, g in zip(acc, got):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_signed_digits_recompose(rng):
    """Signed window digits recompose to the scalar: sum e_w 2^(16w) == k."""
    from kzg_tpu.ops import msm as msmops
    from kzg_tpu.ops import curve as cv

    ks = [rng.randrange(hm.R) for _ in range(13)] + [0, hm.R - 1, 0xFFFF8000]
    sc = cv.fr_to_device(ks, batch=True)
    absd, negd = msmops._fb_digits_signed(sc)
    absd, negd = np.asarray(absd), np.asarray(negd)
    assert absd.max() <= 1 << 15
    for j, k in enumerate(ks):
        total = sum(
            (-int(a) if n else int(a)) << (16 * w)
            for w, (a, n) in enumerate(zip(absd[:, j], negd[:, j]))
        )
        assert total == k, f"recompose mismatch for scalar #{j}"


def test_fixed_base_msm_signed_path_vs_oracle(rng):
    """End-to-end signed (production 16-bit) msm_g1_fixed on the CPU path vs
    the oracle, including adversarial all-0xFFFF / r-1 scalars. Heavier than
    the 8-bit test (B = 2^15 extraction) but warm-cache repeats are cheap."""
    from kzg_tpu.ops import msm as msmops
    from kzg_tpu.ops import curve as cv

    n = 64
    ks = [rng.randrange(1, hm.R) for _ in range(n)]
    pts = [hm.g1_mul(hm.G1_GEN, k) for k in ks]
    x = jnp.asarray(FP.many_to_limbs([p[0] for p in pts]))
    y = jnp.asarray(FP.many_to_limbs([p[1] for p in pts]))
    scalars = [rng.randrange(hm.R) for _ in range(n - 3)]
    scalars += [hm.R - 1, (1 << 255) % hm.R, 0xFFFF]
    sc = cv.fr_to_device(scalars, batch=True)
    tables = msmops.precompute_g1_tables((x, y))
    out = msmops.msm_g1_fixed(tables, sc)
    got = cv.g1_from_device(out)
    exp = hm.g1_mul(hm.G1_GEN, sum(k * s for k, s in zip(ks, scalars)) % hm.R)
    assert got == exp


def test_fold_madd_packed_interpret(rng):
    """Window-fold kernel vs explicit madd+select loop, incl. (0,0) sentinel
    lanes (digit-0 skips) and an all-sentinel lane (identity result)."""
    W, C = 5, 8
    x, y = _rand_g1(rng, W * C)
    xs = x.reshape(FP.L, W, C)
    ys = y.reshape(FP.L, W, C)
    keep = jnp.asarray(
        (np.arange(W)[:, None] + np.arange(C)[None, :]) % 3 != 0
    )  # mixed skip pattern
    keep = keep.at[:, 3].set(False)  # one all-sentinel lane
    xs = jnp.where(keep[None], xs, 0)
    ys = jnp.where(keep[None], ys, 0)
    pk = jnp.moveaxis(xs | (ys << 16), 1, 0)  # (W, L, C)
    got = pm.fold_madd_packed(pk, 8, True)

    acc = tuple(jnp.zeros((FP.L, C), jnp.uint32) for _ in range(3))
    for w in range(W):
        new = G1.madd(acc, (xs[:, w], ys[:, w]))
        acc = tuple(jnp.where(keep[w][None], n, a) for n, a in zip(new, acc))
    for g, a in zip(got, acc):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(a))


def test_mont_mul_mxu_redc_bit_identical(rng):
    """The MXU-offloaded REDC engine (TPU default) vs the stacked VPU path,
    incl. p-1 / 0 edge operands and a 3-D fall-through shape."""
    n = 16
    a = _rand_fp(rng, n)
    b = _rand_fp(rng, n)
    edge = jnp.asarray(FP.many_to_limbs([hm.P - 1, 0]))
    a = jnp.concatenate([edge, a[:, 2:]], axis=1)
    want = np.asarray(pf.mont_mul_stack(a, b, FP.modulus, FP.n_prime_int, FP.L))
    got = np.asarray(pf.mont_mul_stack_mxu(a, b, FP.modulus, FP.n_prime_int, FP.L))
    np.testing.assert_array_equal(got, want)
    a3 = a.reshape(FP.L, 2, n // 2)
    b3 = b.reshape(FP.L, 2, n // 2)
    got3 = np.asarray(pf.mont_mul_stack_mxu(a3, b3, FP.modulus, FP.n_prime_int, FP.L))
    np.testing.assert_array_equal(got3.reshape(FP.L, n), want)

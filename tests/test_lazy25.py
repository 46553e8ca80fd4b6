"""Interpret-mode coverage for the lazy 25-limb MSM kernels (ops/pallas_msm25)
against the 24-limb reference pipeline and the python-int oracle.

The lazy kernels hold REDUNDANT values (multiples of p in a 2^400 Montgomery
domain); assertions compare canonical values after to_mont16 conversion, which
must be bit-exact against the 24-limb path.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kzg_tpu.ops import msm as msmops
from kzg_tpu.ops import pallas_msm25 as k25
from kzg_tpu.ops.curve import G1
from kzg_tpu.ops.field import FP, FR
from kzg_tpu.utils import hostmath as hm

R25 = 1 << 400


def _to25(vals):
    return jnp.asarray(
        np.array([[(v >> (16 * i)) & 0xFFFF for v in vals] for i in range(25)], np.uint32)
    )


def _from25(a):
    a = np.asarray(a, np.uint64)
    return [
        int(sum(int(a[i, t]) << (16 * i) for i in range(a.shape[0])))
        for t in range(a.shape[1])
    ]


def test_mont_mul25_oracle(rng):
    xs = [rng.randrange(hm.P) for _ in range(6)]
    ys = [rng.randrange(hm.P) for _ in range(6)]
    # redundant mont25 representatives (value + k*p, k < 31)
    a_int = [(x * R25) % hm.P + (i * 7 % 31) * hm.P for i, x in enumerate(xs)]
    b_int = [(y * R25) % hm.P + (i * 5 % 31) * hm.P for i, y in enumerate(ys)]
    A, B = _to25(a_int), _to25(b_int)
    for fn in (k25._mont_mul25, k25._mul_cols25_vpu):
        got = _from25(fn(A, B))
        for i in range(6):
            exp = a_int[i] * b_int[i] * pow(R25, -1, hm.P) % hm.P
            assert got[i] % hm.P == exp
            assert got[i] < 3 * hm.P  # lazy output bound


def test_sub_dblshift_oracle(rng):
    a_int = [(rng.randrange(hm.P) * R25) % hm.P + 3 * hm.P for _ in range(4)]
    b_int = [(rng.randrange(hm.P) * R25) % hm.P for _ in range(4)]
    A, B = _to25(a_int), _to25(b_int)
    got = _from25(k25._sub(A, (B, B), k25._KN[8]))
    assert got == [a - 2 * b + 8 * hm.P for a, b in zip(a_int, b_int)]
    assert _from25(k25._dblshift(B, 3)) == [8 * b for b in b_int]


def test_to_mont16_matches_canonical(rng):
    xs = [rng.randrange(hm.P) for _ in range(5)] + [0, 1]
    v_int = [(x * R25) % hm.P + (i * 11 % 40) * hm.P for i, x in enumerate(xs)]
    got = np.asarray(k25.to_mont16(_to25(v_int)))
    # expected: canonical mont16 limbs of x * 2^-16... the table pre-scale is
    # inverted, so to_mont16(x * 2^400 mod-p rep) == mont16(x * 2^16 * 2^-16)
    want = np.asarray(FP.many_to_limbs(xs))
    np.testing.assert_array_equal(got, want)


def _fixed_tables(rng, n):
    pts = [hm.g1_mul(hm.G1_GEN, rng.randrange(1, hm.R)) for _ in range(n)]
    x = jnp.asarray(FP.many_to_limbs([p[0] for p in pts]))
    y = jnp.asarray(FP.many_to_limbs([p[1] for p in pts]))
    return msmops.precompute_g1_tables((x, y)), pts


@pytest.mark.slow
def test_scan25_matches_scan16_canonical(rng):
    """The lazy scan's canonicalized prefixes equal the 24-limb packed scan's
    prefixes exactly (same order of madds, same group elements)."""
    m, C = 8, 2
    pts = [hm.g1_mul(hm.G1_GEN, rng.randrange(1, hm.R)) for _ in range(m * C)]
    x = jnp.asarray(FP.many_to_limbs([p[0] for p in pts]))
    y = jnp.asarray(FP.many_to_limbs([p[1] for p in pts]))
    pk16 = jnp.moveaxis((x | (y << 16)).reshape(24, C, m), 2, 0)
    c16 = jnp.asarray(FP.to_limbs(1 << 16))[:, None]
    pk25 = jnp.moveaxis(
        (FP.mul(x, c16) | (FP.mul(y, c16) << 16)).reshape(24, C, m), 2, 0
    )
    runs25, flag = k25.scan25_fast(pk25, m, blk=8, interpret=True)
    assert not bool(flag)
    runs25x = k25.scan25_exact(pk25, m, blk=8, interpret=True)
    from kzg_tpu.ops import pallas_msm as pm

    runs16 = pm.scan_prefix_madd_packed(pk16, m, blk=8, interpret=True)
    for r25, r25x, r16 in zip(runs25, runs25x, runs16):
        flat25 = jnp.moveaxis(r25, 0, 2).reshape(25, -1)
        flat25x = jnp.moveaxis(r25x, 0, 2).reshape(25, -1)
        flat16 = np.asarray(jnp.moveaxis(r16, 0, 2).reshape(24, -1))
        np.testing.assert_array_equal(np.asarray(k25.to_mont16(flat25)), flat16)
        np.testing.assert_array_equal(np.asarray(k25.to_mont16(flat25x)), flat16)


@pytest.mark.slow
def test_scan25_exact_handles_needs_double(rng):
    """A stream with a repeated point inside one chunk trips the fast flag;
    the exact kernel must produce the doubled point."""
    k = rng.randrange(1, hm.R)
    pt = hm.g1_mul(hm.G1_GEN, k)
    x = jnp.asarray(FP.many_to_limbs([pt[0]] * 8))
    y = jnp.asarray(FP.many_to_limbs([pt[1]] * 8))
    c16 = jnp.asarray(FP.to_limbs(1 << 16))[:, None]
    pk = (FP.mul(x, c16) | (FP.mul(y, c16) << 16)).reshape(24, 8, 1)
    pk = jnp.moveaxis(pk, 1, 0)  # (m=8, 24, C=1)
    _, flag = k25.scan25_fast(pk, 8, blk=8, interpret=True)
    assert bool(flag)
    runs = k25.scan25_exact(pk, 8, blk=8, interpret=True)
    last = tuple(jnp.moveaxis(r, 0, 2).reshape(25, -1)[:, -1:] for r in runs)
    got = tuple(np.asarray(k25.to_mont16(c))[:, 0] for c in last)
    from kzg_tpu.ops import curve as cv

    val = cv.g1_from_device(tuple(jnp.asarray(c) for c in got))
    assert val == hm.g1_mul(pt, 8)


@pytest.mark.slow
def test_fold25_matches_fold16_canonical(rng):
    """The lazy ceremony fold kernel equals the 24-limb fold after
    canonicalization, including digit-0 sentinel skips and an inf lane."""
    from kzg_tpu.ops import pallas_msm as pm

    W, C = 4, 2
    pts = [hm.g1_mul(hm.G1_GEN, rng.randrange(1, hm.R)) for _ in range(W * C)]
    x = np.asarray(FP.many_to_limbs([p[0] for p in pts]), np.uint32)
    y = np.asarray(FP.many_to_limbs([p[1] for p in pts]), np.uint32)
    # sentinel out entries (w=2, c=0) and a whole lane (c=1) -> infinity
    x[:, 4], y[:, 4] = 0, 0
    for w in range(W):
        x[:, w * C + 1], y[:, w * C + 1] = 0, 0
    xs, ys = jnp.asarray(x), jnp.asarray(y)
    pk16 = (xs | (ys << 16)).reshape(24, W, C).transpose(1, 0, 2)
    got16 = pm.fold_madd_packed(pk16, blk=8, interpret=True)
    c16 = jnp.asarray(FP.to_limbs(1 << 16))[:, None]
    pk25 = (FP.mul(xs, c16) | (FP.mul(ys, c16) << 16)).reshape(24, W, C).transpose(1, 0, 2)
    got25 = k25.fold25_packed(pk25, blk=8, interpret=True)
    for a, b in zip(got25, got16):
        np.testing.assert_array_equal(np.asarray(k25.to_mont16(a)), np.asarray(b))


@pytest.mark.slow
def test_fbs25_buckets_match_fbs16(rng):
    """Full signed bucket pipeline (sort -> lazy scan -> convert+extract)
    equals the 24-limb pipeline bucket-for-bucket."""
    n = 16
    (tx, ty), _ = _fixed_tables(rng, n)
    nt = tx.shape[1] // msmops.FB_WINDOWS  # pow2-padded table width
    packed = msmops.pack_tables25((tx, ty))
    sc = [rng.randrange(hm.R) for _ in range(n)]
    std = jnp.asarray(FR.from_mont(jnp.asarray(FR.many_to_limbs(sc))))
    absd, negd = msmops._fbs_digit_arrays(std, None, nt)
    P = msmops.FB_WINDOWS * nt
    m = msmops.fb_chunk_size(P)

    pk25, ds = msmops._fbs25_sort_jit(packed, absd, negd, nt, m)
    runs, flag = k25.scan25_fast(pk25, m, blk=8, interpret=True)
    if bool(flag):
        # pow2-padded tables repeat the generator in pad lanes (digit 0), so
        # consecutive pad pairs hit P == Q — the production cond re-runs the
        # exact kernel, mirrored here
        runs = k25.scan25_exact(pk25, m, blk=8, interpret=True)
    totals = tuple(r[-1] for r in runs)
    runs_flat = tuple(jnp.moveaxis(r, 0, 2).reshape(25, P) for r in runs)
    S25 = msmops._fbs25_extract_jit(runs_flat, totals, ds, m)

    S16 = msmops._fbs_buckets((tx, ty), absd, negd, nt, None)
    for a, b in zip(S25, S16):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_precompute_tables_chunked_matches_full(rng):
    """Column-sliced table build == full-width build (incl. generator pad
    lanes and an inf-masked lane)."""
    n = 96  # n2 = 128 -> two 64-column slices
    pts = [hm.g1_mul(hm.G1_GEN, rng.randrange(1, hm.R)) for _ in range(n)]
    x = jnp.asarray(FP.many_to_limbs([p[0] for p in pts]))
    y = jnp.asarray(FP.many_to_limbs([p[1] for p in pts]))
    mask = np.zeros(n, bool)
    mask[5] = True
    full = msmops.precompute_g1_tables((x, y), mask)
    chunked = msmops.precompute_g1_tables_chunked((x, y), mask, col_chunk=64)
    np.testing.assert_array_equal(np.asarray(full[0]), chunked[0])
    np.testing.assert_array_equal(np.asarray(full[1]), chunked[1])

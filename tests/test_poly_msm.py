"""Polynomial kernels (powers / evaluate / synthetic division) and MSM vs exact oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from kzg_tpu.ops import curve as cv, msm as msmops, poly as polyops
from kzg_tpu.ops.field import FR
from kzg_tpu.utils import hostmath as hm


def test_powers(rng):
    x = rng.randrange(hm.R)
    pw = polyops.powers(jnp.asarray(FR.to_limbs(x)), 17)
    assert FR.from_limbs_many(pw) == [pow(x, i, hm.R) for i in range(17)]


def test_evaluate(rng):
    n = 33
    coeffs = [rng.randrange(hm.R) for _ in range(n)]
    x = rng.randrange(hm.R)
    got = polyops.evaluate(jnp.asarray(FR.many_to_limbs(coeffs)), jnp.asarray(FR.to_limbs(x)), n)
    exp = sum(c * pow(x, i, hm.R) for i, c in enumerate(coeffs)) % hm.R
    assert FR.from_limbs(np.asarray(got)) == exp


def test_synthetic_divide_exact_root(rng):
    # Build P with a known root: P(x) = (x - r) * Q(x)
    d = 12
    q = [rng.randrange(hm.R) for _ in range(d)]
    r = rng.randrange(hm.R)
    p = [0] * (d + 1)
    for i, qi in enumerate(q):  # (x - r) * Q
        p[i + 1] = (p[i + 1] + qi) % hm.R
        p[i] = (p[i] - r * qi) % hm.R
    got_q, rebuilt = polyops.synthetic_divide(
        jnp.asarray(FR.many_to_limbs(p)), jnp.asarray(FR.to_limbs(r)), d + 1
    )
    assert FR.from_limbs_many(got_q) == q
    assert FR.from_limbs(np.asarray(rebuilt)) == p[0]


def test_synthetic_divide_non_root_detected(rng):
    p = [rng.randrange(1, hm.R) for _ in range(5)]
    r = rng.randrange(hm.R)
    _, rebuilt = polyops.synthetic_divide(
        jnp.asarray(FR.many_to_limbs(p)), jnp.asarray(FR.to_limbs(r)), 5
    )
    y = sum(c * pow(r, i, hm.R) for i, c in enumerate(p)) % hm.R
    if y != 0:  # overwhelmingly likely
        assert FR.from_limbs(np.asarray(rebuilt)) != p[0]


@pytest.mark.parametrize("n", [1, 2, 5, 8])
def test_msm_vs_oracle(rng, n):
    ks = [rng.randrange(1, hm.R) for _ in range(n)]
    scalars = [rng.randrange(hm.R) for _ in range(n)]
    pts = [hm.g1_mul(hm.G1_GEN, k) for k in ks]
    px = jnp.asarray(cv.FP.many_to_limbs([p[0] for p in pts]))
    py = jnp.asarray(cv.FP.many_to_limbs([p[1] for p in pts]))
    got = cv.g1_from_device(msmops.msm_g1((px, py), cv.fr_to_device(scalars, batch=True)))
    exp = None
    for s, p in zip(scalars, pts):
        exp = hm.g1_add(exp, hm.g1_mul(p, s))
    assert got == exp


def test_msm_zero_scalars_and_tree_reduce(rng):
    pts = [hm.g1_mul(hm.G1_GEN, rng.randrange(1, hm.R)) for _ in range(3)]
    px = jnp.asarray(cv.FP.many_to_limbs([p[0] for p in pts]))
    py = jnp.asarray(cv.FP.many_to_limbs([p[1] for p in pts]))
    got = cv.g1_from_device(msmops.msm_g1((px, py), cv.fr_to_device([0, 0, 0], batch=True)))
    assert got is None
    dev = cv.g1_to_device(pts, batch=True)
    got2 = cv.g1_from_device(msmops.tree_reduce(cv.G1, dev, axis=-1))
    exp = hm.g1_add(hm.g1_add(pts[0], pts[1]), pts[2])
    assert got2 == exp


@pytest.mark.slow
def test_msm_fixed_base_vs_oracle(rng):
    """Precomputed-table MSM (8-bit windows for CPU-speed) vs exact oracle,
    including edge scalars 0, 1, r-1 and a non-pow2 count."""
    n = 37
    ks = [rng.randrange(1, hm.R) for _ in range(n)]
    scalars = [rng.randrange(hm.R) for _ in range(n)]
    scalars[0], scalars[1], scalars[2] = 0, 1, hm.R - 1
    pts = [hm.g1_mul(hm.G1_GEN, k) for k in ks]
    px = jnp.asarray(cv.FP.many_to_limbs([p[0] for p in pts]))
    py = jnp.asarray(cv.FP.many_to_limbs([p[1] for p in pts]))
    tables = msmops.precompute_g1_tables((px, py), window_bits=8)
    got = cv.g1_from_device(
        msmops.msm_g1_fixed(tables, cv.fr_to_device(scalars, batch=True), window_bits=8)
    )
    exp = None
    for s, p in zip(scalars, pts):
        exp = hm.g1_add(exp, hm.g1_mul(p, s))
    assert got == exp
    # all-zero scalars -> infinity through the same tables
    got0 = cv.g1_from_device(
        msmops.msm_g1_fixed(tables, cv.fr_to_device([0] * n, batch=True), window_bits=8)
    )
    assert got0 is None


def test_msm_fixed_base_blocked_equals_single(rng):
    """msm_g1_fixed_blocked (the HBM-bounded 2^20 path) must produce the same
    group element as the single-shot pipeline across block boundaries,
    including scalars shorter than the padded table width."""
    n = 100  # pads to nt = 128; blocks of 64 -> 2 blocks, second one partial
    ks = [rng.randrange(1, hm.R) for _ in range(n)]
    scalars = [rng.randrange(hm.R) for _ in range(n)]
    scalars[0] = 0
    pts = [hm.g1_mul(hm.G1_GEN, k) for k in ks]
    px = jnp.asarray(cv.FP.many_to_limbs([p[0] for p in pts]))
    py = jnp.asarray(cv.FP.many_to_limbs([p[1] for p in pts]))
    tables = msmops.precompute_g1_tables((px, py), window_bits=8)
    k = cv.fr_to_device(scalars, batch=True)
    single = cv.g1_from_device(msmops.msm_g1_fixed(tables, k, window_bits=8))
    blocked = cv.g1_from_device(
        msmops.msm_g1_fixed_blocked(tables, k, block=64, window_bits=8)
    )
    assert blocked == single


def test_msm_fixed_base_blocked_partial_inf_mask(rng):
    """A mask covering only part of the second block (round-2 bug: the short
    mask slice shape-mismatched the block's scalar slice) must zero exactly
    the flagged lanes."""
    n = 100  # nt = 128, block=64 -> block 2 holds lanes 64..99 (+28 pads)
    ks = [rng.randrange(1, hm.R) for _ in range(n)]
    scalars = [rng.randrange(hm.R) for _ in range(n)]
    pts = [hm.g1_mul(hm.G1_GEN, k) for k in ks]
    px = jnp.asarray(cv.FP.many_to_limbs([p[0] for p in pts]))
    py = jnp.asarray(cv.FP.many_to_limbs([p[1] for p in pts]))
    tables = msmops.precompute_g1_tables((px, py), window_bits=8)
    k = cv.fr_to_device(scalars, batch=True)
    # mask length 80 < n: lanes 70..79 flagged, lanes 80..99 implicitly kept
    mask = np.zeros(80, dtype=bool)
    mask[70:80] = True
    blocked = cv.g1_from_device(
        msmops.msm_g1_fixed_blocked(tables, k, inf_mask=jnp.asarray(mask),
                                    block=64, window_bits=8)
    )
    exp = None
    for i, (s, p) in enumerate(zip(scalars, pts)):
        if 70 <= i < 80:
            continue
        exp = hm.g1_add(exp, hm.g1_mul(p, s))
    assert blocked == exp

"""Batched Jacobian curve ops vs the exact host oracle."""

import jax.numpy as jnp
import pytest

from kzg_tpu.ops import curve as cv
from kzg_tpu.utils import hostmath as hm


@pytest.fixture(scope="module")
def g1_samples():
    import random

    rng = random.Random(0xC0FFEE)
    ks = [rng.randrange(1, hm.R) for _ in range(4)]
    pts = [hm.g1_mul(hm.G1_GEN, k) for k in ks]
    return ks, pts, cv.g1_to_device(pts, batch=True)


def test_g1_add_double(g1_samples):
    ks, pts, dev = g1_samples
    rolled = tuple(jnp.roll(c, -1, axis=1) for c in dev)
    got = cv.g1_from_device(cv.G1.add(dev, rolled))
    exp = [hm.g1_add(pts[i], pts[(i + 1) % 4]) for i in range(4)]
    assert got == exp
    assert cv.g1_from_device(cv.G1.double(dev)) == [hm.g1_add(p, p) for p in pts]


def test_g1_add_exceptional(g1_samples):
    _, pts, dev = g1_samples
    # P + P must route through doubling
    assert cv.g1_from_device(cv.G1.add(dev, dev)) == [hm.g1_add(p, p) for p in pts]
    # P + (-P) = infinity
    assert cv.g1_from_device(cv.G1.add(dev, cv.G1.neg(dev))) == [None] * 4
    # P + infinity = P, infinity + P = P
    inf = cv.G1.inf_like(dev)
    assert cv.g1_from_device(cv.G1.add(dev, inf)) == pts
    assert cv.g1_from_device(cv.G1.add(inf, dev)) == pts


def test_g1_scalar_mult(g1_samples):
    ks, pts, dev = g1_samples
    kdev = cv.fr_to_device(ks, batch=True)
    assert cv.g1_from_device(cv.G1.mul_scalar_affine(cv.G1_GEN_DEV, kdev)) == pts
    exp = [hm.g1_mul(pts[i], ks[i]) for i in range(4)]
    assert cv.g1_from_device(cv.G1.mul_scalar(dev, kdev)) == exp
    # zero scalar -> infinity
    zero = cv.fr_to_device([0], batch=True)
    assert cv.g1_from_device(cv.G1.mul_scalar_affine(cv.G1_GEN_DEV, zero)) == [None]


def test_g1_madd(g1_samples):
    _, pts, dev = g1_samples
    gen_aff = cv.G1_GEN_DEV
    got = cv.g1_from_device(cv.G1.madd(dev, gen_aff))
    assert got == [hm.g1_add(p, hm.G1_GEN) for p in pts]
    # madd onto infinity returns the affine point
    inf = cv.G1.inf_like(dev)
    assert cv.g1_from_device(cv.G1.madd(inf, gen_aff)) == [hm.G1_GEN] * 4


def test_g1_eq_to_affine(g1_samples):
    _, pts, dev = g1_samples
    d = cv.G1.double(dev)
    assert bool(jnp.all(cv.G1.eq(dev, dev)))
    assert not bool(jnp.any(cv.G1.eq(dev, d)))
    (x, y), inf = cv.G1.to_affine(dev)
    assert not bool(jnp.any(inf))
    assert cv.FP.from_limbs_many(x) == [p[0] for p in pts]
    assert cv.FP.from_limbs_many(y) == [p[1] for p in pts]


def test_g2_ops():
    import random

    rng = random.Random(0xDECAF)
    ks = [rng.randrange(1, hm.R) for _ in range(3)]
    pts = [hm.g2_mul(hm.G2_GEN, k) for k in ks]
    dev = cv.g2_to_device(pts, batch=True)
    assert cv.g2_from_device(cv.G2.double(dev)) == [hm.g2_add(p, p) for p in pts]
    rolled = tuple(jnp.roll(c, -1, axis=2) for c in dev)
    got = cv.g2_from_device(cv.G2.add(dev, rolled))
    assert got == [hm.g2_add(pts[i], pts[(i + 1) % 3]) for i in range(3)]
    kdev = cv.fr_to_device(ks, batch=True)
    assert cv.g2_from_device(cv.G2.mul_scalar_affine(cv.G2_GEN_DEV, kdev)) == pts
    assert cv.g2_from_device(cv.G2.sub(dev, dev)) == [None] * 3

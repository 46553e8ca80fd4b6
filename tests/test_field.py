"""Field kernels vs exact python-int arithmetic (the oracle strategy mirrors the
reference's num-bigint-backed unit tests, src/scalar.rs:343-415)."""

import numpy as np
import jax.numpy as jnp
import pytest

from kzg_tpu.ops import FP, FR, limbs as lb


FIELDS = [FP, FR]


def rand_elts(rng, field, n):
    return [rng.randrange(field.modulus) for _ in range(n)]


@pytest.mark.parametrize("field", FIELDS, ids=lambda f: f.name)
def test_limb_roundtrip(field, rng):
    vals = rand_elts(rng, field, 7)
    limbs = field.many_to_limbs(vals)
    assert limbs.shape == (field.L, 7)
    assert field.from_limbs_many(limbs) == vals


@pytest.mark.parametrize("field", FIELDS, ids=lambda f: f.name)
def test_add_sub_neg(field, rng):
    n = 32
    a_int = rand_elts(rng, field, n)
    b_int = rand_elts(rng, field, n)
    a = jnp.asarray(field.many_to_limbs(a_int))
    b = jnp.asarray(field.many_to_limbs(b_int))
    m = field.modulus
    assert field.from_limbs_many(field.add(a, b)) == [(x + y) % m for x, y in zip(a_int, b_int)]
    assert field.from_limbs_many(field.sub(a, b)) == [(x - y) % m for x, y in zip(a_int, b_int)]
    assert field.from_limbs_many(field.neg(a)) == [-x % m for x in a_int]
    assert field.from_limbs_many(field.half(a)) == [
        x * pow(2, -1, m) % m for x in a_int
    ]


@pytest.mark.parametrize("field", FIELDS, ids=lambda f: f.name)
def test_add_edge_cases(field):
    m = field.modulus
    cases = [(0, 0), (m - 1, 1), (m - 1, m - 1), (1, 0), (m // 2, m // 2), (m - 1, 0)]
    a = jnp.asarray(field.many_to_limbs([c[0] for c in cases]))
    b = jnp.asarray(field.many_to_limbs([c[1] for c in cases]))
    assert field.from_limbs_many(field.add(a, b)) == [(x + y) % m for x, y in cases]
    assert field.from_limbs_many(field.sub(a, b)) == [(x - y) % m for x, y in cases]


@pytest.mark.parametrize("field", FIELDS, ids=lambda f: f.name)
def test_mul(field, rng):
    n = 32
    a_int = rand_elts(rng, field, n) + [0, 1, field.modulus - 1]
    b_int = rand_elts(rng, field, n) + [field.modulus - 1, 0, field.modulus - 1]
    a = jnp.asarray(field.many_to_limbs(a_int))
    b = jnp.asarray(field.many_to_limbs(b_int))
    got = field.from_limbs_many(field.mul(a, b))
    assert got == [x * y % field.modulus for x, y in zip(a_int, b_int)]


@pytest.mark.parametrize("field", FIELDS, ids=lambda f: f.name)
def test_mont_roundtrip(field, rng):
    vals = rand_elts(rng, field, 9)
    std = jnp.asarray(lb.ints_to_limbs(vals, field.L))
    mont = field.to_mont(std)
    back = field.from_mont(mont)
    assert lb.limbs_to_ints(back) == vals
    assert field.from_limbs_many(mont) == vals


@pytest.mark.parametrize("field", FIELDS, ids=lambda f: f.name)
def test_pow_and_inv(field, rng):
    m = field.modulus
    vals = rand_elts(rng, field, 4)
    a = jnp.asarray(field.many_to_limbs(vals))
    for e in (0, 1, 2, 57, 1 << 16):
        got = field.from_limbs_many(field.pow_small(a, e))
        assert got == [pow(v, e, m) for v in vals], f"pow_small e={e}"
    inv = field.from_limbs_many(field.inv(a))
    assert inv == [pow(v, -1, m) for v in vals]


@pytest.mark.parametrize("field", FIELDS, ids=lambda f: f.name)
def test_predicates(field, rng):
    vals = [0, 1, field.modulus - 1, rng.randrange(field.modulus)]
    a = jnp.asarray(field.many_to_limbs(vals))
    assert list(np.asarray(field.is_zero(a))) == [v == 0 for v in vals]
    assert bool(np.all(field.eq(a, a)))
    b = field.add(a, jnp.asarray(field.one(a)))
    assert not bool(np.any(field.eq(a, b)))


def test_broadcasting_batch_dims(rng):
    # (L,) against (L, n): single element broadcast over a batch
    f = FR
    x = rng.randrange(f.modulus)
    ys = rand_elts(rng, f, 5)
    a = jnp.asarray(f.to_limbs(x))
    b = jnp.asarray(f.many_to_limbs(ys))
    got = f.from_limbs_many(f.mul(a, b))
    assert got == [x * y % f.modulus for y in ys]
    got = f.from_limbs_many(f.add(a, b))
    assert got == [(x + y) % f.modulus for y in ys]
    got = f.from_limbs_many(f.sub(a, b))
    assert got == [(x - y) % f.modulus for y in ys]

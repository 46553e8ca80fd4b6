"""NTT/iNTT vs the exact oracle (naive evaluation over the domain)."""

import jax.numpy as jnp
import pytest

from kzg_tpu.ops import ntt
from kzg_tpu.ops.field import FR
from kzg_tpu.utils import hostmath as hm


def test_root_orders():
    assert pow(ntt.ROOT_OF_UNITY, 1 << 32, hm.R) == 1
    assert pow(ntt.ROOT_OF_UNITY, 1 << 31, hm.R) != 1
    w8 = ntt._domain_root(3)
    assert pow(w8, 8, hm.R) == 1 and pow(w8, 4, hm.R) != 1


@pytest.mark.parametrize("k", [0, 1, 3, 6])
def test_ntt_matches_naive(rng, k):
    n = 1 << k
    coeffs = [rng.randrange(hm.R) for _ in range(n)]
    got = FR.from_limbs_many(ntt.ntt(jnp.asarray(FR.many_to_limbs(coeffs)), k))
    dom = ntt.domain(k)
    exp = [sum(c * pow(x, i, hm.R) for i, c in enumerate(coeffs)) % hm.R for x in dom]
    assert got == exp


@pytest.mark.parametrize("k", [1, 4, 7])
def test_ntt_roundtrip(rng, k):
    n = 1 << k
    coeffs = [rng.randrange(hm.R) for _ in range(n)]
    dev = jnp.asarray(FR.many_to_limbs(coeffs))
    back = ntt.intt(ntt.ntt(dev, k), k)
    assert FR.from_limbs_many(back) == coeffs


def test_evaluate_on_domain_pads(rng):
    coeffs = [rng.randrange(hm.R) for _ in range(5)]  # degree 4, domain 8
    got = FR.from_limbs_many(ntt.evaluate_on_domain(jnp.asarray(FR.many_to_limbs(coeffs)), 3))
    dom = ntt.domain(3)
    exp = [sum(c * pow(x, i, hm.R) for i, c in enumerate(coeffs)) % hm.R for x in dom]
    assert got == exp


def test_polynomial_multiplication_via_ntt(rng):
    """Convolution check: NTT(a) * NTT(b) interpolates to a*b."""
    a = [rng.randrange(hm.R) for _ in range(4)]
    b = [rng.randrange(hm.R) for _ in range(4)]
    k = 3  # product degree 6 < 8
    ea = ntt.evaluate_on_domain(jnp.asarray(FR.many_to_limbs(a)), k)
    eb = ntt.evaluate_on_domain(jnp.asarray(FR.many_to_limbs(b)), k)
    prod = ntt.interpolate(FR.mul(ea, eb), k)
    got = FR.from_limbs_many(prod)
    exp = [0] * 8
    for i, ai in enumerate(a):
        for j, bj in enumerate(b):
            exp[i + j] = (exp[i + j] + ai * bj) % hm.R
    assert got == exp

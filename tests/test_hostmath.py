"""Self-consistency checks for the host-side oracle (generators, codec, pairing)."""

import pytest

from kzg_tpu.utils import hostmath as hm


def test_generators_on_curve_and_in_subgroup():
    assert hm.g1_is_on_curve(hm.G1_GEN)
    assert hm.g2_is_on_curve(hm.G2_GEN)
    assert hm.g1_in_subgroup(hm.G1_GEN)
    assert hm.g2_in_subgroup(hm.G2_GEN)


def test_g1_codec_roundtrip(rng):
    # canonical generator encoding (well-known vector)
    assert hm.g1_compress(hm.G1_GEN).hex().startswith("97f1d3a73197d794")
    for k in (1, 2, 5, rng.randrange(hm.R)):
        p = hm.g1_mul(hm.G1_GEN, k)
        assert hm.g1_decompress(hm.g1_compress(p)) == p
    assert hm.g1_decompress(hm.g1_compress(None)) is None
    with pytest.raises(ValueError):
        hm.g1_decompress(b"\x00" * 48)
    with pytest.raises(ValueError):
        hm.g1_decompress(b"\x00" * 47)


def test_g2_codec_roundtrip(rng):
    assert hm.g2_compress(hm.G2_GEN).hex().startswith("93e02b60")
    for k in (1, 3, 7, rng.randrange(hm.R)):
        p = hm.g2_mul(hm.G2_GEN, k)
        assert hm.g2_decompress(hm.g2_compress(p)) == p
    assert hm.g2_decompress(hm.g2_compress(None)) is None


def test_affine_group_laws(rng):
    a, b = rng.randrange(1, hm.R), rng.randrange(1, hm.R)
    pa = hm.g1_mul(hm.G1_GEN, a)
    pb = hm.g1_mul(hm.G1_GEN, b)
    assert hm.g1_add(pa, pb) == hm.g1_mul(hm.G1_GEN, (a + b) % hm.R)
    assert hm.g1_add(pa, hm.g1_neg(pa)) is None
    qa = hm.g2_mul(hm.G2_GEN, a)
    qb = hm.g2_mul(hm.G2_GEN, b)
    assert hm.g2_add(qa, qb) == hm.g2_mul(hm.G2_GEN, (a + b) % hm.R)


def test_fp2_sqrt(rng):
    for _ in range(5):
        a = (rng.randrange(hm.P), rng.randrange(hm.P))
        sq = hm.fp2_sq(a)
        root = hm.fp2_sqrt(sq)
        assert root is not None
        assert hm.fp2_sq(root) == sq


@pytest.mark.slow
def test_pairing_bilinearity(rng):
    e = hm.pairing(hm.G1_GEN, hm.G2_GEN)
    assert e != hm.FP12_ONE
    a, b = rng.randrange(2, 1000), rng.randrange(2, 1000)
    lhs = hm.pairing(hm.g1_mul(hm.G1_GEN, a), hm.g2_mul(hm.G2_GEN, b))
    rhs = hm.fp12_pow(e, a * b)
    assert lhs == rhs


@pytest.mark.slow
def test_kzg_identity_via_oracle(rng):
    """End-to-end KZG check in pure python: e(pi, [s-x]_2) == e(C - [y]_1, G2)."""
    s = rng.randrange(2, hm.R)
    coeffs = [rng.randrange(hm.R) for _ in range(4)]  # degree-3 poly
    x = rng.randrange(hm.R)
    y = sum(c * pow(x, i, hm.R) for i, c in enumerate(coeffs)) % hm.R
    # commitment C = P(s) * G1, proof pi = Q(s) * G1 with Q = (P - y)/(X - x)
    p_s = sum(c * pow(s, i, hm.R) for i, c in enumerate(coeffs)) % hm.R
    q_s = (p_s - y) * pow((s - x) % hm.R, -1, hm.R) % hm.R
    commitment = hm.g1_mul(hm.G1_GEN, p_s)
    proof = hm.g1_mul(hm.G1_GEN, q_s)
    lhs = hm.pairing(proof, hm.g2_add(hm.g2_mul(hm.G2_GEN, s), hm.g2_neg(hm.g2_mul(hm.G2_GEN, x))))
    rhs = hm.pairing(hm.g1_add(commitment, hm.g1_neg(hm.g1_mul(hm.G1_GEN, y))), hm.G2_GEN)
    assert lhs == rhs
    # negative case: wrong claimed value must fail
    bad = hm.g1_add(commitment, hm.g1_neg(hm.g1_mul(hm.G1_GEN, (y + 1) % hm.R)))
    assert hm.pairing(bad, hm.G2_GEN) != lhs

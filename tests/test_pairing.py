"""Device pairing vs the host oracle, and full KZG verification round-trips
(the reference's golden flow, src/lib.rs:16-33)."""

import jax.numpy as jnp
import pytest

from kzg_tpu import G1Point, G2Point, Polynomial, Scalar, bilinear_map, generate_setup
from kzg_tpu.ops import curve as cv, fp2, fp12, pairing as dp
from kzg_tpu.utils import hostmath as hm


@pytest.mark.slow
def test_device_pairing_matches_oracle(rng):
    a, b = rng.randrange(2, 1000), rng.randrange(2, 1000)
    P = hm.g1_mul(hm.G1_GEN, a)
    Q = hm.g2_mul(hm.G2_GEN, b)
    xP = jnp.asarray(cv.FP.to_limbs(P[0]))
    yP = jnp.asarray(cv.FP.to_limbs(P[1]))
    xQ = jnp.asarray(fp2.from_ints(Q[0]))
    yQ = jnp.asarray(fp2.from_ints(Q[1]))
    inf = jnp.zeros((), bool)
    out = dp.pairing((xP, yP), inf, (xQ, yQ), inf)
    # device pairing = CANONICAL reduced ate pairing, bit-identical to the
    # oracle (and hence to blst) — round 2's GT-cubed convention is gone
    assert fp12.to_ints(out) == hm.pairing(P, Q)
    # infinity inputs give 1 (blst semantics)
    out_inf = dp.pairing((xP, yP), jnp.ones((), bool), (xQ, yQ), inf)
    assert fp12.to_ints(out_inf) == hm.FP12_ONE


@pytest.mark.slow
def test_bilinear_map_api(rng):
    a, b = rng.randrange(2, 500), rng.randrange(2, 500)
    lhs = bilinear_map(G1Point.from_i128(a), G2Point.from_i128(b))
    rhs = bilinear_map(G1Point.from_i128(a * b), G2Point.from_i128(1))
    assert lhs == rhs
    # public API contract: bilinear_map returns the canonical reduced pairing
    assert lhs == hm.pairing(hm.g1_mul(hm.G1_GEN, a), hm.g2_mul(hm.G2_GEN, b))


def test_hard_part_decomposition_exact():
    """The canonical hard-part chain rests on an integer identity — pin it
    exactly (host ints, no device work)."""
    p, r, X = hm.P, hm.R, hm.BLS_X
    z = -X
    assert (z - 1) ** 2 % 3 == 0
    e = (z - 1) ** 2 // 3
    assert e == dp._E_HARD
    assert (p**4 - p**2 + 1) % r == 0
    assert e * (z + p) * (z * z + p * p - 1) + 1 == (p**4 - p**2 + 1) // r


@pytest.fixture(scope="module")
def setup6():
    return generate_setup(Scalar.from_be_bytes((99991).to_bytes(32, "big")), 6)


@pytest.mark.slow
def test_kzg_roundtrip(setup6, rng):
    """commit -> evaluate -> prove -> verify == the reference run_kate_proof_test."""
    coeffs = [rng.randrange(-(2**63), 2**63) for _ in range(5)]
    p = Polynomial.from_ints(coeffs)
    c = p.commit(setup6)
    ev = p.evaluate(Scalar.from_i128(rng.randrange(2**31)))
    proof = ev.generate_proof(p, setup6)
    assert ev.verify_proof(proof, c, setup6)


@pytest.mark.slow
def test_kzg_negative_cases(setup6, rng):
    """Tampered proof / wrong result / wrong commitment must all fail
    (absent from the reference test suite; added per SURVEY.md §4)."""
    p = Polynomial.from_ints([3, 1, 4, 1, 5])
    c = p.commit(setup6)
    ev = p.evaluate(Scalar.from_i128(11))
    proof = ev.generate_proof(p, setup6)
    assert ev.verify_proof(proof, c, setup6)

    from kzg_tpu.polynomial import Evaluation

    bad_result = Evaluation(point=ev.point, result=ev.result.add(Scalar.from_int(1)))
    assert not bad_result.verify_proof(proof, c, setup6)

    bad_proof = proof.add(G1Point.from_i128(1))
    assert not ev.verify_proof(bad_proof, c, setup6)

    bad_commitment = c.add(G1Point.from_i128(1))
    assert not ev.verify_proof(proof, bad_commitment, setup6)


@pytest.mark.slow
def test_constant_polynomial_verifies(setup6):
    """P(x) = const: C - y*G1 is infinity — exercises the pairing's
    infinity lanes end-to-end."""
    p = Polynomial.from_ints([42])
    c = p.commit(setup6)
    ev = p.evaluate(Scalar.from_i128(7))
    proof = ev.generate_proof(p, setup6)
    assert proof.is_infinity()
    assert ev.verify_proof(proof, c, setup6)


@pytest.mark.slow
def test_verify_proofs_batch(setup6, rng):
    from kzg_tpu.polynomial import verify_proofs_batch

    items = []
    for _ in range(3):
        p = Polynomial.from_ints([rng.randrange(hm.R) for _ in range(4)])
        c = p.commit(setup6)
        ev = p.evaluate(Scalar.from_i128(rng.randrange(2**20)))
        proof = ev.generate_proof(p, setup6)
        items.append((proof, c, ev))
    proofs = [i[0] for i in items]
    cs = [i[1] for i in items]
    evs = [i[2] for i in items]
    assert verify_proofs_batch(proofs, cs, evs, setup6) == [True, True, True]
    # corrupt the middle proof
    proofs[1] = proofs[1].add(G1Point.from_i128(1))
    assert verify_proofs_batch(proofs, cs, evs, setup6) == [True, False, True]

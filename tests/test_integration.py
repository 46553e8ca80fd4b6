"""Randomized end-to-end KZG round-trips — the reference library's golden flow
(src/lib.rs:6-95: run_kate_proof_test over random polynomials/points/setups),
scaled to CPU-mesh test budgets."""

import pytest

from kzg_tpu import Polynomial, Scalar, generate_setup


def run_kate_proof_test(setup, coeffs, x):
    """commit -> evaluate -> prove -> verify (src/lib.rs:16-33)."""
    p = Polynomial.from_ints(coeffs)
    commitment = p.commit(setup)
    evaluation = p.evaluate(Scalar.from_i128(x))
    proof = evaluation.generate_proof(p, setup)
    return evaluation.verify_proof(proof, commitment, setup)


def _random_i128(rng):
    return rng.randrange(-(2**127), 2**127)


@pytest.mark.slow
def test_degree_one_random_polys(rng):
    """Degree-1 polys, random points (src/lib.rs:51-62, reduced counts)."""
    setup = generate_setup(Scalar.from_be_bytes(rng.randbytes(32)), 3)
    for _ in range(3):
        coeffs = [_random_i128(rng), _random_i128(rng)]
        assert run_kate_proof_test(setup, coeffs, _random_i128(rng))


@pytest.mark.slow
def test_degree_two_random_polys(rng):
    """Degree-2 polys (src/lib.rs:64-75, reduced counts)."""
    setup = generate_setup(Scalar.from_be_bytes(rng.randbytes(32)), 4)
    for _ in range(3):
        coeffs = [_random_i128(rng) for _ in range(3)]
        assert run_kate_proof_test(setup, coeffs, _random_i128(rng))


@pytest.mark.slow
def test_random_degrees_fresh_setup(rng):
    """Random degrees with fresh setups (src/lib.rs:77-94; the reference goes
    to degree 2000 — kept ~200 here for CPU test budget)."""
    for degree in [rng.randrange(3, 40), rng.randrange(40, 200)]:
        setup = generate_setup(Scalar.from_be_bytes(rng.randbytes(32)), degree + 1)
        coeffs = [_random_i128(rng) for _ in range(degree + 1)]
        assert run_kate_proof_test(setup, coeffs, 17)

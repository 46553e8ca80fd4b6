"""Batch opening (commit once, open at many points in one device program) and
NTT-domain evaluation — BASELINE config 4 / VERDICT round-1 item 5.

Oracle: exact python-int arithmetic (utils.hostmath) and the per-point
reference path (Evaluation.generate_proof / Polynomial.evaluate)."""

import pytest

from kzg_tpu.polynomial import Polynomial, generate_proofs_batch, verify_proofs_batch
from kzg_tpu.scalar import Scalar
from kzg_tpu.trusted_setup import DeviceSRS, generate_setup
from kzg_tpu.utils import hostmath as hm


@pytest.fixture(scope="module")
def setup9():
    return generate_setup(Scalar.from_int(0xA11CE5EED), 10)


def test_evaluate_many_matches_single(rng):
    coeffs = [rng.randrange(hm.R) for _ in range(9)]
    poly = Polynomial.from_ints(coeffs)
    points = [Scalar.from_int(rng.randrange(hm.R)) for _ in range(5)]
    evs = poly.evaluate_many(points)
    for p, ev in zip(points, evs):
        single = poly.evaluate(p)
        assert ev.result == single.result
        assert ev.point == p
        # exact oracle
        want = sum(c * pow(p.to_int(), i, hm.R) for i, c in enumerate(coeffs)) % hm.R
        assert ev.result.to_int() == want


def test_evaluate_on_domain_matches_pointwise(rng):
    from kzg_tpu.ops import ntt as nttops

    k = 3
    coeffs = [rng.randrange(hm.R) for _ in range(6)]
    poly = Polynomial.from_ints(coeffs)
    evs = poly.evaluate_on_domain(k)
    assert len(evs) == 1 << k
    dom = nttops.domain(k)
    for w, ev in zip(dom, evs):
        assert ev.point.to_int() == w
        want = sum(c * pow(w, i, hm.R) for i, c in enumerate(coeffs)) % hm.R
        assert ev.result.to_int() == want


def test_generate_proofs_batch_matches_single(setup9, rng):
    coeffs = [rng.randrange(hm.R) for _ in range(8)]
    poly = Polynomial.from_ints(coeffs)
    commitment = poly.commit(setup9)
    points = [Scalar.from_int(rng.randrange(hm.R)) for _ in range(3)]
    evs, proofs = generate_proofs_batch(poly, points, setup9)
    for p, ev, proof in zip(points, evs, proofs):
        single_ev = poly.evaluate(p)
        assert ev.result == single_ev.result
        single_proof = single_ev.generate_proof(poly, setup9)
        assert proof == single_proof
        assert ev.verify_proof(proof, commitment, setup9)
    # the whole batch verifies in one pairing program too
    assert verify_proofs_batch(proofs, [commitment] * 3, evs, setup9) == [True] * 3


def test_generate_proofs_batch_device_srs(setup9, rng):
    """The DeviceSRS path routes the k quotient MSMs through ONE composite-key
    fixed-base bucket pass — results must equal the artifact-list path."""
    srs = DeviceSRS.from_artifacts(setup9)
    coeffs = [rng.randrange(hm.R) for _ in range(9)]
    poly = Polynomial.from_ints(coeffs)
    points = [Scalar.from_int(rng.randrange(hm.R)) for _ in range(4)]
    evs_d, proofs_d = generate_proofs_batch(poly, points, srs)
    evs_l, proofs_l = generate_proofs_batch(poly, points, setup9)
    for a, b in zip(evs_d, evs_l):
        assert a.result == b.result
    for a, b in zip(proofs_d, proofs_l):
        assert a == b


def test_generate_proofs_batch_constant_poly(setup9):
    poly = Polynomial.from_ints([7])
    points = [Scalar.from_int(5), Scalar.from_int(11)]
    evs, proofs = generate_proofs_batch(poly, points, setup9)
    for ev, proof in zip(evs, proofs):
        assert ev.result.to_int() == 7
        assert proof.is_infinity()


def _msm_many_case(rng, window_bits: int):
    import jax.numpy as jnp

    from kzg_tpu.ops import curve as cv
    from kzg_tpu.ops import msm as msmops
    from kzg_tpu.ops.field import FP

    n, k = 12, 3
    base = [hm.g1_mul(hm.G1_GEN, rng.randrange(1, hm.R)) for _ in range(n)]
    x = jnp.asarray(FP.many_to_limbs([p[0] for p in base]))
    y = jnp.asarray(FP.many_to_limbs([p[1] for p in base]))
    tables = msmops.precompute_g1_tables((x, y), window_bits=window_bits)
    cols = [[rng.randrange(hm.R) for _ in range(n)] for _ in range(k)]
    many = jnp.stack(
        [cv.fr_to_device(c, batch=True) for c in cols], axis=-1
    )  # (16, n, k)
    out = msmops.msm_g1_fixed_many(tables, many, window_bits=window_bits)
    for j in range(k):
        single = msmops.msm_g1_fixed(tables, many[:, :, j], window_bits=window_bits)
        got = cv.g1_from_device(tuple(c[:, j] for c in out))
        assert got == cv.g1_from_device(single)
        acc = None
        for p, s in zip(base, cols[j]):
            acc = hm.g1_add(acc, hm.g1_mul(p, s))
        assert got == acc


def test_msm_fixed_many_matches_single(rng):
    """msm_g1_fixed_many lane j == msm_g1_fixed on column j (+ exact oracle).

    8-bit windows keep the B-proportional extraction stages CPU-affordable;
    the pipeline is window-size-parametric (the 16-bit variant is the slow
    test below and the production TPU configuration)."""
    _msm_many_case(rng, window_bits=8)


@pytest.mark.slow
def test_msm_fixed_many_matches_single_16bit(rng):
    _msm_many_case(rng, window_bits=16)


def test_generate_proofs_batch_blocked_matches_unblocked(setup9, rng, monkeypatch):
    """Point-axis blocking (the --domain >16 enabler): forcing a tiny block
    size (3) over 8 points — with a padded ragged tail — must give exactly the
    unblocked results."""
    import kzg_tpu.polynomial as polymod

    coeffs = [rng.randrange(hm.R) for _ in range(7)]
    poly = Polynomial.from_ints(coeffs)
    points = [Scalar.from_int(rng.randrange(hm.R)) for _ in range(8)]
    evs_u, proofs_u = generate_proofs_batch(poly, points, setup9)
    monkeypatch.setattr(polymod, "_proofs_point_block", lambda n, s: 3)
    evs_b, proofs_b = generate_proofs_batch(poly, points, setup9)
    assert [e.result for e in evs_b] == [e.result for e in evs_u]
    assert proofs_b == proofs_u


def test_generate_proofs_batch_blocked(setup9, rng, monkeypatch):
    """Point counts beyond the per-program block limit run as padded
    fixed-shape blocks (the `evaluate --domain K` large-K path). Forcing a
    tiny block exercises the blocking + tail-padding logic."""
    import kzg_tpu.polynomial as polymod

    monkeypatch.setattr(polymod, "_proofs_point_block", lambda n, s: 2)
    coeffs = [rng.randrange(hm.R) for _ in range(6)]
    poly = Polynomial.from_ints(coeffs)
    commitment = poly.commit(setup9)
    points = [Scalar.from_int(rng.randrange(hm.R)) for _ in range(5)]  # 3 blocks, ragged tail
    evs, proofs = generate_proofs_batch(poly, points, setup9)
    assert len(evs) == len(proofs) == 5
    for p, ev, proof in zip(points, evs, proofs):
        single_ev = poly.evaluate(p)
        assert ev.result == single_ev.result
        assert proof == single_ev.generate_proof(poly, setup9)
        assert ev.verify_proof(proof, commitment, setup9)

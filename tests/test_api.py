"""API-level parity tests: Scalar / Polynomial / points / trusted setup /
artifact JSON — semantics checked against the exact-int oracle and against the
reference behaviors documented in SURVEY.md (file:line cited in the modules).
"""

import json

import pytest

from kzg_tpu import (
    G1Point,
    G2Point,
    Polynomial,
    ProtocolError,
    Scalar,
    SetupArtifactsGenerator,
    generate_setup,
)
from kzg_tpu import artifacts as art
from kzg_tpu.utils import hostmath as hm


# -- Scalar -------------------------------------------------------------------


def test_scalar_i128_semantics(rng):
    a = rng.randrange(1, 2**127)
    assert Scalar.from_i128(a).to_int() == a
    # negatives map to r - |v| (src/scalar.rs:36-47)
    assert Scalar.from_i128(-a).to_int() == hm.R - a
    assert Scalar.from_i128(0).to_int() == 0


def test_scalar_byte_roundtrips(rng):
    a = rng.randrange(2**128)
    le = a.to_bytes(32, "little")
    s = Scalar.from_le_bytes(le)
    assert s.to_le_bytes() == le
    assert Scalar.from_be_bytes(bytes(reversed(le))).to_int() == a
    assert s.to_be_bytes() == bytes(reversed(le))


def test_scalar_arithmetic_vs_oracle(rng):
    a, b = rng.randrange(hm.R), rng.randrange(hm.R)
    sa, sb = Scalar.from_int(a), Scalar.from_int(b)
    assert sa.mul(sb).to_int() == a * b % hm.R
    assert sa.add(sb).to_int() == (a + b) % hm.R
    assert sa.sub(sb).to_int() == (a - b) % hm.R
    assert sa.neg().to_int() == -a % hm.R
    n = rng.randrange(0, 50)
    assert sa.pow(n).to_int() == pow(a, n, hm.R)
    assert sa.pow(0).to_int() == 1
    assert sa.pow(1).to_int() == a


def test_scalar_display_and_serde(rng):
    a = rng.randrange(hm.R)
    s = Scalar.from_int(a)
    assert str(s) == str(a)  # base-10 display (src/scalar.rs:277-341)
    j = s.to_json()
    assert j == list(a.to_bytes(32, "little"))
    assert Scalar.from_json(j) == s
    with pytest.raises(Exception):
        Scalar.from_json([0] * 31)


# -- Polynomial ------------------------------------------------------------------


def test_polynomial_normalization_matches_reference():
    # mirrors src/polynomial.rs test_create_polynomial_with_tailing_zeros
    assert Polynomial.from_ints([0, 0, 0, 0, 0]).degree() == 0
    assert Polynomial.from_ints([1, 0, 0, 0, 0]).degree() == 0
    assert Polynomial.from_ints([1, 0, 1, 0, 0]).degree() == 2
    assert Polynomial.from_ints([1, 0, 1, 0, 0, 5]).degree() == 5
    # all-zero non-empty keeps exactly ONE zero coefficient (JSON parity)
    assert Polynomial.from_ints([0, 0, 0]).num_coefficients == 1
    assert Polynomial.from_ints([]).num_coefficients == 0
    assert Polynomial.from_ints([]).degree() == 0
    # from_constant drops a zero (src/polynomial.rs:78-89)
    assert Polynomial.from_constant(Scalar.from_int(0)).num_coefficients == 0


def test_polynomial_display():
    assert str(Polynomial.from_ints([])) == "0"
    assert str(Polynomial.from_ints([0])) == "0"
    # reference format keeps the raw scalar digits, e.g. "3x^2 + 1x + 2"
    assert str(Polynomial.from_ints([2, 1, 3])) == "3x^2 + 1x + 2"
    assert str(Polynomial.from_ints([5])) == "5"
    assert str(Polynomial.from_ints([0, 0, 7])) == "7x^2"


def test_polynomial_evaluate_sub(rng):
    coeffs = [rng.randrange(-(2**64), 2**64) for _ in range(9)]
    p = Polynomial.from_ints(coeffs)
    x = rng.randrange(2**32)
    ev = p.evaluate(Scalar.from_i128(x))
    exp = sum((c % hm.R) * pow(x, i, hm.R) for i, c in enumerate(coeffs)) % hm.R
    assert ev.result.to_int() == exp
    q = Polynomial.from_ints(coeffs[:4])
    diff = p.sub(q)
    exp_list = [0 if i < 4 else (c % hm.R) for i, c in enumerate(coeffs)]
    assert diff.coefficient_ints() == exp_list


def test_divide_by_root_and_errors(rng):
    coeffs = [rng.randrange(hm.R) for _ in range(6)]
    p = Polynomial.from_ints(coeffs)
    x = rng.randrange(2**32)
    y = p.evaluate(Scalar.from_i128(x)).result
    q = p.sub(Polynomial.from_constant(y)).divide_by_root(Scalar.from_i128(x))
    # q * (X - x) == p - y  (check at a random point)
    t = rng.randrange(hm.R)
    qt = q.evaluate(Scalar.from_int(t)).result.to_int()
    pt = p.evaluate(Scalar.from_int(t)).result.to_int()
    assert qt * ((t - x) % hm.R) % hm.R == (pt - y.to_int()) % hm.R
    # non-root division must fail the constant-term check
    with pytest.raises(ProtocolError):
        p.divide_by_root(Scalar.from_i128(x + 1))
    # constant polynomial division rejected
    with pytest.raises(ProtocolError):
        Polynomial.from_ints([3]).divide_by_root(Scalar.from_i128(1))
    # zero polynomial divides to zero polynomial
    assert Polynomial.from_ints([0]).divide_by_root(Scalar.from_i128(1)).num_coefficients == 0


# -- trusted setup + commit ---------------------------------------------------------


@pytest.fixture(scope="module")
def small_setup():
    secret = (12345).to_bytes(32, "big")
    return generate_setup(Scalar.from_be_bytes(secret), 6), 12345


def test_setup_matches_oracle(small_setup):
    setup, s = small_setup
    assert len(setup) == 6
    for k, a in enumerate(setup):
        assert a.g1.affine() == hm.g1_mul(hm.G1_GEN, pow(s, k, hm.R))
        assert a.g2.affine() == hm.g2_mul(hm.G2_GEN, pow(s, k, hm.R))


def test_setup_iterator_matches_bulk(small_setup):
    setup, _ = small_setup
    gen = SetupArtifactsGenerator((12345).to_bytes(32, "big"), chunk=2)
    items = gen.take(6)
    for a, b in zip(items, setup):
        assert a.g1 == b.g1 and a.g2 == b.g2


def test_commit_vs_oracle(small_setup, rng):
    setup, s = small_setup
    coeffs = [rng.randrange(hm.R) for _ in range(5)]
    p = Polynomial.from_ints(coeffs)
    c = p.commit(setup)
    exp_scalar = sum(a * pow(s, i, hm.R) for i, a in enumerate(coeffs)) % hm.R
    assert c.affine() == hm.g1_mul(hm.G1_GEN, exp_scalar)
    # degree too high for the setup
    with pytest.raises(ProtocolError):
        Polynomial.from_ints([1] * 7).commit(setup)
    # zero polynomial commits to infinity
    assert Polynomial.from_ints([]).commit(setup).is_infinity()


# -- artifacts JSON -------------------------------------------------------------------


def test_artifact_json_schemas(tmp_path, small_setup, monkeypatch):
    setup, _ = small_setup
    monkeypatch.chdir(tmp_path)
    art.save_setup(setup)
    raw = json.loads(open(art.SETUP_ARTIFACTS_PATH).read())
    assert isinstance(raw, list) and set(raw[0].keys()) == {"g1", "g2"}
    assert len(raw[0]["g1"]) == 48 and len(raw[0]["g2"]) == 96
    # k=0 entries are the compressed generators
    assert bytes(raw[0]["g1"]) == hm.g1_compress(hm.G1_GEN)
    assert bytes(raw[0]["g2"]) == hm.g2_compress(hm.G2_GEN)
    loaded = art.load_setup()
    assert all(a.g1 == b.g1 and a.g2 == b.g2 for a, b in zip(loaded, setup))

    p = Polynomial.from_ints([2, 1, 3])
    c = p.commit(setup)
    art.save_commitment(art.CommitmentArtifact(polynomial=p, commitment=c))
    text = open(art.COMMITMENT_ARTIFACTS_PATH).read()
    assert text.startswith('{"polynomial":{"coefficients":[[2,')  # compact serde_json layout
    ca = art.load_commitment()
    assert ca.polynomial == p and ca.commitment == c

    ev = p.evaluate(Scalar.from_i128(7))
    proof = ev.generate_proof(p, setup)
    art.save_evaluation(art.EvaluationArtifact(evaluation=ev, proof=proof))
    raw = json.loads(open(art.EVALUATION_ARTIFACTS_PATH).read())
    assert set(raw.keys()) == {"evaluation", "proof"}
    assert set(raw["evaluation"].keys()) == {"point", "result"}
    ea = art.load_evaluation()
    assert ea.evaluation.point == ev.point and ea.evaluation.result == ev.result
    assert ea.proof == proof


def test_point_serde_errors():
    with pytest.raises(Exception):
        G1Point.from_json([0] * 47)
    with pytest.raises(Exception):
        G1Point.from_json([0] * 48)  # not compressed-flagged
    with pytest.raises(Exception):
        G2Point.from_json([0] * 96)
    # infinity round-trip
    inf = G1Point.from_i128(0)
    assert G1Point.from_json(inf.to_json()).is_infinity()


def test_g1_batch_decompression(rng):
    from kzg_tpu.ops import codec, curve as cv

    ks = [rng.randrange(1, hm.R) for _ in range(6)]
    pts = [hm.g1_mul(hm.G1_GEN, k) for k in ks] + [None]
    blobs = [hm.g1_compress(p) for p in pts]
    jac = codec.g1_decompress_batch(blobs, subgroup_check=True)
    assert cv.g1_from_device(jac) == pts
    # off-curve x must be rejected
    bad = bytearray(blobs[0])
    # pick an x whose x^3+4 is a non-residue: flip low bytes until decode fails
    import pytest as _pytest

    with _pytest.raises(Exception):
        for tweak in range(1, 200):
            bb = bytearray(blobs[0])
            bb[47] = (bb[47] + tweak) % 256
            codec.g1_decompress_batch([bytes(bb)])


def test_g2_batch_decompression(rng):
    from kzg_tpu.ops import codec, curve as cv

    ks = [rng.randrange(1, hm.R) for _ in range(5)]
    pts = [hm.g2_mul(hm.G2_GEN, k) for k in ks] + [None]
    blobs = [hm.g2_compress(p) for p in pts]
    jac = codec.g2_decompress_batch(blobs, subgroup_check=True)
    assert cv.g2_from_device(jac) == pts
    with pytest.raises(Exception):
        for tweak in range(1, 200):
            bb = bytearray(blobs[0])
            bb[95] = (bb[95] + tweak) % 256
            codec.g2_decompress_batch([bytes(bb)])


def _g1_point_outside_subgroup():
    """A point on E(Fp) but outside the r-order subgroup (cofactor > 1, so a
    random on-curve x is essentially never in G1)."""
    x = 1
    while True:
        y = hm.fp_sqrt((x * x * x + hm.B_G1) % hm.P)
        if y is not None and not hm.g1_in_subgroup((x, y)):
            return (x, y)
        x += 1


def _g2_point_outside_subgroup():
    x0 = 1
    while True:
        x = (x0, 0)
        rhs = hm.fp2_add(hm.fp2_mul(hm.fp2_sq(x), x), hm.B_G2)
        y = hm.fp2_sqrt(rhs)
        if y is not None and not hm.g2_in_subgroup((x, y)):
            return (x, y)
        x0 += 1


def test_bulk_decompression_rejects_out_of_subgroup():
    from kzg_tpu.ops import codec

    p1 = _g1_point_outside_subgroup()
    blob1 = hm.g1_compress(p1)
    codec.g1_decompress_batch([blob1], subgroup_check=False)  # on-curve: parses
    with pytest.raises(Exception, match="subgroup"):
        codec.g1_decompress_batch([blob1], subgroup_check=True)

    p2 = _g2_point_outside_subgroup()
    blob2 = hm.g2_compress(p2)
    codec.g2_decompress_batch([blob2], subgroup_check=False)
    with pytest.raises(Exception, match="subgroup"):
        codec.g2_decompress_batch([blob2], subgroup_check=True)


def test_device_srs_load_rejects_tampered_setup(small_setup, tmp_path, monkeypatch):
    """A malicious setup.json whose G1 points leave the r-order subgroup must
    be rejected on the bulk path (subgroup_check defaults on)."""
    import json as _json

    from kzg_tpu.trusted_setup import DeviceSRS

    setup, _s = small_setup
    monkeypatch.chdir(tmp_path)
    art.save_setup(setup)
    with open(art.SETUP_ARTIFACTS_PATH) as f:
        raw = _json.load(f)
    raw[1]["g1"] = list(hm.g1_compress(_g1_point_outside_subgroup()))
    with open(art.SETUP_ARTIFACTS_PATH, "w") as f:
        _json.dump(raw, f)
    with pytest.raises(Exception, match="subgroup"):
        DeviceSRS.load(art.SETUP_ARTIFACTS_PATH)


def test_device_srs_commit_matches_artifacts(small_setup, tmp_path, monkeypatch, rng):
    from kzg_tpu.trusted_setup import DeviceSRS

    setup, s = small_setup
    monkeypatch.chdir(tmp_path)
    art.save_setup(setup)
    srs = DeviceSRS.load(art.SETUP_ARTIFACTS_PATH)
    assert len(srs) == len(setup)
    p = Polynomial.from_ints([rng.randrange(hm.R) for _ in range(5)])
    assert p.commit(srs) == p.commit(setup)
    srs2 = DeviceSRS.from_artifacts(setup)
    assert p.commit(srs2) == p.commit(setup)
    ev = p.evaluate(Scalar.from_i128(3))
    proof = ev.generate_proof(p, srs)
    assert proof == ev.generate_proof(p, setup)

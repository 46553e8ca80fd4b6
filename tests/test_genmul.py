"""Generator window-table scalar multiplication (ops.genmul) vs the exact
oracle — the fast path under the trusted setup (src/trusted_setup.rs:54-72
analog) and the verifier's y*G1 / x*G2 projections.

The fast gate covers the auto-dispatch (ladder) path; the table-build path
(a one-time ~W*E-lane device program, seconds on TPU / a minute on the CPU
test backend) is slow-marked and also exercised on real hardware by
benches/ceremony.py with oracle spot checks."""

import pytest

from kzg_tpu.ops import curve as cv
from kzg_tpu.ops import genmul
from kzg_tpu.utils import hostmath as hm


def test_mul_gen_auto_g1_matches_oracle(rng):
    ks = [0, 1, 2, 255, 256, 65535, 65536, hm.R - 1, rng.randrange(hm.R)]
    got = cv.g1_from_device(genmul.mul_g1_gen(cv.fr_to_device(ks, batch=True)))
    want = [hm.g1_mul(hm.G1_GEN, k) if k else None for k in ks]
    assert got == want


def test_mul_gen_auto_g2_matches_oracle(rng):
    ks = [0, 1, hm.R - 1, rng.randrange(hm.R)]
    got = cv.g2_from_device(genmul.mul_g2_gen(cv.fr_to_device(ks, batch=True)))
    want = [hm.g2_mul(hm.G2_GEN, k) if k else None for k in ks]
    assert got == want


def test_mul_gen_single_scalar():
    got = cv.g1_from_device(genmul.mul_g1_gen(cv.fr_to_device(12345)))
    assert got == hm.g1_mul(hm.G1_GEN, 12345)


@pytest.mark.slow
def test_mul_gen_g1_table_path_matches_oracle(rng):
    """Force the window-table path (build + gather/tree) against the oracle,
    including digit edge values that exercise every window."""
    ks = [0, 1, 255, 256, 0xFFFF, 1 << 128, hm.R - 1, rng.randrange(hm.R)]
    got = cv.g1_from_device(genmul.mul_gen(cv.G1, cv.fr_to_device(ks, batch=True)))
    want = [hm.g1_mul(hm.G1_GEN, k) if k else None for k in ks]
    assert got == want


@pytest.mark.slow
def test_mul_gen_g2_table_path_matches_oracle(rng):
    ks = [0, 1, 1 << 200, hm.R - 1, rng.randrange(hm.R)]
    got = cv.g2_from_device(genmul.mul_gen(cv.G2, cv.fr_to_device(ks, batch=True)))
    want = [hm.g2_mul(hm.G2_GEN, k) if k else None for k in ks]
    assert got == want


@pytest.mark.slow
def test_chunked_srs_g1_matches_oracle():
    """The jitted chunked ceremony (shared by bench.py and
    benches/ceremony.py), including a ragged tail chunk (n not a multiple of
    chunk) whose padding must not leak into the output."""
    from kzg_tpu.ops.field import FP

    s, n, chunk = 987654321, 10, 4  # 3 chunks, last one partial
    px, py = genmul.chunked_srs_g1(s, n, chunk)
    assert px.shape == (24, n) and py.shape == (24, n)
    for k in range(n):
        exp = hm.g1_mul(hm.G1_GEN, pow(s, k, hm.R))
        assert (FP.from_limbs(px[:, k]), FP.from_limbs(py[:, k])) == exp

"""Run-to-run determinism (the functional-JAX analog of the survey's race
detection / sanitizer row, SURVEY.md §5): identical inputs must produce
bit-identical outputs across repeated executions, on both the single-device
and the sharded paths, and the CLI's --devices flag must not change artifact
bytes."""

import json

import numpy as np
import pytest

from kzg_tpu import artifacts as art
from kzg_tpu import cli
from kzg_tpu.ops import curve as cv
from kzg_tpu.ops import msm as msmops
from kzg_tpu.polynomial import Polynomial
from kzg_tpu.scalar import Scalar
from kzg_tpu.trusted_setup import generate_setup
from kzg_tpu.utils import hostmath as hm


def _jac_bytes(jac):
    return tuple(np.asarray(c).tobytes() for c in jac)


def test_msm_deterministic_across_runs(rng):
    n = 24
    pts = [hm.g1_mul(hm.G1_GEN, rng.randrange(1, hm.R)) for _ in range(n)]
    x = cv.FP.many_to_limbs([p[0] for p in pts])
    y = cv.FP.many_to_limbs([p[1] for p in pts])
    import jax.numpy as jnp

    x, y = jnp.asarray(x), jnp.asarray(y)
    k = cv.fr_to_device([rng.randrange(hm.R) for _ in range(n)], batch=True)
    first = _jac_bytes(msmops.msm_g1((x, y), k))
    for _ in range(2):
        assert _jac_bytes(msmops.msm_g1((x, y), k)) == first


def test_sharded_msm_deterministic(rng):
    from kzg_tpu.parallel import make_mesh, sharded_msm_g1

    mesh = make_mesh(4)
    n = 16
    pts = [hm.g1_mul(hm.G1_GEN, rng.randrange(1, hm.R)) for _ in range(n)]
    import jax.numpy as jnp

    x = jnp.asarray(cv.FP.many_to_limbs([p[0] for p in pts]))
    y = jnp.asarray(cv.FP.many_to_limbs([p[1] for p in pts]))
    k = cv.fr_to_device([rng.randrange(hm.R) for _ in range(n)], batch=True)
    first = _jac_bytes(sharded_msm_g1(mesh, (x, y), k))
    assert _jac_bytes(sharded_msm_g1(mesh, (x, y), k)) == first


def test_commit_deterministic(rng):
    setup = generate_setup(Scalar.from_int(0xDE7E12), 8)
    poly = Polynomial.from_ints([rng.randrange(hm.R) for _ in range(7)])
    c1 = poly.commit(setup)
    c2 = poly.commit(setup)
    assert c1 == c2
    assert c1.to_json() == c2.to_json()


def test_cli_devices_flag_matches_single(tmp_path, monkeypatch):
    """commit/evaluate with --devices 4 write byte-identical artifacts to the
    single-device run (mesh/sharding config row of SURVEY.md §5)."""
    monkeypatch.chdir(tmp_path)
    setup = generate_setup(Scalar.from_int(0xC0FFEE), 10)
    art.save_setup(setup)
    coeffs = ["3", "-2", "7", "1"]

    assert cli.main(["commit", "--coefficients", *coeffs]) == 0
    single = open(art.COMMITMENT_ARTIFACTS_PATH).read()
    assert cli.main(["--devices", "4", "commit", "--coefficients", *coeffs]) == 0
    assert open(art.COMMITMENT_ARTIFACTS_PATH).read() == single

    assert cli.main(["evaluate", "5"]) == 0
    esingle = open(art.EVALUATION_ARTIFACTS_PATH).read()
    assert cli.main(["--devices", "4", "evaluate", "5"]) == 0
    assert open(art.EVALUATION_ARTIFACTS_PATH).read() == esingle


def test_cli_devices_too_many(tmp_path, monkeypatch, capsys):
    monkeypatch.chdir(tmp_path)
    setup = generate_setup(Scalar.from_int(3), 4)
    art.save_setup(setup)
    assert cli.main(["--devices", "64", "commit", "--coefficients", "1", "2"]) == 1
    assert "devices" in capsys.readouterr().err

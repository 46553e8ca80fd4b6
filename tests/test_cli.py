"""CLI workflow tests — the reference's 4-command artifact pipeline
(src/main.rs:108-308) end to end in a temp dir."""

import json
import os

import pytest

from kzg_tpu import cli
from kzg_tpu import artifacts as art


@pytest.fixture
def workdir(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    return tmp_path


# Deliberately NOT marked slow: this is the one end-to-end pairing
# verification the fast gate/CI always executes (round-3 verdict item 5) —
# the persistent compile cache keeps repeats cheap.
def test_full_workflow(workdir, capsys):
    assert cli.main(["trusted-setup"]) == 0
    setup_raw = json.loads(open(art.SETUP_ARTIFACTS_PATH).read())
    assert len(setup_raw) == 10  # MAX_DEGREE + 1 (src/main.rs:106,125-128)

    assert cli.main(["commit", "--coefficients", "2", "1", "3"]) == 0
    craw = json.loads(open(art.COMMITMENT_ARTIFACTS_PATH).read())
    assert [bytes(c)[0] for c in craw["polynomial"]["coefficients"]] == [2, 1, 3]

    assert cli.main(["evaluate", "7"]) == 0
    eraw = json.loads(open(art.EVALUATION_ARTIFACTS_PATH).read())
    # P(7) = 2 + 7 + 3*49 = 156
    assert int.from_bytes(bytes(eraw["evaluation"]["result"]), "little") == 156
    assert int.from_bytes(bytes(eraw["evaluation"]["point"]), "little") == 7

    assert cli.main(["verify-evaluation"]) == 0

    # tampering with the claimed result must fail verification
    eraw["evaluation"]["result"] = list((157).to_bytes(32, "little"))
    open(art.EVALUATION_ARTIFACTS_PATH, "w").write(json.dumps(eraw, separators=(",", ":")))
    assert cli.main(["verify-evaluation"]) == 1
    assert "The proof associated to the evaluation is incorrect." in capsys.readouterr().err


def test_missing_artifact_errors(workdir, capsys):
    assert cli.main(["commit", "--coefficients", "1"]) == 1
    assert "Trusted setup artifacts have not been found" in capsys.readouterr().err
    assert cli.main(["evaluate", "3"]) == 1
    assert cli.main(["verify-evaluation"]) == 1


def test_degree_gate(workdir, capsys):
    coeffs = [str(i + 1) for i in range(11)]  # degree 10 > 9
    assert cli.main(["commit", "--coefficients", *coeffs]) == 1
    assert "Only polynomials up to degree 9 are supported" in capsys.readouterr().err


@pytest.mark.slow
def test_negative_coefficients_workflow(workdir):
    """i128 negatives map to r - |v| through the whole pipeline."""
    assert cli.main(["trusted-setup"]) == 0
    assert cli.main(["commit", "--coefficients", "-2", "5", "-1"]) == 0
    assert cli.main(["evaluate", "-3"]) == 0
    assert cli.main(["verify-evaluation"]) == 0


def test_no_command_warns(capsys):
    assert cli.main([]) == 0


@pytest.mark.slow
def test_batch_evaluate_workflow(workdir, capsys):
    """Multi-point evaluate writes evaluations.json (one batched device
    program); verify-evaluation --all checks every proof in one pairing call.
    k = 3 points shares the batched-pairing program shape with the other
    V = 3 tests (compile-cache reuse)."""
    from kzg_tpu.scalar import Scalar
    from kzg_tpu.trusted_setup import generate_setup

    art.save_setup(generate_setup(Scalar.from_int(0xBA7C4), 10))
    assert cli.main(["commit", "--coefficients", "2", "1", "3"]) == 0
    assert cli.main(["evaluate", "7", "-2", "11"]) == 0
    eraw = json.loads(open(art.EVALUATIONS_BATCH_PATH).read())
    assert len(eraw) == 3
    # P(x) = 2 + x + 3x^2: P(7) = 156, P(-2) = 12, P(11) = 376
    assert int.from_bytes(bytes(eraw[0]["evaluation"]["result"]), "little") == 156
    assert int.from_bytes(bytes(eraw[1]["evaluation"]["result"]), "little") == 12
    assert int.from_bytes(bytes(eraw[2]["evaluation"]["result"]), "little") == 376

    assert cli.main(["verify-evaluation", "--all"]) == 0

    # tamper with one claimed result -> the batched verify must fail
    eraw[1]["evaluation"]["result"] = list((13).to_bytes(32, "little"))
    open(art.EVALUATIONS_BATCH_PATH, "w").write(json.dumps(eraw, separators=(",", ":")))
    assert cli.main(["verify-evaluation", "--all"]) == 1
    assert "The proof associated to the evaluation is incorrect." in capsys.readouterr().err


def test_domain_evaluate_workflow(workdir):
    """`evaluate --domain K`: NTT-evaluate on the 2^K roots-of-unity domain,
    batch-open every point, verify all in one pairing call. K = 1 keeps the
    domain tiny (2 points) for the CPU gate; the NTT results are cross-checked
    against the exact oracle here and against the prover path inside the CLI."""
    from kzg_tpu.scalar import Scalar
    from kzg_tpu.trusted_setup import generate_setup
    from kzg_tpu.utils import hostmath as hm

    art.save_setup(generate_setup(Scalar.from_int(0xD04A1), 10))
    assert cli.main(["commit", "--coefficients", "2", "1", "3"]) == 0
    assert cli.main(["evaluate", "--domain", "1"]) == 0
    eraw = json.loads(open(art.EVALUATIONS_BATCH_PATH).read())
    assert len(eraw) == 2
    for entry in eraw:
        w = int.from_bytes(bytes(entry["evaluation"]["point"]), "little")
        y = int.from_bytes(bytes(entry["evaluation"]["result"]), "little")
        assert y == (2 + w + 3 * w * w) % hm.R
    assert cli.main(["verify-evaluation", "--all"]) == 0
    # points and --domain are mutually exclusive; missing both is an error
    assert cli.main(["evaluate", "7", "--domain", "1"]) == 1
    assert cli.main(["evaluate"]) == 1

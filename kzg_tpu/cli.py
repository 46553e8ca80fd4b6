"""CLI — the reference's four-command workflow (src/main.rs:29-51,108-308)
reimplemented over the TPU framework:

    kzg-tpu trusted-setup
    kzg-tpu commit --coefficients a0 a1 ...
    kzg-tpu evaluate <x>
    kzg-tpu verify-evaluation

Same artifact files, same degree gate (MAX_DEGREE = 9, src/main.rs:106),
same log lines, same `-d`/`-dd` and LOG_LEVEL handling. An extra
`--max-degree` flag raises the cap (the TPU backend has no practical limit).
"""

from __future__ import annotations

import argparse
import logging
import os
import secrets
import sys

from . import artifacts as art
from .errors import CliError, KzgError
from .logging_config import init_logging
from .polynomial import Polynomial
from .scalar import Scalar
from .trusted_setup import SetupArtifactsGenerator

log = logging.getLogger("kzg_tpu")

MAX_DEGREE = 9

_I128_MIN, _I128_MAX = -(2**127), 2**127 - 1


def _i128(text: str) -> int:
    v = int(text)
    if not (_I128_MIN <= v <= _I128_MAX):
        raise argparse.ArgumentTypeError(f"value out of i128 range: {text}")
    return v


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="kzg-tpu",
        description="KZG polynomial commitments over BLS12-381, computed on TPU.",
    )
    p.add_argument("-d", "--debug", action="count", default=0, help="Turn debugging information on")
    sub = p.add_subparsers(dest="command")

    sp = sub.add_parser(
        "trusted-setup",
        help="Perform a trusted setup ceremony and write the artifacts in './artifacts/setup.json'.",
        description="Artifacts are generated until the configured max degree (default 9).",
    )
    sp.add_argument("--max-degree", type=int, default=MAX_DEGREE)

    cp = sub.add_parser("commit", help="Commit to a polynomial using the trusted setup artifacts")
    cp.add_argument(
        "--coefficients",
        type=_i128,
        nargs="+",
        required=True,
        help="Coefficients of the polynomial in ascending degree, starting from the degree zero.",
    )
    cp.add_argument("--max-degree", type=int, default=MAX_DEGREE)

    ep = sub.add_parser(
        "evaluate",
        help="Evaluate the committed polynomial at an input point and generate the associated Kate proof.",
    )
    ep.add_argument("x", type=_i128, help="Input point")

    sub.add_parser("verify-evaluation", help="Verify the previous evaluation with its proof")
    return p


def cmd_trusted_setup(args) -> None:
    log.info("Starting the trusted setup ceremony")
    secret = secrets.token_bytes(32)  # 32 random BE bytes (src/main.rs:122-123)
    setup = SetupArtifactsGenerator(secret).take(args.max_degree + 1)
    art.save_setup(setup)
    log.info(
        'Trusted setup ceremony successfully performed. Artifacts have been written in "%s"',
        art.SETUP_ARTIFACTS_PATH,
    )


def cmd_commit(args) -> None:
    polynomial = Polynomial.from_ints(args.coefficients)
    displayed = str(polynomial)
    if polynomial.degree() > args.max_degree:
        raise CliError(f"Only polynomials up to degree {args.max_degree} are supported")
    log.info('Starting to commit to the polynomial P(x) = "%s"', displayed)
    setup = art.load_setup()
    commitment = polynomial.commit(setup)
    art.save_commitment(art.CommitmentArtifact(polynomial=polynomial, commitment=commitment))
    log.info('Commitment to the polynomial "P(x) = %s" has been successfully generated.', displayed)


def cmd_evaluate(args) -> None:
    log.info('Starting to evaluate the committed polynomial at input point "x = %s"', args.x)
    setup = art.load_setup()
    commitment_artifact = art.load_commitment()
    evaluation = commitment_artifact.polynomial.evaluate(Scalar.from_i128(args.x))
    proof = evaluation.generate_proof(commitment_artifact.polynomial, setup)
    art.save_evaluation(art.EvaluationArtifact(evaluation=evaluation, proof=proof))
    log.info(
        'Evaluation successful for polynomial: "P(x) = %s" at point "x = %s" with "P(%s) = %s"',
        commitment_artifact.polynomial,
        args.x,
        args.x,
        evaluation.result,
    )


def cmd_verify_evaluation(args) -> None:
    log.info("Starting to verify the previous polynomial evaluation")
    setup = art.load_setup()
    commitment_artifact = art.load_commitment()
    evaluation_artifact = art.load_evaluation()
    ok = evaluation_artifact.evaluation.verify_proof(
        evaluation_artifact.proof, commitment_artifact.commitment, setup
    )
    if not ok:
        raise CliError("The proof associated to the evaluation is incorrect.")
    log.info(
        'Successfully verified evaluation for polynomial "P(x) = %s" at point "x = %s" with "P(%s) = %s"',
        commitment_artifact.polynomial,
        evaluation_artifact.evaluation.point,
        evaluation_artifact.evaluation.point,
        evaluation_artifact.evaluation.result,
    )


_COMMANDS = {
    "trusted-setup": cmd_trusted_setup,
    "commit": cmd_commit,
    "evaluate": cmd_evaluate,
    "verify-evaluation": cmd_verify_evaluation,
}


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    init_logging(args.debug)
    if args.command is None:
        log.warning("No command has been input")
        return 0
    try:
        _COMMANDS[args.command](args)
    except KzgError as e:
        # The reference panics with this exact phrasing (src/main.rs:78-81).
        print(f"Command execution failed with error: {e}", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())

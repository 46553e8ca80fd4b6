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
    p.add_argument(
        "--devices",
        type=int,
        default=1,
        help="Shard the commitment/proof MSMs over the first N devices of a "
        "jax.sharding mesh (0 = all available). Results are bit-identical to "
        "the single-device path.",
    )
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
        description="With several input points, all evaluations and opening proofs are "
        "generated in one batched device program (one composite-key MSM bucket pass) "
        "and written to './artifacts/evaluations.json'.",
    )
    ep.add_argument("x", type=_i128, nargs="*", default=[], help="Input point(s)")
    ep.add_argument(
        "--domain",
        type=int,
        default=None,
        metavar="K",
        help="Instead of explicit points, evaluate on the full 2^K NTT domain "
        "(roots of unity) via one forward NTT, then batch-open every point in "
        "one composite-key MSM pass (written to './artifacts/evaluations.json').",
    )

    vp = sub.add_parser("verify-evaluation", help="Verify the previous evaluation with its proof")
    vp.add_argument(
        "--all",
        action="store_true",
        help="Verify every proof in './artifacts/evaluations.json' (from a multi-point "
        "evaluate) in one batched pairing program.",
    )
    return p


def cmd_trusted_setup(args) -> None:
    log.info("Starting the trusted setup ceremony")
    secret = secrets.token_bytes(32)  # 32 random BE bytes (src/main.rs:122-123)
    if args.devices != 1:
        setup = _trusted_setup_sharded(secret, args.max_degree + 1, args.devices)
    else:
        setup = SetupArtifactsGenerator(secret).take(args.max_degree + 1)
    art.save_setup(setup)
    log.info(
        'Trusted setup ceremony successfully performed. Artifacts have been written in "%s"',
        art.SETUP_ARTIFACTS_PATH,
    )


def _trusted_setup_sharded(secret: bytes, count: int, n_devices: int):
    """The powers-of-tau ceremony over the device mesh: the s^k G1 and s^k G2
    point batches are sharded across chips (same generator-table kernels as
    the single-chip path — bit-identical artifacts for the same secret)."""
    from .curves import G1Point, G2Point
    from .ops import curve as cv
    from .parallel import sharded_setup_g1, sharded_setup_g2
    from .trusted_setup import SetupArtifact

    mesh = _make_mesh(n_devices)
    s = Scalar.from_be_bytes(secret)
    g1 = sharded_setup_g1(mesh, s.mont, count)
    g2 = sharded_setup_g2(mesh, s.mont, count)
    return [
        SetupArtifact(g1=G1Point.from_affine(p1), g2=G2Point.from_affine(p2))
        for p1, p2 in zip(cv.g1_from_device(g1), cv.g2_from_device(g2))
    ]


def _make_mesh(n_devices: int):
    import jax

    from .parallel import make_mesh

    nd = len(jax.devices()) if n_devices == 0 else n_devices
    if nd > len(jax.devices()):
        raise CliError(
            f"Requested {nd} devices but only {len(jax.devices())} are available"
        )
    return make_mesh(nd)


def _commit_sharded(polynomial: Polynomial, setup, n_devices: int):
    """Commitment MSM sharded over the device mesh (bit-identical result)."""
    from .curves import G1Point
    from .ops.field import FR
    from .parallel import sharded_msm_g1
    from .trusted_setup import DeviceSRS

    from .errors import ProtocolError

    if polynomial.degree() + 1 > len(setup):
        raise ProtocolError(
            "Setup does not allow for commitment generation of the polynomial. The polynomial degree is too high."
        )
    mesh = _make_mesh(n_devices)
    srs = setup if isinstance(setup, DeviceSRS) else DeviceSRS.from_artifacts(setup)
    n = polynomial.num_coefficients
    if n == 0:
        return G1Point.from_i128(0)
    jac = sharded_msm_g1(
        mesh, (srs.g1_x[:, :n], srs.g1_y[:, :n]), FR.from_mont(polynomial.coeffs_mont)
    )
    return G1Point(jac)


def cmd_commit(args) -> None:
    polynomial = Polynomial.from_ints(args.coefficients)
    displayed = str(polynomial)
    if polynomial.degree() > args.max_degree:
        raise CliError(f"Only polynomials up to degree {args.max_degree} are supported")
    log.info('Starting to commit to the polynomial P(x) = "%s"', displayed)
    setup = art.load_setup()
    if args.devices != 1:
        commitment = _commit_sharded(polynomial, setup, args.devices)
    else:
        commitment = polynomial.commit(setup)
    art.save_commitment(art.CommitmentArtifact(polynomial=polynomial, commitment=commitment))
    log.info('Commitment to the polynomial "P(x) = %s" has been successfully generated.', displayed)


def cmd_evaluate(args) -> None:
    if args.domain is not None:
        return _cmd_evaluate_domain(args)
    if not args.x:
        raise CliError("evaluate needs input point(s) or --domain K")
    if len(args.x) > 1:
        return _cmd_evaluate_batch(args)
    x = args.x[0]
    log.info('Starting to evaluate the committed polynomial at input point "x = %s"', x)
    setup = art.load_setup()
    commitment_artifact = art.load_commitment()
    evaluation = commitment_artifact.polynomial.evaluate(Scalar.from_i128(x))
    if args.devices != 1:
        quotient = commitment_artifact.polynomial.sub(
            Polynomial.from_constant(evaluation.result)
        ).divide_by_root(evaluation.point)
        proof = _commit_sharded(quotient, setup, args.devices)
    else:
        proof = evaluation.generate_proof(commitment_artifact.polynomial, setup)
    art.save_evaluation(art.EvaluationArtifact(evaluation=evaluation, proof=proof))
    log.info(
        'Evaluation successful for polynomial: "P(x) = %s" at point "x = %s" with "P(%s) = %s"',
        commitment_artifact.polynomial,
        x,
        x,
        evaluation.result,
    )


def _cmd_evaluate_batch(args) -> None:
    """Batch opening: k evaluations + k proofs in one device program
    (generate_proofs_batch), written to evaluations.json."""
    from .polynomial import generate_proofs_batch

    log.info(
        "Starting to evaluate the committed polynomial at %d input points", len(args.x)
    )
    setup = art.load_setup()
    commitment_artifact = art.load_commitment()
    points = [Scalar.from_i128(x) for x in args.x]
    evaluations, proofs = generate_proofs_batch(
        commitment_artifact.polynomial, points, setup
    )
    art.save_evaluations_batch(
        [art.EvaluationArtifact(evaluation=ev, proof=pf) for ev, pf in zip(evaluations, proofs)]
    )
    for x, ev in zip(args.x, evaluations):
        log.info(
            'Evaluation successful for polynomial: "P(x) = %s" at point "x = %s" with "P(%s) = %s"',
            commitment_artifact.polynomial,
            x,
            x,
            ev.result,
        )


def _cmd_evaluate_domain(args) -> None:
    """Domain opening: evaluate on the 2^K roots-of-unity domain with ONE
    forward NTT (O(n log n) Fr work total — the degree-scaling evaluation
    engine; the reference recomputes x^i per term per point,
    src/polynomial.rs:112-123), then open every domain point in one
    composite-key MSM bucket pass."""
    from .polynomial import generate_proofs_batch

    k = args.domain
    if args.x:
        raise CliError("evaluate takes either input points or --domain, not both")
    if not (0 <= k <= 20):
        raise CliError("--domain K must be in [0, 20] (2^K evaluations)")
    log.info("Starting to evaluate the committed polynomial on the 2^%d NTT domain", k)
    setup = art.load_setup()
    commitment_artifact = art.load_commitment()
    evaluations = commitment_artifact.polynomial.evaluate_on_domain(k)
    points = [ev.point for ev in evaluations]
    ntt_evals, proofs = generate_proofs_batch(
        commitment_artifact.polynomial, points, setup
    )
    # cross-check the NTT evaluations against the prover's recomputation
    for a, b in zip(evaluations, ntt_evals):
        assert a.result == b.result, "NTT evaluation mismatch vs prover path"
    art.save_evaluations_batch(
        [art.EvaluationArtifact(evaluation=ev, proof=pf) for ev, pf in zip(evaluations, proofs)]
    )
    log.info(
        'Domain evaluation successful for polynomial "P(x) = %s": %d openings written to "%s"',
        commitment_artifact.polynomial,
        len(evaluations),
        art.EVALUATIONS_BATCH_PATH,
    )


def cmd_verify_evaluation(args) -> None:
    if getattr(args, "all", False):
        return _cmd_verify_evaluations_batch(args)
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


def _cmd_verify_evaluations_batch(args) -> None:
    """Verify every proof of a multi-point evaluate in ONE batched pairing
    program (2k pairings in a single device call)."""
    from .polynomial import verify_proofs_batch

    log.info("Starting to verify the previous polynomial evaluations")
    setup = art.load_setup()
    commitment_artifact = art.load_commitment()
    evaluation_artifacts = art.load_evaluations_batch()
    oks = verify_proofs_batch(
        [a.proof for a in evaluation_artifacts],
        [commitment_artifact.commitment] * len(evaluation_artifacts),
        [a.evaluation for a in evaluation_artifacts],
        setup,
    )
    if not all(oks):
        bad = [str(a.evaluation.point) for a, ok in zip(evaluation_artifacts, oks) if not ok]
        raise CliError(
            "The proof associated to the evaluation is incorrect. "
            f"(failing points: {', '.join(bad)})"
        )
    for a in evaluation_artifacts:
        log.info(
            'Successfully verified evaluation for polynomial "P(x) = %s" at point "x = %s" with "P(%s) = %s"',
            commitment_artifact.polynomial,
            a.evaluation.point,
            a.evaluation.point,
            a.evaluation.result,
        )


_COMMANDS = {
    "trusted-setup": cmd_trusted_setup,
    "commit": cmd_commit,
    "evaluate": cmd_evaluate,
    "verify-evaluation": cmd_verify_evaluation,
}


def _init_compile_cache():
    """Persistent XLA compile cache for CLI invocations: every command is a
    fresh process, and cold AOT compiles on a tunneled TPU backend run for
    minutes — with the cache, only the first-ever invocation pays them.
    KZG_TPU_NO_COMPILE_CACHE=1 disables (e.g. for read-only homes)."""
    if os.environ.get("KZG_TPU_NO_COMPILE_CACHE"):
        return
    try:
        import jax

        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get(
                "KZG_TPU_COMPILE_CACHE",
                os.path.expanduser("~/.cache/kzg_tpu_jax_cache"),
            ),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # never let cache plumbing break a command
        pass


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    init_logging(args.debug)
    _init_compile_cache()
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

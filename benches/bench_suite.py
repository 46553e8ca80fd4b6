"""Benchmark suite mirroring the reference's five Criterion harnesses
(/root/reference/benches/*.rs — SURVEY.md §6) at the same degree points
[1, 100, 500, 1000, 2500], plus TPU-scale degrees.

Usage:
    python benches/bench_suite.py [suite ...] [--degrees 1,100,500,1000,2500]
                                  [--iters 3] [--json out.json]

Suites: setup, commit, evaluate, prove, verify (default: all five).

Workload shapes match the reference:
  - trusted_setup: degree+1 {s^k G1, s^k G2} pairs, fixed secret bytes 0..32
    (benches/trusted_setup.rs:7-31)
  - commit: coefficients 5^i + 10 (benches/polynomial_commitment.rs:26-48)
  - evaluate: input point 5^degree + 20 (benches/polynomial_evaluation.rs:18-42)
  - prove: sub + divide_by_root + quotient MSM (benches/evaluation_proof.rs:30-57)
  - verify: 2 pairings + 2 fixed-base mults + 2 subs
    (benches/evaluation_verification.rs:30-62)
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np


def _timeit(fn, iters: int) -> float:
    import jax

    jax.block_until_ready(fn())  # compile + warm
    times = []
    for _ in range(iters):
        t0 = time.time()
        jax.block_until_ready(fn())
        times.append(time.time() - t0)
    return min(times)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("suites", nargs="*", default=[],
                    choices=["setup", "commit", "evaluate", "prove", "verify", []])
    ap.add_argument("--degrees", default="1,100,500,1000,2500")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()
    suites = args.suites or ["setup", "commit", "evaluate", "prove", "verify"]
    degrees = [int(d) for d in args.degrees.split(",")]

    import jax
    import jax.numpy as jnp

    from benches._cache import init_compile_cache

    init_compile_cache()

    from kzg_tpu.ops import curve as cv, msm as msmops, poly as polyops
    from kzg_tpu.ops.field import FR
    from kzg_tpu.utils import hostmath as hm

    dev = jax.devices()[0]
    print(f"[bench_suite] device: {dev.platform}:{dev.device_kind}", file=sys.stderr)

    results = []

    def record(suite: str, degree: int, seconds: float, unit_count: int = 1):
        row = {
            "suite": suite,
            "degree": degree,
            "seconds": round(seconds, 6),
            "per_second": round(unit_count / seconds, 2),
        }
        results.append(row)
        print(f"[bench_suite] {suite:8s} degree={degree:6d}: {seconds*1e3:10.2f} ms", file=sys.stderr)

    secret_bytes = bytes(range(32))  # fixed secret 0..32 like the reference benches
    s_int = int.from_bytes(secret_bytes, "big") % hm.R

    max_d = max(degrees)
    # Shared SRS on device (affine G1 powers) big enough for every suite.
    s_mont = jnp.asarray(FR.to_limbs(s_int))
    pw_std = FR.from_mont(polyops.power_sequence(s_mont, max_d + 1))
    srs_jac = cv.G1.mul_scalar_affine(cv.G1_GEN_DEV, pw_std)
    (srs_x, srs_y), _ = cv.G1.to_affine(srs_jac)
    srs_x, srs_y = jax.block_until_ready((srs_x, srs_y))

    _verify_setup = [None]  # built once, shared across degree points

    for degree in degrees:
        n = degree + 1
        coeffs = [pow(5, i, hm.R) + 10 for i in range(n)]
        cmont = jnp.asarray(FR.many_to_limbs(coeffs))
        cstd = FR.from_mont(cmont)
        x_int = (pow(5, degree, hm.R) + 20) % hm.R
        x_mont = jnp.asarray(FR.to_limbs(x_int))

        if "setup" in suites:
            ladder = jax.jit(lambda k: cv.G1.mul_scalar_affine(cv.G1_GEN_DEV, k))
            ladder2 = jax.jit(lambda k: cv.G2.mul_scalar_affine(cv.G2_GEN_DEV, k))

            def run_setup():
                pw = FR.from_mont(polyops.power_sequence(s_mont, n))
                return ladder(pw), ladder2(pw)

            record("setup", degree, _timeit(run_setup, args.iters), n)

        if "commit" in suites:
            # the production online-MSM entry (batched ladder below the
            # Pippenger threshold, bucketed Pippenger above it)
            record(
                "commit", degree,
                _timeit(lambda: msmops.msm_g1((srs_x[:, :n], srs_y[:, :n]), cstd),
                        args.iters), n,
            )

        if "evaluate" in suites:
            record(
                "evaluate", degree,
                _timeit(lambda: polyops.evaluate(cmont, x_mont, n), args.iters), n,
            )

        if "prove" in suites and degree >= 1:

            def run_prove():
                y = polyops.evaluate(cmont, x_mont, n)
                pm = cmont.at[:, 0].set(FR.sub(cmont[:, 0], y))
                q, _ = polyops.synthetic_divide(pm, x_mont, n)
                return msmops.msm_g1(
                    (srs_x[:, : n - 1], srs_y[:, : n - 1]), FR.from_mont(q)
                )

            record("prove", degree, _timeit(run_prove, args.iters), n)

        if "verify" in suites:
            from kzg_tpu import Polynomial, Scalar, generate_setup

            # ONE shared setup across all degrees: verification cost is
            # degree-independent (2 pairings), and a fresh trusted setup per
            # degree would swamp the measurement in harness cost. The witness
            # polynomial is truncated to degree <= 9, so 11 artifacts cover
            # every degree point.
            if _verify_setup[0] is None:
                _verify_setup[0] = generate_setup(Scalar.from_int(s_int), 11)
            setup_full = _verify_setup[0]
            p = Polynomial.from_ints(coeffs[: min(n, 10)])
            c = p.commit(setup_full)
            ev = p.evaluate(Scalar.from_int(x_int))
            proof = ev.generate_proof(p, setup_full)
            record(
                "verify", degree,
                _timeit(lambda: ev.verify_proof(proof, c, setup_full), args.iters), 1,
            )

    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=1)
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Chip-scaling sweep: sharded MSM / NTT throughput vs mesh size.

On a real pod slice this measures ICI scaling efficiency (SURVEY.md §6
north-star: >= 80% at N >= 2 hosts); on a single host it runs against the
virtual CPU mesh (XLA_FLAGS=--xla_force_host_platform_device_count=N) to
validate the collective paths and report relative efficiency.

Usage: python benches/scaling.py [--n 4096] [--devices 1,2,4,8] [--iters 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--devices", default="1,2,4,8")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--cpu-mesh", action="store_true",
                    help="force an 8-device virtual CPU mesh")
    ap.add_argument("--ntt", action="store_true",
                    help="sweep the distributed NTT instead of the MSM")
    args = ap.parse_args()
    devs = [int(d) for d in args.devices.split(",")]

    if args.cpu_mesh or True:  # single-chip axon: CPU mesh is the only multi-device option
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "") + f" --xla_force_host_platform_device_count={max(devs)}"
        ).strip()

    import jax

    # force the CPU platform BEFORE any backend init: jax.devices() would
    # initialize the (single-chip) axon backend and the platform can no
    # longer change afterwards — round-5 fix: the sweep previously saw ONE
    # device and skipped every multi-device point
    jax.config.update("jax_platforms", "cpu")

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from benches._cache import init_compile_cache

    init_compile_cache()

    import numpy as np
    import jax.numpy as jnp

    from kzg_tpu.ops import curve as cv, poly as polyops
    from kzg_tpu.ops.field import FR
    from kzg_tpu.parallel import make_mesh, sharded_msm_g1
    from kzg_tpu.utils import hostmath as hm

    n = args.n
    if args.ntt:
        # distributed four-step NTT sweep (the SP/CP-analog collective path)
        from kzg_tpu.parallel import sharded as shm

        k = max(4, n.bit_length() - 1)
        coeffs = jnp.asarray(
            FR.many_to_limbs(
                [int.from_bytes(np.random.default_rng(3).bytes(32), "little") % hm.R
                 for _ in range(1 << k)]
            )
        )
        results = []
        base = None
        for d in devs:
            if d > len(jax.devices()):
                continue
            mesh = make_mesh(d)
            fn = lambda: shm.sharded_ntt(mesh, coeffs, k)
            out = jax.block_until_ready(fn())
            ts = []
            for _ in range(args.iters):
                t0 = time.time()
                jax.block_until_ready(fn())
                ts.append(time.time() - t0)
            best = min(ts)
            if base is None:
                base = best
            eff = base / (best * d)
            results.append({"suite": "ntt", "k": k, "devices": d,
                            "seconds": round(best, 4),
                            "points_per_s": round((1 << k) / best, 1),
                            "efficiency_vs_1dev": round(eff, 3)})
            print(f"[scaling] ntt {d} devices: {best*1e3:9.1f} ms eff={eff:.2f}",
                  file=sys.stderr)
        print(json.dumps(results))
        return 0

    s_mont = jnp.asarray(FR.to_limbs(424242))
    pw = FR.from_mont(polyops.power_sequence(s_mont, n))
    jac = cv.G1.mul_scalar_affine(cv.G1_GEN_DEV, pw)
    (x, y), _ = cv.G1.to_affine(jac)
    x, y = jax.block_until_ready((x, y))
    rng = np.random.default_rng(7)
    scalars = cv.fr_to_device(
        [int.from_bytes(rng.bytes(32), "little") % hm.R for _ in range(n)], batch=True
    )

    results = []
    base = None
    for d in devs:
        if d > len(jax.devices()):
            print(f"[scaling] skipping {d} devices (only {len(jax.devices())})", file=sys.stderr)
            continue
        mesh = make_mesh(d)
        fn = lambda: sharded_msm_g1(mesh, (x, y), scalars)
        out = jax.block_until_ready(fn())
        ts = []
        for _ in range(args.iters):
            t0 = time.time()
            jax.block_until_ready(fn())
            ts.append(time.time() - t0)
        best = min(ts)
        if base is None:
            base = best
        eff = base / (best * d)
        results.append({"devices": d, "seconds": round(best, 4),
                        "points_per_s": round(n / best, 1),
                        "efficiency_vs_1dev": round(eff, 3)})
        print(f"[scaling] {d} devices: {best*1e3:9.1f} ms  eff={eff:.2f}", file=sys.stderr)

    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Large-scale trusted-setup ceremony timing: generate an n-point SRS
(s^k G1 for k < n, plus the two G2 points verification needs) end-to-end on
the device and report wall time.

The reference's ceremony is one serial 256-bit blst ladder per point
(src/trusted_setup.rs:40-78). Here the s^k powers are one parallel-prefix
scan and every point is ~32 table gathers + a log-depth add tree against the
precomputed generator window tables (kzg_tpu.ops.genmul) — the fix for the
round-1 "setup-time cliff" (SRS generation was 301 s at n=65536 with the
per-point ladder).

Usage: python benches/ceremony.py [n] [--g2]
Prints one JSON line {"n", "srs_s", "points_per_s", "table_build_s", ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = int(args[0]) if args else 1 << 20
    with_g2 = "--g2" in sys.argv
    chunk = 1 << 16

    import jax
    import jax.numpy as jnp

    from benches._cache import init_compile_cache

    init_compile_cache()

    from kzg_tpu.ops import curve as cv
    from kzg_tpu.ops import genmul
    from kzg_tpu.ops import poly as polyops
    from kzg_tpu.ops.field import FR
    from kzg_tpu.utils import hostmath as hm

    dev = jax.devices()[0]
    print(f"[ceremony] device: {dev.platform}:{dev.device_kind} n={n}", file=sys.stderr)

    res = {"n": n}
    t0 = time.time()
    g1_tables = genmul.gen_tables(cv.G1)
    jax.block_until_ready(g1_tables)
    res["g1_table_build_s"] = round(time.time() - t0, 2)
    print(f"[ceremony] G1 generator tables: {res['g1_table_build_s']}s", file=sys.stderr)

    s = 0x1CAFE_F00D_5EED

    # shared chunked ceremony helper (also the bench.py SRS path)
    t0 = time.time()
    px, py = genmul.chunked_srs_g1(s, n, chunk)
    srs_s = time.time() - t0
    res["srs_g1_s"] = round(srs_s, 2)
    res["g1_points_per_s"] = round(n / srs_s, 1)
    print(f"[ceremony] {n} G1 points in {srs_s:.1f}s "
          f"=> {n/srs_s:,.0f} pts/s", file=sys.stderr)

    # spot-check a few points against the exact oracle
    checks = [1, 2, n // 2, n - 1]
    ok = True
    from kzg_tpu.ops.field import FP

    for k in checks:
        x = FP.from_limbs(px[:, k])
        y = FP.from_limbs(py[:, k])
        exp = hm.g1_mul(hm.G1_GEN, pow(s, k, hm.R))
        if (x, y) != exp:
            ok = False
            print(f"[ceremony] MISMATCH at k={k}", file=sys.stderr)
    res["oracle_ok"] = ok
    print(f"[ceremony] oracle spot-check: {'ok' if ok else 'FAILED'}", file=sys.stderr)

    if with_g2:
        t0 = time.time()
        g2_tables = genmul.gen_tables(cv.G2)
        jax.block_until_ready(g2_tables)
        res["g2_table_build_s"] = round(time.time() - t0, 2)
        t0 = time.time()
        s_mont = jnp.asarray(FR.to_limbs(s))
        base = jnp.asarray(FR.ONE_MONT)
        for lo in range(0, n, chunk):
            m = min(chunk, n - lo)
            pw_chunk = polyops.power_sequence(s_mont, m)
            pw_chunk = FR.mul(pw_chunk, base[:, None])
            base = FR.mul(pw_chunk[:, -1], s_mont)
            std = FR.from_mont(pw_chunk)
            jac = genmul.mul_gen(cv.G2, std, tables=g2_tables)
            jax.block_until_ready(jac)
        g2_s = time.time() - t0
        res["srs_g2_s"] = round(g2_s, 2)
        res["g2_points_per_s"] = round(n / g2_s, 1)
        print(f"[ceremony] {n} G2 points in {g2_s:.1f}s", file=sys.stderr)

    print(json.dumps(res))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())

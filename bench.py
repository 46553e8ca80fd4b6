"""Headline benchmark: G1 commitment-MSM throughput on the attached TPU
(fixed-base precomputed-table path — the production commit configuration).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline compares against the Rust reference's commit path: a serial loop
of blst_p1_mult (256-bit double-and-add) + add per coefficient
(/root/reference/src/polynomial.rs:207-214). The reference publishes no
numbers (BASELINE.md); we use the measured cost of a blst p1 scalar
multiplication on contemporary x86 (~100 us/point => ~10_000 points/s
single-threaded) as the baseline rate.

Detailed per-stage numbers go to stderr; stdout carries exactly one line.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

BASELINE_POINTS_PER_S = 10_000.0  # serial blst double-and-add commit loop


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else (1 << 20)
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    import os

    import jax

    # Persistent compile cache: the tunneled backend's AOT compiles run for
    # minutes; cache hits make repeated driver/bench invocations near-free.
    jax.config.update(
        "jax_compilation_cache_dir", os.path.expanduser("~/.cache/kzg_tpu_jax_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from kzg_tpu.ops import curve as cv
    from kzg_tpu.ops import msm as msmops
    from kzg_tpu.ops.field import FR
    from kzg_tpu.utils import hostmath as hm

    dev = jax.devices()[0]
    print(f"[bench] device: {dev.platform}:{dev.device_kind}", file=sys.stderr)

    # SRS-like points: s^k * G1 via the shared chunked ceremony helper
    # (kzg_tpu.ops.genmul.chunked_srs_g1 — also used by benches/ceremony.py).
    # The points are deterministic (fixed secret), so they are cached on
    # disk: the SRS-generation compile is harness cost, not the metric, and
    # the tunneled backend's cold compiles are minutes long.
    cache = os.path.expanduser(f"~/.cache/kzg_tpu_bench_srs_{n}.npz")
    t0 = time.time()
    if os.path.exists(cache):
        d = np.load(cache)
        px, py = jnp.asarray(d["px"]), jnp.asarray(d["py"])
        print(f"[bench] SRS loaded from cache: {time.time()-t0:.1f}s", file=sys.stderr)
    else:
        from kzg_tpu.ops import genmul

        hx, hy = genmul.chunked_srs_g1(0x1CAFE_F00D_5EED, n, chunk=min(n, 1 << 16))
        px, py = jax.block_until_ready((jnp.asarray(hx), jnp.asarray(hy)))
        print(f"[bench] SRS generation ({n} pts): {time.time()-t0:.1f}s", file=sys.stderr)
        try:
            os.makedirs(os.path.dirname(cache), exist_ok=True)
            np.savez(cache, px=hx, py=hy)
        except OSError:
            pass

    rng = np.random.default_rng(0xB152381)
    # vectorized scalar draw: 16 x u16 limbs with the top limb masked to 10
    # bits (< 2^250 < r) — a python-int per-scalar conversion loop at 2^20
    # costs minutes; this is milliseconds and oracle ints derive exactly
    limbs = rng.integers(0, 1 << 16, size=(16, n), dtype=np.int64)
    limbs[15] &= 0x3FF
    scalars = jnp.asarray(limbs.astype(np.uint32))
    sc_ints = [
        int(sum(int(limbs[j, i]) << (16 * j) for j in range(16))) for i in range(n)
    ]

    # Fixed-base precomputed tables: the SRS is fixed across commits, so the
    # per-SRS table build (one-time, reported separately) moves every
    # subsequent commit/proof MSM to the single-window 16-bit bucket pass.
    # The production pipeline consumes the PACKED lazy-domain table
    # (pack_tables25): one (24, 2*W*nt) array on device; the raw (tx, ty)
    # stay on the host (only needed to build the pack).
    tcache = os.path.expanduser(f"~/.cache/kzg_tpu_bench_tab_{n}.npz")
    pcache = os.path.expanduser(f"~/.cache/kzg_tpu_bench_pack25_{n}.npz")
    t0 = time.time()
    if os.path.exists(pcache):
        packed = jnp.asarray(np.load(pcache)["pk"])
        print(f"[bench] packed tables loaded from cache: {time.time()-t0:.1f}s",
              file=sys.stderr)
    else:
        if os.path.exists(tcache):
            d = np.load(tcache)
            tx, ty = d["tx"], d["ty"]
            print(f"[bench] tables loaded from cache: {time.time()-t0:.1f}s",
                  file=sys.stderr)
        else:
            tx, ty = msmops.precompute_g1_tables_chunked((px, py))
            print(f"[bench] fixed-base table precompute (one-time per SRS): "
                  f"{time.time()-t0:.1f}s", file=sys.stderr)
            try:
                np.savez(tcache, tx=np.asarray(tx), ty=np.asarray(ty))
            except OSError:
                pass
        t0 = time.time()
        # tx/ty stay host-side numpy; pack_tables25 uploads chunk by chunk
        packed = jax.block_until_ready(msmops.pack_tables25((tx, ty)))
        print(f"[bench] lazy-domain table pack (one-time per SRS): "
              f"{time.time()-t0:.1f}s", file=sys.stderr)
        try:
            np.savez(pcache, pk=np.asarray(packed))
        except OSError:
            pass
        del tx, ty
    tables = (None, None, packed)

    # Above 2^18 points the single-shot pipeline's sorted copies + prefix
    # runs approach a v5e's HBM; the blocked variant bounds peak memory and
    # reuses one set of stage programs across blocks. 2^16 blocks reuse the
    # EXACT stage shapes of the n=65536 bench — zero extra AOT compiles on
    # the tunneled backend, whose remote compiler has repeatedly WEDGED on
    # the larger 2^18-block shapes (round-5 observation; bigger blocks
    # amortize per-block overhead better when the compiler cooperates —
    # pass argv[3] to override).
    block = int(sys.argv[3]) if len(sys.argv) > 3 else (1 << 16)

    def run():
        out = msmops.msm_g1_fixed_blocked(tables, scalars, block=block)
        # force full device->host sync (block_until_ready alone has proven
        # unreliable for timing on the tunneled backend)
        return tuple(np.asarray(c) for c in out)

    t0 = time.time()
    out = run()
    print(f"[bench] fixed-base MSM compile+first run: {time.time()-t0:.1f}s", file=sys.stderr)

    # correctness spot check vs exact oracle (iterative powers: per-term
    # pow() is O(log i) each and takes minutes at 2^20)
    s = 0x1CAFE_F00D_5EED
    exp_scalar, pw = 0, 1
    for si in sc_ints:
        exp_scalar = (exp_scalar + si * pw) % hm.R
        pw = pw * s % hm.R
    got = cv.g1_from_device(out)
    exp = hm.g1_mul(hm.G1_GEN, exp_scalar)
    if got != exp:
        print("[bench] WARNING: MSM result mismatch vs oracle!", file=sys.stderr)
        return 1
    print("[bench] MSM output matches exact oracle", file=sys.stderr)

    times = []
    for _ in range(iters):
        t1 = time.time()
        run()
        times.append(time.time() - t1)
    best = min(times)
    pts_per_s = n / best
    print(f"[bench] MSM n={n}: best {best*1e3:.1f} ms over {iters} iters "
          f"=> {pts_per_s:,.0f} points/s", file=sys.stderr)

    # Speed-of-light accounting (BASELINE's MFU analog for u32 field work).
    # Dominant work: the bucket-accumulation scan = 16n mixed adds of 11 Fp
    # muls each (fast madd kernel); each 381-bit Montgomery Fp mul is a 24x24
    # u32-limb schoolbook product + an equal-size Montgomery reduction
    # (~2*24*24 = 1152 32-bit multiplies, ignoring the cheaper carry/add
    # circuits). The v5e VPU upper bound is 8 sublanes x 128 lanes x ~940 MHz
    # one-multiply-per-lane-cycle.
    V5E_U32_MULS_PER_S = 8 * 128 * 940e6
    fp_mul_u32 = 2 * 25 * 25  # lazy 25-limb kernel
    madd_fp_muls = 11
    sol_s = (16 * n) * madd_fp_muls * fp_mul_u32 / V5E_U32_MULS_PER_S
    sol_pts_per_s = n / sol_s
    util = best and sol_s / best
    print(f"[bench] speed-of-light (scan-only, VPU mult-bound): {sol_s*1e3:.1f} ms "
          f"=> {sol_pts_per_s:,.0f} pts/s ceiling; utilization {util*100:.1f}%",
          file=sys.stderr)

    print(json.dumps({
        "metric": f"g1_commit_msm_points_per_s_n{n}",
        "value": round(pts_per_s, 1),
        "unit": "points/s",
        "vs_baseline": round(pts_per_s / BASELINE_POINTS_PER_S, 3),
        "sol_points_per_s": round(sol_pts_per_s, 1),
        "sol_utilization": round(util, 4),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())

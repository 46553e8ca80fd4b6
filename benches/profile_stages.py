"""Fine-grained stage probes for the fixed-base MSM on the attached device.

Splits the round-4 stage profile further: argsort vs point-gathers inside the
sort stage, scan vs block size, extract sub-costs, XLA sort cost vs pair
count. Prints one JSON dict; human lines to stderr.

Usage: python benches/profile_stages.py [n]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timed(fn, *args, iters=3):
    import jax

    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])  # hard sync
    best = float("inf")
    for _ in range(iters):
        t0 = time.time()
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
        best = min(best, time.time() - t0)
    return best, out


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 65536

    import jax

    from benches._cache import init_compile_cache

    init_compile_cache()

    import jax.numpy as jnp
    from functools import partial

    from kzg_tpu.ops import msm as msmops
    from kzg_tpu.ops.field import FP, FR
    from kzg_tpu.utils import hostmath as hm

    dev = jax.devices()[0]
    print(f"[prof] device: {dev.platform}:{dev.device_kind} n={n}", file=sys.stderr)
    res = {"n": n}

    # synthetic but valid inputs: random points = multiples of G (only shape
    # and value-distribution matter here; correctness is bench.py's job)
    rng = np.random.default_rng(5)
    windows = msmops.FB_WINDOWS
    P = windows * n
    m = msmops.fb_chunk_size(P)
    C = P // m
    res.update({"P": P, "m": m, "C": C})

    # fake tables: broadcast a handful of real points (value distribution of
    # limbs is uniform-ish either way)
    base_pts = [hm.g1_mul(hm.G1_GEN, int(rng.integers(1, 2**63))) for _ in range(64)]
    bx = np.asarray(FP.many_to_limbs([p[0] for p in base_pts]), dtype=np.uint32)
    by = np.asarray(FP.many_to_limbs([p[1] for p in base_pts]), dtype=np.uint32)
    reps = P // 64
    tx = jnp.asarray(np.tile(bx, (1, reps)))
    ty = jnp.asarray(np.tile(by, (1, reps)))
    sc_ints = [int.from_bytes(rng.bytes(32), "little") % hm.R for _ in range(n)]
    scalars = jnp.asarray(FR.many_to_limbs(sc_ints))
    digits = msmops._fb_digits(jnp.asarray(FR.from_mont(scalars)), 16)

    # --- sort stage split ---------------------------------------------------
    @jax.jit
    def just_argsort(d):
        return jnp.argsort(d.reshape(P))

    t, order = timed(just_argsort, digits)
    res["argsort_ms"] = round(t * 1e3, 1)

    @jax.jit
    def just_gathers(x, y, d, order):
        flat = d.reshape(P)
        return x[:, order], y[:, order], flat[order]

    t, _ = timed(just_gathers, tx, ty, digits, order)
    res["gathers_ms"] = round(t * 1e3, 1)

    @jax.jit
    def one_gather(x, order):
        return x[:, order]

    t, _ = timed(one_gather, tx, order)
    res["one_gather_ms"] = round(t * 1e3, 1)

    t, sorted_out = timed(
        partial(msmops._fb_sort_jit, nt=n, window_bits=16), tx, ty, digits
    )
    res["sort_total_ms"] = round(t * 1e3, 1)
    xs_s, ys_s, ds = sorted_out

    # --- scan vs block size -------------------------------------------------
    from kzg_tpu.ops import pallas_msm

    xs = jnp.moveaxis(xs_s.reshape(FP.L, C, m), 2, 0)
    ys = jnp.moveaxis(ys_s.reshape(FP.L, C, m), 2, 0)

    for blk in (1024, 2048, 4096):
        if blk > C:
            continue

        @partial(jax.jit, static_argnums=())
        def scan_blk(xs, ys, blk=blk):
            return pallas_msm.scan_prefix_madd_fast(xs, ys, m, blk=blk)

        t, _ = timed(scan_blk, xs, ys)
        res[f"scan_fast_blk{blk}_ms"] = round(t * 1e3, 1)

    # --- chunk-depth sweep: same P, different (m, C) ------------------------
    for m2 in (256, 512, 1024):
        C2 = P // m2
        xs2 = jnp.moveaxis(xs_s.reshape(FP.L, C2, m2), 2, 0)
        ys2 = jnp.moveaxis(ys_s.reshape(FP.L, C2, m2), 2, 0)

        @partial(jax.jit, static_argnums=())
        def scan_m(xs, ys, m2=m2):
            return pallas_msm.scan_prefix_madd_fast(xs, ys, m2, blk=2048)

        t, _ = timed(scan_m, xs2, ys2)
        res[f"scan_fast_m{m2}_ms"] = round(t * 1e3, 1)

    for k, v in res.items():
        print(f"[prof] {k}: {v}", file=sys.stderr)
    print(json.dumps(res))
    return 0


if __name__ == "__main__":
    sys.exit(main())

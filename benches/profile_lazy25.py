"""Stage probes for the lazy 25-limb MSM pipeline: sort variants (column vs
point-major gather), scan block sweep, extraction, and the full bucket stage.

Usage: python benches/profile_lazy25.py [n]
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
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
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
    from kzg_tpu.ops import pallas_msm25 as k25
    from kzg_tpu.ops.field import FP, FR
    from kzg_tpu.utils import hostmath as hm

    dev = jax.devices()[0]
    print(f"[prof25] device: {dev.platform}:{dev.device_kind} n={n}", file=sys.stderr)
    res = {"n": n}

    rng = np.random.default_rng(5)
    W = msmops.FB_WINDOWS
    P = W * n
    m = msmops.fb_chunk_size(P)
    C = P // m
    res.update({"P": P, "m": m, "C": C})

    # real fixed-base tables if the bench cache has them (tiled fake tables
    # contain duplicate points, which trip the P == Q fallback and make the
    # cond-scan measure fast+exact); fall back to tiles otherwise
    tcache = os.path.expanduser(f"~/.cache/kzg_tpu_bench_tab_{n}.npz")
    if os.path.exists(tcache):
        d = np.load(tcache)
        tx, ty = jnp.asarray(d["tx"]), jnp.asarray(d["ty"])
        print("[prof25] using cached real tables", file=sys.stderr)
    else:
        base_pts = [hm.g1_mul(hm.G1_GEN, int(rng.integers(1, 2**63))) for _ in range(64)]
        bx = np.asarray(FP.many_to_limbs([p[0] for p in base_pts]), dtype=np.uint32)
        by = np.asarray(FP.many_to_limbs([p[1] for p in base_pts]), dtype=np.uint32)
        reps = P // 64
        tx = jnp.asarray(np.tile(bx, (1, reps)))
        ty = jnp.asarray(np.tile(by, (1, reps)))

    t0 = time.time()
    packed = jax.block_until_ready(msmops.pack_tables25((tx, ty)))
    res["pack_s"] = round(time.time() - t0, 1)
    del tx, ty

    sc_ints = [int.from_bytes(rng.bytes(32), "little") % hm.R for _ in range(n)]
    scalars = jnp.asarray(FR.from_mont(jnp.asarray(FR.many_to_limbs(sc_ints))))

    t, (absd, negd) = timed(
        lambda s: msmops._fbs_digit_arrays(s, None, n), scalars
    )
    res["digits_ms"] = round(t * 1e3, 1)

    # sort: column-gather vs point-major row-gather
    t, (pk, ds) = timed(partial(msmops._fbs25_sort_jit, nt=n, m=m), packed, absd, negd)
    res["sort_col_ms"] = round(t * 1e3, 1)

    packed_pm = jnp.transpose(packed)  # (2P, 24)
    t, (pk2, ds2) = timed(
        partial(msmops._fbs25_sort_pm_jit, nt=n, m=m), packed_pm, absd, negd
    )
    res["sort_pm_ms"] = round(t * 1e3, 1)
    assert np.array_equal(np.asarray(pk[0, :, :8]), np.asarray(pk2[0, :, :8]))
    del packed_pm, pk2, ds2

    # production scan entry (with in-graph exact fallback); the fast kernel
    # alone is probed at the default block only — every extra block size is
    # a multi-minute AOT compile on the tunneled backend
    t, (runs_f, flag) = timed(lambda p: k25.scan25_fast(p, m, blk=1024), pk)
    res["scan25_fast_ms"] = round(t * 1e3, 1)
    res["flag"] = int(np.asarray(flag))
    t, (runs_flat, totals) = timed(partial(msmops._fbs25_scan_jit, m=m), pk)
    res["scan25_cond_ms"] = round(t * 1e3, 1)

    # extraction (includes offsets + lazy->canonical conversion)
    t, S = timed(partial(msmops._fbs25_extract_jit, m=m), runs_flat, totals, ds)
    res["extract25_ms"] = round(t * 1e3, 1)

    # reduce tail (shared with the 24-limb path)
    t, Wt = timed(msmops._fbs_grid_trees_jit, *S)
    res["grid_trees_ms"] = round(t * 1e3, 1)
    t, ws = timed(msmops._fbs_suffix_weighted_jit, *Wt)
    res["suffix_ms"] = round(t * 1e3, 1)
    t, _ = timed(msmops._fbs_combine_jit, *ws)
    res["combine_ms"] = round(t * 1e3, 1)

    res["stage_sum_ms"] = round(
        sum(v for k, v in res.items() if k.endswith("_ms")
            and not k.startswith(("sort_col", "scan25_blk"))), 1
    )

    for k, v in res.items():
        print(f"[prof25] {k}: {v}", file=sys.stderr)
    print(json.dumps(res))
    return 0


if __name__ == "__main__":
    sys.exit(main())

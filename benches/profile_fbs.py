"""Stage probes for the PRODUCTION signed fixed-base MSM pipeline (the exact
stage programs msm_g1_fixed runs): digit rewrite, packed sort, packed scan,
offsets, extract, grid trees, suffix-weighted, combine.

Usage: python benches/profile_fbs.py [n]
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
    from kzg_tpu.ops.field import FP, FR
    from kzg_tpu.utils import hostmath as hm

    dev = jax.devices()[0]
    print(f"[prof] device: {dev.platform}:{dev.device_kind} n={n}", file=sys.stderr)
    res = {"n": n}

    rng = np.random.default_rng(5)
    windows = msmops.FB_WINDOWS
    P = windows * n
    m = msmops.fb_chunk_size(P)
    C = P // m
    res.update({"P": P, "m": m, "C": C})

    base_pts = [hm.g1_mul(hm.G1_GEN, int(rng.integers(1, 2**63))) for _ in range(64)]
    bx = np.asarray(FP.many_to_limbs([p[0] for p in base_pts]), dtype=np.uint32)
    by = np.asarray(FP.many_to_limbs([p[1] for p in base_pts]), dtype=np.uint32)
    reps = P // 64
    tx = jnp.asarray(np.tile(bx, (1, reps)))
    ty = jnp.asarray(np.tile(by, (1, reps)))
    sc_ints = [int.from_bytes(rng.bytes(32), "little") % hm.R for _ in range(n)]
    scalars = jnp.asarray(FR.from_mont(jnp.asarray(FR.many_to_limbs(sc_ints))))

    # digit rewrite (currently EAGER ops in _fbs_digit_arrays)
    t0 = time.time()
    absd, negd = msmops._fbs_digit_arrays(scalars, None, n)
    jax.block_until_ready((absd, negd))
    res["digits_first_ms"] = round((time.time() - t0) * 1e3, 1)
    t, _ = timed(lambda s: jax.block_until_ready(msmops._fbs_digit_arrays(s, None, n)), scalars)
    res["digits_ms"] = round(t * 1e3, 1)

    # packed sort
    t, (pk, ds) = timed(partial(msmops._fbs_sort_jit, nt=n, m=m), tx, ty, absd, negd)
    res["sort_packed_ms"] = round(t * 1e3, 1)

    # packed scan (fast path as production runs it, with in-graph cond)
    t, (runs_flat, totals) = timed(partial(msmops._fbs_scan_jit, m=m), pk)
    res["scan_packed_ms"] = round(t * 1e3, 1)

    # offsets
    t, off = timed(msmops._fb_offsets_jit, *totals)
    res["offsets_ms"] = round(t * 1e3, 1)

    # extract
    t, S = timed(partial(msmops._fbs_extract_jit, m=m), runs_flat, off, ds)
    res["extract_ms"] = round(t * 1e3, 1)

    # reduce stages
    t, W = timed(msmops._fbs_grid_trees_jit, *S)
    res["grid_trees_ms"] = round(t * 1e3, 1)
    t, ws = timed(msmops._fbs_suffix_weighted_jit, *W)
    res["suffix_ms"] = round(t * 1e3, 1)
    t, _ = timed(msmops._fbs_combine_jit, *ws)
    res["combine_ms"] = round(t * 1e3, 1)

    known = sum(v for k, v in res.items() if k.endswith("_ms") and k != "digits_first_ms")
    res["stage_sum_ms"] = round(known, 1)

    for k, v in res.items():
        print(f"[prof] {k}: {v}", file=sys.stderr)
    print(json.dumps(res))
    return 0


if __name__ == "__main__":
    sys.exit(main())

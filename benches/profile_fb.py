"""Stage-by-stage profile of the fixed-base G1 MSM on the real TPU.

Times each jitted stage of msm_g1_fixed separately (warm, forced host sync),
so the dominant cost is identified before optimizing. Writes human-readable
lines to stderr and one JSON dict to stdout.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def sync(x):
    """Barrier WITHOUT bulk device->host transfer: block until the device is
    done, then fetch a single element. np.asarray of a full (24, 16n) stage
    output moves hundreds of MB over the TPU tunnel (~6-10 s!) and completely
    swamps the compute being measured."""
    import jax

    jax.block_until_ready(x)
    leaf = x
    while isinstance(leaf, tuple):
        leaf = leaf[0]
    flat = leaf.reshape(-1)
    np.asarray(flat[:1])
    return x


def timeit(fn, iters=3):
    # warm (compile) run
    t0 = time.time()
    out = fn()
    sync(out)
    compile_s = time.time() - t0
    best = float("inf")
    for _ in range(iters):
        t0 = time.time()
        out = fn()
        sync(out)
        best = min(best, time.time() - t0)
    return out, best, compile_s


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    import jax
    import jax.numpy as jnp

    from benches._cache import init_compile_cache

    init_compile_cache()

    from kzg_tpu.ops import msm as msmops
    from kzg_tpu.ops.field import FP
    from kzg_tpu.utils import hostmath as hm
    from kzg_tpu.ops import curve as cv

    dev = jax.devices()[0]
    print(f"[prof] device: {dev.platform}:{dev.device_kind} n={n}", file=sys.stderr)

    cache = os.path.expanduser(f"~/.cache/kzg_tpu_bench_tab_{n}.npz")
    if not os.path.exists(cache):
        print(f"[prof] no table cache for n={n}; run bench.py {n} first", file=sys.stderr)
        return 1
    d = np.load(cache)
    tables = (jnp.asarray(d["tx"]), jnp.asarray(d["ty"]))
    tx, ty = tables

    rng = np.random.default_rng(0xB152381)
    sc_ints = [int.from_bytes(rng.bytes(32), "little") % hm.R for _ in range(n)]
    scalars = cv.fr_to_device(sc_ints, batch=True)

    window_bits = msmops.FB_WINDOW_BITS
    windows = 256 // window_bits
    nt = tx.shape[1] // windows
    digits = msmops._fb_digits(scalars, window_bits)
    if n < nt:
        digits = jnp.pad(digits, [(0, 0), (0, nt - n)])
    P = windows * nt
    m = min(512, max(64, P // 2048))
    m = min(m, P)
    C = P // m
    print(f"[prof] P={P} m={m} C={C}", file=sys.stderr)

    res = {"n": n, "P": P, "m": m, "C": C}

    (xs_s, ys_s, ds), t, c = timeit(lambda: msmops._fb_sort_jit(tx, ty, digits, nt, window_bits))
    xs_s, ys_s, ds = jnp.asarray(xs_s), jnp.asarray(ys_s), jnp.asarray(ds)
    res["sort_ms"] = round(t * 1e3, 1)
    print(f"[prof] sort+gather: {t*1e3:.1f} ms (compile {c:.1f}s)", file=sys.stderr)

    (runs_flat, totals), t, c = timeit(lambda: msmops._fb_scan_jit(xs_s, ys_s, m))
    runs_flat = tuple(jnp.asarray(r) for r in runs_flat)
    totals = tuple(jnp.asarray(r) for r in totals)
    res["scan_ms"] = round(t * 1e3, 1)
    print(f"[prof] scan: {t*1e3:.1f} ms (compile {c:.1f}s)", file=sys.stderr)

    from kzg_tpu.ops.field import _use_pallas

    if _use_pallas() and C >= 64:
        (rf_f, tt_f, flag), t, c = timeit(lambda: msmops._fb_scan_fast_jit(xs_s, ys_s, m))
        res["scan_fast_ms"] = round(t * 1e3, 1)
        print(f"[prof] scan_fast (11-mul madd): {t*1e3:.1f} ms (compile {c:.1f}s) "
              f"flag={int(flag)}", file=sys.stderr)
        same = all(
            bool(jnp.all(a == b)) for a, b in zip(rf_f, runs_flat)
        ) and int(flag) == 0
        print(f"[prof] scan_fast == scan: {same}", file=sys.stderr)
        res["scan_fast_matches"] = bool(same)
        runs_flat = tuple(jnp.asarray(r) for r in rf_f)
        totals = tuple(jnp.asarray(r) for r in tt_f)

    off, t, c = timeit(lambda: msmops._fb_offsets_jit(*totals))
    off = tuple(jnp.asarray(o) for o in off)
    res["offsets_ms"] = round(t * 1e3, 1)
    print(f"[prof] offsets: {t*1e3:.1f} ms (compile {c:.1f}s)", file=sys.stderr)

    S, t, c = timeit(lambda: msmops._fb_extract_jit(runs_flat, off, ds, m, window_bits))
    S = tuple(jnp.asarray(s) for s in S)
    res["extract_ms"] = round(t * 1e3, 1)
    print(f"[prof] extract: {t*1e3:.1f} ms (compile {c:.1f}s)", file=sys.stderr)

    W, t, c = timeit(lambda: msmops._fb_grid_trees_jit(*S))
    W = tuple(jnp.asarray(w) for w in W)
    res["grid_trees_ms"] = round(t * 1e3, 1)
    print(f"[prof] grid_trees: {t*1e3:.1f} ms (compile {c:.1f}s)", file=sys.stderr)

    ws, t, c = timeit(lambda: msmops._fb_suffix_weighted_jit(*W))
    ws = tuple(jnp.asarray(w) for w in ws)
    res["suffix_ms"] = round(t * 1e3, 1)
    print(f"[prof] suffix_weighted: {t*1e3:.1f} ms (compile {c:.1f}s)", file=sys.stderr)

    out, t, c = timeit(lambda: msmops._fb_combine_jit(*ws, window_bits // 2))
    res["combine_ms"] = round(t * 1e3, 1)
    print(f"[prof] combine: {t*1e3:.1f} ms (compile {c:.1f}s)", file=sys.stderr)

    total = sum(v for k, v in res.items() if k.endswith("_ms") and k != "scan_ms")
    res["total_ms"] = round(total, 1)
    res["points_per_s"] = round(n / (total / 1e3), 1)
    print(f"[prof] TOTAL (fast-scan path) {total:.1f} ms => "
          f"{res['points_per_s']:,.0f} pts/s", file=sys.stderr)

    # cross-check: the chained production entry (no inter-stage host syncs)
    _, t, c = timeit(lambda: msmops.msm_g1_fixed(tables, scalars))
    res["end_to_end_ms"] = round(t * 1e3, 1)
    print(f"[prof] end-to-end msm_g1_fixed: {t*1e3:.1f} ms (compile {c:.1f}s) "
          f"=> {n/t:,.0f} pts/s", file=sys.stderr)

    # correctness spot check
    s = 0x1CAFE_F00D_5EED
    exp_scalar = sum(si * pow(s, i, hm.R) for i, si in enumerate(sc_ints)) % hm.R
    got = cv.g1_from_device(sync(out))
    exp = hm.g1_mul(hm.G1_GEN, exp_scalar)
    res["oracle_ok"] = got == exp
    print(f"[prof] oracle_ok={res['oracle_ok']}", file=sys.stderr)

    print(json.dumps(res))
    return 0


if __name__ == "__main__":
    sys.exit(main())

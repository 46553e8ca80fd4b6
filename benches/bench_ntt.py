"""NTT throughput on the attached device (BASELINE north-star: NTT 2^20 pts/s).

Times the forward NTT (and the iNTT round-trip) at 2^k points, warm, with a
spot-check of a few outputs against the exact-int oracle DFT.

Usage: python benches/bench_ntt.py [k] [iters]
Prints one JSON dict to stdout; human lines to stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    import jax
    import jax.numpy as jnp

    from benches._cache import init_compile_cache

    init_compile_cache()

    from kzg_tpu.ops import ntt as nttops
    from kzg_tpu.ops.field import FR
    from kzg_tpu.utils import hostmath as hm

    dev = jax.devices()[0]
    n = 1 << k
    print(f"[ntt] device: {dev.platform}:{dev.device_kind} n=2^{k}", file=sys.stderr)

    rng = np.random.default_rng(0x177)
    # vectorized draw (< 2^250 < r): per-int python conversion at 2^20 costs
    # minutes; oracle ints derive from the same limb array
    limbs = rng.integers(0, 1 << 16, size=(16, n), dtype=np.int64)
    limbs[15] &= 0x3FF
    std = limbs.astype(np.uint32)
    coeffs = [
        int(sum(int(std[j, i]) << (16 * j) for j in range(16))) for i in range(n)
    ]
    dev_c = FR.to_mont(jnp.asarray(std))

    t0 = time.time()
    out = jax.block_until_ready(nttops.ntt(dev_c, k))
    print(f"[ntt] compile+first run: {time.time()-t0:.1f}s", file=sys.stderr)

    best = float("inf")
    for _ in range(iters):
        t0 = time.time()
        out = nttops.ntt(dev_c, k)
        jax.block_until_ready(out)
        np.asarray(out[..., :1])  # forced host sync (tunnel timing trap)
        best = min(best, time.time() - t0)
    pts_per_s = n / best

    # spot-check vs the exact oracle DFT at a few indices
    w = nttops._domain_root(k)
    got = np.asarray(out)
    ok = True
    for j in (0, 1, n // 2, n - 1):
        wj = pow(w, j, hm.R)
        want, pw = 0, 1
        for c in coeffs:  # iterative powers (per-term pow() takes minutes)
            want = (want + c * pw) % hm.R
            pw = pw * wj % hm.R
        if FR.from_limbs(got[:, j]) != want:
            ok = False
            print(f"[ntt] MISMATCH at j={j}", file=sys.stderr)

    # inverse round-trip
    t0 = time.time()
    back = jax.block_until_ready(nttops.intt(out, k))
    rt_s = time.time() - t0
    rt_ok = bool(jnp.all(back == dev_c))

    res = {
        "n": n,
        "ntt_ms": round(best * 1e3, 2),
        "points_per_s": round(pts_per_s, 1),
        "oracle_ok": ok,
        "roundtrip_ok": rt_ok,
        "intt_first_run_s": round(rt_s, 2),
    }
    print(f"[ntt] 2^{k}: best {best*1e3:.1f} ms => {pts_per_s:,.0f} pts/s "
          f"oracle_ok={ok} roundtrip_ok={rt_ok}", file=sys.stderr)
    print(json.dumps(res))
    return 0 if ok and rt_ok else 1


if __name__ == "__main__":
    sys.exit(main())

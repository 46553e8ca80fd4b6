"""Resumable 2^20 fixed-base table preparation for the headline bench.

The tunneled backend occasionally wedges mid-process (observed twice in
round 5); this script caches every 2^16-column table slice and every packed
chunk to its own file so a retry resumes where the wedge hit. Produces the
same ~/.cache/kzg_tpu_bench_tab_<n>.npz + kzg_tpu_bench_pack25_<n>.npz files
bench.py consumes.

Usage: python benches/prep20.py [n]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20

    import jax

    from benches._cache import init_compile_cache

    init_compile_cache()

    import jax.numpy as jnp

    from kzg_tpu.ops import msm as msmops
    from kzg_tpu.ops.field import FP

    cache_dir = os.path.expanduser("~/.cache")
    srs = os.path.join(cache_dir, f"kzg_tpu_bench_srs_{n}.npz")
    tab = os.path.join(cache_dir, f"kzg_tpu_bench_tab_{n}.npz")
    pack = os.path.join(cache_dir, f"kzg_tpu_bench_pack25_{n}.npz")
    part_dir = os.path.join(cache_dir, f"kzg_tpu_prep_{n}")
    os.makedirs(part_dir, exist_ok=True)

    d = np.load(srs)
    px, py = d["px"], d["py"]
    W = msmops.FB_WINDOWS
    chunk = 1 << 16
    n2 = 1 << max(6, (n - 1).bit_length())
    assert n2 % chunk == 0

    if not os.path.exists(tab):
        out_x = np.empty((FP.L, W, n2), np.uint32)
        out_y = np.empty((FP.L, W, n2), np.uint32)
        for i, lo in enumerate(range(0, n2, chunk)):
            part = os.path.join(part_dir, f"tab_{i}.npz")
            t0 = time.time()
            if os.path.exists(part):
                dp = np.load(part)
                sx, sy = dp["x"], dp["y"]
                src = "cache"
            else:
                hi = min(lo + chunk, n)
                xs, ys = px[:, lo:hi], py[:, lo:hi]
                tsx, tsy = msmops.precompute_g1_tables(
                    (jnp.asarray(xs), jnp.asarray(ys))
                )
                sx = np.asarray(tsx).reshape(FP.L, W, chunk)
                sy = np.asarray(tsy).reshape(FP.L, W, chunk)
                np.savez(part, x=sx, y=sy)
                src = "built"
            out_x[:, :, lo : lo + chunk] = sx
            out_y[:, :, lo : lo + chunk] = sy
            print(f"[prep] table slice {i + 1}/{n2 // chunk} {src} "
                  f"({time.time() - t0:.1f}s)", flush=True)
        np.savez(tab, tx=out_x.reshape(FP.L, W * n2), ty=out_y.reshape(FP.L, W * n2))
        print("[prep] tables saved", flush=True)
    else:
        print("[prep] tables exist", flush=True)

    if not os.path.exists(pack):
        d = np.load(tab)
        tx, ty = d["tx"], d["ty"]
        Wt = tx.shape[1]
        pchunk = 1 << 20
        parts = []
        c16 = jnp.asarray(FP.to_limbs(1 << 16))[:, None]

        @jax.jit
        def _pk(txc, tyc):
            xs = FP.mul(txc, c16)
            ys = FP.mul(tyc, c16)
            yn = FP.mul(FP.neg(tyc), c16)
            return xs | (ys << 16), xs | (yn << 16)

        pos = np.empty((FP.L, Wt), np.uint32)
        neg = np.empty((FP.L, Wt), np.uint32)
        for i, lo in enumerate(range(0, Wt, pchunk)):
            part = os.path.join(part_dir, f"pk_{i}.npz")
            t0 = time.time()
            if os.path.exists(part):
                dp = np.load(part)
                p_np, n_np = dp["p"], dp["n"]
                src = "cache"
            else:
                p, ng = _pk(tx[:, lo : lo + pchunk], ty[:, lo : lo + pchunk])
                p_np, n_np = np.asarray(p), np.asarray(ng)
                np.savez(part, p=p_np, n=n_np)
                src = "built"
            pos[:, lo : lo + pchunk] = p_np
            neg[:, lo : lo + pchunk] = n_np
            print(f"[prep] pack chunk {i + 1}/{Wt // pchunk} {src} "
                  f"({time.time() - t0:.1f}s)", flush=True)
        np.savez(pack, pk=np.concatenate([pos, neg], axis=1))
        print("[prep] pack saved", flush=True)
    else:
        print("[prep] pack exists", flush=True)

    # cleanup part files once the final artifacts exist
    if os.path.exists(tab) and os.path.exists(pack):
        for f in os.listdir(part_dir):
            os.remove(os.path.join(part_dir, f))
        os.rmdir(part_dir)
    print("[prep] DONE", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""VPU/MXU primitive-rate microbenchmarks on the attached device.

Answers the kernel-design questions the Montgomery-multiply formulation
depends on (the per-step madd cost is ~11 Fp muls of 576 16x16 limb products
each — whatever primitive carries those products sets the MSM ceiling):

  u32_mul   : elementwise uint32 multiply rate (current kernels' primitive)
  f32_mul   : elementwise float32 multiply rate (base-2^8 alternative: 8-bit
              limb products < 2^16 are exact in f32; 2304 products/mul vs 576)
  f32_fma   : elementwise a*b+c rate
  i32_matmul-ish / bf16 matmul: MXU rate reference (dot of f32 HIGHEST,
              the _mul_cols_dot reduction primitive)
  mont_xla  : full Field.mul (XLA path) throughput
  mont_pallas: full fused mont_mul_pallas throughput

Prints one JSON dict; human lines to stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def bench(fn, *args, iters=5):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(iters):
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.time() - t0)
    # forced host sync (tunnel timing trap: block_until_ready alone misled once)
    np.asarray(jax.tree_util.tree_leaves(out)[0][..., :1])
    return best


def main() -> int:
    import jax
    import jax.numpy as jnp
    from jax import lax

    dev = jax.devices()[0]
    print(f"[micro] device: {dev.platform}:{dev.device_kind}", file=sys.stderr)
    res = {"device": f"{dev.platform}:{dev.device_kind}"}

    T = 8 * 1024 * 1024  # elements per plane
    K = 64  # chained iterations inside one program

    @jax.jit
    def u32_chain(x, y):
        def body(i, x):
            return (x * y) + jnp.uint32(1)
        return lax.fori_loop(0, K, body, x)

    @jax.jit
    def f32_chain(x, y):
        def body(i, x):
            return (x * y) + jnp.float32(1)
        return lax.fori_loop(0, K, body, x)

    @jax.jit
    def f32_fma_chain(x, y):
        def body(i, x):
            return x * y + x
        return lax.fori_loop(0, K, body, x)

    xu = jnp.full((T,), np.uint32(3), jnp.uint32)
    yu = jnp.full((T,), np.uint32(60013), jnp.uint32)
    xf = jnp.full((T,), np.float32(1.0000001), jnp.float32)
    yf = jnp.full((T,), np.float32(0.9999999), jnp.float32)

    t = bench(u32_chain, xu, yu)
    res["u32_mul_giga_per_s"] = round(T * K / t / 1e9, 2)
    t = bench(f32_chain, xf, yf)
    res["f32_mul_giga_per_s"] = round(T * K / t / 1e9, 2)
    t = bench(f32_fma_chain, xf, yf)
    res["f32_fma_giga_per_s"] = round(T * K / t / 1e9, 2)
    for k, v in res.items():
        print(f"[micro] {k}: {v}", file=sys.stderr)

    # MXU reference: f32 HIGHEST-precision matmul (the _mul_cols_dot primitive)
    M = 4096

    @jax.jit
    def mm_chain(a, b):
        def body(i, a):
            return lax.dot(a, b, precision=lax.Precision.HIGHEST) * np.float32(1e-3)
        return lax.fori_loop(0, 8, body, a)

    a = jnp.full((M, M), np.float32(0.001))
    b = jnp.full((M, M), np.float32(0.002))
    t = bench(mm_chain, a, b)
    res["f32hi_matmul_tflops"] = round(8 * 2 * M**3 / t / 1e12, 2)
    print(f"[micro] f32hi_matmul_tflops: {res['f32hi_matmul_tflops']}", file=sys.stderr)

    # full Montgomery multiply, both paths
    from kzg_tpu.ops.field import FP
    from kzg_tpu.ops import pallas_field as pf
    from kzg_tpu.utils import hostmath as hm

    rng = np.random.default_rng(1)
    n = 1 << 17
    a_ints = [int(rng.integers(0, 2**63)) for _ in range(256)] * (n // 256)
    av = jnp.asarray(FP.many_to_limbs(a_ints))
    bv = jnp.asarray(FP.many_to_limbs(a_ints[::-1]))

    @jax.jit
    def mont_xla(a, b):
        def body(i, a):
            return FP.mul(a, b)
        return lax.fori_loop(0, 8, body, a)

    t = bench(mont_xla, av, bv)
    res["mont_xla_mmul_per_s"] = round(8 * n / t, 0)
    print(f"[micro] mont_xla: {res['mont_xla_mmul_per_s']:,.0f} muls/s", file=sys.stderr)

    if dev.platform != "cpu":
        @jax.jit
        def mont_pallas_chain(a, b):
            def body(i, a):
                return pf.mont_mul_pallas(a, b, FP.modulus, FP.n_prime_int, FP.L)
            return lax.fori_loop(0, 8, body, a)

        t = bench(mont_pallas_chain, av, bv)
        res["mont_pallas_mmul_per_s"] = round(8 * n / t, 0)
        print(f"[micro] mont_pallas: {res['mont_pallas_mmul_per_s']:,.0f} muls/s",
              file=sys.stderr)

    print(json.dumps(res))
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Fixed-GENERATOR scalar multiplication via precomputed window tables.

The trusted-setup ceremony multiplies the *same* base point (the group
generator) by every power s^k (reference: one fresh 256-bit blst double-and-add
ladder per point, src/trusted_setup.rs:54-72). With the base fixed, the whole
256-step ladder collapses to table lookups: precompute

    T[w][d] = d * 2^(8w) * G        (w < 32 windows, d < 256 entries)

once per process (a single 8-step batched ladder over all 32*256 lanes), then

    k * G = sum_w T[w][digit_w(k)]

is 32 gathers + a 5-level tree of batched adds per point — ~16x less point
work than the 256 double+add ladder, fully data-parallel over the batch of
scalars. Used by the setup ceremony (G1 and G2) and the verifier's y*G1 /
x*G2 projections.

Tables are built lazily per curve on first use: window bases 2^(8w)*G come
from the exact host oracle (256 host doublings, microseconds), the 8192-entry
digit ladders and the batch affine conversion run on device.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from .field import FP, FR
from . import fp2
from .curve import G1, G2, JacobianCurve
from ..utils import hostmath as hm

GEN_WINDOW_BITS = 8
GEN_WINDOWS = 32  # 256 / GEN_WINDOW_BITS
GEN_ENTRIES = 1 << GEN_WINDOW_BITS


def _level_bases(curve: JacobianCurve, k: int):
    """Host-exact affine points [2^(8w + k) * G for w < 32] (microseconds:
    power-of-two scalars are pure doubling chains in the host oracle)."""
    if curve is G1:
        pt, mul = hm.G1_GEN, hm.g1_mul
    else:
        pt, mul = hm.G2_GEN, hm.g2_mul
    return [mul(pt, 1 << (GEN_WINDOW_BITS * w + k)) for w in range(GEN_WINDOWS)]


def _bases_to_device(curve: JacobianCurve, bases):
    if curve is G1:
        bx = jnp.asarray(FP.many_to_limbs([p[0] for p in bases]))  # (L, W)
        by = jnp.asarray(FP.many_to_limbs([p[1] for p in bases]))
    else:
        bx = jnp.asarray(fp2.many_from_ints([p[0] for p in bases]))  # (L, 2, W)
        by = jnp.asarray(fp2.many_from_ints([p[1] for p in bases]))
    return bx, by


@partial(jax.jit, static_argnums=(0,))
def _table_build_kernel(curve: JacobianCurve, bxs, bys):
    """Doubling-structure table build: T[w][j + 2^k] = T[w][j] + 2^k*base_w —
    one batched mixed add per bit level (~W*E point-add lanes total) instead
    of a full E-entry scalar ladder per window (~16x less point work).
    bxs/bys: per-level affine bases, shape (GEN_WINDOW_BITS, L[, 2], W).
    Exceptional madd lanes are benign: T[0] = inf takes the q branch, and
    T[j] == 2^k*base would need j == 2^k (mod r), impossible for j < 2^k."""
    zero = jnp.zeros(bxs[0].shape + (1,), jnp.uint32)
    if curve is G1:
        one = jnp.broadcast_to(jnp.asarray(FP.ONE_MONT)[:, None, None], zero.shape)
    else:
        one = jnp.broadcast_to(
            jnp.asarray(fp2.from_ints((1, 0)))[:, :, None, None], zero.shape
        )
    acc = (
        jnp.concatenate([zero, bxs[0][..., None]], axis=-1),
        jnp.concatenate([zero, bys[0][..., None]], axis=-1),
        jnp.concatenate([zero, one], axis=-1),
    )  # digits [0, 1] = [inf, base]; jacobian (L[, 2], W, width)
    for k in range(1, GEN_WINDOW_BITS):
        new = curve.madd(acc, (bxs[k][..., None], bys[k][..., None]))
        acc = tuple(jnp.concatenate([a, b], axis=-1) for a, b in zip(acc, new))
    (x, y), _inf = curve.to_affine(acc)
    return x, y


def _build_tables(curve: JacobianCurve):
    """(tx, ty) affine Montgomery tables, shape (L[, 2], W, E); entry d = 0 is
    the identity (stored as zeros; lookups mask it via the digit). The level
    bases 2^(8w+k)*G come exactly from the host oracle; the accumulation is
    one jitted device program."""
    pairs = [
        _bases_to_device(curve, _level_bases(curve, k)) for k in range(GEN_WINDOW_BITS)
    ]
    bxs = jnp.stack([p[0] for p in pairs], axis=0)
    bys = jnp.stack([p[1] for p in pairs], axis=0)
    return _table_build_kernel(curve, bxs, bys)


_tables: dict[str, tuple] = {}
_tables25: dict[str, object] = {}


def gen_tables(curve: JacobianCurve):
    t = _tables.get(curve.name)
    if t is None:
        t = _build_tables(curve)
        _tables[curve.name] = t
    return t


def gen_tables25(tables):
    """Packed lazy-domain (mont 2^400) G1 generator tables for the 25-limb
    fold kernel: x|y<<16 words pre-scaled by mont(2^16). The d = 0 sentinel
    (all-zero entry) survives the scale (0 * c = 0). Under an enclosing trace
    (tables arrive as jit arguments) the pack is recomputed in-graph — the
    table is tiny (32*256 entries) and tracers must not be cached."""
    tx, ty = tables
    c16 = jnp.asarray(FP.to_limbs(1 << 16)).reshape(FP.L, 1, 1)
    if isinstance(tx, jax.core.Tracer):
        return FP.mul(tx, c16) | (FP.mul(ty, c16) << 16)
    pk = _tables25.get("g1")
    if pk is None:
        pk = FP.mul(tx, c16) | (FP.mul(ty, c16) << 16)
        _tables25["g1"] = pk
    return pk


def _digits8(k: jnp.ndarray) -> jnp.ndarray:
    """(16, *batch) standard-form u32 limbs -> (32, *batch) 8-bit digits, LSW first."""
    lo = k & jnp.uint32(0xFF)
    hi = k >> 8
    return jnp.stack([lo, hi], axis=1).reshape(2 * k.shape[0], *k.shape[1:])


def mul_gen(curve: JacobianCurve, k: jnp.ndarray, tables=None):
    """[k] * G for the curve generator. k: (16, *batch) standard-form Fr limbs.
    Returns a Jacobian triple with batch shape *batch. Identical group results
    to curve.mul_scalar_affine(GEN, k) — the ladder is baked into the tables.

    The 32 gathered window entries fold into the accumulator with ONE traced
    mixed-add site under lax.fori_loop: 31 madds per point (work-optimal) vs
    the masked-roll tree reduction's ~160 full adds + whole-array rolls per
    level (the round-3 ceremony bottleneck). Digit-0 windows (table entry
    stored as zeros) are skipped by selecting the old accumulator back."""
    if tables is None:
        tables = gen_tables(curve)
    tx, ty = tables
    cd = curve._cdim()
    batch = k.shape[1:]
    d = _digits8(k).astype(jnp.int32)  # (W, *batch)
    # gather: out[l(,c), w, *batch] = t[l(,c), w, d[w, *batch]]
    # flatten the batch, gather along the entry axis, reshape back
    nb = int(np.prod(batch, dtype=np.int64)) if batch else 1
    df = d.reshape(GEN_WINDOWS, nb)  # (W, nb)
    dfe = jnp.broadcast_to(df.reshape((1,) * cd + (GEN_WINDOWS, nb)), tx.shape[:-1] + (nb,))

    from .field import _use_pallas

    if curve is G1 and _use_pallas() and nb >= 64 and nb % 64 == 0:
        # Fused TPU path: ONE packed gather (x | y << 16 halves the
        # element-bound gather cost) + ONE lazy-domain fold kernel instead of
        # 31 madd+select launches (pallas_msm25 — ~1.7x fewer VPU ops than
        # the 24-limb fold). Digit-0 entries are the (0, 0) sentinel the
        # kernel skips. Identical group results to the fori_loop path
        # (canonicalized by to_mont16).
        from . import pallas_msm25 as k25

        pk = jnp.take_along_axis(
            gen_tables25((tx, ty)), dfe, axis=cd + 1
        )  # (L, W, nb)
        out25 = k25.fold25_packed(jnp.moveaxis(pk, 1, 0))
        out = tuple(k25.to_mont16(c) for c in out25)
        return tuple(c.reshape(c.shape[:1] + batch) for c in out)

    x = jnp.take_along_axis(tx, dfe, axis=cd + 1)  # (L[,2], W, nb)
    y = jnp.take_along_axis(ty, dfe, axis=cd + 1)
    nzf = df != 0  # (W, nb)

    x0 = lax.index_in_dim(x, 0, axis=cd, keepdims=False)
    y0 = lax.index_in_dim(y, 0, axis=cd, keepdims=False)
    if curve is G1:
        one = jnp.broadcast_to(jnp.asarray(FP.ONE_MONT)[:, None], x0.shape)
    else:
        one = jnp.broadcast_to(jnp.asarray(fp2.from_ints((1, 0)))[:, :, None], x0.shape)
    z0 = jnp.where(nzf[0][(None,) * cd], one, jnp.zeros_like(x0))
    acc0 = (x0, jnp.where(nzf[0][(None,) * cd], y0, jnp.zeros_like(y0)), z0)

    def body(w, acc):
        qx = lax.dynamic_index_in_dim(x, w, axis=cd, keepdims=False)
        qy = lax.dynamic_index_in_dim(y, w, axis=cd, keepdims=False)
        nz = lax.dynamic_index_in_dim(nzf, w, axis=0, keepdims=False)
        # digit-0 lanes feed garbage (0, 0) into the madd; their output is
        # discarded by the select, so only valid table entries ever land
        added = curve.madd(acc, (qx, qy))
        return curve.select(nz, added, acc)

    out = lax.fori_loop(1, GEN_WINDOWS, body, acc0)
    return tuple(c.reshape(c.shape[:cd] + batch) for c in out)


# Below this batch size, a process that has not already built the window
# tables is better off running the plain 256-step generator ladder: the
# one-time table build is itself ~a 16x8192-lane ladder, which only amortizes
# across hundreds of points (or across many calls — once built, tables always
# win, so the check is "built or big").
GENMUL_TABLE_THRESHOLD = 512


def tables_built(curve: JacobianCurve) -> bool:
    return curve.name in _tables


def mul_gen_auto(curve: JacobianCurve, k: jnp.ndarray,
                 threshold: int = GENMUL_TABLE_THRESHOLD):
    """[k] * G via the window tables when they exist (or the batch amortizes
    building them); via the plain fixed-base ladder otherwise. Identical
    group results either way."""
    nb = int(np.prod(k.shape[1:], dtype=np.int64)) if k.ndim > 1 else 1
    if tables_built(curve) or nb >= threshold:
        return mul_gen(curve, k)
    from . import curve as cvmod

    gen = cvmod.G1_GEN_DEV if curve is G1 else cvmod.G2_GEN_DEV
    return curve.mul_scalar_affine(gen, k)


def mul_g1_gen(k: jnp.ndarray):
    """[k] * G1 generator (see mul_gen_auto)."""
    return mul_gen_auto(G1, k)


@partial(jax.jit, static_argnums=(2,))
def _srs_chunk_points_jit(s_mont, base, chunk: int, tx, ty):
    """One SRS chunk as a single device program: powers scan -> generator
    window-table lookups -> window add tree. Eager per-op dispatch here costs
    one tunneled-backend round trip per op (~50x the device time at 2^16);
    one jitted program per fixed chunk shape removes all of it."""
    from . import poly as polyops

    pw = FR.mul(polyops.powers(s_mont, chunk), base[:, None])
    new_base = FR.mul(pw[:, -1], s_mont)
    jac = mul_gen(G1, FR.from_mont(pw), tables=(tx, ty))
    return jac, new_base


@jax.jit
def _srs_chunk_affine_jit(jx, jy, jz):
    (x, y), inf = G1.to_affine((jx, jy, jz))
    return x, y, jnp.any(inf)


def chunked_srs_g1(s: int, n: int, chunk: int = 1 << 16):
    """Affine SRS points (s^k * G1 for k < n) as host numpy arrays, built in
    fixed-shape device chunks.

    One set of stage programs (power ladder, generator tables, affine
    conversion) covers every chunk: the last partial chunk is PADDED to the
    full chunk width and the outputs sliced back, so no fresh XLA compile is
    triggered for a ragged tail. An unchunked build at 2^20 materializes
    ~10 GB of gather/tree temporaries and OOMs a 16 GB v5e — chunking bounds
    peak memory while the per-chunk programs amortize.

    Parallelizes the reference's serial setup iterator
    (/root/reference/src/trusted_setup.rs:40-78). Returns (px, py) uint32
    arrays of shape (24, n), canonical Montgomery affine.
    """
    from . import poly as polyops
    from . import curve as cvmod

    chunk = min(chunk, n)
    tx, ty = gen_tables(G1)
    s_mont = jnp.asarray(FR.to_limbs(s))
    base = jnp.asarray(FR.ONE_MONT)
    xs, ys = [], []
    for lo in range(0, n, chunk):
        m = min(chunk, n - lo)
        jac, base = _srs_chunk_points_jit(s_mont, base, chunk, tx, ty)
        cx, cy, any_inf = _srs_chunk_affine_jit(*jac)
        # s^k mod r is never 0, so no SRS lane can be the identity; an
        # infinity lane here means an upstream regression and must not be
        # silently encoded as (0, 0) (callers may cache these arrays).
        if bool(any_inf):
            raise AssertionError("SRS ceremony produced a point at infinity")
        xs.append(np.asarray(cx[:, :m]))
        ys.append(np.asarray(cy[:, :m]))
    return np.concatenate(xs, axis=1), np.concatenate(ys, axis=1)


def mul_g2_gen(k: jnp.ndarray):
    """[k] * G2 generator (see mul_gen_auto)."""
    return mul_gen_auto(G2, k)

"""Sharded KZG kernels over a jax.sharding.Mesh (shard_map + collectives).

The reference is single-threaded CPU (SURVEY.md §2.3: no parallelism of any
kind); these are the TPU-native first-class parallel components derived from
the workload:

  - sharded MSM: points + scalars sharded over the mesh batch axis, each chip
    runs its local ladder/reduction, per-chip Jacobian partial sums are
    all-gathered (3x24 u32 words — one tiny ICI hop) and tree-reduced.
    This is the DP/TP analog of the reference commit loop
    (src/polynomial.rs:207-214).
  - sharded evaluation: coefficient shards with per-shard power offsets,
    local Horner-free tree sums, one all-gather of the Fr partials
    (src/polynomial.rs:112-123 analog).
  - sharded powers-of-tau: the fixed-base ladders for s^k G1 are
    embarrassingly parallel over k; output stays sharded
    (src/trusted_setup.rs:40-78 analog).

All functions take an explicit mesh and accept any batch size (padded
internally to a multiple of the mesh size; zero-scalar pads contribute the
identity).
"""

from __future__ import annotations

from functools import lru_cache, partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

# Every shard_map program in this module is built by an @lru_cache'd builder
# keyed on (mesh, static shape params): JAX's trace/compile cache is keyed on
# FUNCTION IDENTITY, so a shard_map/jit function defined inside the public
# entry point would be re-traced (and, without a persistent-cache hit,
# re-COMPILED — minutes on the TPU AOT path) on every single call.

from ..ops import curve as cv
from ..ops import msm as msmops
from ..ops import poly as polyops
from ..ops.curve import G1
from ..ops.field import FR
from ..utils.hostmath import R as hm_R

AXIS = "shard"


def make_mesh(n_devices: int | None = None, axis: str = AXIS) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def _pad_to(arr: jnp.ndarray, n: int, axis: int = -1) -> jnp.ndarray:
    cur = arr.shape[axis]
    if cur == n:
        return arr
    pad = [(0, 0)] * arr.ndim
    pad[axis] = (0, n - cur)
    return jnp.pad(arr, pad)


def _gather_reduce_g1(part, axis_name):
    """All-gather per-chip Jacobian partials and tree-reduce them (replicated)."""
    gathered = jax.lax.all_gather(part, axis_name)  # each coord: (ndev, 24)
    pts = tuple(jnp.moveaxis(g, 0, -1) for g in gathered)  # (24, ndev)
    return msmops.tree_reduce(G1, pts, axis=-1)


@lru_cache(maxsize=None)
def _msm_g1_program(mesh: Mesh):
    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(None, AXIS), P(None, AXIS), P(None, AXIS)),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    def f(xl, yl, kl):
        # bucketed Pippenger per chip once the local shard is big enough for
        # its fixed costs; the tiny-batch ladder otherwise (same results)
        if kl.shape[-1] >= msmops.PIPPENGER_THRESHOLD:
            part = msmops.msm_pippenger_g1((xl, yl), kl)
        else:
            part = msmops.msm_batched_affine(G1, (xl, yl), kl)
        return _gather_reduce_g1(part, AXIS)

    return jax.jit(f)


def sharded_msm_g1(mesh: Mesh, pts_affine, scalars: jnp.ndarray):
    """G1 MSM with the point/scalar batch sharded across the mesh.

    pts_affine: (x, y) arrays (24, N); scalars: (16, N) standard-form limbs.
    Returns the replicated Jacobian triple of the full sum.
    """
    ndev = mesh.devices.size
    n = scalars.shape[-1]
    n_pad = -(-n // ndev) * ndev
    x = _pad_to(pts_affine[0], n_pad)
    y = _pad_to(pts_affine[1], n_pad)
    k = _pad_to(scalars, n_pad)  # zero scalars -> infinity contributions
    return _msm_g1_program(mesh)(x, y, k)


def sharded_precompute_g1_tables(mesh: Mesh, pts_affine, inf_mask=None,
                                 window_bits: int = msmops.FB_WINDOW_BITS):
    """Fixed-base window tables laid out for the sharded MSM: (L, W, N2) with
    the point axis N2 sharded across the mesh (each chip holds the full window
    stack for its point shard). One-time per SRS, like the single-chip path.

    window_bits picks the bucket count B = 2^window_bits PER CHIP: the bucket
    extraction/reduction stages cost O(B) per chip regardless of the shard
    size, so small meshes/shards (tests, dryruns) should use 8-bit windows
    while production scales (shard >= ~2^14 points/chip) use the default 16."""
    tx, ty = msmops.precompute_g1_tables(pts_affine, inf_mask, window_bits)
    W = 256 // window_bits
    n2 = tx.shape[1] // W
    ndev = mesh.devices.size
    if n2 % ndev:
        raise ValueError("table width must be a mesh-size multiple")
    sh = jax.sharding.NamedSharding(mesh, P(None, None, AXIS))
    tx3 = jax.device_put(tx.reshape(cv.FP.L, W, n2), sh)
    ty3 = jax.device_put(ty.reshape(cv.FP.L, W, n2), sh)
    return tx3, ty3


@lru_cache(maxsize=None)
def _fixed_stage_programs(mesh: Mesh, nloc: int, window_bits: int):
    """The 7 per-stage shard_map programs of the sharded fixed-base MSM for a
    given (mesh, per-chip point count, window size). Cached: stage programs
    are shared by every MSM on the same mesh/shape (commitment + proof +
    repeated commits)."""
    L = cv.FP.L
    W = 256 // window_bits
    ploc = W * nloc
    m = msmops.fb_chunk_size(ploc)
    pp = P(None, AXIS)  # (L, point/bucket) arrays, lane axis sharded
    sm = partial(shard_map, mesh=mesh, check_vma=False)

    @partial(sm, in_specs=(P(None, None, AXIS),) * 2 + (pp,),
             out_specs=(pp, pp, P(AXIS)))
    def f_sort(txl, tyl, dl):
        return msmops._fb_sort_jit(
            txl.reshape(L, ploc), tyl.reshape(L, ploc), dl, nloc, window_bits
        )

    @partial(sm, in_specs=(pp, pp), out_specs=((pp,) * 3, (pp,) * 3))
    def f_scan(xs_s, ys_s):
        return msmops._fb_scan_traced(xs_s, ys_s, m)

    @partial(sm, in_specs=((pp,) * 3,), out_specs=(pp,) * 3)
    def f_off(totals):
        return msmops._fb_offsets_jit(*totals)

    @partial(sm, in_specs=((pp,) * 3, (pp,) * 3, P(AXIS)), out_specs=(pp,) * 3)
    def f_extract(runs_flat, off, ds):
        return msmops._fb_extract_jit(runs_flat, off, ds, m, window_bits)

    @partial(sm, in_specs=((pp,) * 3,), out_specs=(P(None, AXIS, None),) * 3)
    def f_trees(S):
        return msmops._fb_grid_trees_jit(*S)

    @partial(sm, in_specs=((P(None, AXIS, None),) * 3,), out_specs=(pp,) * 3)
    def f_suffix(Wg):
        return msmops._fb_suffix_weighted_jit(*Wg)

    @partial(sm, in_specs=((pp,) * 3,), out_specs=(P(), P(), P()))
    def f_combine_reduce(ws):
        part = msmops._fb_combine_jit(*ws, window_bits // 2)
        return _gather_reduce_g1(part, AXIS)

    return tuple(jax.jit(g) for g in (
        f_sort, f_scan, f_off, f_extract, f_trees, f_suffix, f_combine_reduce))


def sharded_msm_g1_fixed(mesh: Mesh, tables, scalars: jnp.ndarray):
    """Production sharded G1 MSM (SURVEY.md §2.3 row 2): fixed-base tables
    sharded over the point axis, each chip runs the full bucket pipeline
    (digit sort -> fused prefix-sum scan -> prefix-difference bucket extraction
    -> log-depth weighted reduction) on its local shard, and the per-chip
    partial sums — the weighted bucket reduction is linear in the buckets, so
    partials just add — are combined with ONE all_gather of 3x24 words + a
    tree reduce. Replaces the reference's serial commit loop
    (src/polynomial.rs:207-214) at multi-chip scale.

    Like the single-chip pipeline, this runs as a SEQUENCE of per-stage
    shard_map programs (every stage is chip-local until the final reduce):
    one fused whole-pipeline program per chip blows up compile memory/latency
    superlinearly on both XLA:CPU and the TPU AOT helper, while the stage
    programs are small, compile once per shape, and are shared between the
    commitment and proof MSMs."""
    tx3, ty3 = tables  # (L, W, n2) sharded on axis 2
    W = tx3.shape[1]
    n2 = tx3.shape[2]
    window_bits = 256 // W
    ndev = mesh.devices.size
    n = scalars.shape[-1]
    if n > n2:
        raise ValueError("more scalars than table points")
    digits = msmops._fb_digits(scalars, window_bits)
    digits = _pad_to(digits, n2)  # zero digits contribute nothing

    nloc = n2 // ndev
    (f_sort, f_scan, f_off, f_extract, f_trees, f_suffix, f_combine_reduce) = (
        _fixed_stage_programs(mesh, nloc, window_bits)
    )
    xs_s, ys_s, ds = f_sort(tx3, ty3, digits)
    runs_flat, totals = f_scan(xs_s, ys_s)
    off = f_off(totals)
    S = f_extract(runs_flat, off, ds)
    Wg = f_trees(S)
    ws = f_suffix(Wg)
    return f_combine_reduce(ws)


@lru_cache(maxsize=None)
def _evaluate_program(mesh: Mesh, m: int):
    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(None, AXIS), P(None), P(None, AXIS)),
        out_specs=P(None),
        check_vma=False,
    )
    def f(cl, xx, off):
        pw = polyops.powers(xx, m)  # x^0..x^(m-1) local
        terms = FR.mul(cl, FR.mul(pw, off))  # off: (16, 1) local offset
        part = polyops.tree_sum(terms)  # (16,)
        gathered = jax.lax.all_gather(part, AXIS)  # (ndev, 16)
        return polyops.tree_sum(jnp.moveaxis(gathered, 0, -1))

    return jax.jit(f)


def sharded_evaluate(mesh: Mesh, coeffs: jnp.ndarray, x: jnp.ndarray):
    """P(x) with the coefficient array sharded: local powers + tree sum, then
    one all-gather of Fr partials. coeffs (16, n) Montgomery; x (16,) Montgomery."""
    ndev = mesh.devices.size
    n = coeffs.shape[-1]
    n_pad = -(-n // ndev) * ndev
    c = _pad_to(coeffs, n_pad)
    m = n_pad // ndev
    # per-shard offset x^(m*j) = (x^m)^j: compute x^m once then its powers
    xm = polyops.powers(x, m + 1)[:, m]
    offsets = polyops.powers(xm, ndev)  # (16, ndev)
    return _evaluate_program(mesh, m)(c, x, offsets)


def _sharded_setup(mesh: Mesh, curve, secret_mont: jnp.ndarray, count: int):
    """Powers-of-tau sharded over k: the s^k scan is global (log-depth,
    trivial), each chip multiplies its shard of exponents against the
    replicated generator window tables (ops.genmul — ~32 gathers + a log-depth
    add tree per point, not a 256-step ladder). Output stays distributed.
    Parallelizes the reference's serial setup iterator
    (src/trusted_setup.rs:40-78) for either group. Small ceremonies (below the
    table-build break-even) run the plain generator ladder per shard."""
    from ..ops import genmul

    ndev = mesh.devices.size
    n_pad = -(-count // ndev) * ndev
    pw = polyops.powers(secret_mont, n_pad)  # (16, n_pad) Montgomery — global scan
    std = FR.from_mont(pw)
    use_tables = (
        genmul.tables_built(curve) or count >= genmul.GENMUL_TABLE_THRESHOLD
    )
    if use_tables:
        tx, ty = genmul.gen_tables(curve)
        jac = _setup_tables_program(mesh, curve)(std, tx, ty)
    else:
        jac = _setup_ladder_program(mesh, curve)(std)
    return tuple(c[..., :count] for c in jac)


@lru_cache(maxsize=None)
def _setup_tables_program(mesh: Mesh, curve):
    cd = curve._cdim()  # 1 for G1 (L, n), 2 for G2 (L, 2, n) coords
    out_spec = P(*([None] * cd), AXIS)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(None, AXIS), P(), P()),
        out_specs=(out_spec, out_spec, out_spec),
        check_vma=False,
    )
    def f(kl, txl, tyl):
        from ..ops import genmul

        return genmul.mul_gen(curve, kl, tables=(txl, tyl))

    return jax.jit(f)


@lru_cache(maxsize=None)
def _setup_ladder_program(mesh: Mesh, curve):
    cd = curve._cdim()
    out_spec = P(*([None] * cd), AXIS)
    gen = cv.G1_GEN_DEV if curve is G1 else cv.G2_GEN_DEV

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(None, AXIS),),
        out_specs=(out_spec, out_spec, out_spec),
        check_vma=False,
    )
    def f(kl):
        return curve.mul_scalar_affine(gen, kl)

    return jax.jit(f)


def sharded_setup_g1(mesh: Mesh, secret_mont: jnp.ndarray, count: int):
    """Sharded s^k G1 ceremony (see _sharded_setup)."""
    return _sharded_setup(mesh, G1, secret_mont, count)


def sharded_setup_g2(mesh: Mesh, secret_mont: jnp.ndarray, count: int):
    """Sharded s^k G2 ceremony — the G2 half of the reference's setup iterator
    (src/trusted_setup.rs:64-72), ~3x the G1 point cost, same layout."""
    from ..ops.curve import G2

    return _sharded_setup(mesh, G2, secret_mont, count)


def sharded_commit_and_prove(mesh: Mesh, setup_x, setup_y, coeffs: jnp.ndarray, x: jnp.ndarray,
                             tables=None):
    """One full KZG 'training step' on a mesh: sharded evaluation y = P(x),
    sharded synthetic division (prefix scan is global; cheap Fr work), and two
    sharded MSMs (commitment + proof). Returns (commit_jac, proof_jac, y_mont).

    When `tables` (from sharded_precompute_g1_tables) is given, both MSMs run
    the production fixed-base bucket pipeline per chip; otherwise the online
    per-chip Pippenger/ladder path. This is the multi-chip flagship pipeline
    the dryrun compiles.
    """
    n = coeffs.shape[-1]
    y = sharded_evaluate(mesh, coeffs, x)
    # quotient (P - y) / (X - x): associative scan over Fr — compute globally
    # (log-depth, bandwidth-trivial next to the MSMs), then shard its MSM.
    pm = coeffs.at[:, 0].set(FR.sub(coeffs[:, 0], y))
    quotient, _rebuilt = polyops.synthetic_divide(pm, x, n)
    if tables is not None:
        commit = sharded_msm_g1_fixed(mesh, tables, FR.from_mont(coeffs))
        proof = sharded_msm_g1_fixed(mesh, tables, FR.from_mont(quotient))
    else:
        commit = sharded_msm_g1(mesh, (setup_x[:, :n], setup_y[:, :n]), FR.from_mont(coeffs))
        proof = sharded_msm_g1(
            mesh, (setup_x[:, : n - 1], setup_y[:, : n - 1]), FR.from_mont(quotient)
        )
    return commit, proof, y


def sharded_ntt(mesh: Mesh, coeffs: jnp.ndarray, k: int, k1: int | None = None,
                gather: bool = True):
    """Distributed four-step NTT with ONE all-to-all (the butterfly-stage
    exchange of SURVEY.md §2.3/§5 — ICI-friendly: every chip exchanges equal
    blocks once, all other stages are chip-local).

    Decompose n = n1 * n2 (k = k1 + k2): columns sharded -> local length-n1
    NTTs -> on-device twiddle correction (geometric prefix scan) -> all_to_all
    transpose -> local length-n2 NTTs. With gather=True (default) returns the
    full natural-order evaluation array ((16, 2^k) Montgomery, replicated).
    With gather=False the result STAYS distributed: returns the (16, n1, n2)
    array sharded on the n1 axis, where evaluation j = j1 + n1*j2 lives at
    [:, j1, j2] — feed it straight into downstream sharded stages without the
    all-gather + host transpose.
    """
    from ..ops import ntt as nttops

    ndev = mesh.devices.size
    n = 1 << k
    if coeffs.shape[1] != n:
        coeffs = jnp.pad(coeffs, [(0, 0), (0, n - coeffs.shape[1])])
    if k1 is None:
        k1 = k // 2
    k2 = k - k1
    n1, n2 = 1 << k1, 1 << k2
    if n2 % ndev or n1 % ndev:
        raise ValueError("mesh size must divide both NTT factors")

    w_n = nttops._domain_root(k)
    # per-global-column ratio w_n^{i2}, shipped sharded (tiny)
    col_pow = FR.many_to_limbs([pow(w_n, i2, hm_R) for i2 in range(n2)])
    mat = coeffs.reshape(FR.L, n1, n2)
    # (16, n1, n2) = X[j1, j2], j = j1 + n1*j2
    out = _ntt_program(mesh, k1, k2)(mat, jnp.asarray(col_pow))
    if not gather:
        return out
    return jnp.transpose(out, (0, 2, 1)).reshape(FR.L, n)


@lru_cache(maxsize=None)
def _ntt_program(mesh: Mesh, k1: int, k2: int):
    from ..ops import ntt as nttops

    n1 = 1 << k1

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(None, None, AXIS), P(None, AXIS)),
        out_specs=P(None, AXIS, None),
        check_vma=False,
    )
    def f(m_local, ratio_local):
        t = nttops._ntt_core(m_local, k1, inverse=False)  # columns, batched over local cols
        # twiddle matrix T[j1, i2] = ratio^(j1): geometric prefix scan along j1
        ones = jnp.broadcast_to(jnp.asarray(FR.ONE_MONT)[:, None, None], (FR.L, 1, ratio_local.shape[1]))
        ratios = jnp.broadcast_to(ratio_local[:, None, :], (FR.L, n1 - 1, ratio_local.shape[1]))
        tw = jax.lax.associative_scan(
            lambda a, b: FR.mul(a, b), jnp.concatenate([ones, ratios], axis=1), axis=1
        )
        t = FR.mul(t, tw)
        # redistribute: split rows (axis 1), gather full columns (axis 2)
        t = jax.lax.all_to_all(t, AXIS, split_axis=1, concat_axis=2, tiled=True)
        # row-wise NTT over the full i2 axis
        t = jnp.moveaxis(t, 2, 1)  # (16, n2, n1_local)
        t = nttops._ntt_core(t, k2, inverse=False)
        return jnp.moveaxis(t, 1, 2)  # (16, n1_local, n2)

    return jax.jit(f)

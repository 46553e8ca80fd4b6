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

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

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

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(None, AXIS), P(None, AXIS), P(None, AXIS)),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    def f(xl, yl, kl):
        part = msmops.msm_batched_affine(G1, (xl, yl), kl)
        return _gather_reduce_g1(part, AXIS)

    return f(x, y, k)


def sharded_evaluate(mesh: Mesh, coeffs: jnp.ndarray, x: jnp.ndarray):
    """P(x) with the coefficient array sharded: local powers + tree sum, then
    one all-gather of Fr partials. coeffs (16, n) Montgomery; x (16,) Montgomery."""
    ndev = mesh.devices.size
    n = coeffs.shape[-1]
    n_pad = -(-n // ndev) * ndev
    c = _pad_to(coeffs, n_pad)
    m = n_pad // ndev
    # per-shard offset x^(m*j), tiny host-independent device computation
    block = polyops.powers(x, ndev + 1)  # x^0..x^ndev — cheap
    # offsets[j] = (x^m)^j: compute x^m once then its powers
    xm = polyops.powers(x, m + 1)[:, m]
    offsets = polyops.powers(xm, ndev)  # (16, ndev)
    del block

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

    return f(c, x, offsets)


def sharded_setup_g1(mesh: Mesh, secret_mont: jnp.ndarray, count: int):
    """Powers-of-tau G1 ladder sharded over k: returns (24, count) x/y... as
    Jacobian triple sharded on the batch axis (output stays distributed)."""
    ndev = mesh.devices.size
    n_pad = -(-count // ndev) * ndev
    pw = polyops.powers(secret_mont, n_pad)  # (16, n_pad) Montgomery — global scan
    std = FR.from_mont(pw)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(None, AXIS),),
        out_specs=(P(None, AXIS), P(None, AXIS), P(None, AXIS)),
        check_vma=False,
    )
    def f(kl):
        return cv.G1.mul_scalar_affine(cv.G1_GEN_DEV, kl)

    jac = f(std)
    return tuple(c[:, :count] for c in jac)


def sharded_commit_and_prove(mesh: Mesh, setup_x, setup_y, coeffs: jnp.ndarray, x: jnp.ndarray):
    """One full KZG 'training step' on a mesh: sharded evaluation y = P(x),
    sharded synthetic division (prefix scan is global; cheap Fr work), and two
    sharded MSMs (commitment + proof). Returns (commit_jac, proof_jac, y_mont).

    This is the multi-chip flagship pipeline the dryrun compiles.
    """
    n = coeffs.shape[-1]
    y = sharded_evaluate(mesh, coeffs, x)
    commit = sharded_msm_g1(mesh, (setup_x[:, :n], setup_y[:, :n]), FR.from_mont(coeffs))
    # quotient (P - y) / (X - x): associative scan over Fr — compute globally
    # (log-depth, bandwidth-trivial next to the MSMs), then shard its MSM.
    pm = coeffs.at[:, 0].set(FR.sub(coeffs[:, 0], y))
    quotient, _rebuilt = polyops.synthetic_divide(pm, x, n)
    proof = sharded_msm_g1(
        mesh, (setup_x[:, : n - 1], setup_y[:, : n - 1]), FR.from_mont(quotient)
    )
    return commit, proof, y


def sharded_ntt(mesh: Mesh, coeffs: jnp.ndarray, k: int, k1: int | None = None):
    """Distributed four-step NTT with ONE all-to-all (the butterfly-stage
    exchange of SURVEY.md §2.3/§5 — ICI-friendly: every chip exchanges equal
    blocks once, all other stages are chip-local).

    Decompose n = n1 * n2 (k = k1 + k2): columns sharded -> local length-n1
    NTTs -> on-device twiddle correction (geometric prefix scan) -> all_to_all
    transpose -> local length-n2 NTTs. Returns the full natural-order
    evaluation array (gathered, (16, 2^k) Montgomery).
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

    out = f(mat, jnp.asarray(col_pow))  # (16, n1, n2) = X[j1, j2], j = j1 + n1*j2
    return jnp.transpose(out, (0, 2, 1)).reshape(FR.L, n)

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
from jax.experimental.shard_map import shard_map

from ..ops import curve as cv
from ..ops import msm as msmops
from ..ops import poly as polyops
from ..ops.curve import G1
from ..ops.field import FR

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
        check_rep=False,
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
        check_rep=False,
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
        check_rep=False,
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

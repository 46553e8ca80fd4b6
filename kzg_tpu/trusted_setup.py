"""Trusted-setup (powers-of-tau) ceremony — parity with the reference's
``SetupArtifactsGenerator`` (src/trusted_setup.rs), computed in device batches.

The reference emits artifacts one at a time: s^k tracked by a running product,
each point a fresh 256-bit blst mult (src/trusted_setup.rs:40-78). Here the
power ladder s^0..s^(n-1) is ONE parallel-prefix scan and the G1/G2 points are
batched fixed-base ladders over the whole chunk — the iterator facade yields
identical items in the same order (k = 0 yields the plain generators,
src/trusted_setup.rs:41-48).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax.numpy as jnp

from .ops.field import FR
from .ops import poly as polyops
from .ops import curve as cv
from .scalar import Scalar
from .curves import G1Point, G2Point


@dataclass
class SetupArtifact:
    """{g1: s^k G1, g2: s^k G2} (src/trusted_setup.rs:31-35)."""

    g1: G1Point
    g2: G2Point

    def to_json(self) -> dict:
        return {"g1": self.g1.to_json(), "g2": self.g2.to_json()}

    @classmethod
    def from_json(cls, data: dict) -> "SetupArtifact":
        return cls(g1=G1Point.from_json(data["g1"]), g2=G2Point.from_json(data["g2"]))


def generate_setup(secret: Scalar, count: int, chunk: int = 8192) -> list[SetupArtifact]:
    """[{s^k G1, s^k G2} for k in 0..count-1] as batched device computation.

    The s^k ladder is one parallel-prefix scan; the point mults use the
    precomputed generator window tables (ops.genmul — ~32 gathers + a
    log-depth add tree per point instead of the reference's 256-step
    double-and-add per point, src/trusted_setup.rs:54-72). Chunked so
    arbitrarily large ceremonies stream through fixed-size device programs.
    """
    from .ops import genmul

    if count <= 0:
        return []
    out: list[SetupArtifact] = [
        SetupArtifact(g1=G1Point.from_i128(1), g2=G2Point.from_i128(1))
    ]
    if count == 1:
        return out

    # s^1 .. s^(count-1) via parallel prefix, then chunked generator-table mults.
    pw = polyops.power_sequence(secret.mont, count)  # (16, count), Montgomery
    std = FR.from_mont(pw)  # standard-form exponent limbs
    for lo in range(1, count, chunk):
        hi = min(lo + chunk, count)
        ks = std[:, lo:hi]
        g1 = genmul.mul_g1_gen(ks)
        g2 = genmul.mul_g2_gen(ks)
        g1_aff = cv.g1_from_device(g1)
        g2_aff = cv.g2_from_device(g2)
        for p1, p2 in zip(g1_aff, g2_aff):
            out.append(SetupArtifact(g1=G1Point.from_affine(p1), g2=G2Point.from_affine(p2)))
    return out


class SetupArtifactsGenerator:
    """Infinite iterator facade matching the reference semantics
    (first item = generators, then s^k pairs), batching device work in chunks.

    * `secret` - 32 big-endian bytes (src/trusted_setup.rs:16-28)
    """

    def __init__(self, secret: bytes, chunk: int = 16):
        self.secret = Scalar.from_be_bytes(secret)
        self._chunk = max(2, chunk)
        self._buf: list[SetupArtifact] = []
        self._next_k = 0
        self._power = Scalar.from_int(1)  # s^(k0 - 1) when the next chunk starts at k0

    def __iter__(self):
        return self

    def __next__(self) -> SetupArtifact:
        if not self._buf:
            self._fill()
        return self._buf.pop(0)

    def _fill(self):
        k0 = self._next_k
        if k0 == 0:
            self._buf.append(SetupArtifact(g1=G1Point.from_i128(1), g2=G2Point.from_i128(1)))
            self._next_k = 1
            self._power = self.secret  # s^1, the first power of the next chunk
            return
        n = self._chunk
        # powers s^k0 .. s^(k0+n-1) = s^k0 * [s^0 .. s^(n-1)]
        from .ops import genmul

        pw = polyops.power_sequence(self.secret.mont, n)
        pw = FR.mul(pw, self._power.mont[:, None])
        std = FR.from_mont(pw)
        g1 = genmul.mul_g1_gen(std)
        g2 = genmul.mul_g2_gen(std)
        for p1, p2 in zip(cv.g1_from_device(g1), cv.g2_from_device(g2)):
            self._buf.append(SetupArtifact(g1=G1Point.from_affine(p1), g2=G2Point.from_affine(p2)))
        self._power = Scalar._from_mont(FR.mul(pw[:, -1], self.secret.mont))
        self._next_k = k0 + n

    def take(self, n: int) -> list[SetupArtifact]:
        return [next(self) for _ in range(n)]


class DeviceSRS:
    """Device-resident SRS: G1 powers as affine limb arrays ready for the MSM
    ladders (no per-commit host conversion), plus the two G2 points
    verification needs. The TPU-native 'sharded SRS load' of SURVEY.md §5.

    Build once from artifacts (or straight from setup.json via batched device
    decompression) and pass to Polynomial.commit / Evaluation.verify_proof in
    place of the artifact list.
    """

    def __init__(self, g1_x, g1_y, g1_inf, g2_points, count: int):
        self.g1_x = g1_x  # (24, n) Montgomery affine
        self.g1_y = g1_y
        self.g1_inf = g1_inf  # (n,) bool or None
        self.g2 = g2_points  # list[G2Point] (only [0], [1] are required)
        self.count = count
        self._fb_tables = None

    def __len__(self) -> int:
        return self.count

    def fixed_tables(self):
        """Fixed-base window tables for the precomputed-MSM commit path
        (ops.msm.precompute_g1_tables), built lazily and cached — the SRS is
        fixed across commits, so the ~240 batched doublings amortize over
        every subsequent commit/proof MSM."""
        if self._fb_tables is None:
            from .ops import msm as msmops
            from .ops.field import _use_pallas

            tx, ty = msmops.precompute_g1_tables(
                (self.g1_x, self.g1_y), self.g1_inf
            )
            if _use_pallas():
                # TPU: also pre-pack the lazy-domain table the 25-limb scan
                # pipeline consumes (one extra one-time pass per SRS)
                self._fb_tables = (tx, ty, msmops.pack_tables25((tx, ty)))
            else:
                self._fb_tables = (tx, ty)
        return self._fb_tables

    @classmethod
    def from_artifacts(cls, setup_artifacts) -> "DeviceSRS":
        import jax.numpy as jnp
        from .ops import curve as cv

        xs, ys, infs = [], [], []
        for a in setup_artifacts:
            p = a.g1.affine()
            if p is None:
                xs.append(0); ys.append(0); infs.append(True)
            else:
                xs.append(p[0]); ys.append(p[1]); infs.append(False)
        g1_x = jnp.asarray(cv.FP.many_to_limbs(xs))
        g1_y = jnp.asarray(cv.FP.many_to_limbs(ys))
        inf = jnp.asarray(infs) if any(infs) else None
        g2s = [a.g2 for a in setup_artifacts[:2]]
        return cls(g1_x, g1_y, inf, g2s, len(setup_artifacts))

    @classmethod
    def load(cls, path: str, subgroup_check: bool = True) -> "DeviceSRS":
        """Bulk-load setup.json: G1 points decompressed in ONE device batch
        (host sqrt per point would take minutes at 2^20 scale). Subgroup
        membership is checked by default — a malicious setup.json with points
        outside the r-order subgroup is rejected, matching the per-point path
        (utils.hostmath.g1_decompress)."""
        import json

        import jax.numpy as jnp

        from .curves import G2Point
        from .ops import codec, curve as cv

        with open(path) as f:
            raw = json.load(f)
        jac = codec.g1_decompress_batch(
            [bytes(a["g1"]) for a in raw], subgroup_check=subgroup_check
        )
        (x, y), inf = cv.G1.to_affine(jac)
        g2s = [G2Point.from_json(a["g2"]) for a in raw[:2]]
        any_inf = bool(jnp.any(inf))
        return cls(x, y, inf if any_inf else None, g2s, len(raw))

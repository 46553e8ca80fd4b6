"""Polynomial over Fr and KZG evaluation proofs — parity with the reference's
``Polynomial`` / ``Evaluation`` (src/polynomial.rs), bulk math on TPU.

Coefficients live as ONE device array of Montgomery Fr limbs, shape (16, n)
ascending degree — not a list of scalars — so evaluation, subtraction,
synthetic division and the commit MSM are single batched device calls
(kzg_tpu.ops.poly / kzg_tpu.ops.msm) instead of the reference's per-coefficient
loops (src/polynomial.rs:112-123,150-195,207-214).

Semantics preserved exactly:
  - construction truncates trailing zero coefficients; the zero polynomial has
    an empty coefficient vector and degree() == 0 (src/polynomial.rs:55-100)
  - coefficient-count cap 2^32 - 1 (src/polynomial.rs:56-61)
  - divide_by_root rejects constant non-zero polynomials and non-roots via the
    rebuilt-constant-term check (src/polynomial.rs:159-192)
  - commit requires degree+1 <= len(setup artifacts) (src/polynomial.rs:201-205)
  - verify compares e(proof, sG2 - xG2) with e(C - yG1, G2) as full Fp12
    values (src/polynomial.rs:276-294)
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .ops.field import FR
from .ops import poly as polyops
from .ops import msm as msmops
from .ops import curve as cv
from .scalar import Scalar
from .curves import G1Point, G2Point
from .errors import ProtocolError

MAX_COEFFS = 2**32 - 1


class Polynomial:
    __slots__ = ("_coeffs",)

    def __init__(self, coeffs: jnp.ndarray):
        """coeffs: (16, n) Montgomery Fr limbs, ascending degree, already
        normalized (no trailing zero coefficient). Internal — use from_*."""
        self._coeffs = coeffs

    # -- constructors -----------------------------------------------------------

    @classmethod
    def from_ints(cls, values: list[int]) -> "Polynomial":
        """From i128-semantics integer coefficients (ascending degree)."""
        if len(values) > MAX_COEFFS:
            raise ProtocolError(
                f"Too many coefficients for polynomial, only 2**32 - 1 coefficients is supported. Got {len(values)}"
            )
        from .utils import hostmath as hm

        vals = [v % hm.R for v in values]
        # Reference normalization (src/polynomial.rs:63-72): truncate AFTER the
        # last non-zero index, which keeps exactly one zero coefficient for an
        # all-zero non-empty input (JSON byte parity depends on this).
        last = 0
        for i, v in enumerate(vals):
            if v != 0:
                last = i
        vals = vals[: last + 1]
        if not vals:
            return cls(FR.zeros(0))
        return cls(jnp.asarray(FR.many_to_limbs(vals)))

    @classmethod
    def from_scalars(cls, values: list[Scalar]) -> "Polynomial":
        if len(values) > MAX_COEFFS:
            raise ProtocolError(
                f"Too many coefficients for polynomial, only 2**32 - 1 coefficients is supported. Got {len(values)}"
            )
        return cls.from_ints([v.to_int() for v in values])

    @classmethod
    def from_constant(cls, a: Scalar) -> "Polynomial":
        """Order-0 polynomial; a zero constant yields the empty polynomial
        (src/polynomial.rs:78-89)."""
        if a.is_zero():
            return cls(FR.zeros(0))
        return cls.from_ints([a.to_int()])

    @classmethod
    def _from_mont_array(cls, coeffs: jnp.ndarray) -> "Polynomial":
        """Reference try_from normalization: truncate after the last non-zero
        coefficient (an all-zero non-empty array keeps one zero)."""
        arr = np.asarray(coeffs)
        if arr.shape[1] == 0:
            return cls(jnp.asarray(arr))
        nz = np.nonzero(np.any(arr != 0, axis=0))[0]
        last = int(nz[-1]) + 1 if nz.size else 1
        return cls(jnp.asarray(arr[:, :last]))

    # -- views -------------------------------------------------------------------

    @property
    def num_coefficients(self) -> int:
        return int(self._coeffs.shape[1])

    def degree(self) -> int:
        """One less than the coefficient count; 0 for the zero polynomial."""
        n = self.num_coefficients
        return n - 1 if n else 0

    def coefficients(self) -> list[Scalar]:
        return [Scalar._from_mont(self._coeffs[:, i]) for i in range(self.num_coefficients)]

    def coefficient_ints(self) -> list[int]:
        return FR.from_limbs_many(np.asarray(self._coeffs))

    @property
    def coeffs_mont(self) -> jnp.ndarray:
        """(16, n) Montgomery device array — the kernel-facing view."""
        return self._coeffs

    # -- algebra (device) ----------------------------------------------------------

    def evaluate(self, x: Scalar) -> "Evaluation":
        """P(x) on device (parallel powers + tree sum)."""
        n = self.num_coefficients
        result = polyops.evaluate(self._coeffs, x.mont, n)
        return Evaluation(point=x, result=Scalar._from_mont(result))

    def sub(self, other: "Polynomial") -> "Polynomial":
        """Coefficient-wise subtraction (zero-padded), renormalized."""
        a, b = self._coeffs, other._coeffs
        na, nb = a.shape[1], b.shape[1]
        n = max(na, nb)
        if na < n:
            a = jnp.concatenate([a, jnp.zeros((FR.L, n - na), jnp.uint32)], axis=1)
        if nb < n:
            b = jnp.concatenate([b, jnp.zeros((FR.L, n - nb), jnp.uint32)], axis=1)
        return Polynomial._from_mont_array(FR.sub(a, b))

    def divide_by_root(self, root: Scalar) -> "Polynomial":
        """Quotient of exact division by (x - root) — errors if root is not a
        root (rebuilt-constant-term check, src/polynomial.rs:183-192)."""
        n = self.num_coefficients
        if n == 0:
            return Polynomial(FR.zeros(0))
        if n == 1:
            # a lone zero coefficient is the zero polynomial (src/polynomial.rs:159-167)
            if not np.asarray(self._coeffs[:, 0]).any():
                return Polynomial(FR.zeros(0))
            raise ProtocolError("Unable to divide a constant polynomial")
        quotient, rebuilt = polyops.synthetic_divide(self._coeffs, root.mont, n)
        if not bool(np.array_equal(np.asarray(rebuilt), np.asarray(self._coeffs[:, 0]))):
            raise ProtocolError(
                "[divide_by_root] Fail to divide the polynomial by a root, constant terms do not add up"
            )
        return Polynomial._from_mont_array(quotient)

    def commit(self, setup_artifacts) -> G1Point:
        """Commitment MSM on device: C = sum_i a_i * (s^i G1)
        (reference hot loop src/polynomial.rs:207-214).

        Accepts either a list of SetupArtifact (reference parity) or a
        trusted_setup.DeviceSRS (device-resident bulk SRS, no host conversion).
        """
        n = self.num_coefficients
        if self.degree() + 1 > len(setup_artifacts):
            raise ProtocolError(
                "Setup does not allow for commitment generation of the polynomial. The polynomial degree is too high."
            )
        if n == 0:
            return G1Point.from_i128(0)
        scalars = FR.from_mont(self._coeffs)
        from .trusted_setup import DeviceSRS

        if isinstance(setup_artifacts, DeviceSRS):
            srs = setup_artifacts
            mask = srs.g1_inf[:n] if srs.g1_inf is not None else None
            if n >= msmops.FIXED_BASE_THRESHOLD:
                # precomputed window tables: the SRS is fixed across commits
                return G1Point(
                    msmops.msm_g1_fixed(srs.fixed_tables(), scalars, inf_mask=mask)
                )
            px, py = srs.g1_x[:, :n], srs.g1_y[:, :n]
            return G1Point(msmops.msm_g1((px, py), scalars, inf_mask=mask))
        xs, ys, infs = [], [], []
        for art in setup_artifacts[:n]:
            p = art.g1.affine()
            if p is None:
                xs.append(0); ys.append(0); infs.append(True)
            else:
                xs.append(p[0]); ys.append(p[1]); infs.append(False)
        px = jnp.asarray(cv.FP.many_to_limbs(xs))
        py = jnp.asarray(cv.FP.many_to_limbs(ys))
        mask = jnp.asarray(infs) if any(infs) else None
        return G1Point(msmops.msm_g1((px, py), scalars, inf_mask=mask))

    def evaluate_many(self, points: list[Scalar]) -> list["Evaluation"]:
        """P(x_j) for many points in ONE device program (batched powers +
        log-depth sums — the k-point analog of src/polynomial.rs:112-123)."""
        if not points:
            return []
        n = self.num_coefficients
        xs = jnp.stack([p.mont for p in points], axis=-1)  # (16, k)
        ys = polyops.evaluate_many(self._coeffs, xs, n)
        return [
            Evaluation(point=p, result=Scalar._from_mont(ys[:, j]))
            for j, p in enumerate(points)
        ]

    def evaluate_on_domain(self, k: int) -> list["Evaluation"]:
        """Evaluate on the full 2^k NTT domain [w^j] in one forward NTT —
        O(n log n) Fr ops total instead of O(n) per point (the degree-scaling
        evaluation engine; the reference recomputes x^i per term per point,
        src/polynomial.rs:112-123)."""
        from .ops import ntt as nttops
        from .utils import hostmath as hm

        if self.num_coefficients > (1 << k):
            raise ProtocolError("Polynomial degree exceeds the evaluation domain")
        evals = nttops.evaluate_on_domain(self._coeffs, k)
        dom = nttops.domain(k)
        return [
            Evaluation(point=Scalar.from_int(w), result=Scalar._from_mont(evals[:, j]))
            for j, w in enumerate(dom)
        ]

    # -- display --------------------------------------------------------------------

    def __str__(self) -> str:
        """"a_n x^n + ... + a_0" skipping zero terms (src/polynomial.rs:218-247)."""
        ints = self.coefficient_ints()
        if not ints:
            return "0"

        def term(c: int, deg: int) -> str:
            suffix = "" if deg == 0 else ("x" if deg == 1 else f"x^{deg}")
            return f"{c}{suffix}"

        n = len(ints)
        parts = [term(ints[n - 1], n - 1)]
        for i in range(n - 2, -1, -1):
            if ints[i] == 0:
                continue
            parts.append(term(ints[i], i))
        return " + ".join(parts)

    def __repr__(self) -> str:
        return f"Polynomial({self.coefficient_ints()})"

    def __eq__(self, other) -> bool:
        return isinstance(other, Polynomial) and self.coefficient_ints() == other.coefficient_ints()

    # -- serde -------------------------------------------------------------------------

    def to_json(self) -> dict:
        return {"coefficients": [list(v.to_bytes(32, "little")) for v in self.coefficient_ints()]}

    @classmethod
    def from_json(cls, data: dict) -> "Polynomial":
        coeffs = [Scalar.from_json(c) for c in data["coefficients"]]
        return cls.from_scalars(coeffs)


class Evaluation:
    """{point, result} evaluation record (src/polynomial.rs:249-295)."""

    __slots__ = ("point", "result")

    def __init__(self, point: Scalar, result: Scalar):
        self.point = point
        self.result = result

    def generate_proof(self, polynomial: Polynomial, setup_artifacts) -> G1Point:
        """pi = commit((P - y) / (x - point)) (src/polynomial.rs:260-269)."""
        return (
            polynomial.sub(Polynomial.from_constant(self.result))
            .divide_by_root(self.point)
            .commit(setup_artifacts)
        )

    def verify_proof(self, proof: G1Point, commitment: G1Point, setup_artifacts) -> bool:
        """e(proof, s G2 - x G2) == e(C - y G1, G2), both pairings in one
        batched device call (src/polynomial.rs:276-294).

        Routed through verify_proofs_batch so every verification in the
        process — single or batched — shares ONE compiled pairing program
        (the pairing is the most expensive compile in the framework; the
        batch dimension is padded to a fixed shape bucket)."""
        return verify_proofs_batch([proof], [commitment], [self], setup_artifacts)[0]

    def to_json(self) -> dict:
        return {"point": self.point.to_json(), "result": self.result.to_json()}

    @classmethod
    def from_json(cls, data: dict) -> "Evaluation":
        return cls(point=Scalar.from_json(data["point"]), result=Scalar.from_json(data["result"]))

    def __repr__(self):
        return f"Evaluation(point={self.point}, result={self.result})"


def _proofs_point_block(n: int, setup_artifacts) -> int:
    """Max points per device program: bounds the (16, n-1, kb) quotient-scan
    working set AND the composite-key MSM's pair count (16 * nt * kb)."""
    from .trusted_setup import DeviceSRS

    kb = max(1, (1 << 21) // max(1, n - 1))
    if isinstance(setup_artifacts, DeviceSRS):
        nt = 1 << max(6, (setup_artifacts.count - 1).bit_length())
        kb = min(kb, max(1, (1 << 22) // (16 * nt)))
    return kb


def generate_proofs_batch(polynomial: Polynomial, points: list[Scalar],
                          setup_artifacts) -> tuple[list[Evaluation], list[G1Point]]:
    """Commit-once, open-at-many-points: evaluations y_j = P(x_j) and opening
    proofs pi_j = commit((P - y_j)/(X - x_j)) for k points — the k synthetic
    divisions run as ONE batched associative scan and the k quotient MSMs run
    as ONE composite-key fixed-base bucket pass (ops.msm.msm_g1_fixed_many).

    Unbounded point counts: blocks of `_proofs_point_block` points run through
    one fixed-shape set of device programs (the tail block is padded by
    repeating the last point and sliced back), so memory stays bounded and no
    ragged-tail recompile is triggered — `evaluate --domain K` scales to 2^20
    domains.

    Per-item results match Evaluation.generate_proof exactly
    (src/polynomial.rs:260-269 semantics, batched)."""
    if not points:
        return [], []
    n = polynomial.num_coefficients
    kb = _proofs_point_block(n, setup_artifacts)
    if len(points) > kb:
        evs: list = []
        prs: list = []
        for lo in range(0, len(points), kb):
            blk = points[lo : lo + kb]
            npad = kb - len(blk)
            if npad:
                blk = blk + [blk[-1]] * npad
            e, p = generate_proofs_batch(polynomial, blk, setup_artifacts)
            evs.extend(e if not npad else e[: kb - npad])
            prs.extend(p if not npad else p[: kb - npad])
        return evs, prs
    if polynomial.degree() + 1 > len(setup_artifacts):
        raise ProtocolError(
            "Setup does not allow for commitment generation of the polynomial. The polynomial degree is too high."
        )
    if n <= 1:
        # constant / zero polynomial: P - P(x) is the zero polynomial; its
        # quotient is zero and the proof is the identity (reference semantics:
        # sub yields the empty polynomial, divide_by_root returns it).
        evs = polynomial.evaluate_many(points) if n else [
            Evaluation(point=p, result=Scalar.from_int(0)) for p in points
        ]
        return evs, [G1Point.from_i128(0) for _ in points]

    from .trusted_setup import DeviceSRS

    xs = jnp.stack([p.mont for p in points], axis=-1)  # (16, k)
    quotients, rems = polyops.synthetic_divide_many(polynomial.coeffs_mont, xs, n)
    evs = [
        Evaluation(point=p, result=Scalar._from_mont(rems[:, j]))
        for j, p in enumerate(points)
    ]
    scalars = FR.from_mont(quotients)  # (16, n-1, k) standard-form

    if isinstance(setup_artifacts, DeviceSRS) and (
        n - 1 >= msmops.FIXED_BASE_THRESHOLD
        # the composite-key bucket pass amortizes its fixed cost across the k
        # MSMs, so it also wins for small degrees once the BATCH is large
        or (n - 1) * len(points) >= msmops.FIXED_BASE_THRESHOLD
    ):
        # one composite-key bucket pass for all k quotient MSMs
        jac = msmops.msm_g1_fixed_many(setup_artifacts.fixed_tables(), scalars)
        proofs = [G1Point(tuple(c[:, j] for c in jac)) for j in range(len(points))]
        return evs, proofs
    # small-degree / artifact-list path: per-point MSMs through the standard
    # commit kernels (k warm reuses of one compiled program)
    proofs = [
        Polynomial._from_mont_array(quotients[:, :, j]).commit(setup_artifacts)
        for j in range(len(points))
    ]
    return evs, proofs


def verify_proofs_batch(proofs, commitments, evaluations, setup_artifacts) -> list[bool]:
    """Verify MANY evaluation proofs in ONE batched device pairing program —
    the TPU-native serving shape (single-proof latency is pairing-depth-bound;
    throughput comes from batching: 2V pairings share every Miller-loop and
    final-exponentiation step).

    Semantics per item match Evaluation.verify_proof exactly.
    """
    from .ops import curve as cvo
    from .ops import pairing as devpair
    from .trusted_setup import DeviceSRS
    from .utils import hostmath as hm

    if len(setup_artifacts) < 2:
        raise ProtocolError("At least 2 setup artifacts are required for verification")
    v = len(proofs)
    if not (len(commitments) == len(evaluations) == v):
        raise ProtocolError("proofs/commitments/evaluations length mismatch")
    if v == 0:
        return []
    # Pad the batch to a power-of-two bucket (>= 4) by repeating item 0, so
    # every batch size in a bucket reuses ONE compiled pairing program (the
    # pairing compile is minutes cold; padded lanes are sliced off below).
    vp = max(4, 1 << (v - 1).bit_length())
    if vp != v:
        proofs = list(proofs) + [proofs[0]] * (vp - v)
        commitments = list(commitments) + [commitments[0]] * (vp - v)
        evaluations = list(evaluations) + [evaluations[0]] * (vp - v)
    s_g2 = (
        setup_artifacts.g2[1]
        if isinstance(setup_artifacts, DeviceSRS)
        else setup_artifacts[1].g2
    )

    xs = jnp.stack([ev.point.std_limbs() for ev in evaluations], axis=-1)  # (16, V)
    ys = jnp.stack([ev.result.std_limbs() for ev in evaluations], axis=-1)

    from .ops import genmul

    # lhs G2 inputs: s*G2 - x*G2 (generator-table mults, batched over V)
    x_g2 = genmul.mul_g2_gen(xs)
    s_jac = tuple(cvo.JacobianCurve.lift(c, x_g2[0].ndim) for c in s_g2.jac)
    lhs_g2 = cvo.G2.add(tuple(jnp.broadcast_to(c, o.shape) for c, o in zip(s_jac, x_g2)),
                        cvo.G2.neg(x_g2))
    # rhs G1 inputs: C - y*G1
    y_g1 = genmul.mul_g1_gen(ys)
    c_jac = tuple(jnp.stack([cm.jac[k] for cm in commitments], axis=-1) for k in range(3))
    rhs_g1 = cvo.G1.add(c_jac, cvo.G1.neg(y_g1))
    p_jac = tuple(jnp.stack([pf.jac[k] for pf in proofs], axis=-1) for k in range(3))

    # batch both pairing sides: lanes [0, Vp) = lhs pairing, [Vp, 2Vp) = rhs pairing
    g1_all = tuple(jnp.concatenate([a, b], axis=-1) for a, b in zip(p_jac, rhs_g1))
    g2_gen = cvo.g2_to_device([hm.G2_GEN] * vp, batch=True)
    g2_all = tuple(jnp.concatenate([a, b], axis=-1) for a, b in zip(lhs_g2, g2_gen))

    (g1x, g1y), g1inf = cvo.G1.to_affine(g1_all)
    (g2x, g2y), g2inf = cvo.G2.to_affine(g2_all)
    out = devpair.pairing((g1x, g1y), g1inf, (g2x, g2y), g2inf)

    # stack the fp12 coefficient tree -> (L, 2, 3, 2, 2Vp); compare lane i vs Vp+i
    flat = jnp.stack([jnp.stack(c6, axis=2) for c6 in out], axis=3)
    eq = jnp.all(flat[..., :vp] == flat[..., vp:], axis=tuple(range(flat.ndim - 1)))
    return [bool(b) for b in np.asarray(eq)[:v]]

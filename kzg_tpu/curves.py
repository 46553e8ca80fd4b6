"""BLS12-381 group types — parity with the reference's ``G1Point`` /
``G2Point`` / ``bilinear_map`` (src/curves.rs), arithmetic on TPU.

Points wrap device Jacobian triples (Montgomery-form limb arrays); the group
law and scalar multiplication run through ``kzg_tpu.ops.curve``. Compression
follows the ZCash convention like blst (48-byte G1 / 96-byte G2; reference
src/curves.rs:99-110,259-343) and happens at the host IO boundary.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .ops import curve as cv
from .ops.field import FR
from .utils import hostmath as hm
from .scalar import Scalar
from .errors import SerializationError


class _PointBase:
    __slots__ = ("_jac", "_affine")

    _curve = None  # JacobianCurve
    _gen_dev = None  # affine device generator

    def __init__(self, jac, _affine=None):
        self._jac = jac
        self._affine = _affine  # lazily-cached host affine ints (None = inf)

    # -- constructors ----------------------------------------------------------

    @classmethod
    def from_scalar(cls, scalar: Scalar):
        """scalar * generator — the reference's 256-bit fixed-base mult
        (src/curves.rs:50-61 / 225-236), via the precomputed generator window
        tables (ops.genmul: 32 gathers + log-depth adds, not a 256-step ladder)."""
        from .ops import genmul

        k = scalar.std_limbs()
        return cls(genmul.mul_gen_auto(cls._curve, k))

    @classmethod
    def from_i128(cls, value: int):
        """value * generator with i128 sign semantics (src/curves.rs:28-45).

        0 and ±1 short-circuit to the known affine points (no device ladder).
        """
        if value == 0:
            return cls.from_affine(None)
        if value == 1:
            return cls.from_affine(cls._gen_affine)
        return cls.from_scalar(Scalar.from_i128(value))

    # -- group ops (device) ------------------------------------------------------

    def add(self, other):
        return type(self)(self._curve.add(self._jac, other._jac))

    def sub(self, other):
        return type(self)(self._curve.sub(self._jac, other._jac))

    def mult(self, scalar: Scalar):
        """Variable-base scalar multiplication (reference src/curves.rs:90-96)."""
        return type(self)(self._curve.mul_scalar(self._jac, scalar.std_limbs()))

    def neg(self):
        return type(self)(self._curve.neg(self._jac))

    def is_infinity(self) -> bool:
        return self.affine() is None

    def __eq__(self, other) -> bool:
        return isinstance(other, type(self)) and self.affine() == other.affine()

    def __hash__(self):
        return hash((type(self).__name__, self.affine()))

    # -- host views ---------------------------------------------------------------

    @property
    def jac(self):
        """Device Jacobian triple — the kernel-facing view."""
        return self._jac


class G1Point(_PointBase):
    _curve = cv.G1
    _gen_dev = cv.G1_GEN_DEV
    _gen_affine = hm.G1_GEN

    def affine(self):
        if self._affine is None:
            self._affine = (cv.g1_from_device(self._jac),)
        return self._affine[0]

    @classmethod
    def from_affine(cls, p) -> "G1Point":
        """Host affine ints (x, y) or None -> device point."""
        return cls(cv.g1_to_device(p), (p,))

    def compress(self) -> bytes:
        return hm.g1_compress(self.affine())

    @classmethod
    def decompress(cls, data: bytes) -> "G1Point":
        try:
            p = hm.g1_decompress(bytes(data))
        except ValueError as e:
            raise SerializationError(str(e)) from e
        return cls.from_affine(p)

    def to_json(self) -> list[int]:
        return list(self.compress())

    @classmethod
    def from_json(cls, data) -> "G1Point":
        if not isinstance(data, list) or len(data) != 48:
            raise SerializationError(
                f"Invalid byte array, expected length 48, got {len(data) if isinstance(data, list) else type(data)}"
            )
        return cls.decompress(bytes(data))

    def __repr__(self):
        return f"G1Point({self.affine()})"


class G2Point(_PointBase):
    _curve = cv.G2
    _gen_dev = cv.G2_GEN_DEV
    _gen_affine = hm.G2_GEN

    def affine(self):
        if self._affine is None:
            self._affine = (cv.g2_from_device(self._jac),)
        return self._affine[0]

    @classmethod
    def from_affine(cls, p) -> "G2Point":
        return cls(cv.g2_to_device(p), (p,))

    def compress(self) -> bytes:
        return hm.g2_compress(self.affine())

    @classmethod
    def decompress(cls, data: bytes) -> "G2Point":
        try:
            p = hm.g2_decompress(bytes(data))
        except ValueError as e:
            raise SerializationError(str(e)) from e
        return cls.from_affine(p)

    def to_json(self) -> list[int]:
        return list(self.compress())

    @classmethod
    def from_json(cls, data) -> "G2Point":
        if not isinstance(data, list) or len(data) != 96:
            raise SerializationError(
                f"Invalid byte array, expected length 96, got {len(data) if isinstance(data, list) else type(data)}"
            )
        return cls.decompress(bytes(data))

    def __repr__(self):
        return f"G2Point({self.affine()})"


def bilinear_map(p1: G1Point, p2: G2Point):
    """CANONICAL reduced optimal ate pairing e(P, Q) -> Fp12 (reference
    src/curves.rs:355-371: blst_miller_loop + blst_final_exp over (G2, G1)
    affines). Values are bit-identical to blst's — external comparisons
    against other BLS12-381 stacks match.

    Runs the device Miller loop + final exponentiation when available; the
    host oracle is the fallback (and the test cross-check).
    """
    from .ops import pairing as devpair

    return devpair.pairing_points(p1, p2)

"""Fr scalar type — functional parity with the reference's ``Scalar``
(src/scalar.rs), arithmetic executed by the TPU Fr kernels.

A ``Scalar`` wraps a (16,)-limb Montgomery-form device array. Construction and
IO codecs (i128 semantics, LE/BE bytes, base-10 display, JSON = 32 LE bytes)
run at the host boundary; add/sub/mul/neg/pow run on device via
``kzg_tpu.ops.field.FR`` (batched under the hood by the polynomial layer).

Reference parity notes:
  - ``from_i128``: negative (and zero) inputs map to ``r - |v|`` via the
    modulus (src/scalar.rs:27-48) — arithmetically ``v mod r``.
  - ``pow`` matches src/scalar.rs:122-187 (value-wise: plain exponentiation).
  - Serde: a Scalar serializes as a JSON array of its 32 LE bytes
    (src/scalar.rs:226-275), deserialization length-checks == 32.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .ops.field import FR
from .ops import limbs as lb
from .utils import hostmath as hm
from .errors import KzgError


class Scalar:
    __slots__ = ("_mont", "_int")

    def __init__(self, mont: jnp.ndarray, _int: int | None = None):
        self._mont = mont
        self._int = _int  # lazily-cached canonical integer value

    # -- constructors ---------------------------------------------------------

    @classmethod
    def from_int(cls, value: int) -> "Scalar":
        v = value % hm.R
        return cls(jnp.asarray(FR.to_limbs(v)), v)

    @classmethod
    def from_i128(cls, value: int) -> "Scalar":
        """i128 semantics of the reference (negatives map to r - |v|)."""
        if not (-(2**127) <= value <= 2**127 - 1):
            raise KzgError(f"Value out of i128 range: {value}")
        return cls.from_int(value)

    @classmethod
    def from_le_bytes(cls, b: bytes | list[int]) -> "Scalar":
        b = bytes(b)
        if len(b) != 32:
            raise KzgError(f"Invalid byte array, expected length 32, got {len(b)}")
        return cls.from_int(int.from_bytes(b, "little"))

    @classmethod
    def from_be_bytes(cls, b: bytes | list[int]) -> "Scalar":
        b = bytes(b)
        if len(b) != 32:
            raise KzgError(f"Invalid byte array, expected length 32, got {len(b)}")
        return cls.from_int(int.from_bytes(b, "big"))

    @classmethod
    def _from_mont(cls, mont: jnp.ndarray) -> "Scalar":
        return cls(mont)

    # -- host-side views -------------------------------------------------------

    def to_int(self) -> int:
        if self._int is None:
            self._int = FR.from_limbs(np.asarray(self._mont))
        return self._int

    def to_le_bytes(self) -> bytes:
        return self.to_int().to_bytes(32, "little")

    def to_be_bytes(self) -> bytes:
        return self.to_int().to_bytes(32, "big")

    @property
    def mont(self) -> jnp.ndarray:
        """Montgomery-form device limbs (16,) — the kernel-facing view."""
        return self._mont

    def std_limbs(self) -> jnp.ndarray:
        """Standard-form limbs (16,) — scalar-multiplication exponent view."""
        return FR.from_mont(self._mont)

    # -- arithmetic (device) ----------------------------------------------------

    def mul(self, other: "Scalar") -> "Scalar":
        return Scalar._from_mont(FR.mul(self._mont, other._mont))

    def add(self, other: "Scalar") -> "Scalar":
        return Scalar._from_mont(FR.add(self._mont, other._mont))

    def sub(self, other: "Scalar") -> "Scalar":
        return Scalar._from_mont(FR.sub(self._mont, other._mont))

    def neg(self) -> "Scalar":
        return Scalar._from_mont(FR.neg(self._mont))

    def pow(self, n: int) -> "Scalar":
        """self^n for a non-negative machine integer n (src/scalar.rs:122-187)."""
        if n == 0:
            return Scalar.from_int(1)
        if n == 1:
            return self
        return Scalar._from_mont(FR.pow_small(self._mont, int(n)))

    def is_zero(self) -> bool:
        return self.to_int() == 0

    # -- dunder sugar -----------------------------------------------------------

    def __eq__(self, other) -> bool:
        return isinstance(other, Scalar) and self.to_int() == other.to_int()

    def __hash__(self):
        return hash(self.to_int())

    def __repr__(self) -> str:
        return f"Scalar({self.to_int()})"

    def __str__(self) -> str:
        """Base-10 rendering (reference Display, src/scalar.rs:277-341)."""
        return str(self.to_int())

    # -- serde (JSON array of 32 LE bytes) ---------------------------------------

    def to_json(self) -> list[int]:
        return list(self.to_le_bytes())

    @classmethod
    def from_json(cls, data) -> "Scalar":
        if not isinstance(data, list):
            raise KzgError("Sequence of u8 expected for Scalar")
        if len(data) != 32:
            raise KzgError(f"Invalid byte array, expected length 32, got {len(data)}")
        return cls.from_le_bytes(data)

"""Generic Montgomery prime-field arithmetic over limb-major uint32 arrays.

A ``Field`` instance bakes all modulus-derived constants (computed exactly with
Python ints at construction, embedded as XLA constants at trace time) and exposes
batched, branchless field ops. Multiplication uses full-width Montgomery REDC:

    t = a*b                      (schoolbook wide mul, 2L limbs)
    m = (t mod R) * N' mod R     (low mul)
    out = (t + m*N) / R          (wide mul + add + shift), cond-subtract N

Unlike word-serial CIOS, every step is a fully vectorized tensor op with no
data-dependent carries inside the multiply, which keeps traces tiny and maps the
whole batch onto the VPU lanes. This is the TPU-native replacement for blst's
Fr/Fp assembly (reference src/scalar.rs:111-117 and src/curves.rs FFI sites).

All stored values are canonical (< modulus) u16 limbs in Montgomery form unless a
function says otherwise.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from . import limbs as lb


_PALLAS_MIN_BATCH = 64  # below this, launch overhead beats the fusion win
_PALLAS_BLOCK = 512
_PALLAS_SMALL_BLOCK = 128  # latency-bound shapes (e.g. the pairing towers)
_USE_PALLAS: bool | None = None


def _use_pallas() -> bool:
    """Route multiplies through the fused Pallas kernel on TPU backends
    (KZG_TPU_NO_PALLAS=1 disables; CPU/test meshes use the XLA path)."""
    global _USE_PALLAS
    if _USE_PALLAS is None:
        import os

        if os.environ.get("KZG_TPU_NO_PALLAS"):
            _USE_PALLAS = False
        else:
            try:
                _USE_PALLAS = jax.default_backend() in ("tpu", "axon")
            except Exception:
                _USE_PALLAS = False
    return _USE_PALLAS


def jitmethod(*, static_argnums=()):
    """Per-instance jit cache for Field methods.

    Eager per-op dispatch is a non-starter on remote-tunneled TPU backends, so every
    public field op is jitted at the method boundary; under an enclosing jit these
    simply inline.
    """

    def deco(fn):
        name = fn.__name__

        @functools.wraps(fn)
        def wrapper(self, *args):
            # Inside an enclosing trace, call straight through (no nested pjit —
            # keeps jaxprs flat so XLA fuses across ops).
            if any(isinstance(a, jax.core.Tracer) for a in args):
                return fn(self, *args)
            cache = self.__dict__.setdefault("_jit_cache", {})
            f = cache.get(name)
            if f is None:
                f = jax.jit(functools.partial(fn, self), static_argnums=static_argnums)
                cache[name] = f
            return f(*args)

        wrapper.__wrapped_raw__ = fn
        return wrapper

    return deco


class Field:
    def __init__(self, modulus: int, n_limbs: int, name: str):
        if modulus >= 1 << (16 * n_limbs):
            raise ValueError("modulus does not fit in n_limbs base-2^16 digits")
        self.name = name
        self.modulus = modulus
        self.L = n_limbs
        self.R_int = 1 << (16 * n_limbs)
        self.R2_int = self.R_int * self.R_int % modulus
        # N' = -N^{-1} mod R (full width, for single-shot REDC)
        self.n_prime_int = (-pow(modulus, -1, self.R_int)) % self.R_int

        self.N = lb.int_to_limbs(modulus, n_limbs)
        self.NP = lb.int_to_limbs(self.n_prime_int, n_limbs)
        self.R2 = lb.int_to_limbs(self.R2_int, n_limbs)
        self.ZERO = np.zeros(n_limbs, np.uint32)
        self.ONE_MONT = lb.int_to_limbs(self.R_int % modulus, n_limbs)

    # -- host conversions ---------------------------------------------------

    def to_limbs(self, value: int) -> np.ndarray:
        """Python int -> canonical Montgomery limbs (host-side, exact)."""
        return lb.int_to_limbs(value % self.modulus * self.R_int % self.modulus, self.L)

    def to_limbs_std(self, value: int) -> np.ndarray:
        """Python int -> canonical *standard-form* limbs (no Montgomery factor)."""
        return lb.int_to_limbs(value % self.modulus, self.L)

    def many_to_limbs(self, values) -> np.ndarray:
        """Iterable of ints -> (L, n) Montgomery limbs."""
        return lb.ints_to_limbs([v % self.modulus * self.R_int % self.modulus for v in values], self.L)

    def from_limbs(self, limbs) -> int:
        """Montgomery limbs (L,) -> python int (host-side)."""
        return lb.limbs_to_int(np.asarray(limbs)) * pow(self.R_int, -1, self.modulus) % self.modulus

    def from_limbs_many(self, limbs) -> list[int]:
        rinv = pow(self.R_int, -1, self.modulus)
        return [v * rinv % self.modulus for v in lb.limbs_to_ints(limbs)]

    # -- shape helpers --------------------------------------------------------

    def zeros(self, *batch) -> jnp.ndarray:
        return jnp.zeros((self.L,) + tuple(batch), jnp.uint32)

    def const(self, arr: np.ndarray, ref: jnp.ndarray) -> jnp.ndarray:
        return lb.bcast_const(arr, ref)

    def one(self, ref: jnp.ndarray | None = None) -> jnp.ndarray:
        """Montgomery one, batch-rank-matched to `ref` if given."""
        c = jnp.asarray(self.ONE_MONT)
        return c if ref is None else lb.bcast_const(self.ONE_MONT, ref)

    # -- core ops (all branchless, batched) ----------------------------------

    def _cond_sub_n(self, x: jnp.ndarray, extra: jnp.ndarray) -> jnp.ndarray:
        """Reduce x + extra*2^(16L) (< 2N) to canonical form."""
        d, borrow = lb.sub_borrow(x, self.const(self.N, x))
        take = jnp.logical_or(extra > 0, borrow == 0)
        return lb.select(take, d, x)

    def _carry_cond_sub(self, cols: jnp.ndarray, keep: int) -> jnp.ndarray:
        """Normalize accumulation columns and conditionally subtract N —
        log-depth: one parallel carry circuit + one complement subtract.
        `keep` = how many trailing limbs form the result (value < 2N before
        the subtraction). Assumes every column < 2^32 - 2^16."""
        limbs, carry = lb.carry_reduce(cols)
        hi = limbs[-keep:]
        d, borrow = lb.sub_borrow(hi, self.const(self.N, hi))
        take = jnp.logical_or(carry > 0, borrow == 0)
        return lb.select(take, d, hi)

    @jitmethod()
    def add(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        a, b = lb.align(a, b)
        return self._carry_cond_sub(a + b, self.L)

    @jitmethod()
    def sub(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        d, borrow = lb.sub_borrow(a, b)
        dn, _ = lb.carry_reduce(d + self.const(self.N, d))
        return lb.select(borrow == 0, d, dn)

    @jitmethod()
    def neg(self, a: jnp.ndarray) -> jnp.ndarray:
        return self.sub(self.const(self.ZERO, a), a)

    @jitmethod()
    def dbl(self, a: jnp.ndarray) -> jnp.ndarray:
        return self.add(a, a)

    @jitmethod()
    def half(self, a: jnp.ndarray) -> jnp.ndarray:
        """a / 2 (exact in the field): shift right, adding N first when odd."""
        odd = (a[0] & 1) == 1
        t = a + jnp.where(odd[None], self.const(self.N, a), self.const(self.ZERO, a))
        limbs_, carry = lb.carry_reduce(t)
        nxt = jnp.concatenate([limbs_[1:], carry[None]], axis=0)
        return (limbs_ >> 1) | ((nxt & 1) << 15)

    def redc(self, t: jnp.ndarray) -> jnp.ndarray:
        """Montgomery reduction of a 2L-limb value t < N*R -> canonical t/R mod N."""
        m = lb.mul_low(t[: self.L], self.const(self.NP, t))
        u = lb.mul_wide(m, self.const(self.N, m))
        t, u = lb.align(t, u)
        return self._carry_cond_sub(t + u, self.L)

    @jitmethod()
    def mul(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        if _use_pallas():
            a, b = lb.align(a, b)
            shape = jnp.broadcast_shapes(a.shape, b.shape)
            batch = int(np.prod(shape[1:], dtype=np.int64)) if len(shape) > 1 else 1
            if batch >= _PALLAS_MIN_BATCH:
                from . import pallas_field as pf

                block = _PALLAS_BLOCK if batch >= _PALLAS_BLOCK else _PALLAS_SMALL_BLOCK
                a = jnp.broadcast_to(a, shape).reshape(self.L, batch)
                b = jnp.broadcast_to(b, shape).reshape(self.L, batch)
                pad = (-batch) % block
                if pad:
                    a = jnp.pad(a, [(0, 0), (0, pad)])
                    b = jnp.pad(b, [(0, 0), (0, pad)])
                out = pf.mont_mul_pallas(a, b, self.modulus, self.n_prime_int, self.L, block)
                return out[:, :batch].reshape(shape)
        return self.redc(lb.mul_wide(a, b))

    @jitmethod()
    def square(self, a: jnp.ndarray) -> jnp.ndarray:
        return self.mul(a, a)

    @jitmethod()
    def to_mont(self, a: jnp.ndarray) -> jnp.ndarray:
        """Standard-form limbs -> Montgomery form."""
        return self.mul(a, self.const(self.R2, a))

    @jitmethod()
    def from_mont(self, a: jnp.ndarray) -> jnp.ndarray:
        """Montgomery form -> standard-form limbs (canonical)."""
        pad = jnp.zeros_like(a)
        return self.redc(jnp.concatenate([a, pad], axis=0))

    # -- predicates -----------------------------------------------------------

    @jitmethod()
    def is_zero(self, a: jnp.ndarray) -> jnp.ndarray:
        return jnp.all(a == 0, axis=0)

    @jitmethod()
    def eq(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        a, b = lb.align(a, b)
        return jnp.all(a == b, axis=0)

    def select(self, mask: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        return lb.select(mask, a, b)

    # -- exponentiation -------------------------------------------------------

    @jitmethod(static_argnums=(1,))
    def pow_const(self, a: jnp.ndarray, e: int) -> jnp.ndarray:
        """a^e for a *static* python-int exponent, via an on-device bit loop.

        The exponent bits are an embedded constant array; the loop body (one
        square + one select-mul) is traced once and run by lax.fori_loop, so the
        trace stays small even for 381-bit exponents (used for inversion).
        """
        if e == 0:
            return jnp.broadcast_to(self.one(a), a.shape)
        nbits = e.bit_length()
        bits = np.array([(e >> i) & 1 for i in range(nbits)], np.uint32)

        def body(i, state):
            acc, base = state
            bit = jnp.asarray(bits)[i]
            new_acc = self.select(bit == 1, self.mul(acc, base), acc)
            new_base = self.square(base)
            return new_acc, new_base

        acc0 = jnp.broadcast_to(self.one(a), a.shape)
        acc, _ = lax.fori_loop(0, nbits, body, (acc0, a))
        return acc

    @jitmethod()
    def inv(self, a: jnp.ndarray) -> jnp.ndarray:
        """Field inverse via Fermat (a^(N-2)); inv(0) = 0."""
        return self.pow_const(a, self.modulus - 2)

    @jitmethod(static_argnums=(1,))
    def inv_batch(self, a: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
        """Batched inversion via the Montgomery trick, parallel-prefix form:
        inv(a_i) = prefix_{i-1} * suffix_{i+1} * inv(total) — two associative
        scans (2 log N batched multiplies) + ONE Fermat inversion, vs the ~760
        multiplies per lane of plain Fermat. Zero lanes map to zero (they are
        replaced by 1 in the products and masked at the end)."""
        ax = axis % a.ndim
        assert ax >= 1, "axis 0 is the limb axis"
        zero = jnp.all(a == 0, axis=0)
        one = self.one(a)
        safe = lb.select(zero, jnp.broadcast_to(one, a.shape), a)
        pre = lax.associative_scan(lambda x, y: self.mul(x, y), safe, axis=ax)
        suf = lax.associative_scan(lambda x, y: self.mul(x, y), safe, axis=ax, reverse=True)
        total_inv = self.inv(lax.index_in_dim(pre, -1, axis=ax, keepdims=True))
        n = a.shape[ax]
        pad = [(0, 0)] * a.ndim
        pad[ax] = (1, 0)
        pre_shift = lax.slice_in_dim(jnp.pad(pre, pad), 0, n, axis=ax)  # prefix_{i-1}, 0-padded
        pad[ax] = (0, 1)
        suf_shift = lax.slice_in_dim(jnp.pad(suf, pad), 1, n + 1, axis=ax)  # suffix_{i+1}
        # replace the zero-padding at the ends with Montgomery one
        idx = lax.broadcasted_iota(jnp.int32, a.shape[1:], ax - 1)
        pre_shift = lb.select(idx == 0, jnp.broadcast_to(one, a.shape), pre_shift)
        suf_shift = lb.select(idx == n - 1, jnp.broadcast_to(one, a.shape), suf_shift)
        out = self.mul(self.mul(pre_shift, suf_shift), total_inv)
        return lb.select(zero, jnp.zeros_like(out), out)

    @jitmethod(static_argnums=(1,))
    def pow_small(self, a: jnp.ndarray, e: int) -> jnp.ndarray:
        """a^e for a static exponent; unrolled when the chain is short, else the
        fori-loop path (keeps compile time bounded for any e)."""
        if e == 0:
            return jnp.broadcast_to(self.one(a), a.shape)
        if e.bit_length() + e.bit_count() > 16:
            return self.pow_const.__wrapped_raw__(self, a, e)
        result = None
        base = a
        while e:
            if e & 1:
                result = base if result is None else self.mul(result, base)
            e >>= 1
            if e:
                base = self.square(base)
        return result


# ---------------------------------------------------------------------------
# The two BLS12-381 fields
# ---------------------------------------------------------------------------

from ..utils.hostmath import P as _P, R as _R  # noqa: E402

FP = Field(_P, 24, "Fp")  # 381-bit base field, 24 limbs
FR = Field(_R, 16, "Fr")  # 255-bit scalar field, 16 limbs

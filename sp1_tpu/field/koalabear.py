"""KoalaBear prime field (p = 2^31 - 2^24 + 1) arithmetic for TPU.

Device representation: Montgomery form with R = 2^32, stored as uint32 jax
arrays. All operations are built from 32-bit integer ops only (multiply,
add, shift, compare), so the exact same code runs inside Pallas TPU kernels
(VPU int32 lanes) and in plain jit-compiled jnp code, and produces identical
results on the CPU backend used for tests.

The parameters match the reference zkVM's field configuration
(reference: crates/primitives/src/lib.rs:28 `SP1Field = KoalaBear`;
sp1-gpu/crates/sys/include/fields/kb31_t.cuh MOD/MONTY constants), because
proof byte-compatibility requires the same field. The implementation is
original: the 64-bit-free Montgomery pipeline below is designed for TPU VPU
lanes (no native 64-bit multiply), using 16-bit limb products with explicit
carry recovery rather than the reference's PTX mad.wide sequences.

Conventions:
  * "monty" values: uint32 arrays holding x*R mod p, always < p.
  * "canonical" values: uint32 arrays holding x < p.
  * Python-int helpers (suffix `_i`) for host-side constant computation.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Constants
# ---------------------------------------------------------------------------

P = 0x7F000001  # 2^31 - 2^24 + 1
P_U32 = np.uint32(P)
MONTY_BITS = 32
R1 = (1 << 32) % P  # R mod p          = 33554430
R2 = (R1 * R1) % P  # R^2 mod p        = 402124772
NINV = ((1 << 32) - pow(P, -1, 1 << 32)) % (1 << 32)  # -p^-1 mod 2^32 = p-2
TWO_ADICITY = 24
MULTIPLICATIVE_GENERATOR = 3
# Generator of the order-2^24 subgroup.
TWO_ADIC_GENERATOR = pow(3, (P - 1) >> TWO_ADICITY, P)

_U16_MASK = 0xFFFF


def _u32(x):
    return jnp.asarray(x, dtype=jnp.uint32)


# ---------------------------------------------------------------------------
# Python-int reference helpers (host-side constants, tests)
# ---------------------------------------------------------------------------

def to_monty_i(x: int) -> int:
    return (x << 32) % P


def from_monty_i(x: int) -> int:
    return (x * pow(1 << 32, -1, P)) % P


def mul_i(a: int, b: int) -> int:
    return a * b % P


def inv_i(a: int) -> int:
    return pow(a, P - 2, P)


# ---------------------------------------------------------------------------
# 32-bit building blocks (work on jnp or np uint32 arrays)
# ---------------------------------------------------------------------------

def mulhi32(a, b):
    """High 32 bits of the 64-bit product of two uint32 arrays.

    Uses 16-bit limb partial products; `mid` carry is recovered with an
    unsigned wrap-around compare, so the result is exact for all inputs.
    """
    a_lo = a & _U16_MASK
    a_hi = a >> 16
    b_lo = b & _U16_MASK
    b_hi = b >> 16
    ll = a_lo * b_lo
    lh = a_lo * b_hi
    hl = a_hi * b_lo
    hh = a_hi * b_hi
    mid = lh + (ll >> 16)          # <= (2^16-1)*(2^16-1) + 2^16 - 1 < 2^32
    mid2 = mid + hl                # may wrap
    carry = (mid2 < mid).astype(mid2.dtype) << 16
    return hh + (mid2 >> 16) + carry


def monty_reduce_pair(hi, lo):
    """Montgomery reduction of the 64-bit value hi*2^32 + lo (< p*2^32).

    Returns (hi*2^32 + lo) * 2^-32 mod p, in [0, p).
    """
    m = lo * np.uint32(NINV)                     # wrapping low-32 product
    mp_hi = mulhi32(m, _u32(P))
    # low 32 bits of x + m*p are zero by construction; the carry out of the
    # low word is 1 exactly when lo != 0.
    carry = (lo != 0).astype(lo.dtype)
    t = hi + mp_hi + carry
    return jnp.where(t >= P_U32, t - P_U32, t)


def mul(a, b):
    """Montgomery product of two monty-form uint32 arrays (< p)."""
    lo = a * b                                   # wrapping low 32 bits
    hi = mulhi32(a, b)
    return monty_reduce_pair(hi, lo)


def add(a, b):
    s = a + b
    return jnp.where(s >= P_U32, s - P_U32, s)


def sub(a, b):
    return jnp.where(a >= b, a - b, a + P_U32 - b)


def neg(a):
    return jnp.where(a == 0, a, P_U32 - a)


def double(a):
    return add(a, a)


def cmul(a, c: int):
    """Multiply monty array by a canonical Python-int constant."""
    return mul(a, _u32(to_monty_i(c % P)))


def to_monty(x):
    """Canonical uint32 array -> monty form."""
    x = _u32(x)
    return mul(x, _u32(R2))


def from_monty(x):
    """Monty-form uint32 array -> canonical."""
    x = _u32(x)
    return monty_reduce_pair(jnp.zeros_like(x), x)


def pow_const(a, e: int):
    """a^e for monty array a, Python-int exponent (square and multiply)."""
    result = jnp.full_like(a, np.uint32(to_monty_i(1)))
    base = a
    while e > 0:
        if e & 1:
            result = mul(result, base)
        base = mul(base, base)
        e >>= 1
    return result


def inv(a):
    """Elementwise inverse (a must be nonzero); a^(p-2)."""
    return pow_const(a, P - 2)


def cube(a):
    return mul(mul(a, a), a)


# ---------------------------------------------------------------------------
# NumPy host mirror (canonical form, uint64 intermediates). Used by the
# Fiat-Shamir challenger and test oracles; must agree with the device path.
# ---------------------------------------------------------------------------

class npf:
    """Canonical-form field ops over numpy uint32 arrays (host side)."""

    P = P

    @staticmethod
    def asarray(x):
        return np.asarray(x, dtype=np.uint32)

    @staticmethod
    def add(a, b):
        # int64 intermediates: numpy's uint64 kernels are scalar (no SIMD)
        # on this target; int64 is ~20-40x faster and 2^62-safe here.
        s = a.astype(np.int64) + b.astype(np.int64)
        return (s % P).astype(np.uint32)

    @staticmethod
    def sub(a, b):
        s = a.astype(np.int64) + P - b.astype(np.int64)
        return (s % P).astype(np.uint32)

    @staticmethod
    def mul(a, b):
        s = a.astype(np.int64) * b.astype(np.int64)
        return (s % P).astype(np.uint32)

    @staticmethod
    def neg(a):
        return np.where(a == 0, a, (P - a.astype(np.int64)).astype(np.uint32))

    @staticmethod
    def cube(a):
        return npf.mul(npf.mul(a, a), a)

    @staticmethod
    def pow(a, e: int):
        result = np.ones_like(a)
        base = a
        while e > 0:
            if e & 1:
                result = npf.mul(result, base)
            base = npf.mul(base, base)
            e >>= 1
        return result

    @staticmethod
    def inv(a):
        return npf.pow(a, P - 2)

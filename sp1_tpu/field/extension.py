"""Extension fields of KoalaBear for TPU.

* Degree-4 binomial extension F_p[x]/(x^4 - 3) — the challenge field
  (reference: crates/primitives/src/lib.rs:30 `BinomialExtensionField<SP1Field, 4>`).
* Degree-7 "septic" extension F_p[z]/(z^7 - 3z - 5) — used for the
  elliptic-curve global-interaction digest
  (reference: crates/hypercube/src/septic_extension.rs:1).

Representation: an extension element is a uint32 array whose *trailing*
dimension is the extension degree (4 or 7), each coefficient in Montgomery
form. All ops are built from the base-field primitives in `koalabear`, so
they are Pallas-safe and fully vmappable.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from . import koalabear as kb

W4 = 3  # x^4 = 3


def _split(a, deg):
    return [a[..., i] for i in range(deg)]


def _join(coeffs):
    return jnp.stack(coeffs, axis=-1)


# ---------------------------------------------------------------------------
# Degree-4 binomial extension
# ---------------------------------------------------------------------------

def ext4_zero(shape=()):
    return jnp.zeros(shape + (4,), dtype=jnp.uint32)


def ext4_one(shape=()):
    one = np.zeros(shape + (4,), dtype=np.uint32)
    one[..., 0] = kb.to_monty_i(1)
    return jnp.asarray(one)


def ext4_from_base(a):
    """Embed a monty base-field array as ext4 (trailing dim added)."""
    zero = jnp.zeros_like(a)
    return _join([a, zero, zero, zero])


def ext4_add(a, b):
    return kb.add(a, b)


def ext4_sub(a, b):
    return kb.sub(a, b)


def ext4_neg(a):
    return kb.neg(a)


def ext4_scale(a, s):
    """Multiply ext4 array by a monty base-field array (broadcast)."""
    return kb.mul(a, s[..., None])


def ext4_mul(a, b):
    """Product in F_p[x]/(x^4 - 3). Schoolbook: 16 base muls."""
    a0, a1, a2, a3 = _split(a, 4)
    b0, b1, b2, b3 = _split(b, 4)
    m = kb.mul
    add = kb.add

    def s3(x):  # multiply by the binomial constant W4 = 3
        return add(add(x, x), x)

    c0 = m(a0, b0)
    c1 = add(m(a0, b1), m(a1, b0))
    c2 = add(add(m(a0, b2), m(a1, b1)), m(a2, b0))
    c3 = add(add(m(a0, b3), m(a1, b2)), add(m(a2, b1), m(a3, b0)))
    # overflow terms: x^4 = 3, x^5 = 3x, x^6 = 3x^2
    c0 = add(c0, s3(add(add(m(a1, b3), m(a2, b2)), m(a3, b1))))
    c1 = add(c1, s3(add(m(a2, b3), m(a3, b2))))
    c2 = add(c2, s3(m(a3, b3)))
    return _join([c0, c1, c2, c3])


def ext4_mul_soa(a, b):
    """ext4_mul over component-major (SoA) operands: a, b are (4, ...)
    with the extension component on axis 0. Same schoolbook formulas as
    ext4_mul, but every operand/temp is a full-width base-field vector —
    no 4-wide minor dimension for the TPU tiler to pad 32x (see
    prover/logup_gkr._lrows for the layout rationale)."""
    m, add = kb.mul, kb.add
    a0, a1, a2, a3 = a[0], a[1], a[2], a[3]
    b0, b1, b2, b3 = b[0], b[1], b[2], b[3]

    def s3(x):  # multiply by the binomial constant W4 = 3
        return add(add(x, x), x)

    c0 = add(m(a0, b0), s3(add(add(m(a1, b3), m(a2, b2)), m(a3, b1))))
    c1 = add(add(m(a0, b1), m(a1, b0)), s3(add(m(a2, b3), m(a3, b2))))
    c2 = add(add(add(m(a0, b2), m(a1, b1)), m(a2, b0)), s3(m(a3, b3)))
    c3 = add(add(m(a0, b3), m(a1, b2)), add(m(a2, b1), m(a3, b0)))
    return jnp.stack([c0, c1, c2, c3])


def ext4_square(a):
    return ext4_mul(a, a)


def ext4_pow_const(a, e: int):
    result = jnp.broadcast_to(ext4_one(), a.shape).astype(jnp.uint32)
    base = a
    while e > 0:
        if e & 1:
            result = ext4_mul(result, base)
        base = ext4_mul(base, base)
        e >>= 1
    return result


def ext4_inv(a):
    """Inverse via the norm map: a^-1 = conj(a) / N(a).

    Frobenius: x -> w^i * x where w = 3^((p-1)/4)-th power pattern; for a
    binomial extension x^4 - 3 the Frobenius maps coefficient a_k to
    a_k * g^k with g = 3^((p-1)/4). Applying all three conjugates gives the
    norm in the base field. Cheaper: a^(p^3 + p^2 + p) * a = N(a) in F_p.
    """
    # g = W4^((p-1)/4) mod p: the Frobenius multiplier.
    g = pow(W4, (kb.P - 1) // 4, kb.P)
    g_m = [kb.to_monty_i(pow(g, k, kb.P)) for k in range(4)]

    def frob(x, power):
        coeffs = _split(x, 4)
        out = []
        for k in range(4):
            mult = pow(g, k * power, kb.P)
            out.append(kb.mul(coeffs[k], jnp.asarray(np.uint32(kb.to_monty_i(mult)))))
        return _join(out)

    c1 = frob(a, 1)
    c2 = frob(a, 2)
    c3 = frob(a, 3)
    conj_prod = ext4_mul(c1, ext4_mul(c2, c3))       # a^(p + p^2 + p^3)
    norm = ext4_mul(a, conj_prod)[..., 0]            # in base field
    inv_norm = kb.inv(norm)
    del g_m
    return ext4_scale(conj_prod, inv_norm)


# ---------------------------------------------------------------------------
# NumPy host mirror of ext4 (canonical form) for the challenger / tests
# ---------------------------------------------------------------------------

class npext4:
    """Canonical-form ext4 ops over numpy arrays, trailing dim 4."""

    @staticmethod
    def mul(a, b):
        """Schoolbook product via direct 7-coefficient convolution.

        int64 intermediates (numpy uint64 kernels are scalar on this
        target); every partial sum keeps <= 2 raw products (< 2^63) before
        reduction, and the binomial fold x^4 = 3 adds < 4p terms.
        """
        a64 = np.asarray(a).astype(np.int64)
        b64 = np.asarray(b).astype(np.int64)
        p = kb.P
        a0, a1, a2, a3 = a64[..., 0], a64[..., 1], a64[..., 2], a64[..., 3]
        b0, b1, b2, b3 = b64[..., 0], b64[..., 1], b64[..., 2], b64[..., 3]
        c0 = a0 * b0 % p
        c1 = (a0 * b1 + a1 * b0) % p
        c2 = (a0 * b2 + a1 * b1) % p + a2 * b0 % p
        c3 = (a0 * b3 + a1 * b2) % p + (a2 * b1 + a3 * b0) % p
        c4 = (a1 * b3 + a2 * b2) % p + a3 * b1 % p
        c5 = (a2 * b3 + a3 * b2) % p
        c6 = a3 * b3 % p
        out = np.empty(np.broadcast_shapes(a64.shape, b64.shape), np.int64)
        out[..., 0] = (c0 + W4 * (c4 % p)) % p
        out[..., 1] = (c1 + W4 * c5) % p
        out[..., 2] = (c2 + W4 * c6) % p
        out[..., 3] = c3 % p
        return out.astype(np.uint32)

    @staticmethod
    def add(a, b):
        return kb.npf.add(np.asarray(a, np.uint32), np.asarray(b, np.uint32))

    @staticmethod
    def sub(a, b):
        return kb.npf.sub(np.asarray(a, np.uint32), np.asarray(b, np.uint32))

    @staticmethod
    def from_base(a):
        a = np.asarray(a, np.uint32)
        out = np.zeros(a.shape + (4,), np.uint32)
        out[..., 0] = a
        return out

    @staticmethod
    def one():
        return np.array([1, 0, 0, 0], np.uint32)

    @staticmethod
    def pow(a, e: int):
        result = np.broadcast_to(npext4.one(), np.asarray(a).shape).copy()
        base = np.asarray(a, np.uint32)
        while e > 0:
            if e & 1:
                result = npext4.mul(result, base)
            base = npext4.mul(base, base)
            e >>= 1
        return result

    @staticmethod
    def inv(a):
        return npext4.pow(a, kb.P**4 - 2)


# ---------------------------------------------------------------------------
# Septic extension F_p[z]/(z^7 - 3z - 5)
# ---------------------------------------------------------------------------

SEPTIC_DEG = 7
# z^7 = 3z + 5


def septic_mul(a, b):
    """Product in F_p[z]/(z^7 - 3z - 5) on monty uint32 arrays (..., 7)."""
    ac = _split(a, 7)
    bc = _split(b, 7)
    m = kb.mul
    add = kb.add
    # full 13-coefficient convolution
    conv = [None] * 13
    for k in range(13):
        acc = None
        for i in range(7):
            j = k - i
            if 0 <= j < 7:
                t = m(ac[i], bc[j])
                acc = t if acc is None else add(acc, t)
        conv[k] = acc
    # reduce top coefficients: z^(7+t) = 3*z^(t+1) + 5*z^t, iterating from the top
    for k in range(12, 6, -1):
        c = conv[k]
        t = k - 7
        conv[t + 1] = add(conv[t + 1], add(add(c, c), c))          # +3c
        five_c = add(add(add(c, c), add(c, c)), c)                  # +5c
        conv[t] = add(conv[t], five_c)
        conv[k] = None
    return _join(conv[:7])


def septic_add(a, b):
    return kb.add(a, b)


def septic_sub(a, b):
    return kb.sub(a, b)

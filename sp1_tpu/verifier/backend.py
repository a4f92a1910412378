"""Scalar value backend for the independent shard verifier.

The verifier (`sp1_tpu.verifier`) is written against this small abstract
operation set so the SAME protocol code runs in two modes:

  * `ConcreteBackend` — python-int arithmetic; assertions raise
    `VerificationError`. This is the standalone acceptance oracle: it
    shares no code with the prover stack (no imports from `prover/`,
    `pcs/`, `iop/`, or `ops/` kernels) and is implemented directly from
    the reference protocol (reference: crates/hypercube/src/verifier/,
    slop/crates/{basefold,stacked,jagged,sumcheck}/src/verifier.rs).
  * a symbolic backend (recursion compiler) — the same calls record
    recursion-VM instructions, turning the verifier into the normalize
    program generator (reference: crates/recursion/circuit/).

Handles: a base-field element ("felt") and a degree-4 extension element
("ext") are opaque to the protocol code; only the backend interprets
them. Static quantities (shapes, heights, counts, indices into proof
structures) stay plain python ints.

Field: KoalaBear p = 2^31 - 2^24 + 1; ext4 = F_p[x]/(x^4 - 3)
(reference: crates/primitives/src/lib.rs:28-31).
"""

from __future__ import annotations

P = 0x7F000001  # 2^31 - 2^24 + 1
W4 = 3  # ext4 defining relation: x^4 = 3
TWO_ADICITY = 24
TWO_ADIC_GENERATOR = pow(3, (P - 1) >> TWO_ADICITY, P)

# Frobenius constants: x^(p^k) = FROB[k][i] * x^i per coefficient, derived
# from x^4 = 3 and p ≡ 1 (mod 4):  x^p = 3^((p-1)/4) * x.
_Z = pow(W4, (P - 1) // 4, P)
_FROB = [[pow(_Z, (k * i) % 4, P) for i in range(4)] for k in range(4)]


class VerificationError(Exception):
    """An assertion over proof values failed (proof rejected)."""


def _ext_mul_ints(a, b):
    """Schoolbook product in F_p[x]/(x^4 - 3) on 4-int tuples."""
    a0, a1, a2, a3 = a
    b0, b1, b2, b3 = b
    c0 = (a0 * b0 + W4 * (a1 * b3 + a2 * b2 + a3 * b1)) % P
    c1 = (a0 * b1 + a1 * b0 + W4 * (a2 * b3 + a3 * b2)) % P
    c2 = (a0 * b2 + a1 * b1 + a2 * b0 + W4 * (a3 * b3)) % P
    c3 = (a0 * b3 + a1 * b2 + a2 * b1 + a3 * b0) % P
    return (c0, c1, c2, c3)


def _ext_frob(a, k):
    t = _FROB[k]
    return tuple((c * t[i]) % P for i, c in enumerate(a))


def _ext_inv_ints(a):
    """a^-1 via conjugate product: N = a * a^p * a^p^2 * a^p^3 in F_p."""
    if all(c == 0 for c in a):
        raise VerificationError("inverse of zero extension element")
    conj = _ext_mul_ints(_ext_frob(a, 1), _ext_mul_ints(_ext_frob(a, 2), _ext_frob(a, 3)))
    norm = _ext_mul_ints(a, conj)
    assert norm[1] == norm[2] == norm[3] == 0, "norm must be in the base field"
    ninv = pow(norm[0], P - 2, P)
    return tuple((c * ninv) % P for c in conj)


# --- Poseidon2-16 permutation (public protocol constants; reference:
# slop/crates/koala-bear/src/koala_bear_poseidon2.rs RC16 table, S-box x^3,
# 8 full + 20 partial rounds, M4-based external layer, 1*J + diag(V)
# internal layer with V = [-2, 1, 2, 4, ..., 2^13, 2^15]). The constant
# tables are imported from the kernel module as data (identical public
# values); the permutation itself is implemented here from the spec.
from ..ops.poseidon2 import EXTERNAL_RC as _EXT_RC_NP  # noqa: E402
from ..ops.poseidon2 import INTERNAL_RC as _INT_RC_NP  # noqa: E402

EXTERNAL_RC = [[int(c) for c in row] for row in _EXT_RC_NP]
INTERNAL_RC = [int(c) for c in _INT_RC_NP]
INTERNAL_DIAG = [P - 2] + [
    1 << s for s in [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 15]
]
ROUNDS_F = 8
ROUNDS_P = 20
WIDTH = 16
RATE = 8
DIGEST = 8


def _p2_external_layer(s):
    for g in range(0, WIDTH, 4):
        x0, x1, x2, x3 = s[g], s[g + 1], s[g + 2], s[g + 3]
        t01 = x0 + x1
        t23 = x2 + x3
        t0123 = t01 + t23
        t01123 = t0123 + x1
        t01233 = t0123 + x3
        s[g] = (t01123 + t01) % P
        s[g + 1] = (t01123 + 2 * x2) % P
        s[g + 2] = (t01233 + t23) % P
        s[g + 3] = (t01233 + 2 * x0) % P
    sums = [sum(s[g + l] for g in range(0, WIDTH, 4)) % P for l in range(4)]
    for g in range(0, WIDTH, 4):
        for l in range(4):
            s[g + l] = (s[g + l] + sums[l]) % P
    return s


def poseidon2_permute_ints(state):
    """Scalar Poseidon2 on 16 canonical ints."""
    s = _p2_external_layer([int(x) % P for x in state])
    for r in range(ROUNDS_F // 2):
        rc = EXTERNAL_RC[r]
        s = [pow((x + c) % P, 3, P) for x, c in zip(s, rc)]
        s = _p2_external_layer(s)
    for r in range(ROUNDS_P):
        s[0] = pow((s[0] + INTERNAL_RC[r]) % P, 3, P)
        total = sum(s) % P
        s = [(x * d + total) % P for x, d in zip(s, INTERNAL_DIAG)]
    for r in range(ROUNDS_F // 2, ROUNDS_F):
        rc = EXTERNAL_RC[r]
        s = [pow((x + c) % P, 3, P) for x, c in zip(s, rc)]
        s = _p2_external_layer(s)
    return s


class ConcreteBackend:
    """Python-int backend: felt = int, ext = 4-tuple of ints."""

    # -- constructors -------------------------------------------------------
    def felt(self, v: int):
        return int(v) % P

    def ext(self, coeffs):
        c = [int(x) % P for x in coeffs]
        assert len(c) == 4
        return tuple(c)

    def ext_from_felt(self, f):
        return (f, 0, 0, 0)

    def ext_from_felts(self, fs):
        assert len(fs) == 4
        return tuple(fs)

    def ext_coeffs(self, e):
        """The 4 felt coefficients of an ext element."""
        return list(e)

    def zero_ext(self):
        return (0, 0, 0, 0)

    def one_ext(self):
        return (1, 0, 0, 0)

    # -- felt arithmetic ----------------------------------------------------
    def fadd(self, a, b):
        return (a + b) % P

    def fsub(self, a, b):
        return (a - b) % P

    def fmul(self, a, b):
        return (a * b) % P

    def fneg(self, a):
        return (-a) % P

    def finv(self, a):
        if a % P == 0:
            raise VerificationError("inverse of zero field element")
        return pow(a, P - 2, P)

    # -- ext arithmetic -----------------------------------------------------
    def eadd(self, a, b):
        return tuple((x + y) % P for x, y in zip(a, b))

    def esub(self, a, b):
        return tuple((x - y) % P for x, y in zip(a, b))

    def emul(self, a, b):
        return _ext_mul_ints(a, b)

    def eneg(self, a):
        return tuple((-x) % P for x in a)

    def einv(self, a):
        return _ext_inv_ints(a)

    def emul_f(self, e, f):
        return tuple((x * f) % P for x in e)

    def emul_const(self, e, w: int):
        return tuple((x * (w % P)) % P for x in e)

    # -- assertions ---------------------------------------------------------
    def assert_f_eq(self, a, b, msg: str = "felt mismatch"):
        if (a - b) % P != 0:
            raise VerificationError(f"{msg}: {a} != {b}")

    def assert_e_eq(self, a, b, msg: str = "ext mismatch"):
        if any((x - y) % P != 0 for x, y in zip(a, b)):
            raise VerificationError(f"{msg}: {a} != {b}")

    def assert_f_zero(self, a, msg: str = "felt not zero"):
        self.assert_f_eq(a, 0, msg)

    def assert_e_zero(self, a, msg: str = "ext not zero"):
        self.assert_e_eq(a, (0, 0, 0, 0), msg)

    def assert_bool(self, f, msg: str = "not boolean"):
        if f not in (0, 1):
            raise VerificationError(f"{msg}: {f}")

    # -- bit operations -----------------------------------------------------
    def num2bits(self, f, nbits: int):
        """LSB-first bit decomposition with recomposition check.

        The canonical value must fit in nbits (the symbolic backend hints
        the bits and constrains booleanity + recomposition + a p-range
        check; reference: recursion circuit `num2bits`)."""
        v = f % P
        if v >> nbits:
            raise VerificationError(f"value {v} exceeds {nbits} bits")
        return [(v >> i) & 1 for i in range(nbits)]

    def bits2num(self, bits):
        return sum(b << i for i, b in enumerate(bits)) % P

    def assert_low_bits_zero(self, f, k: int, msg: str = "grinding check"):
        if (f % P) & ((1 << k) - 1):
            raise VerificationError(f"{msg}: low {k} bits of {f % P} nonzero")

    # -- selection ----------------------------------------------------------
    def select_f(self, bit, t, f):
        """bit ? t : f — bit must be boolean."""
        return (f + bit * (t - f)) % P

    def select_e(self, bit, t, f):
        return tuple((y + bit * (x - y)) % P for x, y in zip(t, f))

    # -- hashing ------------------------------------------------------------
    def poseidon2(self, state):
        assert len(state) == WIDTH
        return poseidon2_permute_ints(state)

    # -- concrete escape hatch ---------------------------------------------
    # Used only by structure checks that are static in the symbolic setting
    # (never called with symbolic handles).
    def felt_value(self, f) -> int:
        return int(f) % P

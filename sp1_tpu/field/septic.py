"""Septic extension field + elliptic curve for the global digest.

The cross-shard "global" interaction argument sums hash-to-curve points on
  y^2 = x^3 + 45x + 41z^3   over  F_{p^7} = F_p[z]/(z^7 - 3z - 5)
(reference: crates/hypercube/src/{septic_extension,septic_curve,
septic_digest}.rs). A shard's global interactions each lift to a curve
point via Poseidon2 + an offset search; the per-shard digests must sum to
zero across shards, replacing challenge-dependent LogUp for cross-shard
memory consistency.

Host-side canonical implementation (python ints / numpy); the in-AIR
point-accumulation chip lands with multi-shard support.
"""

from __future__ import annotations

import numpy as np

from ..field import koalabear as kb
from ..ops.poseidon2 import hostp2

P = kb.P

# Curve/digest constants (reference: septic_curve.rs:23, septic_digest.rs:10).
CURVE_WITNESS_DUMMY_POINT_X = (
    0x2718281 + (1 << 24), 0x8284590, 0x4523536, 0x0287471, 0x3526624, 0x9775724, 0x7093699,
)
CURVE_WITNESS_DUMMY_POINT_Y = (
    1250555984, 1592495468, 656721246, 420301347, 2125819749, 819876460, 17687681,
)
CURVE_CUMULATIVE_SUM_START_X = (
    0x1414213, 0x5623730, 0x9504880, 0x1688724, 0x2096980, 0x7856967, 0x1875376,
)
CURVE_CUMULATIVE_SUM_START_Y = (
    2020310104, 1513506566, 1843922297, 2003644209, 805967281, 1882435203, 1623804682,
)
DIGEST_SUM_START_X = (
    0x1732050, 0x8075688, 0x7729352, 0x7446341, 0x5058723, 0x6694280, 0x5253810,
)
DIGEST_SUM_START_Y = (
    1095433104, 7540207, 1124564165, 2035506693, 11121645, 102781365, 398772161,
)


class Septic:
    """F_p[z]/(z^7 - 3z - 5), canonical-int coefficients."""

    __slots__ = ("c",)

    def __init__(self, coeffs):
        self.c = tuple(int(x) % P for x in coeffs)
        assert len(self.c) == 7

    @staticmethod
    def zero():
        return Septic((0,) * 7)

    @staticmethod
    def one():
        return Septic((1, 0, 0, 0, 0, 0, 0))

    @staticmethod
    def from_base(v: int):
        return Septic((v, 0, 0, 0, 0, 0, 0))

    def __eq__(self, o):
        return self.c == o.c

    def __add__(self, o):
        return Septic(a + b for a, b in zip(self.c, o.c))

    def __sub__(self, o):
        return Septic(a - b for a, b in zip(self.c, o.c))

    def __neg__(self):
        return Septic(-a for a in self.c)

    def __mul__(self, o):
        if isinstance(o, int):
            return Septic(a * o for a in self.c)
        conv = [0] * 13
        for i, a in enumerate(self.c):
            if a:
                for j, b in enumerate(o.c):
                    conv[i + j] += a * b
        # z^(7+t) = 3 z^(t+1) + 5 z^t
        for k in range(12, 6, -1):
            v = conv[k]
            conv[k - 6] += 3 * v
            conv[k - 7] += 5 * v
            conv[k] = 0
        return Septic(conv[:7])

    def square(self):
        return self * self

    def pow(self, e: int):
        result = Septic.one()
        base = self
        while e:
            if e & 1:
                result = result * base
            base = base * base
            e >>= 1
        return result

    def inv(self):
        """a^(p^7 - 2) via the norm trick (reference pow_r_1 structure)."""
        pr1 = self._pow_r_1()
        norm = (pr1 * self).c[0]  # in F_p
        return pr1 * pow(norm, P - 2, P)

    # Frobenius: z -> z^p, computed from z^p mod (z^7 - 3z - 5).
    _ZP = None  # z^(p*k) powers cache: list of Septic for k=0..6
    _ZP2 = None

    @classmethod
    def _z_frob_table(cls):
        if cls._ZP is None:
            zp = Septic((0, 1, 0, 0, 0, 0, 0)).pow(P)
            cls._ZP = [Septic.one()]
            for _ in range(6):
                cls._ZP.append(cls._ZP[-1] * zp)
            zp2 = zp.pow(P)  # z^(p^2)
            cls._ZP2 = [Septic.one()]
            for _ in range(6):
                cls._ZP2.append(cls._ZP2[-1] * zp2)
        return cls._ZP, cls._ZP2

    def frobenius(self):
        zp, _ = Septic._z_frob_table()
        acc = Septic.zero()
        for k in range(7):
            acc = acc + zp[k] * self.c[k]
        return acc

    def double_frobenius(self):
        _, zp2 = Septic._z_frob_table()
        acc = Septic.zero()
        for k in range(7):
            acc = acc + zp2[k] * self.c[k]
        return acc

    def _pow_r_1(self):
        """self^(r-1) with r = (p^7-1)/(p-1): product of frobenius orbits."""
        base = self.frobenius() * self.double_frobenius()
        base_p2 = base.double_frobenius()
        base_p4 = base_p2.double_frobenius()
        return base * base_p2 * base_p4

    def is_square(self):
        pr1 = self._pow_r_1()
        norm = (pr1 * self).c[0]
        return norm, pow(norm, (P - 1) // 2, P) == 1

    def sqrt(self):
        """Square root (None when not a square); reference algorithm:
        reduce to a base-field sqrt of the norm via Cipolla."""
        if self == Septic.zero() or self == Septic.one():
            return Septic(self.c)
        norm, ok = self.is_square()
        if not ok:
            return None
        # n^((r+1)/2 - ... ) following the reference's exponent chain:
        # n_power = n^(1 + sum_{i=23}^{29} 2^i)
        n_iter = self
        n_power = self
        for i in range(1, 30):
            n_iter = n_iter * n_iter
            if i >= 23:
                n_power = n_power * n_iter
        nf = n_power.frobenius()
        denominator = nf
        nf = nf.double_frobenius()
        denominator = denominator * nf
        nf = nf.double_frobenius()
        denominator = denominator * nf
        denominator = denominator * self

        base = pow(norm, P - 2, P)
        g = kb.MULTIPLICATIVE_GENERATOR
        a = 1
        nonresidue = (1 - base) % P
        while pow(nonresidue, (P - 1) // 2, P) == 1:
            a = a * g % P
            nonresidue = (a * a - base) % P
        # Cipolla in F_p[i]/(i^2 - nonresidue)
        cip_pow = (P + 1) // 2
        xr, xi = a, 1
        rr, ri = 1, 0
        e = cip_pow
        while e:
            if e & 1:
                rr, ri = (
                    (rr * xr + ri * xi % P * nonresidue) % P,
                    (rr * xi + ri * xr) % P,
                )
            xr, xi = (
                (xr * xr + xi * xi % P * nonresidue) % P,
                (2 * xr * xi) % P,
            )
            e >>= 1
        return denominator * rr

    # Digest interaction-direction conventions (reference:
    # septic_extension.rs:688-705).
    def is_receive(self) -> bool:
        return 1 <= self.c[6] <= 63 * (1 << 24)

    def is_send(self) -> bool:
        return P - 63 * (1 << 24) <= self.c[6] <= P - 1

    def is_exception(self) -> bool:
        return self.c[6] == 0 or (
            63 * (1 << 24) < self.c[6] < P - 63 * (1 << 24)
        )


class SepticCurvePoint:
    """Affine point on y^2 = x^3 + 45x + 41z^3."""

    __slots__ = ("x", "y")

    def __init__(self, x: Septic, y: Septic):
        self.x = x
        self.y = y

    def __eq__(self, o):
        return self.x == o.x and self.y == o.y

    @staticmethod
    def dummy():
        return SepticCurvePoint(
            Septic(CURVE_WITNESS_DUMMY_POINT_X), Septic(CURVE_WITNESS_DUMMY_POINT_Y)
        )

    @staticmethod
    def cumulative_sum_start():
        return SepticCurvePoint(
            Septic(CURVE_CUMULATIVE_SUM_START_X), Septic(CURVE_CUMULATIVE_SUM_START_Y)
        )

    @staticmethod
    def digest_sum_start():
        return SepticCurvePoint(
            Septic(DIGEST_SUM_START_X), Septic(DIGEST_SUM_START_Y)
        )

    @staticmethod
    def curve_formula(x: Septic) -> Septic:
        return x * x * x + x * 45 + Septic((0, 0, 0, 41, 0, 0, 0))

    def check_on_curve(self) -> bool:
        return self.y.square() == self.curve_formula(self.x)

    def neg(self):
        return SepticCurvePoint(self.x, -self.y)

    def add_incomplete(self, o: "SepticCurvePoint") -> "SepticCurvePoint":
        slope = (o.y - self.y) * (o.x - self.x).inv()
        rx = slope.square() - self.x - o.x
        ry = slope * (self.x - rx) - self.y
        return SepticCurvePoint(rx, ry)

    def double(self) -> "SepticCurvePoint":
        slope = (self.x.square() * 3 + Septic.from_base(45)) * (self.y * 2).inv()
        rx = slope.square() - self.x * 2
        ry = slope * (self.x - rx) - self.y
        return SepticCurvePoint(rx, ry)


def sum_checker_x(p1: SepticCurvePoint, p2: SepticCurvePoint, p3: SepticCurvePoint) -> Septic:
    """Zero iff p3.x == (p1 + p2).x under incomplete addition
    (reference: crates/hypercube/src/septic_curve.rs:170)."""
    return (p1.x + p2.x + p3.x) * (p2.x - p1.x).square() - (p2.y - p1.y).square()


def sum_checker_y(p1: SepticCurvePoint, p2: SepticCurvePoint, p3: SepticCurvePoint) -> Septic:
    """Zero iff p3.y == (p1 + p2).y (reference: septic_curve.rs:181)."""
    return (p1.y + p3.y) * (p2.x - p1.x) - (p2.y - p1.y) * (p1.x - p3.x)


class CompletePoint:
    """Point-or-infinity with complete addition (host verifier use only;
    reference: SepticCurveComplete in septic_curve.rs)."""

    __slots__ = ("p",)

    def __init__(self, p: SepticCurvePoint | None):
        self.p = p  # None = infinity

    @staticmethod
    def infinity() -> "CompletePoint":
        return CompletePoint(None)

    def __add__(self, o: "CompletePoint") -> "CompletePoint":
        if self.p is None:
            return o
        if o.p is None:
            return self
        if self.p.x == o.p.x:
            if self.p.y == o.p.y:
                return CompletePoint(self.p.double())
            return CompletePoint.infinity()
        return CompletePoint(self.p.add_incomplete(o.p))

    def __eq__(self, o):
        if self.p is None or o.p is None:
            return self.p is None and o.p is None
        return self.p == o.p


def digest_value(digest: "SepticCurvePoint") -> CompletePoint:
    """The 'value' of a shard digest: digest minus the accumulation start
    point Z (digests are chains Z + sum(points); cross-shard balance means
    sum over shards of (digest - Z) is the identity)."""
    return CompletePoint(digest) + CompletePoint(
        SepticCurvePoint.cumulative_sum_start().neg()
    )


def lift_x(m8: list) -> tuple:
    """Hash-to-curve: lift the 8-element message to a curve point.

    Returns (point, offset, hash_input, hash_output); reference:
    septic_curve.rs:124 lift_x (Poseidon2 width-16, offset*2^16 added to
    the 8th element, y chosen in [1, (p-1)/2] unless the send convention
    negates it).
    """
    for offset in range(256):
        m_trial = [int(v) % P for v in m8]
        m_trial[7] = (m_trial[7] + (offset << 16)) % P
        state = np.zeros(16, np.uint32)
        state[:8] = m_trial
        m_hash = hostp2.permute(state)
        x = Septic(int(v) for v in m_hash[:7])
        y_sq = SepticCurvePoint.curve_formula(x)
        y = y_sq.sqrt()
        if y is None:
            continue
        if y.is_exception():
            continue
        if y.is_send():
            return SepticCurvePoint(x, -y), offset, m_trial, m_hash
        return SepticCurvePoint(x, y), offset, m_trial, m_hash
    raise RuntimeError("curve point couldn't be found after 256 attempts")

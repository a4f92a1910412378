"""Septic field + curve operations inside recursion programs.

The compose stage accumulates the shards' septic-curve global digests
in-circuit so one compressed proof attests that every global interaction
send is matched by a receive across the whole execution (reference:
crates/recursion/circuit's septic digest accumulation inside
SP1CompressVerifier, crates/hypercube/src/septic_curve.rs:170
sum_checker_x / :181 sum_checker_y).

A septic value is a list of 7 felt cells over F_p[z]/(z^7 - 3z - 5)
(field/septic.py is the host mirror). Curve additions are verified in
CHECKER form — the result point is witnessed and the two chord-law
identities are asserted — so no in-circuit inversion is needed; the
x1 != x2 side condition is enforced with a witnessed linear functional
(sum c_i * d_i == 1 has a solution iff d != 0).
"""

from __future__ import annotations

from ..field import septic as sp
from ..field.koalabear import P

IRRED_A = 3  # z^7 = 3 z + 5
IRRED_B = 5


# -- field ops ---------------------------------------------------------------


def s_const(sym, coeffs):
    return [sym.felt(int(c) % P) for c in coeffs]


def s_witness(sym):
    return [sym.witness_felt() for _ in range(7)]


def s_add(sym, a, b):
    return [sym.fadd(x, y) for x, y in zip(a, b)]


def s_sub(sym, a, b):
    return [sym.fsub(x, y) for x, y in zip(a, b)]


def s_mul(sym, a, b):
    """Schoolbook product + reduction by z^7 - 3z - 5."""
    conv = [None] * 13
    for i in range(7):
        for j in range(7):
            t = sym.fmul(a[i], b[j])
            k = i + j
            conv[k] = t if conv[k] is None else sym.fadd(conv[k], t)
    three = sym.felt(IRRED_A)
    five = sym.felt(IRRED_B)
    for k in range(12, 6, -1):
        v = conv[k]
        conv[k - 6] = sym.fadd(conv[k - 6], sym.fmul(v, three))
        conv[k - 7] = sym.fadd(conv[k - 7], sym.fmul(v, five))
    return conv[:7]


def s_mul_base(sym, a, w: int):
    c = sym.felt(int(w) % P)
    return [sym.fmul(x, c) for x in a]


def s_assert_eq(sym, a, b, msg: str = ""):
    for x, y in zip(a, b):
        sym.assert_f_eq(x, y, msg)


def s_assert_nonzero(sym, d, msg: str = ""):
    """d != 0 via a witnessed functional c with <c, d> == 1."""
    acc = None
    for x in d:
        c = sym.witness_felt()
        t = sym.fmul(c, x)
        acc = t if acc is None else sym.fadd(acc, t)
    sym.assert_f_eq(acc, sym.felt(1), msg or "septic nonzero")


def nonzero_hint(d: "sp.Septic") -> list:
    """Witness blocks for s_assert_nonzero (7 felts)."""
    c = [0] * 7
    for j, v in enumerate(d.c):
        if v % P:
            c[j] = pow(int(v), P - 2, P)
            break
    else:
        raise ValueError("nonzero hint requested for zero septic value")
    return c


# -- curve ops ---------------------------------------------------------------


def curve_formula(sym, x):
    """x^3 + 45 x + 41 z^3 (reference: septic_curve.rs curve equation)."""
    x3 = s_mul(sym, s_mul(sym, x, x), x)
    t = s_add(sym, x3, s_mul_base(sym, x, 45))
    b = [sym.felt(0)] * 3 + [sym.felt(41)] + [sym.felt(0)] * 3
    return s_add(sym, t, b)


def assert_on_curve(sym, pt, msg: str = ""):
    x, y = pt
    s_assert_eq(sym, s_mul(sym, y, y), curve_formula(sym, x),
                msg or "point on curve")


def point_const(sym, host_pt: "sp.SepticCurvePoint"):
    return (s_const(sym, host_pt.x.c), s_const(sym, host_pt.y.c))


def point_witness(sym):
    return (s_witness(sym), s_witness(sym))


def point_neg(sym, pt):
    x, y = pt
    return (x, [sym.fneg(c) for c in y])


def assert_incomplete_add(sym, p1, p2, p3, msg: str = ""):
    """p3 == p1 + p2 under the chord law, with x2 != x1 enforced.

    sum_checker_x: (x1+x2+x3)(x2-x1)^2 - (y2-y1)^2 == 0
    sum_checker_y: (y1+y3)(x2-x1) - (y2-y1)(x1-x3) == 0
    (reference: crates/hypercube/src/septic_curve.rs:170,181). Given
    x2 != x1 the two identities determine p3 uniquely, so the witnessed
    p3 IS p1 + p2.
    """
    x1, y1 = p1
    x2, y2 = p2
    x3, y3 = p3
    dx = s_sub(sym, x2, x1)
    dy = s_sub(sym, y2, y1)
    lhs = s_mul(sym, s_add(sym, s_add(sym, x1, x2), x3), s_mul(sym, dx, dx))
    s_assert_eq(sym, lhs, s_mul(sym, dy, dy), (msg or "") + " sum_checker_x")
    lhs_y = s_mul(sym, s_add(sym, y1, y3), dx)
    rhs_y = s_mul(sym, dy, s_sub(sym, x1, x3))
    s_assert_eq(sym, lhs_y, rhs_y, (msg or "") + " sum_checker_y")
    return dx


# -- accumulation ------------------------------------------------------------


class HostAccumulator:
    """Host-side mirror computing the witnessed hint blocks in the exact
    order the circuit consumes them (StreamWriter.felt protocol)."""

    def __init__(self, start: "sp.SepticCurvePoint"):
        self.acc = start
        self.hints: list = []  # flat felt values, in witness order

    def add(self, pt: "sp.SepticCurvePoint"):
        """One incomplete addition: acc' witnessed, then nonzero hint."""
        dx = pt.x - self.acc.x
        nxt = self.acc.add_incomplete(pt)
        for c in nxt.x.c + nxt.y.c:
            self.hints.append(int(c))
        self.hints.extend(nonzero_hint(dx))
        self.acc = nxt
        return nxt


def circuit_accumulate(sym, start_pt, points, msg: str = ""):
    """acc = start + sum(points), each step a witnessed incomplete add.

    Witness order per step: result point (14 felts), then the 7-felt
    nonzero hint for x_pt - x_acc — matching HostAccumulator.add."""
    acc = start_pt
    for i, pt in enumerate(points):
        nxt = point_witness(sym)
        dx = s_sub(sym, pt[0], acc[0])
        assert_incomplete_add(sym, acc, pt, nxt, f"{msg} add {i}")
        s_assert_nonzero(sym, dx, f"{msg} add {i} distinct x")
        acc = nxt
    return acc

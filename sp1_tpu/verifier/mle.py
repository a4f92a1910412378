"""Scalar multilinear helpers over a verifier backend.

Points are lists of ext handles, big-endian (point[0] = most significant
variable), matching the prover's convention (reference:
slop/crates/multilinear/src/{mle,point,virtual_geq}.rs).
"""

from __future__ import annotations


def log2_ceil(x: int) -> int:
    return max(x - 1, 0).bit_length() if x > 1 else 0


def point_from_usize(x: int, bits: int):
    """Big-endian bit list (plain ints — static data)."""
    return [(x >> (bits - 1 - k)) & 1 for k in range(bits)]


def partial_lagrange(bk, point):
    """eq table of a point: list of 2^k ext handles, big-endian order."""
    evals = [bk.one_ext()]
    for x in point:
        nxt = []
        for e in evals:
            prod = bk.emul(e, x)
            nxt.append(bk.esub(e, prod))
            nxt.append(prod)
        evals = nxt
    return evals


def eval_ext_mle(bk, values, point):
    """MLE of `values` (list of ext, len <= 2^k) evaluated at `point`."""
    eq = partial_lagrange(bk, point)
    assert len(values) <= len(eq)
    acc = bk.zero_ext()
    for v, e in zip(values, eq):
        acc = bk.eadd(acc, bk.emul(v, e))
    return acc


def eq_points(bk, a, b):
    """eq(a, b) = prod_k (a_k b_k + (1-a_k)(1-b_k))."""
    assert len(a) == len(b)
    one = bk.one_ext()
    acc = one
    for x, y in zip(a, b):
        t = bk.eadd(
            bk.emul(x, y), bk.emul(bk.esub(one, x), bk.esub(one, y))
        )
        acc = bk.emul(acc, t)
    return acc


def full_geq(bk, threshold, point):
    """MLE of [index >= threshold] at an ext point.

    threshold: static bit list (ints, big-endian); point: ext handles.
    Reference: slop/crates/multilinear/src/virtual_geq.rs.
    """
    one = bk.one_ext()
    acc = one
    n = len(point)
    assert len(threshold) == n
    for k in range(n - 1, -1, -1):
        x_bit = threshold[k]
        y = point[k]
        x = one if x_bit else bk.zero_ext()
        t1 = bk.emul(bk.esub(one, y), bk.esub(one, x))
        t2 = bk.emul(y, x)
        acc = bk.eadd(
            bk.emul(bk.eadd(t1, t2), acc), bk.emul(y, bk.esub(one, x))
        )
    return acc


def uni_eval(bk, coeffs, x):
    """Horner evaluation of a coefficient-form univariate poly."""
    acc = coeffs[-1]
    for i in range(len(coeffs) - 2, -1, -1):
        acc = bk.eadd(bk.emul(acc, x), coeffs[i])
    return acc


def uni_eval_zero_plus_one(bk, coeffs):
    """p(0) + p(1) = 2*c0 + c1 + ... + cd."""
    acc = coeffs[0]
    for c in coeffs:
        acc = bk.eadd(acc, c)
    return acc

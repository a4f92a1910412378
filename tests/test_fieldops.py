"""Unit tests for the emulated-field operation blocks (riscv/fieldops.py).

Reference parity: crates/core/machine/src/operations/field/ — each op's
vanishing-polynomial identity is checked on concrete rows through the
NpOps constraint folder, with tamper cases.
"""

import random

import numpy as np
import pytest

from sp1_tpu.air.builder import ConstraintFolder, NpOps
from sp1_tpu.riscv import fieldops as fo
from sp1_tpu.riscv.machine import Cols

FIELDS = [fo.ED25519_FP, fo.SECP256K1_FP, fo.SECP256R1_FP, fo.BN254_FP,
          fo.UINT256, fo.BLS12381_FP]


def _eval_case(fp, kind, a, b):
    p = fp.modulus
    c = Cols()
    c.col("is_real")
    c.cols("a", fp.nb)
    c.cols("b", fp.nb)
    blk = fo.FieldOpBlock("m", fp)
    blk.alloc(c)
    lt = fo.FieldLtBlock("lt", fp)
    lt.alloc(c)
    row = np.zeros(c.n, np.int64)
    a_l, b_l = fo.int_to_limbs(a, fp.nb), fo.int_to_limbs(b, fp.nb)
    row[c["a"]] = a_l
    row[c["b"]] = b_l
    row[c["is_real"]] = 1
    if kind == "mul":
        r, carry = (a * b) % p, (a * b) // p
    elif kind == "add":
        r, carry = (a + b) % p, (a + b) // p
    elif kind == "den_plus":
        r = a * pow((b + 1) % p, p - 2, p) % p
        carry = (b * r + r - a) // p
    elif kind == "den_minus":
        r = a * pow((1 - b) % p, p - 2, p) % p
        carry = (b * r + a - r) // p
    elif kind == "inner":
        r, carry = (2 * a * b) % p, (2 * a * b) // p
    elif kind == "div":
        r = a * pow(b, p - 2, p) % p
        carry = (r * b - a) // p
    elif kind == "sub":
        r = (a - b) % p
        carry = (b + r - a) // p
    r_l = fo.int_to_limbs(r, fp.nb)
    terms = {
        "mul": [(+1, a_l, b_l), (-1, r_l)],
        "add": [(+1, a_l), (+1, b_l), (-1, r_l)],
        "sub": [(+1, b_l), (+1, r_l), (-1, a_l)],
        "den_plus": [(+1, b_l, r_l), (+1, r_l), (-1, a_l)],
        "den_minus": [(+1, b_l, r_l), (+1, a_l), (-1, r_l)],
        "inner": [(+1, a_l, b_l), (+1, b_l, a_l), (-1, r_l)],
        "div": [(+1, r_l, b_l), (-1, a_l)],
    }[kind]
    blk.populate(row, c, terms, r, carry)
    if p != 1 << 256:
        lt.populate(row, c, r)

    def fold(main):
        ops = NpOps()
        f = ConstraintFolder(ops, [], main, [ops.zero()] * 64, ops.const(12345))

        def g(name):
            v = c[name]
            if isinstance(v, slice):
                return [main[i] for i in range(v.start, v.stop)]
            return main[v]

        gate = g("is_real")
        if kind == "inner":
            blk.eval_inner(f, g, gate, [g("a"), g("b")], [g("b"), g("a")])
        elif kind == "den_plus":
            blk.eval_den(f, g, gate, g("a"), g("b"), True)
        elif kind == "den_minus":
            blk.eval_den(f, g, gate, g("a"), g("b"), False)
        else:
            getattr(blk, "eval_" + kind)(f, g, gate, g("a"), g("b"))
        if p != 1 << 256:
            lt.eval(f, g, gate, g("m_r"))
        return f.accumulator

    ops = NpOps()
    main = [ops.const(int(v) % ((1 << 31) - (1 << 24) + 1)) for v in row]
    assert not fold(main).any(), f"{fp.name} {kind}: constraints violated"
    # tamper with the result
    bad = list(main)
    bad[c["m_r"].start] = ops.const(int(row[c["m_r"].start]) + 1)
    assert fold(bad).any(), f"{fp.name} {kind}: tamper not caught"
    return r


@pytest.mark.parametrize("fp", FIELDS, ids=lambda f: f.name)
def test_field_ops(fp):
    # deterministic seed: hash() is per-process randomized and made the
    # draws (and an inner-carry overflow, below) flaky across runs
    random.seed(sum(fp.name.encode()))
    p = fp.modulus
    for kind in ("mul", "add", "sub", "den_plus", "den_minus", "inner", "div"):
        if kind in ("den_plus", "den_minus", "div") and p == 1 << 256:
            continue  # 2^256 is not prime; no inverses
        a, b = random.randrange(1, p), random.randrange(2, p - 1)
        if kind == "inner":
            # inner's carry is 2ab//p: for moduli close to 2^(8 nb) a
            # full-range product needs nb+1 carry limbs. The one chip
            # using eval_inner (ed25519 add, p < 2^255) always fits;
            # bound the draw so the synthetic case fits too.
            b = random.randrange(2, p // 2)
        _eval_case(fp, kind, a, b)


@pytest.mark.parametrize("fp", [fo.ED25519_FP, fo.UINT256], ids=lambda f: f.name)
def test_field_ops_edges(fp):
    p = fp.modulus
    _eval_case(fp, "mul", 0, 0)
    _eval_case(fp, "mul", p - 1, p - 1)
    _eval_case(fp, "add", p - 1, 1)


def test_lt_rejects_modulus():
    """FieldLtBlock.populate must refuse value == modulus."""
    fp = fo.ED25519_FP
    c = Cols()
    lt = fo.FieldLtBlock("lt", fp)
    lt.alloc(c)
    row = np.zeros(c.n, np.int64)
    with pytest.raises(AssertionError):
        lt.populate(row, c, fp.modulus)

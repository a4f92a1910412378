"""Emulated-field arithmetic column blocks for precompile chips.

Reference roles:
  crates/core/machine/src/operations/field/field_op.rs      (FieldOpCols)
  crates/core/machine/src/operations/field/field_den.rs     (FieldDenCols)
  crates/core/machine/src/operations/field/field_inner_product.rs
  crates/core/machine/src/operations/field/util_air.rs      (eval_field_operation)
  crates/curves/src/params.rs                               (limb parameters)

A 256-bit (or 384-bit) field element is witnessed as NB u8 limbs. An
operation r = a OP b (mod m) is proven with the polynomial identity

    v(x) := lhs(x) - rhs(x) - carry(x) * m(x)  ==  (x - 256) * w(x)

checked coefficient-wise over KoalaBear, where a(256) = int(a) etc.
result/carry limbs are u8 range-checked and the witness w is stored
shifted by WITNESS_OFFSET and u16 range-checked, which bounds every
coefficient's magnitude below the KoalaBear modulus so the mod-p check
implies the integer identity.

TPU-native divergences from the reference: constraints are emitted into
the SSA constraint tape (air/tape.py) with BALANCED summation trees so
the level-batched zerocheck kernel stays shallow; u8 range checks ride
the existing 2^16 Range table by sending 256*x (x < 256 iff 256*x is a
table index); strict result < modulus checks use a borrow-chain
subtraction witness instead of a byte-LT table.

These blocks require the production word model (limb_bits=16).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..air.builder import KIND_RANGE, Affine, Interaction, main_col


@dataclass(frozen=True)
class FieldParams:
    """u8-limb parameters of an emulated field (crates/curves/src/params.rs)."""

    name: str
    modulus: int
    nb: int        # number of u8 limbs per element
    nw: int        # number of witness limbs
    offset: int    # witness shift (|w_i| < offset; w_i + offset is u16)

    @property
    def modulus_limbs(self) -> list:
        return int_to_limbs(self.modulus, self.nb + 1)[: self.nb + 1]


# 2^255 - 19 (crates/curves/src/edwards/ed25519.rs:29-38)
ED25519_FP = FieldParams("ed25519", (1 << 255) - 19, 32, 62, 1 << 14)
# secp256k1 base field (crates/curves/src/weierstrass/secp256k1.rs:40-49)
SECP256K1_FP = FieldParams(
    "secp256k1", (1 << 256) - (1 << 32) - 977, 32, 62, 1 << 14
)
# secp256r1 (NIST P-256) base field (weierstrass/secp256r1.rs:39-48)
SECP256R1_FP = FieldParams(
    "secp256r1",
    0xFFFFFFFF00000001000000000000000000000000FFFFFFFFFFFFFFFFFFFFFFFF,
    32, 62, 1 << 14,
)
# BN254 base field (weierstrass/bn254.rs:29-48)
BN254_FP = FieldParams(
    "bn254",
    21888242871839275222246405745257275088696311157297823662689037894645226208583,
    32, 62, 1 << 14,
)
# BN254 scalar field (for curve order checks; same limb shape)
BN254_FR = FieldParams(
    "bn254_fr",
    21888242871839275222246405745257275088548364400416034343698204186575808495617,
    32, 62, 1 << 14,
)
# BLS12-381 base field (weierstrass/bls12_381.rs:43-60)
BLS12381_FP = FieldParams(
    "bls12381",
    0x1A0111EA397FE69A4B1BA7B6434BACD764774B84F38512BF6730D2A0F6B0F6241EABFFFEB153FFFFB9FEFFFFFFFFAAAB,
    48, 94, 1 << 15,
)
# uint256 ring: modulus 2^256 (crates/curves/src/uint256.rs:22-34)
UINT256 = FieldParams("uint256", 1 << 256, 32, 63, 1 << 14)

# ed25519 curve constant d = -121665/121666 mod p
ED25519_D = (
    37095705934669439343138083508754565189542113879843219016388785533085940283555
)

# secp256k1: y^2 = x^3 + 7; secp256r1: y^2 = x^3 + ax + b
SECP256K1_A, SECP256K1_B = 0, 7
SECP256R1_A = (
    0xFFFFFFFF00000001000000000000000000000000FFFFFFFFFFFFFFFFFFFFFFFC
)
SECP256R1_B = (
    0x5AC635D8AA3A93E7B3EBBD55769886BC651D06B0CC53B0F63BCE3C3E27D2604B
)
BN254_A, BN254_B = 0, 3


def int_to_limbs(v: int, n: int) -> list:
    return [(v >> (8 * i)) & 0xFF for i in range(n)]


def limbs_to_int(limbs) -> int:
    return sum(int(l) << (8 * i) for i, l in enumerate(limbs))


def _balanced_sum(ops, items):
    """Pairwise-balanced tape sum: depth log2(n) instead of n."""
    items = [it for it in items if it is not None]
    if not items:
        return ops.zero()
    while len(items) > 1:
        nxt = []
        for i in range(0, len(items) - 1, 2):
            nxt.append(ops.add(items[i], items[i + 1]))
        if len(items) & 1:
            nxt.append(items[-1])
        items = nxt
    return items[0]


def _term(ops, a, b):
    """Product of a tape sym and a sym-or-int (int -> scale_base)."""
    if isinstance(b, int):
        if b == 0:
            return None
        if b == 1:
            return a
        return ops.scale_base(a, b)
    if isinstance(a, int):
        return _term(ops, b, a)
    return ops.mul(a, b)


class VanishingBuilder:
    """Accumulates signed polynomial terms of v(x) and emits the
    (x - 256) * witness identity (util_air.rs:eval_field_operation)."""

    def __init__(self, ops, fp: FieldParams):
        self.ops = ops
        self.fp = fp
        # per-coefficient lists of (+terms, -terms)
        self.pos: list = [[] for _ in range(2 * fp.nb + 1)]
        self.neg: list = [[] for _ in range(2 * fp.nb + 1)]

    def add_poly(self, limbs, sign=+1):
        """Add ±p(x) where limbs is a list of syms/ints (length <= 2nb+1)."""
        tgt = self.pos if sign > 0 else self.neg
        for k, l in enumerate(limbs):
            if isinstance(l, int):
                if l == 0:
                    continue
                l = self.ops.const(l)
            tgt[k].append(l)

    def add_prod(self, a_limbs, b_limbs, sign=+1):
        """Add ±a(x)*b(x); either side's entries may be ints."""
        tgt = self.pos if sign > 0 else self.neg
        for i, ai in enumerate(a_limbs):
            if isinstance(ai, int) and ai == 0:
                continue
            for j, bj in enumerate(b_limbs):
                if isinstance(bj, int) and bj == 0:
                    continue
                t = _term(self.ops, ai, bj)
                if t is not None:
                    tgt[i + j].append(t)

    def constrain(self, f, gate, w_syms):
        """Emit gate * (v_k - [(w-off)(x)*(x-256)]_k) == 0 for all k."""
        ops, fp = self.ops, self.fp
        off = fp.offset
        nw = len(w_syms)
        for k in range(nw + 1):
            v_k = ops.sub(
                _balanced_sum(ops, self.pos[k]), _balanced_sum(ops, self.neg[k])
            )
            # [(w(x) - off*ones(x)) * (x - 256)]_k
            rhs = ops.zero()
            if 0 <= k - 1 < nw:
                rhs = ops.add(rhs, ops.sub(w_syms[k - 1], ops.const(off)))
            if k < nw:
                rhs = ops.sub(
                    rhs, ops.scale_base(ops.sub(w_syms[k], ops.const(off)), 256)
                )
            f.assert_zero(ops.mul(gate, ops.sub(v_k, rhs)))
        # coefficients beyond the witness range must cancel exactly
        for k in range(nw + 1, 2 * fp.nb + 1):
            if self.pos[k] or self.neg[k]:
                v_k = ops.sub(
                    _balanced_sum(ops, self.pos[k]),
                    _balanced_sum(ops, self.neg[k]),
                )
                f.assert_zero(ops.mul(gate, v_k))


class FieldOpBlock:
    """Columns (result, carry, witness) proving one emulated field op.

    Allocate at layout time with `alloc`; emit constraints with one of
    the eval_* methods; fill rows with the matching populate_*.
    """

    def __init__(self, name: str, fp: FieldParams):
        self.name = name
        self.fp = fp

    def alloc(self, c):
        fp = self.fp
        c.cols(self.name + "_r", fp.nb)
        c.cols(self.name + "_c", fp.nb)
        c.cols(self.name + "_w", fp.nw)

    # ---- layout access -----------------------------------------------------
    def syms(self, g):
        """(result, carry, witness) sym lists from the chip's g() getter."""
        return (
            g(self.name + "_r"),
            g(self.name + "_c"),
            g(self.name + "_w"),
        )

    def result_slice(self, L):
        return L[self.name + "_r"]

    # ---- constraint emission ------------------------------------------------
    def _vanish(self, f, g, gate, build):
        ops = f.ops
        r, cr, w = self.syms(g)
        vb = VanishingBuilder(ops, self.fp)
        build(vb, r)
        vb.add_prod(cr, self.fp.modulus_limbs, sign=-1)
        vb.constrain(f, gate, w)

    def eval_add(self, f, g, gate, a, b):
        """r = a + b (mod m)."""
        self._vanish(
            f, g, gate,
            lambda vb, r: (vb.add_poly(a), vb.add_poly(b), vb.add_poly(r, -1)),
        )

    def eval_sub(self, f, g, gate, a, b):
        """r = a - b (mod m), proven as b + r = a + carry*m."""
        self._vanish(
            f, g, gate,
            lambda vb, r: (vb.add_poly(b), vb.add_poly(r), vb.add_poly(a, -1)),
        )

    def eval_sub2(self, f, g, gate, a, b1, b2):
        """r = a - b1 - b2 (mod m), proven as b1 + b2 + r = a + carry*m."""
        self._vanish(
            f, g, gate,
            lambda vb, r: (
                vb.add_poly(b1),
                vb.add_poly(b2),
                vb.add_poly(r),
                vb.add_poly(a, -1),
            ),
        )

    def eval_mul(self, f, g, gate, a, b, c=None):
        """r = a * b (+ c) (mod m)."""
        def build(vb, r):
            vb.add_prod(a, b)
            if c is not None:
                vb.add_poly(c)
            vb.add_poly(r, -1)

        self._vanish(f, g, gate, build)

    def eval_div(self, f, g, gate, a, b):
        """r = a / b (mod m), proven as r * b = a + carry*m.

        Division by zero is NOT excluded here (field_op.rs warning) —
        callers must ensure b != 0."""
        def build(vb, r):
            vb.add_prod(r, b)
            vb.add_poly(a, -1)

        self._vanish(f, g, gate, build)

    def eval_den(self, f, g, gate, a, b, sign: bool):
        """r = a / (1 + b) if sign else a / (1 - b) (field_den.rs:48-50):
        sign:  b*r + r - a = carry*m
        !sign: b*r + a - r = carry*m
        """
        def build(vb, r):
            vb.add_prod(b, r)
            if sign:
                vb.add_poly(r)
                vb.add_poly(a, -1)
            else:
                vb.add_poly(a)
                vb.add_poly(r, -1)

        self._vanish(f, g, gate, build)

    def eval_inner(self, f, g, gate, a_vecs, b_vecs):
        """r = sum_i a_i * b_i (mod m) (field_inner_product.rs)."""
        def build(vb, r):
            for av, bv in zip(a_vecs, b_vecs):
                vb.add_prod(av, bv)
            vb.add_poly(r, -1)

        self._vanish(f, g, gate, build)

    # ---- range-check interactions ------------------------------------------
    def range_sends(self, L, mult: Affine) -> list:
        """u8 checks on result+carry (as 256*x against the 2^16 table),
        u16 checks on the shifted witness."""
        out = []
        rs, cs, wsl = (
            L[self.name + "_r"],
            L[self.name + "_c"],
            L[self.name + "_w"],
        )
        for i in range(rs.start, rs.stop):
            out.append(
                Interaction((Affine(0, ((main_col(i), 256),)),), mult, KIND_RANGE)
            )
        for i in range(cs.start, cs.stop):
            out.append(
                Interaction((Affine(0, ((main_col(i), 256),)),), mult, KIND_RANGE)
            )
        for i in range(wsl.start, wsl.stop):
            out.append(
                Interaction((Affine.col(main_col(i)),), mult, KIND_RANGE)
            )
        return out

    # ---- host-side population ----------------------------------------------
    def populate(self, row: np.ndarray, L, lhs_terms, result: int, carry: int):
        """Fill one trace row given the integer identity
        sum(lhs_terms) - carry*m = 0 where lhs_terms is a list of
        (sign, poly_int_limbs) OR (sign, a_limbs, b_limbs) products and
        must INCLUDE the result term with the sign the eval_* uses."""
        fp = self.fp
        r_l = int_to_limbs(result, fp.nb)
        c_l = int_to_limbs(carry, fp.nb)
        v = np.zeros(2 * fp.nb + 1, np.int64)
        for t in lhs_terms:
            if len(t) == 2:
                sign, limbs = t
                for k, l in enumerate(limbs):
                    v[k] += sign * int(l)
            else:
                sign, al, bl = t
                a_arr = np.asarray(al, np.int64)
                b_arr = np.asarray(bl, np.int64)
                v[: len(al) + len(bl) - 1] += sign * np.convolve(a_arr, b_arr)
        m_l = fp.modulus_limbs
        v[: fp.nb + len(m_l) - 1] -= np.convolve(
            np.asarray(c_l, np.int64), np.asarray(m_l, np.int64)
        )
        # divide v(x) by (x - 256): top-down recurrence (field_op.rs:92-98)
        w = np.zeros(fp.nw, np.int64)
        pol_carry = 0
        for k in range(fp.nw, -1, -1):
            if k < fp.nw:
                w[k] = pol_carry
            pol_carry = int(v[k]) + pol_carry * 256
        assert pol_carry == 0, f"{self.name}: vanishing poly not divisible"
        assert np.all(v[fp.nw + 1 :] == 0), f"{self.name}: v too long"
        w16 = w + fp.offset
        assert np.all((0 <= w16) & (w16 < (1 << 16))), f"{self.name}: witness range"
        rs, cs, wsl = L[self.name + "_r"], L[self.name + "_c"], L[self.name + "_w"]
        row[rs] = r_l
        row[cs] = c_l
        row[wsl] = w16
        return r_l, c_l, w16


class FieldLtBlock:
    """Borrow-chain proof that a limb vector is <= bound-1 (i.e. strictly
    below a constant bound; used for result < modulus checks).

    Divergence from the reference's byte-LT table (field/range.rs): we
    witness d = (bound-1) - value limb-wise with boolean borrows and u8
    range checks; d >= 0 integer-wise iff value < bound.
    """

    def __init__(self, name: str, fp: FieldParams, bound: int | None = None):
        self.name = name
        self.fp = fp
        self.bound = fp.modulus if bound is None else bound

    def alloc(self, c):
        c.cols(self.name + "_d", self.fp.nb)
        c.cols(self.name + "_bw", self.fp.nb)

    def eval(self, f, g, gate, val_syms):
        """d_i - 256*bw_i = t_i - v_i - bw_{i-1}, bw boolean, bw_last = 0,
        where t = limbs(bound-1): schoolbook subtraction witness of
        t - value with d limbs u8-checked; bw_last = 0 forces t >= value."""
        ops = f.ops
        d = g(self.name + "_d")
        bw = g(self.name + "_bw")
        t = int_to_limbs(self.bound - 1, self.fp.nb)
        prev = None
        for i in range(self.fp.nb):
            f.assert_bool(bw[i])
            lhs = ops.sub(d[i], ops.scale_base(bw[i], 256))
            rhs = ops.sub(ops.const(t[i]), val_syms[i])
            if prev is not None:
                rhs = ops.sub(rhs, prev)
            f.assert_zero(ops.mul(gate, ops.sub(lhs, rhs)))
            prev = bw[i]
        f.assert_zero(ops.mul(gate, bw[self.fp.nb - 1]))

    def range_sends(self, L, mult: Affine) -> list:
        ds = L[self.name + "_d"]
        return [
            Interaction((Affine(0, ((main_col(i), 256),)),), mult, KIND_RANGE)
            for i in range(ds.start, ds.stop)
        ]

    def populate(self, row: np.ndarray, L, value: int):
        t = self.bound - 1
        assert 0 <= value <= t, "value exceeds bound-1"
        d_l = int_to_limbs(t - value, self.fp.nb)
        # bw_i = 1 iff the low i+1 limbs of t are below those of value
        bw_l = []
        for i in range(self.fp.nb):
            mask = (1 << (8 * (i + 1))) - 1
            bw_l.append(1 if (t & mask) < (value & mask) else 0)
        row[L[self.name + "_d"]] = d_l
        row[L[self.name + "_bw"]] = bw_l
        return d_l

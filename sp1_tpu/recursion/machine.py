"""RecursionAir: the chip set proving RecursionProgram execution.

Each instruction class is one chip; program structure (operand
addresses, opcode selectors, write multiplicities) lives in the
PREPROCESSED traces — bound by the recursion verifying key — while
runtime values live in the main traces (reference: the 11-chip
RecursionAir, crates/recursion/machine/src/machine.rs:31-47, chips under
crates/recursion/machine/src/chips/).

Memory argument: the write-once block memory is a LogUp multiset
argument (KIND_REC_MEM). The instruction that WRITES cell `a` with
block v sends (a, v0..v3) with multiplicity = the cell's static read
count; every READ receives (a, v0..v3) once. Cancellation forces each
read to observe the unique write's value (reference:
crates/recursion/machine/src/chips/mem/).

Public values: the CommitPV instruction receives (pv_index, value) in
KIND_REC_PV; the machine's public-values digest sends (i, pv[i]) for
every index, so each committed cell is forced equal to the claimed
public value (reference: recursion public-values binding in
crates/recursion/machine/src/chips/public_values.rs).
"""

from __future__ import annotations

import numpy as np

from ..air.builder import Affine, Chip, Interaction, main_col, prep_col
from ..field import koalabear as kb
from ..prover.machine import Machine
from ..verifier.backend import (
    EXTERNAL_RC,
    INTERNAL_DIAG,
    INTERNAL_RC,
    ROUNDS_F,
    ROUNDS_P,
    WIDTH,
)
from .program import NUM_BITS

KIND_REC_MEM = 40
KIND_REC_PV = 41

NUM_ROUNDS = ROUNDS_F + ROUNDS_P  # 28


def _mem_value(addr_aff, v_affs):
    """(addr, v0..v3) interaction value tuple; v_affs padded to 4."""
    vals = [addr_aff] + list(v_affs)
    while len(vals) < 5:
        vals.append(Affine.const(0))
    return tuple(vals)


def _recv(addr_aff, v_affs, mult):
    return Interaction(values=_mem_value(addr_aff, v_affs), multiplicity=mult,
                       kind=KIND_REC_MEM)


def _send(addr_aff, v_affs, mult):
    return Interaction(values=_mem_value(addr_aff, v_affs), multiplicity=mult,
                       kind=KIND_REC_MEM)


def _ext_mul_exprs(ops, a, b):
    """Schoolbook ext4 product of two 4-expression vectors (x^4 = 3)."""
    def m(i, j):
        return ops.mul(a[i], b[j])

    c0 = ops.add(m(0, 0), ops.scale_base(
        ops.add(ops.add(m(1, 3), m(2, 2)), m(3, 1)), 3))
    c1 = ops.add(ops.add(m(0, 1), m(1, 0)), ops.scale_base(
        ops.add(m(2, 3), m(3, 2)), 3))
    c2 = ops.add(ops.add(ops.add(m(0, 2), m(1, 1)), m(2, 0)),
                 ops.scale_base(m(3, 3), 3))
    c3 = ops.add(ops.add(ops.add(m(0, 3), m(1, 2)), m(2, 1)), m(3, 0))
    return [c0, c1, c2, c3]


class RecBaseAluChip(Chip):
    """prep: is_add,is_sub,is_mul,is_div,out,in1,in2,mult,is_real
    main: v1, v2, vout."""

    name = "RecBaseAlu"
    width = 3
    preprocessed_width = 9

    P_ADD, P_SUB, P_MUL, P_DIV, P_OUT, P_IN1, P_IN2, P_MULT, P_REAL = range(9)

    def eval(self, f):
        ops = f.ops
        is_add, is_sub, is_mul, is_div = f.preprocessed[:4]
        v1, v2, vout = f.main
        f.assert_zero(ops.mul(is_add, ops.sub(ops.add(v1, v2), vout)))
        f.assert_zero(ops.mul(is_sub, ops.sub(ops.sub(v1, v2), vout)))
        f.assert_zero(ops.mul(is_mul, ops.sub(ops.mul(v1, v2), vout)))
        f.assert_zero(ops.mul(is_div, ops.sub(ops.mul(vout, v2), v1)))

    def receives(self):
        real = Affine.col(prep_col(self.P_REAL))
        return [
            _recv(Affine.col(prep_col(self.P_IN1)), [Affine.col(main_col(0))], real),
            _recv(Affine.col(prep_col(self.P_IN2)), [Affine.col(main_col(1))], real),
        ]

    def sends(self):
        return [
            _send(Affine.col(prep_col(self.P_OUT)), [Affine.col(main_col(2))],
                  Affine.col(prep_col(self.P_MULT))),
        ]


class RecExtAluChip(Chip):
    """prep: is_add,is_sub,is_mul,is_div,out,in1,in2,mult,is_real
    main: v1[4], v2[4], vout[4]."""

    name = "RecExtAlu"
    width = 12
    preprocessed_width = 9

    P_ADD, P_SUB, P_MUL, P_DIV, P_OUT, P_IN1, P_IN2, P_MULT, P_REAL = range(9)

    def eval(self, f):
        ops = f.ops
        is_add, is_sub, is_mul, is_div = f.preprocessed[:4]
        v1 = f.main[0:4]
        v2 = f.main[4:8]
        vout = f.main[8:12]
        prod = _ext_mul_exprs(ops, v1, v2)
        dprod = _ext_mul_exprs(ops, vout, v2)
        for i in range(4):
            f.assert_zero(ops.mul(is_add, ops.sub(ops.add(v1[i], v2[i]), vout[i])))
            f.assert_zero(ops.mul(is_sub, ops.sub(ops.sub(v1[i], v2[i]), vout[i])))
            f.assert_zero(ops.mul(is_mul, ops.sub(prod[i], vout[i])))
            f.assert_zero(ops.mul(is_div, ops.sub(dprod[i], v1[i])))

    def receives(self):
        real = Affine.col(prep_col(self.P_REAL))
        return [
            _recv(Affine.col(prep_col(self.P_IN1)),
                  [Affine.col(main_col(i)) for i in range(4)], real),
            _recv(Affine.col(prep_col(self.P_IN2)),
                  [Affine.col(main_col(4 + i)) for i in range(4)], real),
        ]

    def sends(self):
        return [
            _send(Affine.col(prep_col(self.P_OUT)),
                  [Affine.col(main_col(8 + i)) for i in range(4)],
                  Affine.col(prep_col(self.P_MULT))),
        ]


class RecConstChip(Chip):
    """prep: addr, v0..v3, send_mult, recv_mult; main: one dummy column.

    Send rows produce constant cells; receive rows assert a computed
    cell equals the constant (the lowering of every assert_eq)."""

    name = "RecConst"
    width = 1
    preprocessed_width = 7

    def eval(self, f):
        pass

    def sends(self):
        return [
            _send(Affine.col(prep_col(0)),
                  [Affine.col(prep_col(1 + i)) for i in range(4)],
                  Affine.col(prep_col(5))),
        ]

    def receives(self):
        return [
            _recv(Affine.col(prep_col(0)),
                  [Affine.col(prep_col(1 + i)) for i in range(4)],
                  Affine.col(prep_col(6))),
        ]


class RecWitnessChip(Chip):
    """prep: addr, mult; main: v0..v3 (from the runtime witness stream)."""

    name = "RecWitness"
    width = 4
    preprocessed_width = 2

    def eval(self, f):
        pass

    def sends(self):
        return [
            _send(Affine.col(prep_col(0)),
                  [Affine.col(main_col(i)) for i in range(4)],
                  Affine.col(prep_col(1))),
        ]


class RecPoseidon2Chip(Chip):
    """Width-16 Poseidon2 permutation, one per row.

    prep: in_addr[16], out_addr[16], mult[16], is_real.
    main: input[16] + state after each of the 28 rounds (16 each).

    The pre-rounds external layer is folded into round 0's constraint
    (it is linear). Full-round constraint: s' = M_E * cube(s + rc)
    (degree 3); partial-round: lane0 cubed + internal diag layer
    (degree 3). Reference: the wide Poseidon2 chip
    crates/recursion/machine/src/chips/poseidon2_wide/."""

    name = "RecPoseidon2"
    width = 16 + 16 * NUM_ROUNDS
    preprocessed_width = 49

    def _ext_layer(self, ops, s):
        out = [None] * WIDTH
        for g in range(0, WIDTH, 4):
            x0, x1, x2, x3 = s[g:g + 4]
            # M4 rows: (2,3,1,1), (1,2,3,1), (1,1,2,3), (3,1,1,2)
            out[g] = ops.add(ops.add(ops.scale_base(x0, 2), ops.scale_base(x1, 3)),
                             ops.add(x2, x3))
            out[g + 1] = ops.add(ops.add(x0, ops.scale_base(x1, 2)),
                                 ops.add(ops.scale_base(x2, 3), x3))
            out[g + 2] = ops.add(ops.add(x0, x1),
                                 ops.add(ops.scale_base(x2, 2), ops.scale_base(x3, 3)))
            out[g + 3] = ops.add(ops.add(ops.scale_base(x0, 3), x1),
                                 ops.add(x2, ops.scale_base(x3, 2)))
        sums = [None] * 4
        for l in range(4):
            sums[l] = out[l]
            for g in range(4, WIDTH, 4):
                sums[l] = ops.add(sums[l], out[g + l])
        return [ops.add(out[i], sums[i % 4]) for i in range(WIDTH)]

    def eval(self, f):
        ops = f.ops

        def cube(e):
            return ops.mul(ops.mul(e, e), e)

        def state(r):
            """Stored state after loop round r (r = -1 -> input cols)."""
            if r < 0:
                return f.main[0:16]
            base = 16 + 16 * r
            return f.main[base:base + 16]

        half = ROUNDS_F // 2
        prev = self._ext_layer(ops, state(-1))  # pre-rounds layer (linear)
        r_idx = 0
        for r in range(half):
            cubes = [cube(ops.add(prev[i], ops.const(EXTERNAL_RC[r][i])))
                     for i in range(WIDTH)]
            nxt = self._ext_layer(ops, cubes)
            stored = state(r_idx)
            for i in range(WIDTH):
                f.assert_eq(stored[i], nxt[i])
            prev = stored
            r_idx += 1
        for r in range(ROUNDS_P):
            s0 = cube(ops.add(prev[0], ops.const(INTERNAL_RC[r])))
            star = [s0] + list(prev[1:])
            total = star[0]
            for i in range(1, WIDTH):
                total = ops.add(total, star[i])
            stored = state(r_idx)
            for i in range(WIDTH):
                f.assert_eq(
                    stored[i],
                    ops.add(ops.scale_base(star[i], INTERNAL_DIAG[i]), total),
                )
            prev = stored
            r_idx += 1
        for r in range(half, ROUNDS_F):
            cubes = [cube(ops.add(prev[i], ops.const(EXTERNAL_RC[r][i])))
                     for i in range(WIDTH)]
            nxt = self._ext_layer(ops, cubes)
            stored = state(r_idx)
            for i in range(WIDTH):
                f.assert_eq(stored[i], nxt[i])
            prev = stored
            r_idx += 1

    def receives(self):
        real = Affine.col(prep_col(48))
        return [
            _recv(Affine.col(prep_col(i)), [Affine.col(main_col(i))], real)
            for i in range(WIDTH)
        ]

    def sends(self):
        last = 16 + 16 * (NUM_ROUNDS - 1)
        return [
            _send(Affine.col(prep_col(16 + i)),
                  [Affine.col(main_col(last + i))],
                  Affine.col(prep_col(32 + i)))
            for i in range(WIDTH)
        ]


class RecSelectChip(Chip):
    """prep: bit,in1,in2,out1,out2,mult1,mult2,is_real
    main: b, v1[4], v2[4], o1[4], o2[4].
    o1 = b ? v2 : v1 ; o2 = b ? v1 : v2."""

    name = "RecSelect"
    width = 17
    preprocessed_width = 8

    P_BIT, P_IN1, P_IN2, P_OUT1, P_OUT2, P_M1, P_M2, P_REAL = range(8)

    def eval(self, f):
        ops = f.ops
        b = f.main[0]
        v1 = f.main[1:5]
        v2 = f.main[5:9]
        o1 = f.main[9:13]
        o2 = f.main[13:17]
        f.assert_bool(b)
        for i in range(4):
            f.assert_zero(ops.sub(
                o1[i], ops.add(v1[i], ops.mul(b, ops.sub(v2[i], v1[i])))))
            f.assert_zero(ops.sub(
                o2[i], ops.add(v2[i], ops.mul(b, ops.sub(v1[i], v2[i])))))

    def receives(self):
        real = Affine.col(prep_col(self.P_REAL))
        return [
            _recv(Affine.col(prep_col(self.P_BIT)), [Affine.col(main_col(0))], real),
            _recv(Affine.col(prep_col(self.P_IN1)),
                  [Affine.col(main_col(1 + i)) for i in range(4)], real),
            _recv(Affine.col(prep_col(self.P_IN2)),
                  [Affine.col(main_col(5 + i)) for i in range(4)], real),
        ]

    def sends(self):
        return [
            _send(Affine.col(prep_col(self.P_OUT1)),
                  [Affine.col(main_col(9 + i)) for i in range(4)],
                  Affine.col(prep_col(self.P_M1))),
            _send(Affine.col(prep_col(self.P_OUT2)),
                  [Affine.col(main_col(13 + i)) for i in range(4)],
                  Affine.col(prep_col(self.P_M2))),
        ]


class RecBitsChip(Chip):
    """31-bit LSB-first decomposition with in-AIR uniqueness (< p).

    prep: src, out[31], mult[31], is_real; main: b[31], h[6].
    h is the running product of bits 24..30; if all are 1 the low 24
    bits must be 0 (p = 2^31 - 2^24 + 1, so the only canonical value
    with bits 24..30 all set is 0x7F000000)."""

    name = "RecBits"
    width = NUM_BITS + 6
    preprocessed_width = 2 * NUM_BITS + 2

    def eval(self, f):
        ops = f.ops
        b = f.main[:NUM_BITS]
        h = f.main[NUM_BITS:NUM_BITS + 6]
        for i in range(NUM_BITS):
            f.assert_bool(b[i])
        f.assert_eq(h[0], ops.mul(b[24], b[25]))
        for k in range(1, 6):
            f.assert_eq(h[k], ops.mul(h[k - 1], b[25 + k]))
        for j in range(24):
            f.assert_zero(ops.mul(h[5], b[j]))

    def receives(self):
        recomp = Affine(0, tuple(
            (main_col(i), (1 << i) % kb.P) for i in range(NUM_BITS)))
        real = Affine.col(prep_col(2 * NUM_BITS + 1))
        return [_recv(Affine.col(prep_col(0)), [recomp], real)]

    def sends(self):
        return [
            _send(Affine.col(prep_col(1 + i)), [Affine.col(main_col(i))],
                  Affine.col(prep_col(1 + NUM_BITS + i)))
            for i in range(NUM_BITS)
        ]


class RecConvertChip(Chip):
    """Pack 4 felts into an ext block / unpack a block into felts.

    prep: is_pack, blk, f0..f3, blk_mult, fmult[4], is_real; main: x[4].
    Pure data movement — the memory argument enforces equality."""

    name = "RecConvert"
    width = 4
    preprocessed_width = 12

    P_PACK, P_BLK, P_F0, P_F1, P_F2, P_F3, P_BMULT = range(7)
    P_FM0 = 7
    P_REAL = 11

    def eval(self, f):
        pass

    def receives(self):
        is_pack = Affine.col(prep_col(self.P_PACK))
        # unpack rows read the block: mult = is_real - is_pack
        blk_read = Affine(0, ((prep_col(self.P_REAL), 1), (prep_col(self.P_PACK), kb.P - 1)))
        out = [
            _recv(Affine.col(prep_col(self.P_BLK)),
                  [Affine.col(main_col(i)) for i in range(4)], blk_read),
        ]
        for i in range(4):
            out.append(_recv(Affine.col(prep_col(self.P_F0 + i)),
                             [Affine.col(main_col(i))], is_pack))
        return out

    def sends(self):
        out = [
            _send(Affine.col(prep_col(self.P_BLK)),
                  [Affine.col(main_col(i)) for i in range(4)],
                  Affine.col(prep_col(self.P_BMULT))),
        ]
        for i in range(4):
            out.append(_send(Affine.col(prep_col(self.P_F0 + i)),
                             [Affine.col(main_col(i))],
                             Affine.col(prep_col(self.P_FM0 + i))))
        return out


class RecPublicValuesChip(Chip):
    """prep: addr, pv_index, is_real; main: v.

    Receives (pv_index, v) in KIND_REC_PV against the machine's
    public-values digest, and reads the committed cell."""

    name = "RecPublicValues"
    width = 1
    preprocessed_width = 3

    def eval(self, f):
        pass

    def receives(self):
        real = Affine.col(prep_col(2))
        return [
            _recv(Affine.col(prep_col(0)), [Affine.col(main_col(0))], real),
            Interaction(
                values=(Affine.col(prep_col(1)), Affine.col(main_col(0))),
                multiplicity=real,
                kind=KIND_REC_PV,
            ),
        ]


class RecursionMachine(Machine):
    """Machine whose public-values digest sends (i, pv[i]) per index."""

    def max_pv_interaction_arity(self) -> int:
        return 3  # (index, value) + 1

    def eval_public_values(self, public_values, challenge, alpha, betas):
        from ..field import extension as ext

        E4 = ext.npext4
        digest = np.zeros(4, np.uint32)
        for i in range(self.num_pv_elts()):
            fp = E4.add(
                np.asarray(alpha, np.uint32),
                kb.npf.mul(np.asarray(betas[0], np.uint32), np.uint32(KIND_REC_PV)),
            )
            fp = E4.add(fp, kb.npf.mul(np.asarray(betas[1], np.uint32), np.uint32(i)))
            fp = E4.add(
                fp,
                kb.npf.mul(
                    np.asarray(betas[2], np.uint32),
                    np.uint32(int(public_values[i]) % kb.P),
                ),
            )
            digest = E4.add(digest, E4.inv(fp))
        return True, digest

    def pv_digest_spec(self):
        """Terms may reference a pv index (int) or a constant ("c", v)."""
        return (
            [],
            [
                (KIND_REC_PV, [("c", i), i], +1)
                for i in range(self.num_pv_elts())
            ],
        )


RECURSION_CHIPS = [
    RecBaseAluChip, RecExtAluChip, RecConstChip, RecWitnessChip,
    RecPoseidon2Chip, RecSelectChip, RecBitsChip, RecConvertChip,
    RecPublicValuesChip,
]


def build_recursion_machine(num_pvs: int) -> RecursionMachine:
    return RecursionMachine(
        [cls() for cls in RECURSION_CHIPS], num_pv_elts=num_pvs
    )

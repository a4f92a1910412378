"""Poseidon2 permutation precompile chip (syscall 38).

The guest permutes 16 KoalaBear elements in place (one element per
8-byte cell, low 32 bits, canonical). One trace row per call: the 28
round states are materialized as columns and each round's transition is
a degree-3 constraint, exactly like the recursion machine's wide
Poseidon2 chip (recursion/machine.py RecPoseidon2Chip; reference:
crates/core/machine/src/syscall/precompiles/poseidon2/ +
crates/recursion/machine/src/chips/poseidon2_wide/).

Memory-limb binding: the input field element of lane i is the u8-limb
composition of the read cell's low 4 bytes (high bytes asserted zero,
value proven < p with a borrow-chain lt); the output cell's bytes are
fresh columns whose composition must equal the final round state, also
proven canonical — so the bytes the memory argument carries determine
the field values uniquely in both directions.
"""

from __future__ import annotations

import numpy as np

from ..field import koalabear as kb
from ..ops.poseidon2 import (
    EXTERNAL_RC,
    INTERNAL_DIAG,
    INTERNAL_RC,
    ROUNDS_F,
    ROUNDS_P,
    WIDTH,
)
from . import fieldops as fo
from .curvechip import Affine, CallChip, Cols, main_col
from .fieldops import FieldLtBlock

NUM_ROUNDS = ROUNDS_F + ROUNDS_P

# 4-byte KoalaBear element params for the canonicality lt blocks
KB_FP4 = fo.FieldParams("kb31", kb.P, 4, 7, 1 << 14)

SYSCALL_POSEIDON2 = 38


class Poseidon2PermChip(CallChip):
    name = "Poseidon2Perm"
    SYSCALL_ID = SYSCALL_POSEIDON2
    N_READ = 16
    N_WRITE = 16

    def __init__(self, ws):
        self.in_lt: list = []
        self.out_lt: list = []
        super().__init__(ws)

    def extra_layout(self, c: Cols):
        c.cols("rstate", WIDTH * NUM_ROUNDS)
        c.cols("outb", WIDTH * 4)  # u8 limbs of each output element
        for i in range(WIDTH):
            blk = FieldLtBlock(f"ilt{i}", KB_FP4)
            blk.alloc(c)
            self.in_lt.append(blk)
            blk = FieldLtBlock(f"olt{i}", KB_FP4)
            blk.alloc(c)
            self.out_lt.append(blk)

    # -- constraint body -----------------------------------------------------
    def _ext_layer(self, ops, s):
        out = [None] * WIDTH
        for g in range(0, WIDTH, 4):
            x0, x1, x2, x3 = s[g : g + 4]
            out[g] = ops.add(
                ops.add(ops.scale_base(x0, 2), ops.scale_base(x1, 3)),
                ops.add(x2, x3),
            )
            out[g + 1] = ops.add(
                ops.add(x0, ops.scale_base(x1, 2)),
                ops.add(ops.scale_base(x2, 3), x3),
            )
            out[g + 2] = ops.add(
                ops.add(x0, x1),
                ops.add(ops.scale_base(x2, 2), ops.scale_base(x3, 3)),
            )
            out[g + 3] = ops.add(
                ops.add(ops.scale_base(x0, 3), x1),
                ops.add(x2, ops.scale_base(x3, 2)),
            )
        sums = [None] * 4
        for l in range(4):
            sums[l] = out[l]
            for g in range(4, WIDTH, 4):
                sums[l] = ops.add(sums[l], out[g + l])
        return [ops.add(out[i], sums[i % 4]) for i in range(WIDTH)]

    def eval_body(self, f, g):
        ops = f.ops
        gate = g("is_real")
        inb = g("inb")
        rstate = g("rstate")
        outb = g("outb")

        def cube(e):
            return ops.mul(ops.mul(e, e), e)

        def compose4(limbs):
            acc = limbs[0]
            for b in range(1, 4):
                acc = ops.add(acc, ops.scale_base(limbs[b], 1 << (8 * b)))
            return acc

        # inputs: low 4 bytes compose the element; high bytes are zero
        inputs = []
        for i in range(WIDTH):
            cell = inb[i * 8 : (i + 1) * 8]
            for b in cell[4:]:
                f.assert_zero(ops.mul(gate, b))
            inputs.append(compose4(cell[:4]))
            self.in_lt[i].eval(f, g, gate, cell[:4])

        def state(r):
            if r < 0:
                return inputs
            return rstate[WIDTH * r : WIDTH * (r + 1)]

        half = ROUNDS_F // 2
        prev = self._ext_layer(ops, state(-1))
        r_idx = 0
        for r in range(half):
            cubes = [
                cube(ops.add(prev[i], ops.const(int(EXTERNAL_RC[r][i]))))
                for i in range(WIDTH)
            ]
            nxt = self._ext_layer(ops, cubes)
            stored = state(r_idx)
            for i in range(WIDTH):
                # ungated (degree 3; zero padded rows give the CONSTANT
                # the zerocheck padding adjustment accounts for)
                f.assert_zero(ops.sub(stored[i], nxt[i]))
            prev = stored
            r_idx += 1
        for r in range(ROUNDS_P):
            s0 = cube(ops.add(prev[0], ops.const(int(INTERNAL_RC[r]))))
            star = [s0] + list(prev[1:])
            total = star[0]
            for i in range(1, WIDTH):
                total = ops.add(total, star[i])
            stored = state(r_idx)
            for i in range(WIDTH):
                f.assert_zero(
                    ops.sub(
                        stored[i],
                        ops.add(
                            ops.scale_base(star[i], int(INTERNAL_DIAG[i])),
                            total,
                        ),
                    )
                )
            prev = stored
            r_idx += 1
        for r in range(half, ROUNDS_F):
            cubes = [
                cube(ops.add(prev[i], ops.const(int(EXTERNAL_RC[r][i]))))
                for i in range(WIDTH)
            ]
            nxt = self._ext_layer(ops, cubes)
            stored = state(r_idx)
            for i in range(WIDTH):
                f.assert_zero(ops.sub(stored[i], nxt[i]))
            prev = stored
            r_idx += 1

        # outputs: fresh byte columns composing to the final state,
        # proven canonical (< p)
        final = state(NUM_ROUNDS - 1)
        for i in range(WIDTH):
            limbs = outb[i * 4 : (i + 1) * 4]
            f.assert_zero(ops.mul(gate, ops.sub(compose4(limbs), final[i])))
            self.out_lt[i].eval(f, g, gate, limbs)

    # -- range / write wiring ------------------------------------------------
    def u8_check_slices(self, L) -> list:
        out = [L["outb"]]
        for blk in self.in_lt + self.out_lt:
            out.append(L[blk.name + "_d"])
        return out

    def extra_sends(self, is_real) -> list:
        out = self._u8_sends(
            list(range(self.layout["outb"].start, self.layout["outb"].stop)),
            is_real,
        )
        for blk in self.in_lt + self.out_lt:
            out.extend(blk.range_sends(self.layout, is_real))
        return out

    def write_limb_aff(self, cell: int, limb: int) -> Affine:
        base = self.layout["outb"].start + cell * 4 + limb * 2
        if limb >= 2:  # high 32 bits of the cell are zero
            return Affine(0, ())
        return Affine(0, ((main_col(base), 1), (main_col(base + 1), 256)))

    def populate_row(self, row64, L, in_bytes) -> list:
        from ..recursion.tracegen import _p2_forward_states

        vals = np.zeros(WIDTH, np.uint64)
        for i in range(WIDTH):
            v = 0
            for b in range(8):
                v |= int(in_bytes[i * 8 + b]) << (8 * b)
            assert v < kb.P, "non-canonical poseidon2 input"
            vals[i] = v
        states = _p2_forward_states(vals[None, :])[0]  # (28, 16)
        row64[L["rstate"]] = states.reshape(-1)
        out_vals = [int(v) for v in states[-1]]
        for i, v in enumerate(out_vals):
            for b in range(4):
                row64[L["outb"].start + i * 4 + b] = (v >> (8 * b)) & 0xFF
        for i in range(WIDTH):
            self.in_lt[i].populate(row64, L, int(vals[i]))
            self.out_lt[i].populate(row64, L, out_vals[i])
        return out_vals

"""SHA-256 extend precompile chip.

Reference: crates/core/machine/src/syscall/precompiles/sha256/extend/
(ShaExtendChip: 48 rows per syscall, one message-schedule round each) and
the executor-side event recording in
crates/core/executor/src/syscalls/precompiles/sha256/extend.rs.

TPU-native design notes (deliberately NOT the reference layout):
  * The reference constrains consecutive rows of one call with multi-row
    AIRs. Our zerocheck is strictly single-row, so per-call continuity
    rides a LogUp "round chain" multiset instead: row j receives
    (clk, step, cell) and sends (clk+1, step+1, cell); the first row
    receives the Cpu's KIND_SYSCALL message and the last row (step=47)
    sends nothing. Step strictly increases along chain edges, so no
    cycle can balance, and every real row traces back to a real ecall.
  * All rotations/XORs are evaluated inline over the 32-bit operand bit
    decompositions as degree-<=3 polynomials — no extra lookup tables,
    which keeps every constraint in one fused XLA kernel.

ABI: ecall with a7=8, a0 = cell-aligned pointer to w[0..64], one u32 per
8-byte cell. Rounds run at clk+1+j; the Cpu ecall row's state-chain send
skips the 48-cycle window.
"""

from __future__ import annotations

import numpy as np

from ..air.builder import (
    KIND_MEMORY,
    KIND_PX_CHAIN,
    KIND_RANGE,
    KIND_SYSCALL,
    Affine,
    Chip,
    Interaction,
    main_col,
)
from ..field import koalabear as kb
from .machine import Cols, WordSpec, _aff

SHA_EXTEND_ID = 8
SHA_EXTEND_ROUNDS = 48
# read offsets (in cells, relative to ptr_cell + step) for w[i-15], w[i-2],
# w[i-16], w[i-7] with i = step + 16
READ_OFFS = (1, 14, 0, 9)
WRITE_OFF = 16
READ_SLOTS = (0, 1, 2, 3)
WRITE_SLOT = 4


def _pcell_limbs(ws: WordSpec) -> list:
    """Pointer limb indices (>=1) that contribute to the cell index."""
    return [i for i in range(1, ws.num_limbs) if ws.limb_bits * i < 24]


def sha_extend_layout(ws: WordSpec) -> Cols:
    c = Cols()
    nl, lw, tsl = ws.num_limbs, 32 // ws.limb_bits, ws.ts_limbs
    c.col("is_real")
    c.col("is_first")
    c.col("is_last")
    c.col("clk")  # per-round clk
    c.col("step")
    c.cols("ptr", nl)  # raw pointer limbs (constrained on first rows)
    # cell-index components: [ptr_limb0/8] + higher in-range pointer limbs
    c.cols("pcell", 1 + len(_pcell_limbs(ws)))
    c.cols("r_prev_ts", 4)
    c.cols("tsd_r", 4 * tsl)
    c.cols("r_val", 4 * nl)
    c.col("w_prev_ts")
    c.cols("tsd_w", tsl)
    c.cols("w_prev_val", nl)
    c.cols("w_new", lw)
    c.cols("b15", 32)  # bits of w[i-15] (low 32 of r_val[0])
    c.cols("b2", 32)  # bits of w[i-2] (low 32 of r_val[1])
    c.cols("c0", lw)  # addition carry bit 0
    c.cols("c1", lw)  # addition carry bit 1
    return c


def _xor2(ops, x, y):
    return ops.sub(ops.add(x, y), ops.scale_base(ops.mul(x, y), 2))


def _xor3(ops, x, y, z):
    s = ops.add(ops.add(x, y), z)
    p = ops.add(ops.add(ops.mul(x, y), ops.mul(y, z)), ops.mul(x, z))
    t = ops.mul(ops.mul(x, y), z)
    return ops.add(ops.sub(s, ops.scale_base(p, 2)), ops.scale_base(t, 4))


class ShaExtendChip(Chip):
    name = "ShaExtend"

    def __init__(self, ws: WordSpec):
        self.ws = ws
        self.layout = sha_extend_layout(ws)
        self.width = self.layout.n
        self.preprocessed_width = 0

    # -- affine helpers ------------------------------------------------------
    def _cell_aff(self, extra_const: int, with_step=True) -> Affine:
        """32 + cell index + step + extra (memory-argument address)."""
        ws, L = self.ws, self.layout
        terms = [(main_col(L["pcell"].start), 1)]
        for k, i in enumerate(_pcell_limbs(ws)):
            terms.append(
                (main_col(L["pcell"].start + 1 + k), 1 << (ws.limb_bits * i - 3))
            )
        if with_step:
            terms.append((main_col(L["step"]), 1))
        return Affine(32 + extra_const, tuple(terms))

    def _ts_aff(self, slot: int) -> Affine:
        return Affine(slot, ((main_col(self.layout["clk"]), 8),))

    def _chain_vals(self, shift: int) -> tuple:
        """(clk+shift, step+shift, *pcell components)."""
        L = self.layout
        vals = [
            Affine(shift, ((main_col(L["clk"]), 1),)),
            Affine(shift, ((main_col(L["step"]), 1),)),
        ]
        for k in range(L["pcell"].stop - L["pcell"].start):
            vals.append(_aff(L["pcell"].start + k))
        return tuple(vals)

    # -- constraints ---------------------------------------------------------
    def eval(self, f):
        ws, L = self.ws, self.layout
        ops = f.ops
        m = f.main
        nl, lw, tsl = ws.num_limbs, 32 // ws.limb_bits, ws.ts_limbs
        lb = ws.limb_bits

        def g(name):
            v = L[name]
            if isinstance(v, slice):
                return [m[i] for i in range(v.start, v.stop)]
            return m[v]

        one = ops.one()
        is_real, is_first, is_last = g("is_real"), g("is_first"), g("is_last")
        clk, step = g("clk"), g("step")
        f.assert_bool(is_real)
        f.assert_bool(is_first)
        f.assert_bool(is_last)
        # flags only on real rows
        f.assert_zero(ops.mul(is_first, ops.sub(one, is_real)))
        f.assert_zero(ops.mul(is_last, ops.sub(one, is_real)))
        # step boundaries (the chain forces everything in between)
        f.assert_zero(ops.mul(is_first, step))
        f.assert_zero(
            ops.mul(is_last, ops.sub(step, ops.const(SHA_EXTEND_ROUNDS - 1)))
        )

        # first-row pointer decode: pcell[0] = ptr_limb0 / 8 (alignment),
        # pcell[1+k] = ptr_limb_{i_k}; out-of-range limbs zero.
        ptr = g("ptr")
        pcell = g("pcell")
        f.assert_zero(
            ops.mul(is_first, ops.sub(ops.scale_base(pcell[0], 8), ptr[0]))
        )
        in_range = _pcell_limbs(ws)
        for k, i in enumerate(in_range):
            f.assert_zero(ops.mul(is_first, ops.sub(pcell[1 + k], ptr[i])))
        for i in range(1, nl):
            if i not in in_range:
                f.assert_zero(ops.mul(is_first, ptr[i]))

        # timestamp ordering: new_ts - prev_ts - 1 = sum(tsd * 2^(lb*i))
        r_prev_ts, tsd_r = g("r_prev_ts"), g("tsd_r")
        accs = []
        for k in range(4):
            acc = ops.zero()
            for i in range(tsl):
                acc = ops.add(
                    acc, ops.scale_base(tsd_r[k * tsl + i], 1 << (lb * i))
                )
            new_ts = ops.add(ops.scale_base(clk, 8), ops.const(READ_SLOTS[k]))
            f.assert_zero(
                ops.mul(
                    is_real,
                    ops.sub(ops.sub(ops.sub(new_ts, r_prev_ts[k]), one), acc),
                )
            )
            accs.append(acc)
        w_prev_ts, tsd_w = g("w_prev_ts"), g("tsd_w")
        acc = ops.zero()
        for i in range(tsl):
            acc = ops.add(acc, ops.scale_base(tsd_w[i], 1 << (lb * i)))
        new_ts = ops.add(ops.scale_base(clk, 8), ops.const(WRITE_SLOT))
        f.assert_zero(
            ops.mul(
                is_real, ops.sub(ops.sub(ops.sub(new_ts, w_prev_ts), one), acc)
            )
        )

        # bit decompositions of w[i-15] and w[i-2] (low 32 bits of the cells)
        r_val = g("r_val")
        b15, b2 = g("b15"), g("b2")
        for bit in b15 + b2:
            f.assert_bool(bit)
        for name, bits, base_idx in (("b15", b15, 0), ("b2", b2, 1)):
            for l in range(lw):
                acc = ops.zero()
                for t in range(lb):
                    acc = ops.add(acc, ops.scale_base(bits[l * lb + t], 1 << t))
                f.assert_eq(acc, r_val[base_idx * nl + l])

        # message schedule bits:
        # s0 = rotr(w15,7) ^ rotr(w15,18) ^ (w15 >> 3)
        # s1 = rotr(w2,17) ^ rotr(w2,19) ^ (w2 >> 10)
        def s0_bit(k):
            x, y = b15[(k + 7) % 32], b15[(k + 18) % 32]
            if k < 29:
                return _xor3(ops, x, y, b15[k + 3])
            return _xor2(ops, x, y)

        def s1_bit(k):
            x, y = b2[(k + 17) % 32], b2[(k + 19) % 32]
            if k < 22:
                return _xor3(ops, x, y, b2[k + 10])
            return _xor2(ops, x, y)

        # w_new = w[i-16] + s0 + w[i-7] + s1 (mod 2^32), limb-wise with
        # 2-bit carries; s0/s1 limbs are inline degree-3 bit expressions,
        # so these constraints stay ungated (all-zero padded rows satisfy
        # them identically).
        w_new, c0, c1 = g("w_new"), g("c0"), g("c1")
        for b in c0 + c1:
            f.assert_bool(b)
        for l in range(lw):
            s0_l = ops.zero()
            s1_l = ops.zero()
            for t in range(lb):
                s0_l = ops.add(s0_l, ops.scale_base(s0_bit(l * lb + t), 1 << t))
                s1_l = ops.add(s1_l, ops.scale_base(s1_bit(l * lb + t), 1 << t))
            lhs = ops.add(
                ops.add(r_val[2 * nl + l], s0_l),
                ops.add(r_val[3 * nl + l], s1_l),
            )
            if l > 0:
                carry_in = ops.add(c0[l - 1], ops.scale_base(c1[l - 1], 2))
                lhs = ops.add(lhs, carry_in)
            carry = ops.add(c0[l], ops.scale_base(c1[l], 2))
            rhs = ops.add(w_new[l], ops.scale_base(carry, 1 << lb))
            f.assert_eq(lhs, rhs)

    # -- interactions ----------------------------------------------------------
    def sends(self) -> list:
        ws, L = self.ws, self.layout
        nl, lw, tsl = ws.num_limbs, 32 // ws.limb_bits, ws.ts_limbs
        is_real = _aff(L["is_real"])
        out = []
        # round chain: (clk+1, step+1, cell comps), everyone but the last
        chain_out_mult = Affine(
            0, ((main_col(L["is_real"]), 1), (main_col(L["is_last"]), kb.P - 1))
        )
        out.append(Interaction(self._chain_vals(1), chain_out_mult, KIND_PX_CHAIN))
        # memory: new read states (same value, bumped ts)
        for k in range(4):
            vals = [self._cell_aff(READ_OFFS[k]), self._ts_aff(READ_SLOTS[k])]
            vals += [_aff(L["r_val"].start + k * nl + i) for i in range(nl)]
            out.append(Interaction(tuple(vals), is_real, KIND_MEMORY))
        # memory: the w[i] write (upper limbs of the new value are zero)
        wvals = [self._cell_aff(WRITE_OFF), self._ts_aff(WRITE_SLOT)]
        wvals += [_aff(L["w_new"].start + i) for i in range(lw)]
        wvals += [Affine.const(0)] * (nl - lw)
        out.append(Interaction(tuple(wvals), is_real, KIND_MEMORY))
        # range checks
        for k in range(4 * tsl):
            out.append(Interaction((_aff(L["tsd_r"].start + k),), is_real, KIND_RANGE))
        for i in range(tsl):
            out.append(Interaction((_aff(L["tsd_w"].start + i),), is_real, KIND_RANGE))
        for i in range(lw):
            out.append(Interaction((_aff(L["w_new"].start + i),), is_real, KIND_RANGE))
        out.append(
            Interaction((_aff(L["pcell"].start),), _aff(L["is_first"]), KIND_RANGE)
        )
        return out

    def receives(self) -> list:
        ws, L = self.ws, self.layout
        nl, tsl = ws.num_limbs, ws.ts_limbs
        is_real = _aff(L["is_real"])
        out = []
        # the Cpu's syscall dispatch: (id, parent clk, raw pointer limbs)
        sys_vals = [
            Affine.const(SHA_EXTEND_ID),
            Affine(kb.P - 1, ((main_col(L["clk"]), 1),)),
        ]
        sys_vals += [_aff(L["ptr"].start + i) for i in range(nl)]
        out.append(
            Interaction(tuple(sys_vals), _aff(L["is_first"]), KIND_SYSCALL)
        )
        # round chain in: everyone but the first
        chain_in_mult = Affine(
            0, ((main_col(L["is_real"]), 1), (main_col(L["is_first"]), kb.P - 1))
        )
        out.append(Interaction(self._chain_vals(0), chain_in_mult, KIND_PX_CHAIN))
        # memory: previous read/write states
        for k in range(4):
            vals = [self._cell_aff(READ_OFFS[k]), _aff(L["r_prev_ts"].start + k)]
            vals += [_aff(L["r_val"].start + k * nl + i) for i in range(nl)]
            out.append(Interaction(tuple(vals), is_real, KIND_MEMORY))
        wvals = [self._cell_aff(WRITE_OFF), _aff(L["w_prev_ts"])]
        wvals += [_aff(L["w_prev_val"].start + i) for i in range(nl)]
        out.append(Interaction(tuple(wvals), is_real, KIND_MEMORY))
        return out


# ---------------------------------------------------------------------------
# Trace generation
# ---------------------------------------------------------------------------


def generate_sha_extend_trace(px, ws: WordSpec, height: int):
    """Build the ShaExtend trace from kind==8 PxEvents.

    Returns (trace, n_rows, range_lookups) where range_lookups is a list of
    (values, multiplicities) pairs for the caller's Range-table tally.
    """
    L = sha_extend_layout(ws)
    nl, lw, tsl = ws.num_limbs, 32 // ws.limb_bits, ws.ts_limbs
    lb = ws.limb_bits
    mask = (1 << lb) - 1
    n = len(px)
    tr = np.zeros((height, L.n), np.uint32)
    if n == 0:
        return tr, 0, []

    step = px["step"].astype(np.uint64)
    clk = px["clk"].astype(np.uint64)
    tr[:n, L["is_real"]] = 1
    tr[:n, L["is_first"]] = (step == 0).astype(np.uint32)
    tr[:n, L["is_last"]] = (step == SHA_EXTEND_ROUNDS - 1).astype(np.uint32)
    tr[:n, L["clk"]] = clk.astype(np.uint32)
    tr[:n, L["step"]] = step.astype(np.uint32)

    ptr = px["ptr"].astype(np.uint64)
    for i in range(nl):
        tr[:n, L["ptr"].start + i] = ((ptr >> (lb * i)) & mask).astype(np.uint32)
    tr[:n, L["pcell"].start] = ((ptr & mask) >> 3).astype(np.uint32)
    for k, i in enumerate(_pcell_limbs(ws)):
        tr[:n, L["pcell"].start + 1 + k] = ((ptr >> (lb * i)) & mask).astype(
            np.uint32
        )

    range_lookups = []
    ones = np.ones(n, np.uint32)
    for k in range(4):
        prev = px["r_prev_ts"][:, k].astype(np.uint64)
        tr[:n, L["r_prev_ts"].start + k] = prev.astype(np.uint32)
        diff = clk * 8 + READ_SLOTS[k] - prev - 1
        for i in range(tsl):
            col = ((diff >> (lb * i)) & mask).astype(np.uint32)
            tr[:n, L["tsd_r"].start + k * tsl + i] = col
            range_lookups.append((col, ones))
        val = px["r_val"][:, k].astype(np.uint64)
        for i in range(nl):
            tr[:n, L["r_val"].start + k * nl + i] = ((val >> (lb * i)) & mask).astype(
                np.uint32
            )
    prev = px["w_prev_ts"].astype(np.uint64)
    tr[:n, L["w_prev_ts"]] = prev.astype(np.uint32)
    diff = clk * 8 + WRITE_SLOT - prev - 1
    for i in range(tsl):
        col = ((diff >> (lb * i)) & mask).astype(np.uint32)
        tr[:n, L["tsd_w"].start + i] = col
        range_lookups.append((col, ones))
    wpv = px["w_prev_val"].astype(np.uint64)
    for i in range(nl):
        tr[:n, L["w_prev_val"].start + i] = ((wpv >> (lb * i)) & mask).astype(
            np.uint32
        )
    wv = px["w_val"].astype(np.uint64)
    for i in range(lw):
        col = ((wv >> (lb * i)) & mask).astype(np.uint32)
        tr[:n, L["w_new"].start + i] = col
        range_lookups.append((col, ones))
    range_lookups.append(
        (tr[:n, L["pcell"].start], tr[:n, L["is_first"]])
    )

    w15 = px["r_val"][:, 0].astype(np.uint64) & 0xFFFFFFFF
    w2 = px["r_val"][:, 1].astype(np.uint64) & 0xFFFFFFFF
    for t in range(32):
        tr[:n, L["b15"].start + t] = ((w15 >> t) & 1).astype(np.uint32)
        tr[:n, L["b2"].start + t] = ((w2 >> t) & 1).astype(np.uint32)

    # addition carries: w_new = w16 + s0 + w7 + s1 limb-wise
    def rotr(x, r):
        return ((x >> r) | (x << (32 - r))) & 0xFFFFFFFF

    s0 = rotr(w15, 7) ^ rotr(w15, 18) ^ (w15 >> 3)
    s1 = rotr(w2, 17) ^ rotr(w2, 19) ^ (w2 >> 10)
    w16 = px["r_val"][:, 2].astype(np.uint64) & 0xFFFFFFFF
    w7 = px["r_val"][:, 3].astype(np.uint64) & 0xFFFFFFFF
    carry = np.zeros(n, np.uint64)
    for l in range(lw):
        tot = (
            ((w16 >> (lb * l)) & mask)
            + ((s0 >> (lb * l)) & mask)
            + ((w7 >> (lb * l)) & mask)
            + ((s1 >> (lb * l)) & mask)
            + carry
        )
        carry = (tot - ((wv >> (lb * l)) & mask)) >> lb
        tr[:n, L["c0"].start + l] = (carry & 1).astype(np.uint32)
        tr[:n, L["c1"].start + l] = (carry >> 1).astype(np.uint32)
    return tr, n, range_lookups

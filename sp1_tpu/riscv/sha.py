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
    KIND_SHA_K,
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
    return [i for i in range(1, ws.num_limbs) if ws.limb_bits * i < 32]


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
        """(id, clk+shift, step+shift, *pcell components). The leading
        syscall-id constant keeps chain tuples of different precompiles
        from ever RLC-colliding (tuples of unequal length zero-pad)."""
        L = self.layout
        vals = [
            Affine.const(SHA_EXTEND_ID),
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


# ---------------------------------------------------------------------------
# SHA-256 compress
# ---------------------------------------------------------------------------

SHA_COMPRESS_ID = 9
SHA_COMPRESS_ROUNDS = 80  # 8 init reads + 64 compression rounds + 8 finalize
H_CELL_OFF = 64  # h[0..8] lives at cells 64..72 of the single buffer

SHA_K = (
    0x428A2F98, 0x71374491, 0xB5C0FBCF, 0xE9B5DBA5, 0x3956C25B, 0x59F111F1,
    0x923F82A4, 0xAB1C5ED5, 0xD807AA98, 0x12835B01, 0x243185BE, 0x550C7DC3,
    0x72BE5D74, 0x80DEB1FE, 0x9BDC06A7, 0xC19BF174, 0xE49B69C1, 0xEFBE4786,
    0x0FC19DC6, 0x240CA1CC, 0x2DE92C6F, 0x4A7484AA, 0x5CB0A9DC, 0x76F988DA,
    0x983E5152, 0xA831C66D, 0xB00327C8, 0xBF597FC7, 0xC6E00BF3, 0xD5A79147,
    0x06CA6351, 0x14292967, 0x27B70A85, 0x2E1B2138, 0x4D2C6DFC, 0x53380D13,
    0x650A7354, 0x766A0ABB, 0x81C2C92E, 0x92722C85, 0xA2BFE8A1, 0xA81A664B,
    0xC24B8B70, 0xC76C51A3, 0xD192E819, 0xD6990624, 0xF40E3585, 0x106AA070,
    0x19A4C116, 0x1E376C08, 0x2748774C, 0x34B0BCB5, 0x391C0CB3, 0x4ED8AA4A,
    0x5B9CCA4F, 0x682E6FF3, 0x748F82EE, 0x78A5636F, 0x84C87814, 0x8CC70208,
    0x90BEFFFA, 0xA4506CEB, 0xBEF9A3F7, 0xC67178F2,
)


class ShaKChip(Chip):
    """Preprocessed SHA-256 round-constant table: (round index, k limbs).

    Reference role: the reference bakes k[i] into the ShaCompress AIR's
    per-row constraints (crates/core/machine/src/syscall/precompiles/
    sha256/compress/columns.rs); our rows are not call-aligned, so the
    constant rides a lookup instead. The lookup doubles as the proof
    that a compress-phase row's round index lies in 0..64."""

    name = "ShaK"
    width = 1  # multiplicity

    def __init__(self, ws: WordSpec):
        self.ws = ws
        self.preprocessed_width = 1 + 32 // ws.limb_bits

    def eval(self, f):
        pass

    def receives(self) -> list:
        from ..air.builder import prep_col

        lw = 32 // self.ws.limb_bits
        vals = tuple(Affine.col(prep_col(i)) for i in range(1 + lw))
        return [Interaction(vals, Affine.col(main_col(0)), KIND_SHA_K)]


def sha_compress_layout(ws: WordSpec) -> Cols:
    c = Cols()
    nl, lw, tsl = ws.num_limbs, 32 // ws.limb_bits, ws.ts_limbs
    c.col("is_real")
    c.col("is_first")
    c.col("is_last")
    c.col("is_init")
    c.col("is_compress")
    c.col("is_finalize")
    c.cols("oh", 8)  # slot one-hot (init/finalize rows)
    c.col("clk")
    c.col("step")
    c.cols("ptr", nl)
    c.cols("pcell", 1 + len(_pcell_limbs(ws)))
    c.cols("state", 8 * lw)  # incoming working vars a..h (chain in)
    c.cols("ns", 8 * lw)  # outgoing working vars (chain out)
    c.cols("k", lw)  # round constant (ShaK lookup on compress rows)
    c.cols("rv", nl)  # memory read value (h[slot] on init, w[i] on compress)
    c.col("r_prev_ts")
    c.cols("tsd_r", tsl)
    c.col("w_prev_ts")
    c.cols("tsd_w", tsl)
    c.cols("w_prev_val", nl)
    c.cols("wv", lw)  # finalize write value = prev + state[slot] mod 2^32
    c.cols("fc", lw)  # finalize add carries
    c.cols("sel", lw)  # oh-selected state word (finalize)
    for nm in ("ba", "bb", "bc", "be", "bf", "bg"):
        c.cols(nm, 32)  # bits of working vars a,b,c,e,f,g
    c.cols("t1", lw)  # temp1 = h + S1 + ch + k + w
    c.cols("tc0", lw)  # temp1 carry bits (carry in 0..5)
    c.cols("tc1", lw)
    c.cols("tc2", lw)
    c.cols("t2", lw)  # temp2 = S0 + maj
    c.cols("t2c", lw)
    c.cols("ec", lw)  # new_e = d + t1 carries
    c.cols("ac", lw)  # new_a = t1 + t2 carries
    return c


class ShaCompressChip(Chip):
    """SHA-256 compress precompile chip.

    Reference: crates/core/machine/src/syscall/precompiles/sha256/compress/
    (80 rows per syscall: 8 initialize + 64 compression + 8 finalize) and
    executor events in crates/core/executor/src/syscalls/precompiles/
    sha256/compress.rs.

    Same TPU-native round-chain design as ShaExtendChip, with the 8
    working variables carried inside the KIND_PX_CHAIN message so each
    row is a pure single-row AIR. ABI: ecall a7=9, a0 = cell-aligned
    buffer [w[0..64], h[0..8]] (one u32 per 8-byte cell; h at cells
    64..72). Phases are forced by step: init rows prove step==slot,
    finalize rows step==72+slot (slot one-hot), and compress rows prove
    step-8 in 0..64 through the ShaK table lookup."""

    name = "ShaCompress"

    def __init__(self, ws: WordSpec):
        self.ws = ws
        self.layout = sha_compress_layout(ws)
        self.width = self.layout.n
        self.preprocessed_width = 0

    # -- affine helpers ----------------------------------------------------
    def _buf_cell(self, terms_extra=(), const_extra: int = 0) -> Affine:
        """32 + buffer cell index (+ extras) as a memory-argument address."""
        ws, L = self.ws, self.layout
        terms = [(main_col(L["pcell"].start), 1)]
        for k, i in enumerate(_pcell_limbs(ws)):
            terms.append(
                (main_col(L["pcell"].start + 1 + k), 1 << (ws.limb_bits * i - 3))
            )
        return Affine(32 + const_extra, tuple(terms) + tuple(terms_extra))

    def _h_cell(self) -> Affine:
        # h[slot]: base + 64 + sum(j * oh[j])
        L = self.layout
        oh_terms = tuple(
            (main_col(L["oh"].start + j), j) for j in range(1, 8)
        )
        return self._buf_cell(oh_terms, H_CELL_OFF)

    def _w_cell(self) -> Affine:
        # w[step-8]
        L = self.layout
        return self._buf_cell(((main_col(L["step"]), 1),), -8)

    def _chain_vals(self, shift: int, state_slice: str) -> tuple:
        L = self.layout
        vals = [
            Affine.const(SHA_COMPRESS_ID),
            Affine(shift, ((main_col(L["clk"]), 1),)),
            Affine(shift, ((main_col(L["step"]), 1),)),
        ]
        for k in range(L["pcell"].stop - L["pcell"].start):
            vals.append(_aff(L["pcell"].start + k))
        s = L[state_slice]
        vals.extend(_aff(s.start + i) for i in range(s.stop - s.start))
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
        is_init, is_compress, is_finalize = (
            g("is_init"), g("is_compress"), g("is_finalize"),
        )
        clk, step, oh = g("clk"), g("step"), g("oh")
        for flag in (is_real, is_first, is_last, is_init, is_compress, is_finalize):
            f.assert_bool(flag)
        f.assert_eq(
            ops.add(ops.add(is_init, is_compress), is_finalize), is_real
        )
        f.assert_zero(ops.mul(is_first, ops.sub(one, is_real)))
        f.assert_zero(ops.mul(is_last, ops.sub(one, is_real)))
        f.assert_zero(ops.mul(is_first, step))
        f.assert_zero(
            ops.mul(is_last, ops.sub(step, ops.const(SHA_COMPRESS_ROUNDS - 1)))
        )
        # slot one-hot: sum = is_init + is_finalize; phase<->step binding
        oh_sum, slotidx = ops.zero(), ops.zero()
        for j in range(8):
            f.assert_bool(oh[j])
            oh_sum = ops.add(oh_sum, oh[j])
            if j:
                slotidx = ops.add(slotidx, ops.scale_base(oh[j], j))
        f.assert_eq(oh_sum, ops.add(is_init, is_finalize))
        f.assert_zero(ops.mul(is_init, ops.sub(step, slotidx)))
        f.assert_zero(
            ops.mul(
                is_finalize,
                ops.sub(step, ops.add(slotidx, ops.const(SHA_COMPRESS_ROUNDS - 8))),
            )
        )

        # first-row pointer decode (same shape as ShaExtendChip)
        ptr, pcell = g("ptr"), g("pcell")
        f.assert_zero(
            ops.mul(is_first, ops.sub(ops.scale_base(pcell[0], 8), ptr[0]))
        )
        in_range = _pcell_limbs(ws)
        for k, i in enumerate(in_range):
            f.assert_zero(ops.mul(is_first, ops.sub(pcell[1 + k], ptr[i])))
        for i in range(1, nl):
            if i not in in_range:
                f.assert_zero(ops.mul(is_first, ptr[i]))

        # timestamp ordering
        is_read_row = ops.add(is_init, is_compress)
        r_prev_ts, tsd_r = g("r_prev_ts"), g("tsd_r")
        acc = ops.zero()
        for i in range(tsl):
            acc = ops.add(acc, ops.scale_base(tsd_r[i], 1 << (lb * i)))
        new_ts = ops.scale_base(clk, 8)  # read slot 0
        f.assert_zero(
            ops.mul(
                is_read_row,
                ops.sub(ops.sub(ops.sub(new_ts, r_prev_ts), one), acc),
            )
        )
        w_prev_ts, tsd_w = g("w_prev_ts"), g("tsd_w")
        acc = ops.zero()
        for i in range(tsl):
            acc = ops.add(acc, ops.scale_base(tsd_w[i], 1 << (lb * i)))
        new_ts = ops.add(ops.scale_base(clk, 8), ops.const(WRITE_SLOT))
        f.assert_zero(
            ops.mul(
                is_finalize,
                ops.sub(ops.sub(ops.sub(new_ts, w_prev_ts), one), acc),
            )
        )

        # working-variable bit decompositions (ungated; zero rows satisfy)
        state = g("state")
        bits = {nm: g(nm) for nm in ("ba", "bb", "bc", "be", "bf", "bg")}
        word_of = {"ba": 0, "bb": 1, "bc": 2, "be": 4, "bf": 5, "bg": 6}
        for nm, bs in bits.items():
            for bit in bs:
                f.assert_bool(bit)
            w = word_of[nm]
            for l in range(lw):
                acc = ops.zero()
                for t in range(lb):
                    acc = ops.add(acc, ops.scale_base(bs[l * lb + t], 1 << t))
                f.assert_eq(acc, state[w * lw + l])

        ba, bb, bc = bits["ba"], bits["bb"], bits["bc"]
        be, bf_, bg = bits["be"], bits["bf"], bits["bg"]

        # S1 = rotr(e,6)^rotr(e,11)^rotr(e,25); ch = e&f ^ ~e&g
        def s1_bit(t):
            return _xor3(
                ops, be[(t + 6) % 32], be[(t + 11) % 32], be[(t + 25) % 32]
            )

        def ch_bit(t):
            # g + e*f - e*g
            return ops.add(
                bg[t], ops.sub(ops.mul(be[t], bf_[t]), ops.mul(be[t], bg[t]))
            )

        # S0 = rotr(a,2)^rotr(a,13)^rotr(a,22); maj = ab+ac+bc-2abc
        def s0_bit(t):
            return _xor3(
                ops, ba[(t + 2) % 32], ba[(t + 13) % 32], ba[(t + 22) % 32]
            )

        def maj_bit(t):
            s = ops.add(
                ops.add(ops.mul(ba[t], bb[t]), ops.mul(ba[t], bc[t])),
                ops.mul(bb[t], bc[t]),
            )
            return ops.sub(
                s, ops.scale_base(ops.mul(ops.mul(ba[t], bb[t]), bc[t]), 2)
            )

        # t1 = h + S1 + ch + k + rv (ungated limb equation, 3-bit carries)
        k_c, rv = g("k"), g("rv")
        t1, tc0, tc1, tc2 = g("t1"), g("tc0"), g("tc1"), g("tc2")
        t2, t2c = g("t2"), g("t2c")
        for b in tc0 + tc1 + tc2 + t2c:
            f.assert_bool(b)
        for l in range(lw):
            s1_l, ch_l, s0_l, mj_l = (ops.zero(),) * 4
            for t in range(lb):
                s1_l = ops.add(s1_l, ops.scale_base(s1_bit(l * lb + t), 1 << t))
                ch_l = ops.add(ch_l, ops.scale_base(ch_bit(l * lb + t), 1 << t))
                s0_l = ops.add(s0_l, ops.scale_base(s0_bit(l * lb + t), 1 << t))
                mj_l = ops.add(mj_l, ops.scale_base(maj_bit(l * lb + t), 1 << t))
            lhs = ops.add(
                ops.add(state[7 * lw + l], ops.add(s1_l, ch_l)),
                ops.add(k_c[l], rv[l]),
            )
            if l:
                lhs = ops.add(
                    lhs,
                    ops.add(
                        ops.add(tc0[l - 1], ops.scale_base(tc1[l - 1], 2)),
                        ops.scale_base(tc2[l - 1], 4),
                    ),
                )
            carry = ops.add(
                ops.add(tc0[l], ops.scale_base(tc1[l], 2)),
                ops.scale_base(tc2[l], 4),
            )
            f.assert_eq(lhs, ops.add(t1[l], ops.scale_base(carry, 1 << lb)))
            # t2 = S0 + maj
            lhs2 = ops.add(s0_l, mj_l)
            if l:
                lhs2 = ops.add(lhs2, t2c[l - 1])
            f.assert_eq(
                lhs2, ops.add(t2[l], ops.scale_base(t2c[l], 1 << lb))
            )

        # next state (phase-muxed)
        ns, ec, ac = g("ns"), g("ec"), g("ac")
        for b in ec + ac:
            f.assert_bool(b)
        # compress: a' = t1 + t2, e' = d + t1, rest shift down
        for l in range(lw):
            lhs = ops.add(t1[l], t2[l])
            if l:
                lhs = ops.add(lhs, ac[l - 1])
            f.assert_zero(
                ops.mul(
                    is_compress,
                    ops.sub(
                        lhs, ops.add(ns[l], ops.scale_base(ac[l], 1 << lb))
                    ),
                )
            )
            lhs = ops.add(state[3 * lw + l], t1[l])
            if l:
                lhs = ops.add(lhs, ec[l - 1])
            f.assert_zero(
                ops.mul(
                    is_compress,
                    ops.sub(
                        lhs,
                        ops.add(ns[4 * lw + l], ops.scale_base(ec[l], 1 << lb)),
                    ),
                )
            )
        for dst, src in ((1, 0), (2, 1), (3, 2), (5, 4), (6, 5), (7, 6)):
            for l in range(lw):
                f.assert_zero(
                    ops.mul(
                        is_compress,
                        ops.sub(ns[dst * lw + l], state[src * lw + l]),
                    )
                )
        # init: ns[w] = state[w] + oh[w]*(rv - state[w]); finalize: ns = state
        for w in range(8):
            for l in range(lw):
                delta = ops.mul(
                    oh[w], ops.sub(rv[l], state[w * lw + l])
                )
                f.assert_zero(
                    ops.mul(
                        is_init,
                        ops.sub(ops.sub(ns[w * lw + l], state[w * lw + l]), delta),
                    )
                )
                f.assert_zero(
                    ops.mul(
                        is_finalize,
                        ops.sub(ns[w * lw + l], state[w * lw + l]),
                    )
                )

        # finalize write value: wv = w_prev_val + state[slot] mod 2^32
        sel, wv, fc = g("sel"), g("wv"), g("fc")
        w_prev_val = g("w_prev_val")
        for b in fc:
            f.assert_bool(b)
        for l in range(lw):
            acc = ops.zero()
            for j in range(8):
                acc = ops.add(acc, ops.mul(oh[j], state[j * lw + l]))
            f.assert_eq(sel[l], acc)  # ungated (oh all-zero rows force 0)
            lhs = ops.add(w_prev_val[l], sel[l])
            if l:
                lhs = ops.add(lhs, fc[l - 1])
            f.assert_zero(
                ops.mul(
                    is_finalize,
                    ops.sub(lhs, ops.add(wv[l], ops.scale_base(fc[l], 1 << lb))),
                )
            )

    # -- interactions --------------------------------------------------------
    def sends(self) -> list:
        ws, L = self.ws, self.layout
        nl, lw, tsl = ws.num_limbs, 32 // ws.limb_bits, ws.ts_limbs
        is_real = _aff(L["is_real"])
        is_init, is_compress, is_finalize = (
            _aff(L["is_init"]), _aff(L["is_compress"]), _aff(L["is_finalize"]),
        )
        read_mult = Affine(
            0, ((main_col(L["is_init"]), 1), (main_col(L["is_compress"]), 1))
        )
        out = []
        # round chain out: everyone but the last (carries ns)
        chain_out_mult = Affine(
            0, ((main_col(L["is_real"]), 1), (main_col(L["is_last"]), kb.P - 1))
        )
        out.append(
            Interaction(self._chain_vals(1, "ns"), chain_out_mult, KIND_PX_CHAIN)
        )
        # ShaK lookup: (step - 8, k limbs) on compress rows
        kvals = [Affine(kb.P - 8, ((main_col(L["step"]), 1),))]
        kvals += [_aff(L["k"].start + i) for i in range(lw)]
        out.append(Interaction(tuple(kvals), is_compress, KIND_SHA_K))
        # memory: bumped read state (h[slot] on init, w[step-8] on compress)
        for cell_aff, mult in ((self._h_cell(), is_init), (self._w_cell(), is_compress)):
            vals = [cell_aff, Affine(0, ((main_col(L["clk"]), 8),))]
            vals += [_aff(L["rv"].start + i) for i in range(nl)]
            out.append(Interaction(tuple(vals), mult, KIND_MEMORY))
        # memory: the finalize h write (upper limbs zeroed)
        wvals = [self._h_cell(), self._ts_aff(WRITE_SLOT)]
        wvals += [_aff(L["wv"].start + i) for i in range(lw)]
        wvals += [Affine.const(0)] * (nl - lw)
        out.append(Interaction(tuple(wvals), is_finalize, KIND_MEMORY))
        # range checks
        for i in range(tsl):
            out.append(Interaction((_aff(L["tsd_r"].start + i),), read_mult, KIND_RANGE))
            out.append(
                Interaction((_aff(L["tsd_w"].start + i),), is_finalize, KIND_RANGE)
            )
        for i in range(lw):
            out.append(Interaction((_aff(L["wv"].start + i),), is_finalize, KIND_RANGE))
            out.append(Interaction((_aff(L["t1"].start + i),), is_compress, KIND_RANGE))
            out.append(Interaction((_aff(L["t2"].start + i),), is_compress, KIND_RANGE))
            # new a and e words feed the next round's mod-2^32 math
            out.append(Interaction((_aff(L["ns"].start + i),), is_compress, KIND_RANGE))
            out.append(
                Interaction(
                    (_aff(L["ns"].start + 4 * lw + i),), is_compress, KIND_RANGE
                )
            )
        out.append(
            Interaction((_aff(L["pcell"].start),), _aff(L["is_first"]), KIND_RANGE)
        )
        return out

    def _ts_aff(self, slot: int) -> Affine:
        return Affine(slot, ((main_col(self.layout["clk"]), 8),))

    def receives(self) -> list:
        ws, L = self.ws, self.layout
        nl = ws.num_limbs
        is_init, is_compress, is_finalize = (
            _aff(L["is_init"]), _aff(L["is_compress"]), _aff(L["is_finalize"]),
        )
        out = []
        # Cpu syscall dispatch (id, parent clk, raw pointer limbs)
        sys_vals = [
            Affine.const(SHA_COMPRESS_ID),
            Affine(kb.P - 1, ((main_col(L["clk"]), 1),)),
        ]
        sys_vals += [_aff(L["ptr"].start + i) for i in range(nl)]
        out.append(Interaction(tuple(sys_vals), _aff(L["is_first"]), KIND_SYSCALL))
        # round chain in: everyone but the first (carries state)
        chain_in_mult = Affine(
            0, ((main_col(L["is_real"]), 1), (main_col(L["is_first"]), kb.P - 1))
        )
        out.append(
            Interaction(self._chain_vals(0, "state"), chain_in_mult, KIND_PX_CHAIN)
        )
        # memory: previous read state
        for cell_aff, mult in ((self._h_cell(), is_init), (self._w_cell(), is_compress)):
            vals = [cell_aff, _aff(L["r_prev_ts"])]
            vals += [_aff(L["rv"].start + i) for i in range(nl)]
            out.append(Interaction(tuple(vals), mult, KIND_MEMORY))
        # memory: previous write state
        wvals = [self._h_cell(), _aff(L["w_prev_ts"])]
        wvals += [_aff(L["w_prev_val"].start + i) for i in range(nl)]
        out.append(Interaction(tuple(wvals), is_finalize, KIND_MEMORY))
        return out


def make_sha_k_preprocessed(ws: WordSpec, height: int):
    """(preprocessed trace, n_rows) for the ShaK table."""
    lw = 32 // ws.limb_bits
    mask = (1 << ws.limb_bits) - 1
    prep = np.zeros((height, 1 + lw), np.uint32)
    ks = np.asarray(SHA_K, np.uint64)
    prep[:64, 0] = np.arange(64)
    for i in range(lw):
        prep[:64, 1 + i] = ((ks >> (ws.limb_bits * i)) & mask).astype(np.uint32)
    return prep, 64


def generate_sha_compress_trace(px, ws: WordSpec, height: int):
    """Build the ShaCompress trace from kind==9 PxEvents.

    Returns (trace, n_rows, range_lookups, k_mult) where k_mult is the
    ShaK-table multiplicity histogram (length 64)."""
    L = sha_compress_layout(ws)
    nl, lw, tsl = ws.num_limbs, 32 // ws.limb_bits, ws.ts_limbs
    lb = ws.limb_bits
    mask = (1 << lb) - 1
    n = len(px)
    tr = np.zeros((height, L.n), np.uint32)
    if n == 0:
        return tr, 0, [], np.zeros(64, np.uint32)

    step = px["step"].astype(np.uint64)
    clk = px["clk"].astype(np.uint64)
    is_init = step < 8
    is_compress = (step >= 8) & (step < 72)
    is_finalize = step >= 72
    tr[:n, L["is_real"]] = 1
    tr[:n, L["is_first"]] = (step == 0).astype(np.uint32)
    tr[:n, L["is_last"]] = (step == SHA_COMPRESS_ROUNDS - 1).astype(np.uint32)
    tr[:n, L["is_init"]] = is_init.astype(np.uint32)
    tr[:n, L["is_compress"]] = is_compress.astype(np.uint32)
    tr[:n, L["is_finalize"]] = is_finalize.astype(np.uint32)
    slot = np.where(is_init, step, np.where(is_finalize, step - 72, 0))
    has_slot = is_init | is_finalize
    for j in range(8):
        tr[:n, L["oh"].start + j] = (has_slot & (slot == j)).astype(np.uint32)
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

    # replay the working variables per call (rows arrive clk-ordered, so
    # each call's 80 rows are contiguous and step-ordered)
    assert n % SHA_COMPRESS_ROUNDS == 0, "partial sha-compress call in shard"
    ncalls = n // SHA_COMPRESS_ROUNDS
    st2 = np.zeros((ncalls, 8), np.uint64)  # incoming state per call, updated
    rv_low = (px["r_val"][:, 0].astype(np.uint64) & 0xFFFFFFFF).reshape(
        ncalls, SHA_COMPRESS_ROUNDS
    )
    state_rows = np.zeros((ncalls, SHA_COMPRESS_ROUNDS, 8), np.uint64)
    ns_rows = np.zeros((ncalls, SHA_COMPRESS_ROUNDS, 8), np.uint64)
    t1_rows = np.zeros((ncalls, SHA_COMPRESS_ROUNDS), np.uint64)
    t2_rows = np.zeros((ncalls, SHA_COMPRESS_ROUNDS), np.uint64)
    M32 = np.uint64(0xFFFFFFFF)

    def rotr(x, r):
        return ((x >> np.uint64(r)) | (x << np.uint64(32 - r))) & M32

    for j in range(SHA_COMPRESS_ROUNDS):
        state_rows[:, j] = st2
        e, fv, gv, a0, b0, c0 = (
            st2[:, 4], st2[:, 5], st2[:, 6], st2[:, 0], st2[:, 1], st2[:, 2]
        )
        S1 = rotr(e, 6) ^ rotr(e, 11) ^ rotr(e, 25)
        ch = (e & fv) ^ (~e & gv) & M32
        S0 = rotr(a0, 2) ^ rotr(a0, 13) ^ rotr(a0, 22)
        maj = (a0 & b0) ^ (a0 & c0) ^ (b0 & c0)
        if j < 8:
            kj = np.uint64(0)
        elif j < 72:
            kj = np.uint64(SHA_K[j - 8])
        else:
            kj = np.uint64(0)
        w = rv_low[:, j]
        # ungated t1/t2 definitions hold on every real row
        t1_full = st2[:, 7] + S1 + (ch & M32) + kj + w
        t2_full = S0 + maj
        t1_rows[:, j] = t1_full
        t2_rows[:, j] = t2_full
        ns = st2.copy()
        if j < 8:
            ns[:, j] = w  # h[j] read
        elif j < 72:
            t1m = t1_full & M32
            ns[:, 7] = st2[:, 6]
            ns[:, 6] = st2[:, 5]
            ns[:, 5] = st2[:, 4]
            ns[:, 4] = (st2[:, 3] + t1m) & M32
            ns[:, 3] = st2[:, 2]
            ns[:, 2] = st2[:, 1]
            ns[:, 1] = st2[:, 0]
            ns[:, 0] = (t1m + (t2_full & M32)) & M32
        ns_rows[:, j] = ns
        st2 = ns

    state_flat = state_rows.reshape(n, 8)
    ns_flat = ns_rows.reshape(n, 8)
    for w in range(8):
        for l in range(lw):
            tr[:n, L["state"].start + w * lw + l] = (
                (state_flat[:, w] >> np.uint64(lb * l)) & mask
            ).astype(np.uint32)
            tr[:n, L["ns"].start + w * lw + l] = (
                (ns_flat[:, w] >> np.uint64(lb * l)) & mask
            ).astype(np.uint32)

    # bits of a,b,c,e,f,g
    for nm, w in (("ba", 0), ("bb", 1), ("bc", 2), ("be", 4), ("bf", 5), ("bg", 6)):
        word = state_flat[:, w]
        for t in range(32):
            tr[:n, L[nm].start + t] = ((word >> np.uint64(t)) & np.uint64(1)).astype(
                np.uint32
            )

    range_lookups = []
    k_mult = np.zeros(64, np.uint32)
    ic_u32 = is_compress.astype(np.uint32)
    init_u32 = is_init.astype(np.uint32)
    fin_u32 = is_finalize.astype(np.uint32)
    read_u32 = init_u32 + ic_u32

    # k limbs (zero outside compress rows)
    kcol = np.zeros(n, np.uint64)
    kidx = np.where(is_compress, step - 8, 0).astype(np.int64)
    kcol[is_compress] = np.asarray(SHA_K, np.uint64)[kidx[is_compress]]
    np.add.at(k_mult, kidx[is_compress], 1)
    for l in range(lw):
        tr[:n, L["k"].start + l] = ((kcol >> np.uint64(lb * l)) & mask).astype(
            np.uint32
        )

    # memory read columns
    rv_full = px["r_val"][:, 0].astype(np.uint64)
    rv_full[is_finalize] = 0
    for i in range(nl):
        tr[:n, L["rv"].start + i] = ((rv_full >> np.uint64(lb * i)) & mask).astype(
            np.uint32
        )
    prev = px["r_prev_ts"][:, 0].astype(np.uint64)
    prev[is_finalize] = 0
    tr[:n, L["r_prev_ts"]] = prev.astype(np.uint32)
    diff = np.where(is_finalize, 0, clk * 8 - prev - 1)
    for i in range(tsl):
        col = ((diff >> np.uint64(lb * i)) & mask).astype(np.uint32)
        tr[:n, L["tsd_r"].start + i] = col
        range_lookups.append((col, read_u32))

    # finalize write columns
    wprev_ts = px["w_prev_ts"].astype(np.uint64)
    wprev_ts[~is_finalize] = 0
    tr[:n, L["w_prev_ts"]] = wprev_ts.astype(np.uint32)
    diff = np.where(is_finalize, clk * 8 + WRITE_SLOT - wprev_ts - 1, 0)
    for i in range(tsl):
        col = ((diff >> np.uint64(lb * i)) & mask).astype(np.uint32)
        tr[:n, L["tsd_w"].start + i] = col
        range_lookups.append((col, fin_u32))
    wpv = px["w_prev_val"].astype(np.uint64)
    wpv[~is_finalize] = 0
    for i in range(nl):
        tr[:n, L["w_prev_val"].start + i] = ((wpv >> np.uint64(lb * i)) & mask).astype(
            np.uint32
        )
    wv = px["w_val"].astype(np.uint64)
    wv[~is_finalize] = 0
    selv = np.zeros(n, np.uint64)
    hs = has_slot
    selv[hs] = state_flat[hs, slot[hs].astype(np.int64)]
    for l in range(lw):
        tr[:n, L["sel"].start + l] = ((selv >> np.uint64(lb * l)) & mask).astype(
            np.uint32
        )
        col = ((wv >> np.uint64(lb * l)) & mask).astype(np.uint32)
        tr[:n, L["wv"].start + l] = col
        range_lookups.append((col, fin_u32))
    # finalize add carries: wv = w_prev_val(low32) + sel
    carry = np.zeros(n, np.uint64)
    for l in range(lw):
        tot = ((wpv >> np.uint64(lb * l)) & mask) + (
            (selv >> np.uint64(lb * l)) & mask
        ) + carry
        carry = (tot - ((wv >> np.uint64(lb * l)) & mask)) >> np.uint64(lb)
        tr[:n, L["fc"].start + l] = carry.astype(np.uint32)

    # t1 / t2 limbs + carries (ungated equations: fill on every real row)
    t1_flat = t1_rows.reshape(n)
    t2_flat = t2_rows.reshape(n)
    t1m = t1_flat & M32
    t2m = t2_flat & M32
    st7 = state_flat[:, 7]
    # recompute limbwise sums to derive carries exactly
    e = state_flat[:, 4]
    fv = state_flat[:, 5]
    gv = state_flat[:, 6]
    a0 = state_flat[:, 0]
    b0 = state_flat[:, 1]
    c0 = state_flat[:, 2]
    S1 = rotr(e, 6) ^ rotr(e, 11) ^ rotr(e, 25)
    ch = ((e & fv) ^ (~e & gv)) & M32
    S0 = rotr(a0, 2) ^ rotr(a0, 13) ^ rotr(a0, 22)
    maj = (a0 & b0) ^ (a0 & c0) ^ (b0 & c0)
    carry1 = np.zeros(n, np.uint64)
    carry2 = np.zeros(n, np.uint64)
    for l in range(lw):
        sh = np.uint64(lb * l)
        tot1 = (
            ((st7 >> sh) & mask) + ((S1 >> sh) & mask) + ((ch >> sh) & mask)
            + ((kcol >> sh) & mask) + ((rv_full >> sh) & mask) + carry1
        )
        t1_l = tot1 & np.uint64(mask)
        carry1 = tot1 >> np.uint64(lb)
        tr[:n, L["t1"].start + l] = t1_l.astype(np.uint32)
        tr[:n, L["tc0"].start + l] = (carry1 & 1).astype(np.uint32)
        tr[:n, L["tc1"].start + l] = ((carry1 >> np.uint64(1)) & 1).astype(np.uint32)
        tr[:n, L["tc2"].start + l] = ((carry1 >> np.uint64(2)) & 1).astype(np.uint32)
        range_lookups.append((t1_l.astype(np.uint32), ic_u32))
        tot2 = ((S0 >> sh) & mask) + ((maj >> sh) & mask) + carry2
        t2_l = tot2 & np.uint64(mask)
        carry2 = tot2 >> np.uint64(lb)
        tr[:n, L["t2"].start + l] = t2_l.astype(np.uint32)
        tr[:n, L["t2c"].start + l] = carry2.astype(np.uint32)
        range_lookups.append((t2_l.astype(np.uint32), ic_u32))
    # compress next-state carries: a' = t1 + t2, e' = d + t1 (low-limb sums)
    d0 = state_flat[:, 3]
    carry_a = np.zeros(n, np.uint64)
    carry_e = np.zeros(n, np.uint64)
    na = ns_flat[:, 0]
    ne = ns_flat[:, 4]
    for l in range(lw):
        sh = np.uint64(lb * l)
        t1_l = tr[:n, L["t1"].start + l].astype(np.uint64)
        t2_l = tr[:n, L["t2"].start + l].astype(np.uint64)
        tot = t1_l + t2_l + carry_a
        carry_a = np.where(is_compress, (tot - ((na >> sh) & mask)) >> np.uint64(lb), 0)
        tr[:n, L["ac"].start + l] = carry_a.astype(np.uint32)
        tot = ((d0 >> sh) & mask) + t1_l + carry_e
        carry_e = np.where(is_compress, (tot - ((ne >> sh) & mask)) >> np.uint64(lb), 0)
        tr[:n, L["ec"].start + l] = carry_e.astype(np.uint32)
        range_lookups.append(
            (tr[:n, L["ns"].start + l], ic_u32)
        )
        range_lookups.append(
            (tr[:n, L["ns"].start + 4 * lw + l], ic_u32)
        )
    range_lookups.append((tr[:n, L["pcell"].start], tr[:n, L["is_first"]]))
    return tr, n, range_lookups, k_mult

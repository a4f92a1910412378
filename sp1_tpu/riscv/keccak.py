"""Keccak-f[1600] permutation precompile chip.

Reference: crates/core/machine/src/syscall/precompiles/keccak256/ (which
wraps plonky3's KeccakAir: 24 rows per permutation, one round each, the
state carried as bit decompositions) and the executor-side event
recording in crates/core/executor/src/syscalls/precompiles/keccak256/
permute.rs.

TPU-native design notes (single-row AIR, LogUp chaining — same scheme as
sha.py):
  * One row per keccak-f ROUND (24 rows per permutation). The round
    input state A is witnessed as 1600 bits; theta's column parities C
    (320 bits) are pinned with the (sum-c)(sum-c-2)(sum-c-4) = 0 parity
    identity; the theta output A' = A ^ C[x-1] ^ rot1(C[x+1]) is
    witnessed (1600 bits) with a degree-3 xor3 constraint; rho/pi are
    pure wiring on A' bit indices; chi is an inline degree-3 bit
    expression recomposed directly into the output lane limbs; lane
    (0,0) routes through 64 witnessed chi bits so the iota
    round-constant xor (flag-selected, affine) stays at degree 2.
  * Rows of one permutation are linked by a LogUp round chain carrying
    (id, clk, step, cell, output state limbs); row 0 additionally
    receives the Cpu ecall's KIND_SYSCALL dispatch and performs the 25
    lane reads, row 23 performs the 25 lane writes.

ABI: ecall a7=10, a0 = cell-aligned pointer to the 25-lane u64 state,
one lane per 8-byte cell (lane l = x + 5y at ptr + 8l). Reads run at
clk+1+j (j<25), round j-25 at clk+1+j, writes at clk+1+49+i; the Cpu
ecall row's state-chain send skips the 74-cycle window.
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

KECCAK_ID = 10
KECCAK_ROUNDS = 24
NUM_LANES = 25
READ_BASE = 1      # read j at clk + READ_BASE + j
WRITE_BASE = 50    # write i at clk + WRITE_BASE + i

RC = [
    0x0000000000000001, 0x0000000000008082, 0x800000000000808A,
    0x8000000080008000, 0x000000000000808B, 0x0000000080000001,
    0x8000000080008081, 0x8000000000008009, 0x000000000000008A,
    0x0000000000000088, 0x0000000080008009, 0x000000008000000A,
    0x000000008000808B, 0x800000000000008B, 0x8000000000008089,
    0x8000000000008003, 0x8000000000008002, 0x8000000000000080,
    0x000000000000800A, 0x800000008000000A, 0x8000000080008081,
    0x8000000000008080, 0x0000000080000001, 0x8000000080008008,
]
# rotation offsets indexed by lane l = x + 5*y
RHO = [0, 1, 62, 28, 27, 36, 44, 6, 55, 20, 3, 10, 43, 25,
       39, 41, 45, 15, 21, 8, 18, 2, 61, 56, 14]
# pi destination: B[PI_DST[l]] = rot(A'[l], RHO[l]) for l = x + 5y
PI_DST = [(l // 5) + 5 * ((2 * (l % 5) + 3 * (l // 5)) % 5) for l in range(25)]
# inverse: B lane m comes from A' lane PI_SRC[m]
PI_SRC = [0] * 25
for _l in range(25):
    PI_SRC[PI_DST[_l]] = _l


def _pcell_limbs(ws: WordSpec) -> list:
    return [i for i in range(1, ws.num_limbs) if ws.limb_bits * i < 32]


def keccak_layout(ws: WordSpec) -> Cols:
    c = Cols()
    nl, tsl = ws.num_limbs, ws.ts_limbs
    c.col("is_real")
    c.cols("flags", KECCAK_ROUNDS)  # round one-hot
    c.col("step")
    c.col("clk")  # parent ecall clk (constant across a permutation)
    c.cols("ptr", nl)
    c.cols("pcell", 1 + len(_pcell_limbs(ws)))
    c.cols("a", 25 * 64)    # round input state bits (lane l, bit z)
    c.cols("cb", 5 * 64)    # theta column parities
    c.cols("ap", 25 * 64)   # theta output bits
    c.cols("app00", 64)     # chi output bits of lane (0,0) (pre-iota)
    c.cols("o", 25 * nl)    # round output lane limbs (post-iota)
    c.cols("r_prev_ts", NUM_LANES)
    c.cols("tsd_r", NUM_LANES * tsl)
    c.cols("w_prev_ts", NUM_LANES)
    c.cols("tsd_w", NUM_LANES * tsl)
    c.cols("w_prev_val", NUM_LANES * nl)
    return c


def _xor2(ops, x, y):
    return ops.sub(ops.add(x, y), ops.scale_base(ops.mul(x, y), 2))


def _xor3(ops, x, y, z):
    s = ops.add(ops.add(x, y), z)
    p = ops.add(ops.add(ops.mul(x, y), ops.mul(y, z)), ops.mul(x, z))
    t = ops.mul(ops.mul(x, y), z)
    return ops.add(ops.sub(s, ops.scale_base(p, 2)), ops.scale_base(t, 4))


class KeccakPermChip(Chip):
    name = "KeccakPerm"

    def __init__(self, ws: WordSpec):
        self.ws = ws
        self.layout = keccak_layout(ws)
        self.width = self.layout.n
        self.preprocessed_width = 0

    # -- affine helpers ------------------------------------------------------
    def _cell_aff(self, lane: int) -> Affine:
        """32 + cell index of lane (memory-argument address)."""
        ws, L = self.ws, self.layout
        terms = [(main_col(L["pcell"].start), 1)]
        for k, i in enumerate(_pcell_limbs(ws)):
            terms.append(
                (main_col(L["pcell"].start + 1 + k), 1 << (ws.limb_bits * i - 3))
            )
        return Affine(32 + lane, tuple(terms))

    def _lane_in_aff(self, lane: int, limb: int) -> Affine:
        """Input lane limb as an affine sum of the a bits."""
        ws, L = self.ws, self.layout
        lb = ws.limb_bits
        base = L["a"].start + lane * 64 + limb * lb
        return Affine(0, tuple((main_col(base + t), 1 << t) for t in range(lb)))

    def _chain_vals(self, shift: int, state_cols: list) -> tuple:
        L = self.layout
        vals = [
            Affine.const(KECCAK_ID),
            _aff(L["clk"]),
            Affine(shift, ((main_col(L["step"]), 1),)),
        ]
        for k in range(L["pcell"].stop - L["pcell"].start):
            vals.append(_aff(L["pcell"].start + k))
        vals.extend(state_cols)
        return tuple(vals)

    # -- constraints ---------------------------------------------------------
    def eval(self, f):
        ws, L = self.ws, self.layout
        ops = f.ops
        m = f.main
        nl, tsl, lb = ws.num_limbs, ws.ts_limbs, ws.limb_bits

        def g(name):
            v = L[name]
            if isinstance(v, slice):
                return [m[i] for i in range(v.start, v.stop)]
            return m[v]

        one = ops.one()
        is_real = g("is_real")
        flags = g("flags")
        step, clk = g("step"), g("clk")
        f.assert_bool(is_real)
        total = ops.zero()
        step_sum = ops.zero()
        for r, fl in enumerate(flags):
            f.assert_bool(fl)
            total = ops.add(total, fl)
            if r:
                step_sum = ops.add(step_sum, ops.scale_base(fl, r))
        f.assert_eq(total, is_real)
        f.assert_eq(step, step_sum)
        flag0, flag23 = flags[0], flags[KECCAK_ROUNDS - 1]

        # first-row pointer decode (alignment + 32-bit range)
        ptr, pcell = g("ptr"), g("pcell")
        f.assert_zero(ops.mul(flag0, ops.sub(ops.scale_base(pcell[0], 8), ptr[0])))
        in_range = _pcell_limbs(ws)
        for k, i in enumerate(in_range):
            f.assert_zero(ops.mul(flag0, ops.sub(pcell[1 + k], ptr[i])))
        for i in range(1, nl):
            if i not in in_range:
                f.assert_zero(ops.mul(flag0, ptr[i]))

        a, cb, ap, app00 = g("a"), g("cb"), g("ap"), g("app00")
        for bit in a + cb + ap + app00:
            f.assert_bool(bit)

        # theta parity: c[x][z] has the parity of the 5 column bits
        for x in range(5):
            for z in range(64):
                s = ops.zero()
                for y in range(5):
                    s = ops.add(s, a[(x + 5 * y) * 64 + z])
                d = ops.sub(s, cb[x * 64 + z])
                f.assert_zero(
                    ops.mul(
                        ops.mul(d, ops.sub(d, ops.const(2))),
                        ops.sub(d, ops.const(4)),
                    )
                )
        # theta output: ap = a ^ C[x-1][z] ^ C[x+1][z-1]
        for l in range(25):
            x = l % 5
            for z in range(64):
                c1 = cb[((x + 4) % 5) * 64 + z]
                c2 = cb[((x + 1) % 5) * 64 + (z + 63) % 64]
                f.assert_eq(ap[l * 64 + z], _xor3(ops, a[l * 64 + z], c1, c2))

        # rho/pi wiring: B[m][z] = ap[PI_SRC[m]][(z - RHO[src]) mod 64]
        def b_bit(mlane, z):
            src = PI_SRC[mlane]
            return ap[src * 64 + (z - RHO[src]) % 64]

        # chi (+ iota on lane 0) recomposed into output limbs
        def chi_bit(q, z):
            x2, y2 = q % 5, q // 5
            b1 = b_bit(q, z)
            b2 = b_bit((x2 + 1) % 5 + 5 * y2, z)
            b3 = b_bit((x2 + 2) % 5 + 5 * y2, z)
            t = ops.mul(ops.sub(one, b2), b3)
            return _xor2(ops, b1, t)

        o = g("o")
        for z in range(64):
            f.assert_eq(app00[z], chi_bit(0, z))
        # iota round-constant bits, selected by the round flags (affine)
        for k in range(nl):
            acc = ops.zero()
            for t in range(lb):
                z = k * lb + t
                rc_terms = tuple(
                    (main_col(L["flags"].start + r), 1)
                    for r in range(KECCAK_ROUNDS)
                    if (RC[r] >> z) & 1
                )
                if rc_terms:
                    rc_bit = Affine(0, rc_terms)
                    rc_sym = ops.zero()
                    for r in range(KECCAK_ROUNDS):
                        if (RC[r] >> z) & 1:
                            rc_sym = ops.add(rc_sym, flags[r])
                else:
                    rc_sym = ops.zero()
                acc = ops.add(
                    acc, ops.scale_base(_xor2(ops, app00[z], rc_sym), 1 << t)
                )
            f.assert_eq(o[k], acc)
        for q in range(1, 25):
            for k in range(nl):
                acc = ops.zero()
                for t in range(lb):
                    acc = ops.add(acc, ops.scale_base(chi_bit(q, k * lb + t), 1 << t))
                f.assert_eq(o[q * nl + k], acc)

        # timestamp ordering for the first-row reads / last-row writes
        r_prev_ts, tsd_r = g("r_prev_ts"), g("tsd_r")
        for j in range(NUM_LANES):
            acc = ops.zero()
            for i in range(tsl):
                acc = ops.add(acc, ops.scale_base(tsd_r[j * tsl + i], 1 << (lb * i)))
            new_ts = ops.add(ops.scale_base(clk, 8), ops.const(8 * (READ_BASE + j)))
            f.assert_zero(
                ops.mul(
                    flag0,
                    ops.sub(ops.sub(ops.sub(new_ts, r_prev_ts[j]), one), acc),
                )
            )
        w_prev_ts, tsd_w = g("w_prev_ts"), g("tsd_w")
        for j in range(NUM_LANES):
            acc = ops.zero()
            for i in range(tsl):
                acc = ops.add(acc, ops.scale_base(tsd_w[j * tsl + i], 1 << (lb * i)))
            new_ts = ops.add(
                ops.scale_base(clk, 8), ops.const(8 * (WRITE_BASE + j) + 4)
            )
            f.assert_zero(
                ops.mul(
                    flag23,
                    ops.sub(ops.sub(ops.sub(new_ts, w_prev_ts[j]), one), acc),
                )
            )

    # -- interactions ----------------------------------------------------------
    def sends(self) -> list:
        ws, L = self.ws, self.layout
        nl, tsl = ws.num_limbs, ws.ts_limbs
        out = []
        # round chain out: everyone but the last row; state = output limbs
        chain_out_mult = Affine(
            0,
            (
                (main_col(L["is_real"]), 1),
                (main_col(L["flags"].start + KECCAK_ROUNDS - 1), kb.P - 1),
            ),
        )
        o_cols = [_aff(L["o"].start + i) for i in range(25 * nl)]
        out.append(
            Interaction(self._chain_vals(1, o_cols), chain_out_mult, KIND_PX_CHAIN)
        )
        flag0 = _aff(L["flags"].start)
        flag23 = _aff(L["flags"].start + KECCAK_ROUNDS - 1)
        # reads: bumped-ts state (same lane value, from the a bits)
        for j in range(NUM_LANES):
            ts = Affine(8 * (READ_BASE + j), ((main_col(L["clk"]), 8),))
            vals = [self._cell_aff(j), ts]
            vals += [self._lane_in_aff(j, i) for i in range(nl)]
            out.append(Interaction(tuple(vals), flag0, KIND_MEMORY))
        # writes: new lane values (the final round's output limbs)
        for j in range(NUM_LANES):
            ts = Affine(8 * (WRITE_BASE + j) + 4, ((main_col(L["clk"]), 8),))
            vals = [self._cell_aff(j), ts]
            vals += [_aff(L["o"].start + j * nl + i) for i in range(nl)]
            out.append(Interaction(tuple(vals), flag23, KIND_MEMORY))
        # range checks
        for k in range(NUM_LANES * tsl):
            out.append(Interaction((_aff(L["tsd_r"].start + k),), flag0, KIND_RANGE))
            out.append(Interaction((_aff(L["tsd_w"].start + k),), flag23, KIND_RANGE))
        out.append(Interaction((_aff(L["pcell"].start),), flag0, KIND_RANGE))
        return out

    def receives(self) -> list:
        ws, L = self.ws, self.layout
        nl = ws.num_limbs
        out = []
        flag0 = _aff(L["flags"].start)
        flag23 = _aff(L["flags"].start + KECCAK_ROUNDS - 1)
        # the Cpu's syscall dispatch: (id, parent clk, raw pointer limbs)
        sys_vals = [Affine.const(KECCAK_ID), _aff(L["clk"])]
        sys_vals += [_aff(L["ptr"].start + i) for i in range(nl)]
        out.append(Interaction(tuple(sys_vals), flag0, KIND_SYSCALL))
        # round chain in: everyone but the first; state = input limbs (a bits)
        chain_in_mult = Affine(
            0,
            (
                (main_col(L["is_real"]), 1),
                (main_col(L["flags"].start), kb.P - 1),
            ),
        )
        in_cols = [self._lane_in_aff(l, i) for l in range(25) for i in range(nl)]
        out.append(
            Interaction(self._chain_vals(0, in_cols), chain_in_mult, KIND_PX_CHAIN)
        )
        # memory: previous read/write states
        for j in range(NUM_LANES):
            vals = [self._cell_aff(j), _aff(L["r_prev_ts"].start + j)]
            vals += [self._lane_in_aff(j, i) for i in range(nl)]
            out.append(Interaction(tuple(vals), flag0, KIND_MEMORY))
        for j in range(NUM_LANES):
            vals = [self._cell_aff(j), _aff(L["w_prev_ts"].start + j)]
            vals += [
                _aff(L["w_prev_val"].start + j * nl + i) for i in range(nl)
            ]
            out.append(Interaction(tuple(vals), flag23, KIND_MEMORY))
        return out


# ---------------------------------------------------------------------------
# Trace generation
# ---------------------------------------------------------------------------


def _bits_of_lanes(lanes: np.ndarray) -> np.ndarray:
    """(25,) u64 -> (25*64,) bit array (lane-major, z ascending)."""
    z = np.arange(64, dtype=np.uint64)
    return ((lanes[:, None] >> z[None, :]) & np.uint64(1)).astype(np.uint32).reshape(-1)


def _keccak_round(st: np.ndarray, r: int):
    """One keccak-f round on (25,) u64; returns (a_bits, c_bits, ap_bits,
    app00_bits, new_state)."""
    M = np.uint64(0xFFFFFFFFFFFFFFFF)
    a_bits = _bits_of_lanes(st)
    cpar = np.zeros(5, np.uint64)
    for x in range(5):
        cpar[x] = st[x] ^ st[x + 5] ^ st[x + 10] ^ st[x + 15] ^ st[x + 20]
    c_bits = ((cpar[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
              & np.uint64(1)).astype(np.uint32).reshape(-1)
    d = np.zeros(5, np.uint64)
    for x in range(5):
        t = cpar[(x + 1) % 5]
        d[x] = cpar[(x + 4) % 5] ^ (((t << np.uint64(1)) | (t >> np.uint64(63))) & M)
    apl = np.zeros(25, np.uint64)
    for l in range(25):
        apl[l] = st[l] ^ d[l % 5]
    ap_bits = _bits_of_lanes(apl)
    b = np.zeros(25, np.uint64)
    for l in range(25):
        rot = RHO[l]
        v = apl[l]
        rv = ((v << np.uint64(rot)) | (v >> np.uint64(64 - rot))) & M if rot else v
        b[PI_DST[l]] = rv
    new = np.zeros(25, np.uint64)
    for y in range(5):
        for x in range(5):
            new[x + 5 * y] = b[x + 5 * y] ^ ((~b[(x + 1) % 5 + 5 * y]) & b[(x + 2) % 5 + 5 * y])
    app00 = new[0]
    app00_bits = ((app00 >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(np.uint32)
    new[0] ^= np.uint64(RC[r])
    return a_bits, c_bits, ap_bits, app00_bits, new


def generate_keccak_trace(px, ws: WordSpec, height: int):
    """Build the KeccakPerm trace from kind==10 PxEvents.

    Returns (trace, n_rows, range_lookups)."""
    L = keccak_layout(ws)
    nl, tsl, lb = ws.num_limbs, ws.ts_limbs, ws.limb_bits
    mask = np.uint64((1 << lb) - 1)
    tr = np.zeros((height, L.n), np.uint32)
    if px is None or len(px) == 0:
        return tr, 0, []

    parents = (px["clk"] - 1 - px["step"]).astype(np.uint64)
    order = sorted(set(int(p) for p in parents))
    range_lookups = []
    row = 0
    for parent in order:
        sel = px[parents == parent]
        sel = sel[np.argsort(sel["step"])]
        assert len(sel) == 74, f"keccak event group has {len(sel)} steps"
        reads = sel[:25]
        writes = sel[49:]
        lanes = reads["r_val"][:, 0].astype(np.uint64)
        ptr = int(sel["ptr"][0])
        st = lanes.copy()
        for r in range(KECCAK_ROUNDS):
            a_bits, c_bits, ap_bits, app00_bits, st = _keccak_round(st, r)
            i = row + r
            tr[i, L["is_real"]] = 1
            tr[i, L["flags"].start + r] = 1
            tr[i, L["step"]] = r
            tr[i, L["clk"]] = parent
            for k in range(nl):
                tr[i, L["ptr"].start + k] = (ptr >> (lb * k)) & int(mask)
            tr[i, L["pcell"].start] = (ptr & int(mask)) >> 3
            for k, li in enumerate(_pcell_limbs(ws)):
                tr[i, L["pcell"].start + 1 + k] = (ptr >> (lb * li)) & int(mask)
            tr[i, L["a"]] = a_bits
            tr[i, L["cb"]] = c_bits
            tr[i, L["ap"]] = ap_bits
            tr[i, L["app00"]] = app00_bits
            olimbs = ((st[:, None] >> (np.uint64(lb) * np.arange(nl, dtype=np.uint64))[None, :]) & mask).astype(np.uint32)
            tr[i, L["o"]] = olimbs.reshape(-1)
        # first-row reads
        i0 = row
        onef = np.ones(1, np.uint32)
        for j in range(NUM_LANES):
            prev = int(reads["r_prev_ts"][j, 0])
            tr[i0, L["r_prev_ts"].start + j] = prev
            diff = (parent * 8 + 8 * (READ_BASE + j)) - prev - 1
            for i2 in range(tsl):
                col = (int(diff) >> (lb * i2)) & int(mask)
                tr[i0, L["tsd_r"].start + j * tsl + i2] = col
                range_lookups.append((np.array([col], np.uint32), onef))
        # last-row writes
        i23 = row + KECCAK_ROUNDS - 1
        for j in range(NUM_LANES):
            prev = int(writes["w_prev_ts"][j])
            wpv = int(writes["w_prev_val"][j])
            tr[i23, L["w_prev_ts"].start + j] = prev
            for k in range(nl):
                tr[i23, L["w_prev_val"].start + j * nl + k] = (wpv >> (lb * k)) & int(mask)
            diff = (parent * 8 + 8 * (WRITE_BASE + j) + 4) - prev - 1
            for i2 in range(tsl):
                col = (int(diff) >> (lb * i2)) & int(mask)
                tr[i23, L["tsd_w"].start + j * tsl + i2] = col
                range_lookups.append((np.array([col], np.uint32), onef))
            assert int(writes["w_val"][j]) == int(st[j]), "keccak state mismatch"
        range_lookups.append(
            (np.array([tr[i0, L["pcell"].start]], np.uint32), onef)
        )
        row += KECCAK_ROUNDS
    return tr, row, range_lookups

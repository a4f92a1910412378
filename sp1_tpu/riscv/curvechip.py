"""Curve / uint256 precompile chips: one row per syscall.

Reference roles:
  crates/core/machine/src/syscall/precompiles/edwards/ed_add.rs
  crates/core/machine/src/syscall/precompiles/weierstrass/weierstrass_add.rs
  crates/core/machine/src/syscall/precompiles/weierstrass/weierstrass_double.rs
  crates/core/machine/src/syscall/precompiles/uint256/air.rs
  crates/core/executor/src/events/precompiles/ec.rs (event recording)

TPU-native design: each syscall is ONE trace row. The guest's operand
buffer is read cell-by-cell in the clk window after the ecall (read j at
clk+1+j, write i at clk+1+NR+i — the Cpu chip's state chain skips the
window), every read byte is witnessed as a u8 limb, and the curve
formulas are proven with the emulated-field blocks of fieldops.py.

ABI divergence from the reference (documented): SP1 passes two pointers
(a0 = p, a1 = q); our Cpu ecall row reads only a7/a0, so these syscalls
take a SINGLE pointer to a contiguous buffer [p || q] and write the
result over p. Layouts (8-byte cells, little-endian):
  ED_ADD / WEIERSTRASS ADD (16 cells): p.x[0..3] p.y[4..7] q.x[8..11] q.y[12..15]
  WEIERSTRASS DOUBLE (8 cells):        p.x[0..3] p.y[4..7]
  UINT256_MUL (12 cells):              x[0..3] y[4..7] m[8..11]  (m = 0 means 2^256)
These chips require the production word model (limb_bits = 16).
"""

from __future__ import annotations

import numpy as np

from ..air.builder import (
    KIND_MEMORY,
    KIND_RANGE,
    KIND_SYSCALL,
    Affine,
    Chip,
    Interaction,
    main_col,
)
from . import fieldops as fo
from .fieldops import FieldLtBlock, FieldOpBlock, int_to_limbs, limbs_to_int
from .machine import Cols, WordSpec, _aff

SYSCALL_ED_ADD = 11
SYSCALL_SECP256K1_ADD = 12
SYSCALL_SECP256K1_DOUBLE = 13
SYSCALL_UINT256_MUL = 14
SYSCALL_BN254_ADD = 15
SYSCALL_SECP256R1_ADD = 18
SYSCALL_SECP256R1_DOUBLE = 19
SYSCALL_SECP256R1_DECOMPRESS = 20
SYSCALL_BN254_DOUBLE = 21
SYSCALL_BLS12381_ADD = 22
SYSCALL_BLS12381_DOUBLE = 23
SYSCALL_BLS12381_DECOMPRESS = 24
# window length = reads + writes (virtual cycles consumed after the ecall)


def _pcell_limbs(ws: WordSpec) -> list:
    return [i for i in range(1, ws.num_limbs) if ws.limb_bits * i < 32]


class CallChip(Chip):
    """Shared machinery for one-row-per-call precompile chips.

    Subclasses define: name, SYSCALL_ID, N_READ, N_WRITE (cell counts),
    extra_layout(c), eval_body(f, g), write_limb_aff(cell, limb) and the
    trace population hook populate_row(row, L, in_bytes) -> out_ints.
    """

    SYSCALL_ID = 0
    N_READ = 0
    N_WRITE = 0

    def __init__(self, ws: WordSpec):
        assert ws.limb_bits == 16, f"{self.name} requires the 16-bit word model"
        self.ws = ws
        self.layout = self._build_layout(ws)
        self.width = self.layout.n
        self.preprocessed_width = 0

    @property
    def window(self) -> int:
        return self.N_READ + self.N_WRITE

    def _build_layout(self, ws: WordSpec) -> Cols:
        c = Cols()
        nl, tsl = ws.num_limbs, ws.ts_limbs
        c.col("is_real")
        c.col("clk")
        c.cols("ptr", nl)
        c.cols("pcell", 1 + len(_pcell_limbs(ws)))
        c.cols("inb", self.N_READ * 8)          # read bytes (u8 limbs)
        c.cols("r_prev_ts", self.N_READ)
        c.cols("tsd_r", self.N_READ * tsl)
        c.cols("w_prev_ts", self.N_WRITE)
        c.cols("tsd_w", self.N_WRITE * tsl)
        c.cols("w_prev_val", self.N_WRITE * nl)
        self.extra_layout(c)
        return c

    def extra_layout(self, c: Cols):
        raise NotImplementedError

    # -- affine helpers ------------------------------------------------------
    def _cell_aff(self, cell: int) -> Affine:
        """Unified memory-argument address of buffer cell (registers are
        0..31; memory cell c is 32 + c — see keccak.py:_cell_aff)."""
        ws, L = self.ws, self.layout
        terms = [(main_col(L["pcell"].start), 1)]
        for k, i in enumerate(_pcell_limbs(ws)):
            terms.append(
                (main_col(L["pcell"].start + 1 + k), 1 << (ws.limb_bits * i - 3))
            )
        return Affine(32 + cell, tuple(terms))

    def _read_limb_aff(self, cell: int, limb: int) -> Affine:
        """16-bit memory limb of read cell composed from its u8 limbs."""
        L = self.layout
        base = L["inb"].start + cell * 8 + limb * 2
        return Affine(0, ((main_col(base), 1), (main_col(base + 1), 256)))

    def write_limb_aff(self, cell: int, limb: int) -> Affine:
        raise NotImplementedError

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
        f.assert_bool(is_real)
        clk = g("clk")

        # pointer decode: cell-aligned, 32-bit (keccak.py:180-188)
        ptr, pcell = g("ptr"), g("pcell")
        f.assert_zero(ops.mul(is_real, ops.sub(ops.scale_base(pcell[0], 8), ptr[0])))
        in_range = _pcell_limbs(ws)
        for k, i in enumerate(in_range):
            f.assert_zero(ops.mul(is_real, ops.sub(pcell[1 + k], ptr[i])))
        for i in range(1, nl):
            if i not in in_range:
                f.assert_zero(ops.mul(is_real, ptr[i]))

        # timestamp ordering: read j at (clk+1+j)*8, write i at
        # (clk+1+N_READ+i)*8+4, each strictly after the previous access
        r_prev_ts, tsd_r = g("r_prev_ts"), g("tsd_r")
        for j in range(self.N_READ):
            acc = ops.zero()
            for i in range(tsl):
                acc = ops.add(acc, ops.scale_base(tsd_r[j * tsl + i], 1 << (lb * i)))
            new_ts = ops.add(ops.scale_base(clk, 8), ops.const(8 * (1 + j)))
            f.assert_zero(
                ops.mul(
                    is_real,
                    ops.sub(ops.sub(ops.sub(new_ts, r_prev_ts[j]), one), acc),
                )
            )
        w_prev_ts, tsd_w = g("w_prev_ts"), g("tsd_w")
        for j in range(self.N_WRITE):
            acc = ops.zero()
            for i in range(tsl):
                acc = ops.add(acc, ops.scale_base(tsd_w[j * tsl + i], 1 << (lb * i)))
            new_ts = ops.add(
                ops.scale_base(clk, 8), ops.const(8 * (1 + self.N_READ + j) + 4)
            )
            f.assert_zero(
                ops.mul(
                    is_real,
                    ops.sub(ops.sub(ops.sub(new_ts, w_prev_ts[j]), one), acc),
                )
            )

        self.eval_body(f, g)

    def eval_body(self, f, g):
        raise NotImplementedError

    # -- interactions --------------------------------------------------------
    def _u8_sends(self, idx_range, mult) -> list:
        """u8 range check as 256*x against the 2^16 Range table."""
        return [
            Interaction((Affine(0, ((main_col(i), 256),)),), mult, KIND_RANGE)
            for i in idx_range
        ]

    def sends(self) -> list:
        ws, L = self.ws, self.layout
        nl, tsl = ws.num_limbs, ws.ts_limbs
        is_real = _aff(L["is_real"])
        out = []
        # reads: bumped-ts state with the same (witnessed-byte) value
        for j in range(self.N_READ):
            ts = Affine(8 * (1 + j), ((main_col(L["clk"]), 8),))
            vals = [self._cell_aff(j), ts]
            vals += [self._read_limb_aff(j, i) for i in range(nl)]
            out.append(Interaction(tuple(vals), is_real, KIND_MEMORY))
        # writes: new value from the subclass's result columns
        for j in range(self.N_WRITE):
            ts = Affine(8 * (1 + self.N_READ + j) + 4, ((main_col(L["clk"]), 8),))
            vals = [self._cell_aff(j), ts]
            vals += [self.write_limb_aff(j, i) for i in range(nl)]
            out.append(Interaction(tuple(vals), is_real, KIND_MEMORY))
        # range checks: ts diffs (u16), pointer cell, read bytes (u8)
        for k in range(self.N_READ * tsl):
            out.append(Interaction((_aff(L["tsd_r"].start + k),), is_real, KIND_RANGE))
        for k in range(self.N_WRITE * tsl):
            out.append(Interaction((_aff(L["tsd_w"].start + k),), is_real, KIND_RANGE))
        out.append(Interaction((_aff(L["pcell"].start),), is_real, KIND_RANGE))
        out.extend(
            self._u8_sends(range(L["inb"].start, L["inb"].stop), is_real)
        )
        out.extend(self.extra_sends(is_real))
        return out

    def extra_sends(self, is_real) -> list:
        return []

    def receives(self) -> list:
        ws, L = self.ws, self.layout
        nl = ws.num_limbs
        is_real = _aff(L["is_real"])
        out = []
        # the Cpu ecall dispatch: (id, parent clk, raw pointer limbs)
        sys_vals = [Affine.const(self.SYSCALL_ID), _aff(L["clk"])]
        sys_vals += [_aff(L["ptr"].start + i) for i in range(nl)]
        out.append(Interaction(tuple(sys_vals), is_real, KIND_SYSCALL))
        # memory: previous states
        for j in range(self.N_READ):
            vals = [self._cell_aff(j), _aff(L["r_prev_ts"].start + j)]
            vals += [self._read_limb_aff(j, i) for i in range(nl)]
            out.append(Interaction(tuple(vals), is_real, KIND_MEMORY))
        for j in range(self.N_WRITE):
            vals = [self._cell_aff(j), _aff(L["w_prev_ts"].start + j)]
            vals += [
                _aff(L["w_prev_val"].start + j * nl + i) for i in range(nl)
            ]
            out.append(Interaction(tuple(vals), is_real, KIND_MEMORY))
        return out

    # -- trace generation ----------------------------------------------------
    def generate_trace(self, px: np.ndarray, height: int):
        """Build the trace from this chip's PxEvents (window-grouped).

        px: structured array with one record per read/write step, kind ==
        SYSCALL_ID, grouped in windows of N_READ + N_WRITE. Returns
        (trace, n_rows, range_lookups)."""
        ws, L = self.ws, self.layout
        nl, tsl, lb = ws.num_limbs, ws.ts_limbs, ws.limb_bits
        W = self.window
        assert len(px) % W == 0, f"{self.name}: ragged event stream"
        n = len(px) // W
        tr = np.zeros((height, L.n), np.uint32)
        lookups = []
        mask = np.uint32((1 << lb) - 1)
        for r in range(n):
            evs = px[r * W : (r + 1) * W]
            row64 = np.zeros(L.n, np.int64)
            clk = int(evs[0]["clk"]) - 1  # parent ecall clk
            ptr = int(evs[0]["ptr"])
            row64[L["is_real"]] = 1
            row64[L["clk"]] = clk
            for i in range(nl):
                row64[L["ptr"].start + i] = (ptr >> (lb * i)) & int(mask)
            row64[L["pcell"].start] = (ptr & mask) >> 3
            for k, i in enumerate(_pcell_limbs(ws)):
                row64[L["pcell"].start + 1 + k] = (ptr >> (lb * i)) & int(mask)
            in_bytes = np.zeros(self.N_READ * 8, np.int64)
            for j in range(self.N_READ):
                e = evs[j]
                val = int(e["r_val"][0])
                prev_ts = int(e["r_prev_ts"][0])
                new_ts = (clk + 1 + j) * 8
                for b in range(8):
                    in_bytes[j * 8 + b] = (val >> (8 * b)) & 0xFF
                row64[L["r_prev_ts"].start + j] = 0  # set below (ts limbs)
                row64[L["r_prev_ts"].start + j] = prev_ts
                d = new_ts - prev_ts - 1
                for i in range(tsl):
                    row64[L["tsd_r"].start + j * tsl + i] = (d >> (lb * i)) & int(mask)
            row64[L["inb"]] = in_bytes
            for j in range(self.N_WRITE):
                e = evs[self.N_READ + j]
                prev_ts = int(e["w_prev_ts"])
                prev_val = int(e["w_prev_val"])
                new_ts = (clk + 1 + self.N_READ + j) * 8 + 4
                row64[L["w_prev_ts"].start + j] = prev_ts
                d = new_ts - prev_ts - 1
                for i in range(tsl):
                    row64[L["tsd_w"].start + j * tsl + i] = (d >> (lb * i)) & int(mask)
                for i in range(nl):
                    row64[L["w_prev_val"].start + j * nl + i] = (
                        prev_val >> (lb * i)
                    ) & int(mask)
            out_vals = self.populate_row(row64, L, in_bytes)
            # consistency: the executor's written values must match ours
            for j in range(self.N_WRITE):
                assert int(evs[self.N_READ + j]["w_val"]) == out_vals[j], (
                    f"{self.name}: executor/tracegen result mismatch at cell {j}"
                )
            tr[r] = row64.astype(np.uint32)
        if n:
            # range lookups, vectorized over real rows
            real = tr[:n]
            for sl, scale in ((L["tsd_r"], 1), (L["tsd_w"], 1)):
                vals = real[:, sl].reshape(-1)
                lookups.append((vals.astype(np.int64), np.ones_like(vals, np.int64)))
            lookups.append(
                (
                    real[:, L["pcell"].start].astype(np.int64),
                    np.ones(n, np.int64),
                )
            )
            u8_slices = [L["inb"]] + self.u8_check_slices(L)
            for sl in u8_slices:
                vals = real[:, sl].reshape(-1).astype(np.int64) * 256
                lookups.append((vals, np.ones_like(vals)))
            for sl in self.u16_check_slices(L):
                vals = real[:, sl].reshape(-1).astype(np.int64)
                lookups.append((vals, np.ones_like(vals)))
        return tr, n, lookups

    def populate_row(self, row64: np.ndarray, L, in_bytes: np.ndarray) -> list:
        """Fill subclass columns; return the N_WRITE written cell values."""
        raise NotImplementedError

    def u8_check_slices(self, L) -> list:
        return []

    def u16_check_slices(self, L) -> list:
        return []


class _BlockChip(CallChip):
    """CallChip whose body is a sequence of FieldOp/FieldLt blocks; gives
    uniform range-send/lookup wiring."""

    def __init__(self, ws: WordSpec):
        self.blocks: list = []
        self.lt_blocks: list = []
        super().__init__(ws)

    def _add_block(self, c: Cols, name: str, fp) -> FieldOpBlock:
        blk = FieldOpBlock(name, fp)
        blk.alloc(c)
        self.blocks.append(blk)
        return blk

    def _add_lt(self, c: Cols, name: str, fp) -> FieldLtBlock:
        blk = FieldLtBlock(name, fp)
        blk.alloc(c)
        self.lt_blocks.append(blk)
        return blk

    def extra_sends(self, is_real) -> list:
        out = []
        for blk in self.blocks:
            out.extend(blk.range_sends(self.layout, is_real))
        for blk in self.lt_blocks:
            out.extend(blk.range_sends(self.layout, is_real))
        return out

    def u8_check_slices(self, L) -> list:
        out = []
        for blk in self.blocks:
            out.append(L[blk.name + "_r"])
            out.append(L[blk.name + "_c"])
        for blk in self.lt_blocks:
            out.append(L[blk.name + "_d"])
        return out

    def u16_check_slices(self, L) -> list:
        return [L[blk.name + "_w"] for blk in self.blocks]

    def _res(self, g, blk: FieldOpBlock):
        return g(blk.name + "_r")

    def _write_aff_from(self, blocks_per_cell, cell: int, limb: int) -> Affine:
        """Write limb of `cell` from the result u8 limbs of the block
        covering it (4 cells per 32-byte coordinate)."""
        blk, cell0 = blocks_per_cell[cell]
        base = self.layout[blk.name + "_r"].start + (cell - cell0) * 8 + limb * 2
        return Affine(0, ((main_col(base), 1), (main_col(base + 1), 256)))


class EdAddChip(_BlockChip):
    """ed25519 twisted-Edwards addition (ed_add.rs).

    x3 = (x1 y2 + x2 y1) / (1 + d x1 x2 y1 y2)
    y3 = (y1 y2 + x1 x2) / (1 - d x1 x2 y1 y2)
    """

    name = "EdAdd"
    SYSCALL_ID = SYSCALL_ED_ADD
    N_READ = 16
    N_WRITE = 8
    FP = fo.ED25519_FP

    def extra_layout(self, c: Cols):
        fp = self.FP
        self.x3n = self._add_block(c, "x3n", fp)
        self.y3n = self._add_block(c, "y3n", fp)
        self.x1y1 = self._add_block(c, "x1y1", fp)
        self.x2y2 = self._add_block(c, "x2y2", fp)
        self.fblk = self._add_block(c, "fblk", fp)
        self.dfblk = self._add_block(c, "dfblk", fp)
        self.x3d = self._add_block(c, "x3d", fp)
        self.y3d = self._add_block(c, "y3d", fp)
        self.x3lt = self._add_lt(c, "x3lt", fp)
        self.y3lt = self._add_lt(c, "y3lt", fp)

    def _coord(self, g, idx: int) -> list:
        """u8 limbs of input coordinate idx (x1=0, y1=1, x2=2, y2=3)."""
        inb = g("inb")
        return inb[idx * 32 : (idx + 1) * 32]

    def eval_body(self, f, g):
        ops = f.ops
        gate = g("is_real")
        x1, y1 = self._coord(g, 0), self._coord(g, 1)
        x2, y2 = self._coord(g, 2), self._coord(g, 3)
        d_limbs = int_to_limbs(fo.ED25519_D, self.FP.nb)
        self.x3n.eval_inner(f, g, gate, [x1, x2], [y2, y1])
        self.y3n.eval_inner(f, g, gate, [y1, x1], [y2, x2])
        self.x1y1.eval_mul(f, g, gate, x1, y1)
        self.x2y2.eval_mul(f, g, gate, x2, y2)
        self.fblk.eval_mul(
            f, g, gate, self._res(g, self.x1y1), self._res(g, self.x2y2)
        )
        self.dfblk.eval_mul(f, g, gate, self._res(g, self.fblk), d_limbs)
        self.x3d.eval_den(
            f, g, gate, self._res(g, self.x3n), self._res(g, self.dfblk), True
        )
        self.y3d.eval_den(
            f, g, gate, self._res(g, self.y3n), self._res(g, self.dfblk), False
        )
        self.x3lt.eval(f, g, gate, self._res(g, self.x3d))
        self.y3lt.eval(f, g, gate, self._res(g, self.y3d))

    def write_limb_aff(self, cell: int, limb: int) -> Affine:
        per_cell = {c: (self.x3d, 0) for c in range(4)}
        per_cell.update({c: (self.y3d, 4) for c in range(4, 8)})
        return self._write_aff_from(per_cell, cell, limb)

    def populate_row(self, row64, L, in_bytes) -> list:
        fp = self.FP
        p = fp.modulus
        x1 = limbs_to_int(in_bytes[0:32])
        y1 = limbs_to_int(in_bytes[32:64])
        x2 = limbs_to_int(in_bytes[64:96])
        y2 = limbs_to_int(in_bytes[96:128])
        d = fo.ED25519_D
        x1_l, y1_l = int_to_limbs(x1, 32), int_to_limbs(y1, 32)
        x2_l, y2_l = int_to_limbs(x2, 32), int_to_limbs(y2, 32)

        def popm(blk, a, b, a_l, b_l):
            full = a * b
            r, carry = full % p, full // p
            blk.populate(
                row64, L, [(+1, a_l, b_l), (-1, int_to_limbs(r, 32))], r, carry
            )
            return r

        x3num = (x1 * y2 + x2 * y1) % p
        self.x3n.populate(
            row64, L,
            [(+1, x1_l, y2_l), (+1, x2_l, y1_l), (-1, int_to_limbs(x3num, 32))],
            x3num, (x1 * y2 + x2 * y1) // p,
        )
        y3num = (y1 * y2 + x1 * x2) % p
        self.y3n.populate(
            row64, L,
            [(+1, y1_l, y2_l), (+1, x1_l, x2_l), (-1, int_to_limbs(y3num, 32))],
            y3num, (y1 * y2 + x1 * x2) // p,
        )
        a1 = popm(self.x1y1, x1, y1, x1_l, y1_l)
        a2 = popm(self.x2y2, x2, y2, x2_l, y2_l)
        fv = popm(self.fblk, a1, a2, int_to_limbs(a1, 32), int_to_limbs(a2, 32))
        dfv = popm(self.dfblk, fv, d, int_to_limbs(fv, 32), int_to_limbs(d, 32))
        x3 = x3num * pow((1 + dfv) % p, p - 2, p) % p
        x3_l = int_to_limbs(x3, 32)
        self.x3d.populate(
            row64, L,
            [(+1, int_to_limbs(dfv, 32), x3_l), (+1, x3_l),
             (-1, int_to_limbs(x3num, 32))],
            x3, (dfv * x3 + x3 - x3num) // p,
        )
        y3 = y3num * pow((1 - dfv) % p, p - 2, p) % p
        y3_l = int_to_limbs(y3, 32)
        self.y3d.populate(
            row64, L,
            [(+1, int_to_limbs(dfv, 32), y3_l), (+1, int_to_limbs(y3num, 32)),
             (-1, y3_l)],
            y3, (dfv * y3 + y3num - y3) // p,
        )
        self.x3lt.populate(row64, L, x3)
        self.y3lt.populate(row64, L, y3)
        out = []
        for j in range(4):
            out.append((x3 >> (64 * j)) & ((1 << 64) - 1))
        for j in range(4):
            out.append((y3 >> (64 * j)) & ((1 << 64) - 1))
        return out


class WeierstrassAddChip(_BlockChip):
    """Short-Weierstrass distinct-point addition (weierstrass_add.rs).

    s  = (y2 - y1) / (x2 - x1)
    x3 = s^2 - x1 - x2,   y3 = s (x1 - x3) - y1
    The executor must never call this with x1 == x2 (reference contract).
    """

    name = "WsAdd"
    SYSCALL_ID = 0  # set per curve subclass
    N_READ = 16
    N_WRITE = 8
    FP = None

    def extra_layout(self, c: Cols):
        fp = self.FP
        self.sn = self._add_block(c, "sn", fp)     # y2 - y1
        self.sd = self._add_block(c, "sd", fp)     # x2 - x1
        self.s = self._add_block(c, "s", fp)       # sn / sd
        self.ss = self._add_block(c, "ss", fp)     # s^2
        self.x3b = self._add_block(c, "x3b", fp)   # ss - x1 - x2
        self.dx = self._add_block(c, "dx", fp)     # x1 - x3
        self.sdx = self._add_block(c, "sdx", fp)   # s * dx
        self.y3b = self._add_block(c, "y3b", fp)   # sdx - y1
        self.x3lt = self._add_lt(c, "x3lt", fp)
        self.y3lt = self._add_lt(c, "y3lt", fp)

    def _coord(self, g, idx: int) -> list:
        inb = g("inb")
        nb = self.FP.nb
        return inb[idx * nb : (idx + 1) * nb]

    def eval_body(self, f, g):
        gate = g("is_real")
        x1, y1 = self._coord(g, 0), self._coord(g, 1)
        x2, y2 = self._coord(g, 2), self._coord(g, 3)
        self.sn.eval_sub(f, g, gate, y2, y1)
        self.sd.eval_sub(f, g, gate, x2, x1)
        self.s.eval_div(f, g, gate, self._res(g, self.sn), self._res(g, self.sd))
        sres = self._res(g, self.s)
        self.ss.eval_mul(f, g, gate, sres, sres)
        # x3: ss - x1 - x2 = x3  <=>  x1 + x2 + x3 = ss + carry-form; use
        # sub twice via an intermediate? One block: treat as
        # r = ss - (x1 + x2): b + r = a with b = x1+x2 (poly sum)
        self.x3b.eval_sub2(f, g, gate, self._res(g, self.ss), x1, x2)
        self.dx.eval_sub(f, g, gate, x1, self._res(g, self.x3b))
        self.sdx.eval_mul(f, g, gate, sres, self._res(g, self.dx))
        self.y3b.eval_sub(f, g, gate, self._res(g, self.sdx), y1)
        self.x3lt.eval(f, g, gate, self._res(g, self.x3b))
        self.y3lt.eval(f, g, gate, self._res(g, self.y3b))

    def write_limb_aff(self, cell: int, limb: int) -> Affine:
        nw = self.FP.nb // 8  # dwords per coordinate
        per_cell = {c: (self.x3b, 0) for c in range(nw)}
        per_cell.update({c: (self.y3b, nw) for c in range(nw, 2 * nw)})
        return self._write_aff_from(per_cell, cell, limb)

    def populate_row(self, row64, L, in_bytes) -> list:
        fp = self.FP
        p = fp.modulus
        nb = fp.nb
        x1 = limbs_to_int(in_bytes[0 : nb])
        y1 = limbs_to_int(in_bytes[nb : 2 * nb])
        x2 = limbs_to_int(in_bytes[2 * nb : 3 * nb])
        y2 = limbs_to_int(in_bytes[3 * nb : 4 * nb])

        def L32(v):
            return int_to_limbs(v, nb)

        def pop_sub(blk, a, b):
            r = (a - b) % p
            carry = (b + r - a) // p
            blk.populate(row64, L, [(+1, L32(b)), (+1, L32(r)), (-1, L32(a))], r, carry)
            return r

        sn = pop_sub(self.sn, y2, y1)
        sd = pop_sub(self.sd, x2, x1)
        s = sn * pow(sd, p - 2, p) % p
        self.s.populate(
            row64, L, [(+1, L32(s), L32(sd)), (-1, L32(sn))], s, (s * sd - sn) // p
        )
        ss = s * s % p
        self.ss.populate(
            row64, L, [(+1, L32(s), L32(s)), (-1, L32(ss))], ss, (s * s) // p
        )
        x3 = (ss - x1 - x2) % p
        carry = (x1 + x2 + x3 - ss) // p
        self.x3b.populate(
            row64, L,
            [(+1, L32(x1)), (+1, L32(x2)), (+1, L32(x3)), (-1, L32(ss))],
            x3, carry,
        )
        dx = pop_sub(self.dx, x1, x3)
        sdx = s * dx % p
        self.sdx.populate(
            row64, L, [(+1, L32(s), L32(dx)), (-1, L32(sdx))], sdx, (s * dx) // p
        )
        y3 = pop_sub(self.y3b, sdx, y1)
        self.x3lt.populate(row64, L, x3)
        self.y3lt.populate(row64, L, y3)
        nw = nb // 8
        out = [(x3 >> (64 * j)) & ((1 << 64) - 1) for j in range(nw)]
        out += [(y3 >> (64 * j)) & ((1 << 64) - 1) for j in range(nw)]
        return out


class WeierstrassDoubleChip(_BlockChip):
    """Short-Weierstrass doubling (weierstrass_double.rs).

    s  = (3 x^2 + a) / (2 y)
    x3 = s^2 - 2x,   y3 = s (x - x3) - y
    """

    name = "WsDouble"
    SYSCALL_ID = 0
    N_READ = 8
    N_WRITE = 8
    FP = None
    A = 0

    def extra_layout(self, c: Cols):
        fp = self.FP
        self.xx = self._add_block(c, "xx", fp)     # 3 x^2 + a
        self.s = self._add_block(c, "s", fp)       # xx / (2y)
        self.ss = self._add_block(c, "ss", fp)     # s^2
        self.x3b = self._add_block(c, "x3b", fp)   # ss - 2x
        self.dx = self._add_block(c, "dx", fp)     # x - x3
        self.sdx = self._add_block(c, "sdx", fp)   # s * dx
        self.y3b = self._add_block(c, "y3b", fp)   # sdx - y
        self.x3lt = self._add_lt(c, "x3lt", fp)
        self.y3lt = self._add_lt(c, "y3lt", fp)

    def eval_body(self, f, g):
        ops = f.ops
        gate = g("is_real")
        inb = g("inb")
        fp = self.FP
        x, y = inb[0 : fp.nb], inb[fp.nb : 2 * fp.nb]
        # xx = 3 x^2 + a: r + carry*m = 3*x*x + a
        def build_xx(vb, r):
            vb.add_prod(x, [fo_scale3(ops, l) for l in x])
            # (3*x)*x via scaled copies — emitted by add_prod with scaled syms
            vb.add_poly(int_to_limbs(self.A, fp.nb))
            vb.add_poly(r, -1)

        self.xx._vanish(f, g, gate, build_xx)
        # s * (2y) = xx
        y2 = [fo_scale2(ops, l) for l in y]
        def build_s(vb, r):
            vb.add_prod(r, y2)
            vb.add_poly(self._res(g, self.xx), -1)

        self.s._vanish(f, g, gate, build_s)
        sres = self._res(g, self.s)
        self.ss.eval_mul(f, g, gate, sres, sres)
        self.x3b.eval_sub2(f, g, gate, self._res(g, self.ss), x, x)
        self.dx.eval_sub(f, g, gate, x, self._res(g, self.x3b))
        self.sdx.eval_mul(f, g, gate, sres, self._res(g, self.dx))
        self.y3b.eval_sub(f, g, gate, self._res(g, self.sdx), y)
        self.x3lt.eval(f, g, gate, self._res(g, self.x3b))
        self.y3lt.eval(f, g, gate, self._res(g, self.y3b))

    def write_limb_aff(self, cell: int, limb: int) -> Affine:
        nw = self.FP.nb // 8
        per_cell = {c: (self.x3b, 0) for c in range(nw)}
        per_cell.update({c: (self.y3b, nw) for c in range(nw, 2 * nw)})
        return self._write_aff_from(per_cell, cell, limb)

    def populate_row(self, row64, L, in_bytes) -> list:
        fp = self.FP
        p = fp.modulus
        nb = fp.nb
        x = limbs_to_int(in_bytes[0 : nb])
        y = limbs_to_int(in_bytes[nb : 2 * nb])

        def L32(v):
            return int_to_limbs(v, nb)

        xx = (3 * x * x + self.A) % p
        carry = (3 * x * x + self.A) // p
        x3_l = [3 * l for l in L32(x)]
        self.xx.populate(
            row64, L,
            [(+1, L32(x), x3_l), (+1, L32(self.A)), (-1, L32(xx))], xx, carry,
        )
        s = xx * pow(2 * y % p, p - 2, p) % p
        y2_l = [2 * l for l in L32(y)]
        self.s.populate(
            row64, L, [(+1, L32(s), y2_l), (-1, L32(xx))], s,
            (s * 2 * y - xx) // p,
        )
        ss = s * s % p
        self.ss.populate(
            row64, L, [(+1, L32(s), L32(s)), (-1, L32(ss))], ss, (s * s) // p
        )
        x3 = (ss - 2 * x) % p
        self.x3b.populate(
            row64, L,
            [(+1, L32(x)), (+1, L32(x)), (+1, L32(x3)), (-1, L32(ss))],
            x3, (2 * x + x3 - ss) // p,
        )
        dx = (x - x3) % p
        self.dx.populate(
            row64, L, [(+1, L32(x3)), (+1, L32(dx)), (-1, L32(x))], dx,
            (x3 + dx - x) // p,
        )
        sdx = s * dx % p
        self.sdx.populate(
            row64, L, [(+1, L32(s), L32(dx)), (-1, L32(sdx))], sdx, (s * dx) // p
        )
        y3 = (sdx - y) % p
        self.y3b.populate(
            row64, L, [(+1, L32(y)), (+1, L32(y3)), (-1, L32(sdx))], y3,
            (y + y3 - sdx) // p,
        )
        self.x3lt.populate(row64, L, x3)
        self.y3lt.populate(row64, L, y3)
        nw = nb // 8
        out = [(x3 >> (64 * j)) & ((1 << 64) - 1) for j in range(nw)]
        out += [(y3 >> (64 * j)) & ((1 << 64) - 1) for j in range(nw)]
        return out


def fo_scale2(ops, sym):
    return ops.scale_base(sym, 2)


def fo_scale3(ops, sym):
    return ops.scale_base(sym, 3)


class Secp256k1AddChip(WeierstrassAddChip):
    name = "Secp256k1Add"
    SYSCALL_ID = SYSCALL_SECP256K1_ADD
    FP = fo.SECP256K1_FP


class Secp256k1DoubleChip(WeierstrassDoubleChip):
    name = "Secp256k1Double"
    SYSCALL_ID = SYSCALL_SECP256K1_DOUBLE
    FP = fo.SECP256K1_FP
    A = fo.SECP256K1_A


class Bn254AddChip(WeierstrassAddChip):
    name = "Bn254Add"
    SYSCALL_ID = SYSCALL_BN254_ADD
    FP = fo.BN254_FP


class Secp256r1AddChip(WeierstrassAddChip):
    name = "Secp256r1Add"
    SYSCALL_ID = SYSCALL_SECP256R1_ADD
    FP = fo.SECP256R1_FP


class Secp256r1DoubleChip(WeierstrassDoubleChip):
    name = "Secp256r1Double"
    SYSCALL_ID = SYSCALL_SECP256R1_DOUBLE
    FP = fo.SECP256R1_FP
    A = fo.SECP256R1_A


class Bn254DoubleChip(WeierstrassDoubleChip):
    name = "Bn254Double"
    SYSCALL_ID = SYSCALL_BN254_DOUBLE
    FP = fo.BN254_FP
    A = fo.BN254_A


class Bls12381AddChip(WeierstrassAddChip):
    name = "Bls12381Add"
    SYSCALL_ID = SYSCALL_BLS12381_ADD
    N_READ = 24
    N_WRITE = 12
    FP = fo.BLS12381_FP


class Bls12381DoubleChip(WeierstrassDoubleChip):
    name = "Bls12381Double"
    SYSCALL_ID = SYSCALL_BLS12381_DOUBLE
    N_READ = 12
    N_WRITE = 12
    FP = fo.BLS12381_FP
    A = 0


class Uint256MulChip(_BlockChip):
    """uint256 modular multiplication: x = x * y mod m (uint256/air.rs).

    Buffer: x (cells 0..3, written back), y (4..7), m (8..11); m == 0
    means mod 2^256 (uint256_mul.rs convention).
    """

    name = "Uint256Mul"
    SYSCALL_ID = SYSCALL_UINT256_MUL
    N_READ = 12
    N_WRITE = 4
    FP = fo.UINT256

    def extra_layout(self, c: Cols):
        fp = self.FP
        self.mul = self._add_block(c, "mul", fp)
        c.col("m_is_zero")  # 1 iff the modulus operand is 0 (use 2^256)
        c.col("m_inv")      # base-field inverse witness of sum(m bytes)

    def eval_body(self, f, g):
        ops = f.ops
        gate = g("is_real")
        inb = g("inb")
        x, y, m = inb[0:32], inb[32:64], inb[64:96]
        mz = g("m_is_zero")
        f.assert_bool(mz)
        # m_is_zero <=> all m bytes are 0:
        #   mz * m_i = 0 for all i               (mz = 1 forces m = 0)
        #   gate * (s*inv + mz - 1) = 0          (m = 0 forces mz = 1)
        # where s = sum(m bytes) < 2^13 < p so a base inverse exists.
        s = ops.zero()
        for l in m:
            s = ops.add(s, l)
            f.assert_zero(ops.mul(gate, ops.mul(mz, l)))
        inv = g("m_inv")
        f.assert_zero(
            ops.mul(gate, ops.sub(ops.add(ops.mul(s, inv), mz), ops.one()))
        )
        # modulus poly: m bytes when mz=0, else 2^256 (handled as carry*2^256
        # — with m=0 the carry term vanishes and the result is the low part;
        # we constrain via a SELECTED modulus: m_sel_i = m_i + mz * (2^256)_i
        msel = list(m)
        two256 = int_to_limbs(1 << 256, 33)
        # x*y = r + carry * m_sel: build manually (modulus is dynamic)
        r, cr, w = self.mul.syms(g)
        vb = fo.VanishingBuilder(ops, self.FP)
        vb.add_prod(x, y)
        vb.add_poly(r, -1)
        vb.add_prod(cr, msel, sign=-1)
        # mz branch: carry * 2^256 = shifted carry at limb 32
        for i, cl in enumerate(cr):
            vb.neg[32 + i].append(ops.mul(mz, cl))
        vb.constrain(f, gate, w)

    def write_limb_aff(self, cell: int, limb: int) -> Affine:
        per_cell = {c: (self.mul, 0) for c in range(4)}
        return self._write_aff_from(per_cell, cell, limb)

    def populate_row(self, row64, L, in_bytes) -> list:
        x = limbs_to_int(in_bytes[0:32])
        y = limbs_to_int(in_bytes[32:64])
        m = limbs_to_int(in_bytes[64:96])
        modulus = m if m != 0 else (1 << 256)
        r = (x * y) % modulus
        carry = (x * y) // modulus
        assert carry < (1 << 256), "uint256 carry overflow"
        m_l33 = int_to_limbs(modulus, 33)
        self.mul.populate(
            row64, L,
            [(+1, int_to_limbs(x, 32), int_to_limbs(y, 32)),
             (-1, int_to_limbs(r, 32)),
             (-1, int_to_limbs(carry, 32), m_l33)],
            r, 0,
        )
        # the generic populate already subtracted carry*modulus via terms;
        # overwrite the carry columns with the real carry limbs
        row64[L["mul_c"]] = int_to_limbs(carry, 32)
        row64[L["m_is_zero"]] = 1 if m == 0 else 0
        if m != 0:
            kp = (1 << 31) - (1 << 24) + 1
            s = int(sum(in_bytes[64:96])) % kp
            row64[L["m_inv"]] = pow(s, kp - 2, kp)
        return [(r >> (64 * j)) & ((1 << 64) - 1) for j in range(4)]


class EdDecompressChip(_BlockChip):
    """ed25519 point decompression (ed_decompress.rs).

    x^2 = (y^2 - 1) / (d y^2 + 1); the witnessed root is negated when the
    sign cell requests the other representative.

    ABI (single-pointer, cells): 0 = sign (0/1), 1..4 = y; x written to
    cells 5..8. The executor picks the root with lsb 0 as the base
    representative; sign = 1 selects p - x.
    """

    name = "EdDecompress"
    SYSCALL_ID = 16
    N_READ = 5
    N_WRITE = 4
    FP = fo.ED25519_FP

    def extra_layout(self, c: Cols):
        fp = self.FP
        self.yy = self._add_block(c, "yy", fp)      # y^2
        self.vblk = self._add_block(c, "vblk", fp)  # d*y^2 + 1
        self.wblk = self._add_block(c, "wblk", fp)  # (y^2 - 1) / v
        self.xx = self._add_block(c, "xx", fp)      # x^2 (must equal w)
        self.negx = self._add_block(c, "negx", fp)  # p - x  (0 - x)
        self.xlt = self._add_lt(c, "xlt", fp)
        c.cols("xroot", fp.nb)   # witnessed base root
        c.cols("xout", fp.nb)    # sign-selected output

    def eval_body(self, f, g):
        ops = f.ops
        gate = g("is_real")
        inb = g("inb")
        sign = inb[0]          # low byte of the sign cell
        y = inb[8:40]          # cells 1..4
        fp = self.FP
        f.assert_zero(ops.mul(gate, ops.mul(sign, ops.sub(sign, ops.one()))))
        for b in inb[1:8]:     # rest of the sign cell must be zero
            f.assert_zero(ops.mul(gate, b))
        x = g("xroot")
        self.yy.eval_mul(f, g, gate, y, y)
        d_limbs = int_to_limbs(fo.ED25519_D, fp.nb)
        one_l = int_to_limbs(1, fp.nb)
        self.vblk.eval_mul(f, g, gate, d_limbs, self._res(g, self.yy), c=one_l)
        # w * v = y^2 - 1  <=>  w*v + 1 = y^2: div form with a = yy - 1
        # handled as: w*v - (yy - 1) = carry*p  ==  w*v + 1 - yy = carry*p
        r, cr, w_ = self.wblk.syms(g)
        vb = fo.VanishingBuilder(ops, fp)
        vb.add_prod(r, self._res(g, self.vblk))
        vb.add_poly(one_l)
        vb.add_poly(self._res(g, self.yy), -1)
        vb.add_prod(cr, fp.modulus_limbs, sign=-1)
        vb.constrain(f, gate, w_)
        # x^2 = w (limb equality of the two reduced results)
        self.xx.eval_mul(f, g, gate, x, x)
        for a, b in zip(self._res(g, self.xx), self._res(g, self.wblk)):
            f.assert_zero(ops.mul(gate, ops.sub(a, b)))
        # negx = 0 - x:  x + negx = carry*p
        rn, crn, wn = self.negx.syms(g)
        vbn = fo.VanishingBuilder(ops, fp)
        vbn.add_poly(x)
        vbn.add_poly(rn)
        vbn.add_prod(crn, fp.modulus_limbs, sign=-1)
        vbn.constrain(f, gate, wn)
        # xout = (1-s)*x + s*negx, per limb (degree 2 + gate)
        xout = g("xout")
        for i in range(fp.nb):
            sel = ops.add(
                ops.mul(ops.sub(ops.one(), sign), x[i]),
                ops.mul(sign, rn[i]),
            )
            f.assert_zero(ops.mul(gate, ops.sub(xout[i], sel)))
        self.xlt.eval(f, g, gate, xout)

    def u8_check_slices(self, L) -> list:
        return super().u8_check_slices(L) + [L["xroot"], L["xout"]]

    def extra_sends(self, is_real) -> list:
        out = super().extra_sends(is_real)
        out.extend(
            self._u8_sends(
                list(range(self.layout["xroot"].start, self.layout["xroot"].stop))
                + list(range(self.layout["xout"].start, self.layout["xout"].stop)),
                is_real,
            )
        )
        return out

    def write_limb_aff(self, cell: int, limb: int) -> Affine:
        base = self.layout["xout"].start + cell * 8 + limb * 2
        return Affine(0, ((main_col(base), 1), (main_col(base + 1), 256)))

    def populate_row(self, row64, L, in_bytes) -> list:
        fp = self.FP
        p = fp.modulus
        sign = int(in_bytes[0])
        y = limbs_to_int(in_bytes[8:40])
        d = fo.ED25519_D
        nb = fp.nb

        def L32(v):
            return int_to_limbs(v, nb)

        yy = y * y % p
        self.yy.populate(
            row64, L, [(+1, L32(y), L32(y)), (-1, L32(yy))], yy, (y * y) // p
        )
        v = (d * yy + 1) % p
        self.vblk.populate(
            row64, L,
            [(+1, L32(d), L32(yy)), (+1, L32(1)), (-1, L32(v))],
            v, (d * yy + 1) // p,
        )
        w = (yy - 1) * pow(v, p - 2, p) % p
        self.wblk.populate(
            row64, L,
            [(+1, L32(w), L32(v)), (+1, L32(1)), (-1, L32(yy))],
            w, (w * v + 1 - yy) // p,
        )
        # base root with lsb 0 (executor convention)
        x = pow(w, (p + 3) // 8, p)
        if x * x % p != w:
            x = x * pow(2, (p - 1) // 4, p) % p
        assert x * x % p == w, "not a square (invalid compressed point)"
        if x & 1:
            x = p - x
        self.xx.populate(
            row64, L, [(+1, L32(x), L32(x)), (-1, L32(w))], w, (x * x) // p
        )
        negx = (p - x) % p
        self.negx.populate(
            row64, L, [(+1, L32(x)), (+1, L32(negx)), (-1, L32(0))],
            negx, (x + negx) // p,
        )
        xout = negx if sign else x
        row64[L["xroot"]] = L32(x)
        row64[L["xout"]] = L32(xout)
        self.xlt.populate(row64, L, xout)
        return [(xout >> (64 * j)) & ((1 << 64) - 1) for j in range(4)]


class Secp256k1DecompressChip(_BlockChip):
    """secp256k1 point decompression (weierstrass decompress.rs).

    y^2 = x^3 + 7; the witnessed root's parity is selected by the sign
    cell. ABI (cells): 0 = sign (0/1 = desired y parity via select of
    +-root), 1..4 = x; y written to cells 5..8.
    """

    name = "Secp256k1Decompress"
    SYSCALL_ID = 17
    N_READ = 5
    N_WRITE = 4
    FP = fo.SECP256K1_FP

    def extra_layout(self, c: Cols):
        fp = self.FP
        self.xx = self._add_block(c, "xx", fp)      # x^2
        self.rhs = self._add_block(c, "rhs", fp)    # x^3 + 7
        self.yy = self._add_block(c, "yy", fp)      # y^2 (must equal rhs)
        self.negy = self._add_block(c, "negy", fp)  # p - y
        self.ylt = self._add_lt(c, "ylt", fp)
        c.cols("yroot", fp.nb)
        c.cols("yout", fp.nb)

    def eval_body(self, f, g):
        ops = f.ops
        gate = g("is_real")
        inb = g("inb")
        sign = inb[0]
        x = inb[8:40]
        fp = self.FP
        f.assert_zero(ops.mul(gate, ops.mul(sign, ops.sub(sign, ops.one()))))
        for b in inb[1:8]:
            f.assert_zero(ops.mul(gate, b))
        y = g("yroot")
        self.xx.eval_mul(f, g, gate, x, x)
        b_l = int_to_limbs(fo.SECP256K1_B, fp.nb)
        self.rhs.eval_mul(f, g, gate, self._res(g, self.xx), x, c=b_l)
        self.yy.eval_mul(f, g, gate, y, y)
        for a, b in zip(self._res(g, self.yy), self._res(g, self.rhs)):
            f.assert_zero(ops.mul(gate, ops.sub(a, b)))
        rn, crn, wn = self.negy.syms(g)
        vbn = fo.VanishingBuilder(ops, fp)
        vbn.add_poly(y)
        vbn.add_poly(rn)
        vbn.add_prod(crn, fp.modulus_limbs, sign=-1)
        vbn.constrain(f, gate, wn)
        yout = g("yout")
        for i in range(fp.nb):
            sel = ops.add(
                ops.mul(ops.sub(ops.one(), sign), y[i]),
                ops.mul(sign, rn[i]),
            )
            f.assert_zero(ops.mul(gate, ops.sub(yout[i], sel)))
        self.ylt.eval(f, g, gate, yout)

    def u8_check_slices(self, L) -> list:
        return super().u8_check_slices(L) + [L["yroot"], L["yout"]]

    def extra_sends(self, is_real) -> list:
        out = super().extra_sends(is_real)
        out.extend(
            self._u8_sends(
                list(range(self.layout["yroot"].start, self.layout["yroot"].stop))
                + list(range(self.layout["yout"].start, self.layout["yout"].stop)),
                is_real,
            )
        )
        return out

    def write_limb_aff(self, cell: int, limb: int) -> Affine:
        base = self.layout["yout"].start + cell * 8 + limb * 2
        return Affine(0, ((main_col(base), 1), (main_col(base + 1), 256)))

    def populate_row(self, row64, L, in_bytes) -> list:
        fp = self.FP
        p = fp.modulus
        sign = int(in_bytes[0])
        x = limbs_to_int(in_bytes[8:40])
        nb = fp.nb

        def L32(v):
            return int_to_limbs(v, nb)

        xx = x * x % p
        self.xx.populate(
            row64, L, [(+1, L32(x), L32(x)), (-1, L32(xx))], xx, (x * x) // p
        )
        rhs = (xx * x + fo.SECP256K1_B) % p
        self.rhs.populate(
            row64, L,
            [(+1, L32(xx), L32(x)), (+1, L32(fo.SECP256K1_B)), (-1, L32(rhs))],
            rhs, (xx * x + fo.SECP256K1_B) // p,
        )
        y = pow(rhs, (p + 1) // 4, p)  # p = 3 mod 4
        assert y * y % p == rhs, "not a square (invalid x)"
        if y & 1:
            y = p - y
        self.yy.populate(
            row64, L, [(+1, L32(y), L32(y)), (-1, L32(rhs))], rhs, (y * y) // p
        )
        negy = (p - y) % p
        self.negy.populate(
            row64, L, [(+1, L32(y)), (+1, L32(negy)), (-1, L32(0))],
            negy, (y + negy) // p,
        )
        yout = negy if sign else y
        row64[L["yroot"]] = L32(y)
        row64[L["yout"]] = L32(yout)
        self.ylt.populate(row64, L, yout)
        return [(yout >> (64 * j)) & ((1 << 64) - 1) for j in range(4)]


class Secp256r1DecompressChip(_BlockChip):
    """secp256r1 (NIST P-256) decompression (weierstrass decompress.rs).

    y^2 = x^3 + a x + b with a = -3; like Secp256k1Decompress plus the
    a*x product block. ABI (cells): 0 = sign, 1..4 = x; y -> cells 5..8.
    """

    name = "Secp256r1Decompress"
    SYSCALL_ID = SYSCALL_SECP256R1_DECOMPRESS
    N_READ = 5
    N_WRITE = 4
    FP = fo.SECP256R1_FP

    def extra_layout(self, c: Cols):
        fp = self.FP
        self.xx = self._add_block(c, "xx", fp)      # x^2
        self.ax = self._add_block(c, "ax", fp)      # a * x
        self.rhs = self._add_block(c, "rhs", fp)    # x^3 + a x + b
        self.yy = self._add_block(c, "yy", fp)      # y^2 (must equal rhs)
        self.negy = self._add_block(c, "negy", fp)  # p - y
        self.ylt = self._add_lt(c, "ylt", fp)
        c.cols("yroot", fp.nb)
        c.cols("yout", fp.nb)

    def eval_body(self, f, g):
        ops = f.ops
        gate = g("is_real")
        inb = g("inb")
        sign = inb[0]
        x = inb[8:40]
        fp = self.FP
        f.assert_zero(ops.mul(gate, ops.mul(sign, ops.sub(sign, ops.one()))))
        for b in inb[1:8]:
            f.assert_zero(ops.mul(gate, b))
        y = g("yroot")
        self.xx.eval_mul(f, g, gate, x, x)
        a_l = int_to_limbs(fo.SECP256R1_A, fp.nb)
        self.ax.eval_mul(f, g, gate, a_l, x)
        b_l = int_to_limbs(fo.SECP256R1_B, fp.nb)

        def build_rhs(vb, r):
            vb.add_prod(self._res(g, self.xx), x)
            vb.add_poly(self._res(g, self.ax))
            vb.add_poly(b_l)
            vb.add_poly(r, -1)

        self.rhs._vanish(f, g, gate, build_rhs)
        self.yy.eval_mul(f, g, gate, y, y)
        for a, b in zip(self._res(g, self.yy), self._res(g, self.rhs)):
            f.assert_zero(ops.mul(gate, ops.sub(a, b)))
        rn, crn, wn = self.negy.syms(g)
        vbn = fo.VanishingBuilder(ops, fp)
        vbn.add_poly(y)
        vbn.add_poly(rn)
        vbn.add_prod(crn, fp.modulus_limbs, sign=-1)
        vbn.constrain(f, gate, wn)
        yout = g("yout")
        for i in range(fp.nb):
            sel = ops.add(
                ops.mul(ops.sub(ops.one(), sign), y[i]),
                ops.mul(sign, rn[i]),
            )
            f.assert_zero(ops.mul(gate, ops.sub(yout[i], sel)))
        self.ylt.eval(f, g, gate, yout)

    def u8_check_slices(self, L) -> list:
        return super().u8_check_slices(L) + [L["yroot"], L["yout"]]

    def extra_sends(self, is_real) -> list:
        out = super().extra_sends(is_real)
        out.extend(
            self._u8_sends(
                list(range(self.layout["yroot"].start, self.layout["yroot"].stop))
                + list(range(self.layout["yout"].start, self.layout["yout"].stop)),
                is_real,
            )
        )
        return out

    def write_limb_aff(self, cell: int, limb: int) -> Affine:
        base = self.layout["yout"].start + cell * 8 + limb * 2
        return Affine(0, ((main_col(base), 1), (main_col(base + 1), 256)))

    def populate_row(self, row64, L, in_bytes) -> list:
        fp = self.FP
        p = fp.modulus
        sign = int(in_bytes[0])
        x = limbs_to_int(in_bytes[8:40])
        nb = fp.nb

        def L32(v):
            return int_to_limbs(v, nb)

        xx = x * x % p
        self.xx.populate(
            row64, L, [(+1, L32(x), L32(x)), (-1, L32(xx))], xx, (x * x) // p
        )
        a = fo.SECP256R1_A
        ax = a * x % p
        self.ax.populate(
            row64, L, [(+1, L32(a), L32(x)), (-1, L32(ax))], ax, (a * x) // p
        )
        rhs = (xx * x + ax + fo.SECP256R1_B) % p
        self.rhs.populate(
            row64, L,
            [(+1, L32(xx), L32(x)), (+1, L32(ax)), (+1, L32(fo.SECP256R1_B)),
             (-1, L32(rhs))],
            rhs, (xx * x + ax + fo.SECP256R1_B) // p,
        )
        y = pow(rhs, (p + 1) // 4, p)  # p = 3 mod 4
        assert y * y % p == rhs, "not a square (invalid x)"
        if y & 1:
            y = p - y
        self.yy.populate(
            row64, L, [(+1, L32(y), L32(y)), (-1, L32(rhs))], rhs, (y * y) // p
        )
        negy = (p - y) % p
        self.negy.populate(
            row64, L, [(+1, L32(y)), (+1, L32(negy)), (-1, L32(0))],
            negy, (y + negy) // p,
        )
        yout = negy if sign else y
        row64[L["yroot"]] = L32(y)
        row64[L["yout"]] = L32(yout)
        self.ylt.populate(row64, L, yout)
        return [(yout >> (64 * j)) & ((1 << 64) - 1) for j in range(4)]


class Bls12381DecompressChip(_BlockChip):
    """BLS12-381 G1 decompression: y^2 = x^3 + 4 over the 381-bit field
    (weierstrass decompress.rs for bls12_381). ABI (cells): 0 = sign,
    1..6 = x (6 dwords LE); y written to cells 7..12... the write window
    overwrites cells 0..5 with y (head-overwrite convention like the
    256-bit family).
    """

    name = "Bls12381Decompress"
    SYSCALL_ID = SYSCALL_BLS12381_DECOMPRESS
    N_READ = 7
    N_WRITE = 6
    FP = fo.BLS12381_FP

    def extra_layout(self, c: Cols):
        fp = self.FP
        self.xx = self._add_block(c, "xx", fp)      # x^2
        self.rhs = self._add_block(c, "rhs", fp)    # x^3 + 4
        self.yy = self._add_block(c, "yy", fp)      # y^2 (must equal rhs)
        self.negy = self._add_block(c, "negy", fp)  # p - y
        self.ylt = self._add_lt(c, "ylt", fp)
        c.cols("yroot", fp.nb)
        c.cols("yout", fp.nb)

    def eval_body(self, f, g):
        ops = f.ops
        gate = g("is_real")
        inb = g("inb")
        sign = inb[0]
        fp = self.FP
        x = inb[8 : 8 + fp.nb]
        f.assert_zero(ops.mul(gate, ops.mul(sign, ops.sub(sign, ops.one()))))
        for b in inb[1:8]:
            f.assert_zero(ops.mul(gate, b))
        y = g("yroot")
        self.xx.eval_mul(f, g, gate, x, x)
        b_l = int_to_limbs(4, fp.nb)
        self.rhs.eval_mul(f, g, gate, self._res(g, self.xx), x, c=b_l)
        self.yy.eval_mul(f, g, gate, y, y)
        for a, b in zip(self._res(g, self.yy), self._res(g, self.rhs)):
            f.assert_zero(ops.mul(gate, ops.sub(a, b)))
        rn, crn, wn = self.negy.syms(g)
        vbn = fo.VanishingBuilder(ops, fp)
        vbn.add_poly(y)
        vbn.add_poly(rn)
        vbn.add_prod(crn, fp.modulus_limbs, sign=-1)
        vbn.constrain(f, gate, wn)
        yout = g("yout")
        for i in range(fp.nb):
            sel = ops.add(
                ops.mul(ops.sub(ops.one(), sign), y[i]),
                ops.mul(sign, rn[i]),
            )
            f.assert_zero(ops.mul(gate, ops.sub(yout[i], sel)))
        self.ylt.eval(f, g, gate, yout)

    def u8_check_slices(self, L) -> list:
        return super().u8_check_slices(L) + [L["yroot"], L["yout"]]

    def extra_sends(self, is_real) -> list:
        out = super().extra_sends(is_real)
        out.extend(
            self._u8_sends(
                list(range(self.layout["yroot"].start, self.layout["yroot"].stop))
                + list(range(self.layout["yout"].start, self.layout["yout"].stop)),
                is_real,
            )
        )
        return out

    def write_limb_aff(self, cell: int, limb: int) -> Affine:
        base = self.layout["yout"].start + cell * 8 + limb * 2
        return Affine(0, ((main_col(base), 1), (main_col(base + 1), 256)))

    def populate_row(self, row64, L, in_bytes) -> list:
        fp = self.FP
        p = fp.modulus
        sign = int(in_bytes[0])
        x = limbs_to_int(in_bytes[8 : 8 + fp.nb])
        nb = fp.nb

        def LL(v):
            return int_to_limbs(v, nb)

        xx = x * x % p
        self.xx.populate(
            row64, L, [(+1, LL(x), LL(x)), (-1, LL(xx))], xx, (x * x) // p
        )
        rhs = (xx * x + 4) % p
        self.rhs.populate(
            row64, L,
            [(+1, LL(xx), LL(x)), (+1, LL(4)), (-1, LL(rhs))],
            rhs, (xx * x + 4) // p,
        )
        y = pow(rhs, (p + 1) // 4, p)  # p = 3 mod 4
        assert y * y % p == rhs, "not a square (invalid x)"
        if y & 1:
            y = p - y
        self.yy.populate(
            row64, L, [(+1, LL(y), LL(y)), (-1, LL(rhs))], rhs, (y * y) // p
        )
        negy = (p - y) % p
        self.negy.populate(
            row64, L, [(+1, LL(y)), (+1, LL(negy)), (-1, LL(0))],
            negy, (y + negy) // p,
        )
        yout = negy if sign else y
        row64[L["yroot"]] = LL(y)
        row64[L["yout"]] = LL(yout)
        self.ylt.populate(row64, L, yout)
        return [(yout >> (64 * j)) & ((1 << 64) - 1) for j in range(6)]


# ---------------------------------------------------------------------------
# Fp / Fp2 tower precompiles (reference:
# crates/core/machine/src/syscall/precompiles/fptower/{fp,fp2_addsub,
# fp2_mul}.rs) — add/sub/mul over the base field and the quadratic
# extension Fp2 = Fp[u]/(u^2 + 1), for bn254 and bls12-381.
# ---------------------------------------------------------------------------


class FpOpChip(_BlockChip):
    """r = x OP y mod p. ABI: x (nw dwords) | y (nw dwords); r -> head."""

    OP = "add"  # add | sub | mul

    def extra_layout(self, c: Cols):
        fp = self.FP
        self.r = self._add_block(c, "r", fp)
        self.rlt = self._add_lt(c, "rlt", fp)

    def eval_body(self, f, g):
        gate = g("is_real")
        inb = g("inb")
        nb = self.FP.nb
        x, y = inb[0:nb], inb[nb : 2 * nb]
        if self.OP == "mul":
            self.r.eval_mul(f, g, gate, x, y)
        elif self.OP == "sub":
            self.r.eval_sub(f, g, gate, x, y)
        else:

            def build(vb, r):
                vb.add_poly(x)
                vb.add_poly(y)
                vb.add_poly(r, -1)

            self.r._vanish(f, g, gate, build)
        self.rlt.eval(f, g, gate, self._res(g, self.r))

    def write_limb_aff(self, cell: int, limb: int) -> Affine:
        per_cell = {c: (self.r, 0) for c in range(self.FP.nb // 8)}
        return self._write_aff_from(per_cell, cell, limb)

    def populate_row(self, row64, L, in_bytes) -> list:
        fp = self.FP
        p = fp.modulus
        nb = fp.nb
        x = limbs_to_int(in_bytes[0:nb])
        y = limbs_to_int(in_bytes[nb : 2 * nb])

        def LL(v):
            return int_to_limbs(v, nb)

        if self.OP == "mul":
            r = x * y % p
            self.r.populate(
                row64, L, [(+1, LL(x), LL(y)), (-1, LL(r))], r, (x * y) // p
            )
        elif self.OP == "sub":
            r = (x - y) % p
            self.r.populate(
                row64, L, [(+1, LL(y)), (+1, LL(r)), (-1, LL(x))], r,
                (y + r - x) // p,
            )
        else:
            r = (x + y) % p
            self.r.populate(
                row64, L, [(+1, LL(x)), (+1, LL(y)), (-1, LL(r))], r,
                (x + y - r) // p,
            )
        self.rlt.populate(row64, L, r)
        return [(r >> (64 * j)) & ((1 << 64) - 1) for j in range(nb // 8)]


class Fp2AddSubChip(_BlockChip):
    """Componentwise Fp2 add/sub. ABI: x0|x1|y0|y1; (r0, r1) -> head."""

    OP = "add"

    def extra_layout(self, c: Cols):
        fp = self.FP
        self.r0 = self._add_block(c, "r0", fp)
        self.r1 = self._add_block(c, "r1", fp)
        self.r0lt = self._add_lt(c, "r0lt", fp)
        self.r1lt = self._add_lt(c, "r1lt", fp)

    def eval_body(self, f, g):
        gate = g("is_real")
        inb = g("inb")
        nb = self.FP.nb
        comps = [inb[i * nb : (i + 1) * nb] for i in range(4)]
        for blk, lt, a, b in (
            (self.r0, self.r0lt, comps[0], comps[2]),
            (self.r1, self.r1lt, comps[1], comps[3]),
        ):
            if self.OP == "sub":
                blk.eval_sub(f, g, gate, a, b)
            else:

                def build(vb, r, a=a, b=b):
                    vb.add_poly(a)
                    vb.add_poly(b)
                    vb.add_poly(r, -1)

                blk._vanish(f, g, gate, build)
            lt.eval(f, g, gate, self._res(g, blk))

    def write_limb_aff(self, cell: int, limb: int) -> Affine:
        nw = self.FP.nb // 8
        per_cell = {c: (self.r0, 0) for c in range(nw)}
        per_cell.update({c: (self.r1, nw) for c in range(nw, 2 * nw)})
        return self._write_aff_from(per_cell, cell, limb)

    def populate_row(self, row64, L, in_bytes) -> list:
        fp = self.FP
        p = fp.modulus
        nb = fp.nb
        v = [limbs_to_int(in_bytes[i * nb : (i + 1) * nb]) for i in range(4)]

        def LL(x):
            return int_to_limbs(x, nb)

        outs = []
        for blk, lt, a, b in (
            (self.r0, self.r0lt, v[0], v[2]),
            (self.r1, self.r1lt, v[1], v[3]),
        ):
            if self.OP == "sub":
                r = (a - b) % p
                blk.populate(row64, L, [(+1, LL(b)), (+1, LL(r)), (-1, LL(a))],
                             r, (b + r - a) // p)
            else:
                r = (a + b) % p
                blk.populate(row64, L, [(+1, LL(a)), (+1, LL(b)), (-1, LL(r))],
                             r, (a + b - r) // p)
            lt.populate(row64, L, r)
            outs.append(r)
        nw = nb // 8
        out = [(outs[0] >> (64 * j)) & ((1 << 64) - 1) for j in range(nw)]
        out += [(outs[1] >> (64 * j)) & ((1 << 64) - 1) for j in range(nw)]
        return out


class Fp2MulChip(_BlockChip):
    """Fp2 product: (x0 y0 - x1 y1, x0 y1 + x1 y0). ABI like Fp2AddSub."""

    def extra_layout(self, c: Cols):
        fp = self.FP
        self.t0 = self._add_block(c, "t0", fp)  # x0 y0
        self.t1 = self._add_block(c, "t1", fp)  # x1 y1
        self.c0 = self._add_block(c, "c0", fp)  # t0 - t1
        self.t2 = self._add_block(c, "t2", fp)  # x0 y1
        self.t3 = self._add_block(c, "t3", fp)  # x1 y0
        self.c1 = self._add_block(c, "c1", fp)  # t2 + t3
        self.c0lt = self._add_lt(c, "c0lt", fp)
        self.c1lt = self._add_lt(c, "c1lt", fp)

    def eval_body(self, f, g):
        gate = g("is_real")
        inb = g("inb")
        nb = self.FP.nb
        x0, x1, y0, y1 = (inb[i * nb : (i + 1) * nb] for i in range(4))
        self.t0.eval_mul(f, g, gate, x0, y0)
        self.t1.eval_mul(f, g, gate, x1, y1)
        self.c0.eval_sub(f, g, gate, self._res(g, self.t0), self._res(g, self.t1))
        self.t2.eval_mul(f, g, gate, x0, y1)
        self.t3.eval_mul(f, g, gate, x1, y0)
        t2r, t3r = self._res(g, self.t2), self._res(g, self.t3)

        def build_c1(vb, r):
            vb.add_poly(t2r)
            vb.add_poly(t3r)
            vb.add_poly(r, -1)

        self.c1._vanish(f, g, gate, build_c1)
        self.c0lt.eval(f, g, gate, self._res(g, self.c0))
        self.c1lt.eval(f, g, gate, self._res(g, self.c1))

    def write_limb_aff(self, cell: int, limb: int) -> Affine:
        nw = self.FP.nb // 8
        per_cell = {c: (self.c0, 0) for c in range(nw)}
        per_cell.update({c: (self.c1, nw) for c in range(nw, 2 * nw)})
        return self._write_aff_from(per_cell, cell, limb)

    def populate_row(self, row64, L, in_bytes) -> list:
        fp = self.FP
        p = fp.modulus
        nb = fp.nb
        x0, x1, y0, y1 = (
            limbs_to_int(in_bytes[i * nb : (i + 1) * nb]) for i in range(4)
        )

        def LL(v):
            return int_to_limbs(v, nb)

        t0 = x0 * y0 % p
        self.t0.populate(row64, L, [(+1, LL(x0), LL(y0)), (-1, LL(t0))], t0,
                         (x0 * y0) // p)
        t1 = x1 * y1 % p
        self.t1.populate(row64, L, [(+1, LL(x1), LL(y1)), (-1, LL(t1))], t1,
                         (x1 * y1) // p)
        c0 = (t0 - t1) % p
        self.c0.populate(row64, L, [(+1, LL(t1)), (+1, LL(c0)), (-1, LL(t0))],
                         c0, (t1 + c0 - t0) // p)
        t2 = x0 * y1 % p
        self.t2.populate(row64, L, [(+1, LL(x0), LL(y1)), (-1, LL(t2))], t2,
                         (x0 * y1) // p)
        t3 = x1 * y0 % p
        self.t3.populate(row64, L, [(+1, LL(x1), LL(y0)), (-1, LL(t3))], t3,
                         (x1 * y0) // p)
        c1 = (t2 + t3) % p
        self.c1.populate(row64, L, [(+1, LL(t2)), (+1, LL(t3)), (-1, LL(c1))],
                         c1, (t2 + t3 - c1) // p)
        self.c0lt.populate(row64, L, c0)
        self.c1lt.populate(row64, L, c1)
        nw = nb // 8
        out = [(c0 >> (64 * j)) & ((1 << 64) - 1) for j in range(nw)]
        out += [(c1 >> (64 * j)) & ((1 << 64) - 1) for j in range(nw)]
        return out


def _tower(name, sid, base, op, fp, n_read, n_write):
    """Subclass factory for the 12 tower chips."""
    cls = type(
        name,
        (base,),
        {
            "name": name,
            "SYSCALL_ID": sid,
            "N_READ": n_read,
            "N_WRITE": n_write,
            "FP": fp,
            "OP": op,
        },
    )
    return cls


_B254, _B381 = fo.BN254_FP, fo.BLS12381_FP
Bn254FpAddChip = _tower("Bn254FpAdd", 25, FpOpChip, "add", _B254, 8, 4)
Bn254FpSubChip = _tower("Bn254FpSub", 26, FpOpChip, "sub", _B254, 8, 4)
Bn254FpMulChip = _tower("Bn254FpMul", 27, FpOpChip, "mul", _B254, 8, 4)
Bn254Fp2AddChip = _tower("Bn254Fp2Add", 28, Fp2AddSubChip, "add", _B254, 16, 8)
Bn254Fp2SubChip = _tower("Bn254Fp2Sub", 29, Fp2AddSubChip, "sub", _B254, 16, 8)
Bn254Fp2MulChip = _tower("Bn254Fp2Mul", 30, Fp2MulChip, None, _B254, 16, 8)
Bls12381FpAddChip = _tower("Bls12381FpAdd", 31, FpOpChip, "add", _B381, 12, 6)
Bls12381FpSubChip = _tower("Bls12381FpSub", 32, FpOpChip, "sub", _B381, 12, 6)
Bls12381FpMulChip = _tower("Bls12381FpMul", 33, FpOpChip, "mul", _B381, 12, 6)
Bls12381Fp2AddChip = _tower("Bls12381Fp2Add", 34, Fp2AddSubChip, "add", _B381, 24, 12)
Bls12381Fp2SubChip = _tower("Bls12381Fp2Sub", 35, Fp2AddSubChip, "sub", _B381, 24, 12)
Bls12381Fp2MulChip = _tower("Bls12381Fp2Mul", 36, Fp2MulChip, None, _B381, 24, 12)

TOWER_CHIPS = {
    "bn254_fp_add": Bn254FpAddChip,
    "bn254_fp_sub": Bn254FpSubChip,
    "bn254_fp_mul": Bn254FpMulChip,
    "bn254_fp2_add": Bn254Fp2AddChip,
    "bn254_fp2_sub": Bn254Fp2SubChip,
    "bn254_fp2_mul": Bn254Fp2MulChip,
    "bls12381_fp_add": Bls12381FpAddChip,
    "bls12381_fp_sub": Bls12381FpSubChip,
    "bls12381_fp_mul": Bls12381FpMulChip,
    "bls12381_fp2_add": Bls12381Fp2AddChip,
    "bls12381_fp2_sub": Bls12381Fp2SubChip,
    "bls12381_fp2_mul": Bls12381Fp2MulChip,
}


# sizing-only params for the u256x2048 vanishing identity (no modulus:
# the chip proves the EXACT integer product split lo + hi*2^2048)
U2048_VB = fo.FieldParams("u256x2048", 1, 144, 287, 1 << 14)

SYSCALL_U256X2048_MUL = 37


class U256x2048MulChip(CallChip):
    """x (256-bit) times y (2048-bit) -> lo (2048) + hi (256) bits.

    Proves the exact integer identity a(x)*b(x) - lo(x) - hi(x)*x^256
    vanishes at x = 256 via the witness-quotient argument (reference:
    crates/core/machine/src/syscall/precompiles/u256x2048_mul/ — the
    reference reads two pointers; our single-pointer ABI packs
    [a (4 cells) | b (32 cells)] and writes [lo (32) | hi (4)] over the
    head, see curvechip.py ABI note).
    """

    name = "U256x2048Mul"
    SYSCALL_ID = SYSCALL_U256X2048_MUL
    N_READ = 36
    N_WRITE = 36

    def extra_layout(self, c: Cols):
        c.cols("lo", 256)
        c.cols("hi", 32)
        c.cols("vw", U2048_VB.nw)

    def eval_body(self, f, g):
        ops = f.ops
        gate = g("is_real")
        inb = g("inb")
        a = inb[0:32]
        b = inb[32:288]
        lo = g("lo")
        hi = g("hi")
        vb = fo.VanishingBuilder(ops, U2048_VB)
        vb.add_prod(a, b)
        vb.add_poly(lo, -1)
        vb.add_poly([0] * 256 + list(hi), -1)
        vb.constrain(f, gate, g("vw"))

    def u8_check_slices(self, L) -> list:
        return [L["lo"], L["hi"]]

    def u16_check_slices(self, L) -> list:
        return [L["vw"]]

    def extra_sends(self, is_real) -> list:
        L = self.layout
        out = self._u8_sends(
            list(range(L["lo"].start, L["lo"].stop))
            + list(range(L["hi"].start, L["hi"].stop)),
            is_real,
        )
        for i in range(L["vw"].start, L["vw"].stop):
            out.append(
                Interaction((Affine.col(main_col(i)),), is_real, KIND_RANGE)
            )
        return out

    def write_limb_aff(self, cell: int, limb: int) -> Affine:
        L = self.layout
        if cell < 32:
            base = L["lo"].start + cell * 8 + limb * 2
        else:
            base = L["hi"].start + (cell - 32) * 8 + limb * 2
        return Affine(0, ((main_col(base), 1), (main_col(base + 1), 256)))

    def populate_row(self, row64, L, in_bytes) -> list:
        a = limbs_to_int(in_bytes[0:32])
        b = limbs_to_int(in_bytes[32:288])
        prod = a * b
        lo = prod & ((1 << 2048) - 1)
        hi = prod >> 2048
        lo_l = int_to_limbs(lo, 256)
        hi_l = int_to_limbs(hi, 32)
        row64[L["lo"]] = lo_l
        row64[L["hi"]] = hi_l
        v = np.zeros(2 * U2048_VB.nb + 1, np.int64)
        v[:287] += np.convolve(
            np.asarray(in_bytes[0:32], np.int64),
            np.asarray(in_bytes[32:288], np.int64),
        )
        v[:256] -= np.asarray(lo_l, np.int64)
        v[256:288] -= np.asarray(hi_l, np.int64)
        nw = U2048_VB.nw
        w = np.zeros(nw, np.int64)
        pol_carry = 0
        for k in range(nw, -1, -1):
            if k < nw:
                w[k] = pol_carry
            pol_carry = int(v[k]) + pol_carry * 256
        assert pol_carry == 0, "u256x2048 identity not divisible"
        assert np.all(v[nw + 1 :] == 0)
        w16 = w + U2048_VB.offset
        assert np.all((0 <= w16) & (w16 < (1 << 16)))
        row64[L["vw"]] = w16
        out = [(lo >> (64 * j)) & ((1 << 64) - 1) for j in range(32)]
        out += [(hi >> (64 * j)) & ((1 << 64) - 1) for j in range(4)]
        return out

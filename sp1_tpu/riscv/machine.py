"""The RISC-V zkVM machine: chips, decode, and trace generation.

A reduced-but-sound RV64 machine proving real executions from the native
executor (reference architecture: crates/core/machine/src/riscv/mod.rs's
122-chip RiscvAir; this first revision folds the per-class ALU chips into
one wide Cpu chip — the interaction structure (program ROM lookups,
timestamped-memory register file, range-check table) follows the same
design, at reduced chip granularity; the set widens in later revisions).

Word model: 64-bit values as NUM_LIMBS limbs of LIMB_BITS bits (SP1 uses
16-bit limbs on KoalaBear; tests may use 8-bit limbs for a smaller range
table). Registers live in timestamped memory at addresses 0..31; every
access receives the (addr, prev_ts, prev_value) tuple and sends
(addr, new_ts, new_value), with Init/Final chips closing the telescope
and ts-difference range checks enforcing ordering.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

import jax.numpy as jnp

from ..air.builder import (
    Affine,
    Chip,
    Interaction,
    KIND_BYTE,
    KIND_GLOBAL,
    KIND_GLOBAL_ACC,
    KIND_GLOBAL_MEMORY,
    KIND_GLOBAL_SYSCALL,
    KIND_MEMORY,
    KIND_PROGRAM,
    KIND_RANGE,
    KIND_STATE,
    KIND_SYSCALL,
    main_col,
    prep_col,
)
from ..field import koalabear as kb
from ..prover.machine import Machine
from ..field.septic import CURVE_CUMULATIVE_SUM_START_X, CURVE_CUMULATIVE_SUM_START_Y

# The accumulation chain's start point Z (14 canonical values, x then y).
_GLOBAL_ACC_START = list(CURVE_CUMULATIVE_SUM_START_X) + list(
    CURVE_CUMULATIVE_SUM_START_Y
)


@dataclass(frozen=True)
class WordSpec:
    limb_bits: int = 16

    @property
    def num_limbs(self) -> int:
        return 64 // self.limb_bits

    @property
    def ts_limbs(self) -> int:
        # timestamps < 2^(3*limb_bits) (enforced by max cycle count)
        return 3

    @property
    def pc_limbs(self) -> int:
        """Limbs needed to cover pc+4 < 2^25."""
        return -(-25 // self.limb_bits)


# Public-values layout (within the padded 187-element vector; reference:
# PROOF_MAX_NUM_PVS and the pc/timestamp chaining in
# crates/prover/src/verify.rs):
PV_PC_START = 0
PV_NEXT_PC = 1
PV_CLK_START = 2  # first row's clk (1 for a fresh execution)
PV_CLK_END = 3  # last row's clk + 1
PV_EXIT_CODE = 4  # NUM_LIMBS limbs of the halt code (a0)
PV_IS_HALTED = 12  # boolean
PV_GLOBAL_COUNT = 13  # number of Global chip rows (accumulation chain length)
PV_GLOBAL_SUM = 16  # 14 slots: septic digest (x, y) of the global interactions
NUM_PV_ELTS = 30


# Opcode ids (our machine's decode vocabulary). `muli` is the internal
# multiply-by-immediate used to realize slli (b << s == b * 2^s mod 2^64).
(
    OP_ADD, OP_ADDI, OP_SUB, OP_BEQ, OP_BNE, OP_JAL, OP_ECALL,
    OP_LD, OP_SD, OP_AND, OP_OR, OP_XOR, OP_ANDI, OP_ORI, OP_XORI,
    OP_MUL, OP_MULI,
    OP_SLT, OP_SLTU, OP_SLTI, OP_SLTIU, OP_BLT, OP_BGE, OP_BLTU, OP_BGEU,
    OP_SLL, OP_SRL, OP_SRA, OP_SRLI, OP_SRAI,
    OP_DIVU, OP_REMU, OP_JALR, OP_LUI, OP_AUIPC,
    OP_LB, OP_LBU, OP_LH, OP_LHU, OP_LW, OP_LWU, OP_SB, OP_SH, OP_SW,
    OP_ADDW, OP_ADDIW, OP_SUBW, OP_MULW,
    OP_SLLW, OP_SRLW, OP_SRAW, OP_SLLIW, OP_SRLIW, OP_SRAIW,
    OP_DIV, OP_REM, OP_DIVW, OP_DIVUW, OP_REMW, OP_REMUW,
    OP_MULH, OP_MULHU, OP_MULHSU,
) = range(63)
NUM_OPS = 63

SEL_NAMES = [
    "add", "addi", "sub", "beq", "bne", "jal", "ecall",
    "ld", "sd", "and", "or", "xor", "andi", "ori", "xori", "mul", "muli",
    "slt", "sltu", "slti", "sltiu", "blt", "bge", "bltu", "bgeu",
    "sll", "srl", "sra", "srli", "srai",
    "divu", "remu", "jalr", "lui", "auipc",
    "lb", "lbu", "lh", "lhu", "lw", "lwu", "sb", "sh", "sw",
    "addw", "addiw", "subw", "mulw",
    "sllw", "srlw", "sraw", "slliw", "srliw", "sraiw",
    "div", "rem", "divw", "divuw", "remw", "remuw",
    "mulh", "mulhu", "mulhsu",
]
BITWISE_SELS = ("and", "or", "xor", "andi", "ori", "xori")

# Precompile ecall dispatch registry: (Cpu flag column, syscall id,
# clk-window length, limb16-only). The window is the number of virtual
# cycles the precompile's reads/rounds/writes occupy after the ecall
# (reference role: each syscall bumping the clock,
# crates/core/executor/src/syscall_code.rs header comment).
PRECOMPILE_FLAGS = [
    ("is_sha_extend", 8, 48, False),
    ("is_sha_compress", 9, 80, False),
    ("is_keccak", 10, 74, False),
    ("is_ed_add", 11, 24, True),
    ("is_secp256k1_add", 12, 24, True),
    ("is_secp256k1_double", 13, 16, True),
    ("is_uint256_mul", 14, 16, True),
    ("is_bn254_add", 15, 24, True),
    ("is_ed_decompress", 16, 9, True),
    ("is_secp256k1_decompress", 17, 9, True),
    ("is_secp256r1_add", 18, 24, True),
    ("is_secp256r1_double", 19, 16, True),
    ("is_secp256r1_decompress", 20, 9, True),
    ("is_bn254_double", 21, 16, True),
    ("is_bls12381_add", 22, 36, True),
    ("is_bls12381_double", 23, 24, True),
    ("is_bls12381_decompress", 24, 13, True),
    # fp/fp2 tower family (windows = n_read + n_write cells)
    ("is_bn254_fp_add", 25, 12, True),
    ("is_bn254_fp_sub", 26, 12, True),
    ("is_bn254_fp_mul", 27, 12, True),
    ("is_bn254_fp2_add", 28, 24, True),
    ("is_bn254_fp2_sub", 29, 24, True),
    ("is_bn254_fp2_mul", 30, 24, True),
    ("is_bls12381_fp_add", 31, 18, True),
    ("is_bls12381_fp_sub", 32, 18, True),
    ("is_bls12381_fp_mul", 33, 18, True),
    ("is_bls12381_fp2_add", 34, 36, True),
    ("is_bls12381_fp2_sub", 35, 36, True),
    ("is_bls12381_fp2_mul", 36, 36, True),
    ("is_u256x2048_mul", 37, 72, True),
    ("is_poseidon2", 38, 32, True),
]


def precompile_flags(ws) -> list:
    """Registry rows available at this word model (curve/uint256 chips
    require limb_bits=16; see curvechip.py)."""
    return [r for r in PRECOMPILE_FLAGS if not r[3] or ws.limb_bits == 16]
CIMM_SELS = ("addi", "andi", "ori", "xori", "muli", "ld", "slti", "sltiu", "srli", "srai",
             "lb", "lbu", "lh", "lhu", "lw", "lwu", "addiw",
             "slliw", "srliw", "sraiw")
MUL_SELS = ("mul", "muli")
CMP_SELS = ("slt", "sltu", "slti", "sltiu", "blt", "bge", "bltu", "bgeu")
SIGNED_CMP_SELS = ("slt", "slti", "blt", "bge")
CMP_BRANCH_SELS = ("blt", "bge", "bltu", "bgeu")
SLT_SELS = ("slt", "sltu", "slti", "sltiu")
# Shift family: left shift by register; right shifts by register and
# immediate. (slli is realized as multiply-by-2^sh through the mul path.)
SHIFT_SELS = ("sll", "srl", "sra", "srli", "srai")
SHIFT_RIGHT_SELS = ("srl", "sra", "srli", "srai")
SRL_CLS_SELS = ("srl", "srli")
SRA_CLS_SELS = ("sra", "srai")
DIV_SELS = ("divu", "remu")
SDIV_SELS = ("div", "rem")
WDIV_SELS = ("divw", "divuw", "remw", "remuw")
WUDIV_SELS = ("divuw", "remuw")
WSDIV_SELS = ("divw", "remw")
MULH_SELS = ("mulh", "mulhu", "mulhsu")
# Sub-word memory: read-modify-write on the 8-byte cell with a one-hot
# byte-offset select.
SUBW_LOAD_SELS = ("lb", "lbu", "lh", "lhu", "lw", "lwu")
SUBW_STORE_SELS = ("sb", "sh", "sw")
SUBW_SELS = SUBW_LOAD_SELS + SUBW_STORE_SELS
SUBW_SIZE = {"lb": 1, "lbu": 1, "lh": 2, "lhu": 2, "lw": 4, "lwu": 4,
             "sb": 1, "sh": 2, "sw": 4}
SUBW_SIGNED_LOADS = ("lb", "lh", "lw")
# W-form arithmetic: 32-bit op then sign-extend. The low 4 result limbs
# reuse the add/sub carry and mul convolution columns; the high limbs are
# the hbm sign witness replicated.
W_ARITH_SELS = ("addw", "addiw", "subw", "mulw")
WSHIFT_SELS = ("sllw", "srlw", "sraw", "slliw", "srliw", "sraiw")
WSHIFT_LEFT_SELS = ("sllw", "slliw")
WSHIFT_RIGHT_SELS = ("srlw", "sraw", "srliw", "sraiw")
WSRA_CLS_SELS = ("sraw", "sraiw")


class Cols:
    """Column layout helper: allocate named columns/slices."""

    def __init__(self):
        self.names = {}
        self.n = 0

    def col(self, name):
        self.names[name] = self.n
        self.n += 1
        return self.names[name]

    def cols(self, name, k):
        self.names[name] = slice(self.n, self.n + k)
        self.n += k
        return self.names[name]

    def __getitem__(self, name):
        return self.names[name]


# Column families of the instruction-class chips. The single wide Cpu
# chip of round 1 is split per instruction class (reference role:
# crates/core/machine/src/riscv/mod.rs per-class chip set +
# crates/hypercube/src/machine.rs MachineShape): each class chip carries
# the shared "adapter" (pc/clk chain, ROM lookup, register file ops) plus
# only its own constraint columns, so trace area scales with what the
# shard actually executed.
CPU_CLASSES = {
    "CpuAlu": (
        ("add", "addi", "sub", "jal", "jalr", "lui", "auipc", "ecall",
         "addw", "addiw", "subw"),
        ("carry", "maddr", "hbm", "ecall"),
    ),
    "CpuBranch": (
        ("beq", "bne", "blt", "bge", "bltu", "bgeu",
         "slt", "sltu", "slti", "sltiu"),
        ("eq", "cmp"),
    ),
    "CpuMem": (
        ("ld", "sd", "lb", "lbu", "lh", "lhu", "lw", "lwu", "sb", "sh", "sw"),
        ("carry", "maddr", "mem", "hbm"),
    ),
    "CpuBitwise": (
        ("and", "or", "xor", "andi", "ori", "xori"),
        ("bitwise",),
    ),
    "CpuMul": (
        ("mul", "muli", "mulw", "mulh", "mulhu", "mulhsu"),
        ("mulcols", "mulh", "hbm"),
    ),
    "CpuShift": (
        ("sll", "srl", "sra", "srli", "srai",
         "sllw", "srlw", "sraw", "slliw", "srliw", "sraiw"),
        ("shift", "hbm"),
    ),
    "CpuDiv": (
        ("divu", "remu", "div", "rem", "divw", "divuw", "remw", "remuw"),
        ("carry", "div", "hbm"),
    ),
}


def cpu_layout(ws: WordSpec, sel_names=None, fams=None) -> Cols:
    sel_names = SEL_NAMES if sel_names is None else sel_names
    fams = (
        frozenset(
            {"carry", "maddr", "hbm", "ecall", "eq", "cmp", "mem", "bitwise",
             "mulcols", "mulh", "shift", "div"}
        )
        if fams is None
        else frozenset(fams)
    )
    c = Cols()
    c.col("is_real")
    c.col("clk")
    c.col("pc")
    c.col("next_pc")
    for s in sel_names:
        c.col(f"sel_{s}")
    c.col("rd")
    c.col("rs1")
    c.col("rs2")
    c.col("imm_f")
    nl = ws.num_limbs
    c.cols("imm", nl)
    c.cols("b", nl)
    c.cols("c", nl)
    c.cols("a", nl)
    c.cols("rd_prev_val", nl)
    c.col("rs1_prev_ts")
    c.col("rs2_prev_ts")
    c.col("rd_prev_ts")
    c.cols("tsd_rs1", ws.ts_limbs)
    c.cols("tsd_rs2", ws.ts_limbs)
    c.cols("tsd_rd", ws.ts_limbs)
    if "carry" in fams:
        c.cols("carry", nl)
    if "eq" in fams:
        c.cols("eqf", nl)  # per-limb equality flags
        c.cols("eqi", nl)  # inverse witnesses
        if nl > 2:
            c.cols("eqchain", nl - 2)
        c.col("taken")
    # memory-op columns (maddr also serves the jalr target adder)
    if "maddr" in fams:
        c.cols("maddr", nl)
    if "mem" in fams:
        c.col("maddr0_div")
        c.col("mem_prev_ts")
        c.cols("mem_prev_val", nl)
        c.cols("tsd_mem", ws.ts_limbs)
    # bitwise half-limb decompositions (L/2-bit halves)
    if "bitwise" in fams:
        c.cols("bh", 2 * nl)
        c.cols("ch", 2 * nl)
        c.cols("ah", 2 * nl)
    # The mul/shift/div machinery runs at BYTE granularity in all word
    # models (NB = 8 bytes per 64-bit word): byte products stay < 2^16,
    # so convolution partial sums never overflow the ~2^31 field. At
    # limb_bits=8 the byte arrays alias the operand limbs; at
    # limb_bits=16 they are witness columns (bv*) bound to the limbs and
    # byte-checked through the byte table (reference analog: the byte
    # decompositions of crates/core/machine/src/alu/mul/mod.rs).
    nb = 8
    bpl = ws.limb_bits // 8
    if bpl == 2:
        if fams & {"mulcols", "mulh", "shift", "div"}:
            c.cols("bvb", nb)
        if fams & {"mulcols", "mulh", "div"}:
            c.cols("bvc", nb)
        if fams & {"mulcols", "shift"}:
            c.cols("bva", nb)
        if fams & {"mulh", "div"}:
            c.cols("bvq", nb)
            c.cols("bvm", nb)
        if "div" in fams:
            c.cols("bvr", nb)
            c.cols("bvmc", nb)
    # mul carry decompositions (per byte position)
    if "mulcols" in fams:
        c.cols("mc_lo", nb)
        c.cols("mc_hi", nb)
    # comparison machinery: difference limbs, borrow chain, sign bits
    if "cmp" in fams:
        c.cols("dcmp", nl)
        c.cols("cborrow", nl)
        c.col("ltres")
    if fams & {"cmp", "shift", "div", "mulh"}:
        c.col("hb_b")
    if fams & {"cmp", "div", "mulh"}:
        c.col("hb_c")
    # shift machinery: byte/bit one-hots of the shift amount s = L*q + r,
    # high bits of the amount operand, per-limb 2^r / 2^(L-r) product
    # decompositions, and the arithmetic-shift sign-fill partial
    if "shift" in fams:
        c.cols("shq", nb)
        c.cols("shr", 8)
        c.col("shb0")
        c.col("shb1")
        c.cols("sll_lo", nb)
        c.cols("sll_hi", nb)
        c.cols("srw_lo", nb)
        c.cols("srw_hi", nb)
        c.col("sgp")
        # W-shift extras: third amount high bit, 32-bit sign, its fill
        c.col("shb2")
        c.col("sgpw")
        if bpl == 2:
            # bits 8.. of the amount limb c_0 (byte-checked)
            c.col("shrest")
    if fams & {"shift", "div"}:
        c.col("whb")  # 32-bit operand sign (W-sra / W signed division)
    # unsigned division: quotient/remainder limbs, 2nl-limb convolution
    # carries for q*c + r = b, the (c-1-r) borrow chain, div-by-zero flag.
    # dq/mb/dvc double as the full-product halves for mulh.
    if fams & {"div", "mulh"}:
        c.cols("dq", nl)
        c.cols("dvc_lo", 2 * nb)
        c.cols("dvc_hi", 2 * nb)
        c.cols("mb", nl)
    if "div" in fams:
        c.cols("dr", nl)
        c.cols("ddr", nl)
        c.cols("dbor", nl)
        c.col("is_div0")
        c.col("dz_inv")
        # signed division: operand magnitudes with their negate-chain
        # carries, the quotient sign, and div0*op product gates
        c.cols("mc2", nl)
        c.cols("ncb", nl)
        c.cols("ncc", nl)
        c.col("qs")
        c.col("d0_div")
        c.col("d0_rem")
        c.col("d0u")
        # W division: 32-bit divisor sign witness + div0*class gates
        c.col("whc")
        c.col("d0_wu")
        c.col("d0_ws")
        c.col("d0_remw")
    # sub-word memory: byte-offset one-hot (always 8 byte offsets of the
    # 8-byte cell), the stored cell's new word, and the load
    # sign-extension bit. With 16-bit limbs (bpl=2) the byte-granular
    # ops (lb/lbu/sb) additionally witness a byte split of the previous
    # word (mpb) and of the stored register's low limb (cb0/cb1), all
    # byte-checked through the byte table (whose half-limbs are 8-bit
    # exactly when limb_bits=16).
    if "mem" in fams:
        c.cols("moff", 8)
        c.cols("nw", nl)
        if ws.limb_bits == 16:
            c.cols("mpb", 8)
            c.col("cb0")
            c.col("cb1")
    if "hbm" in fams:
        c.col("hbm")
    if "ecall" in fams:
        c.col("is_halt")
        c.col("is_read")
        for flag, _sid, _win, _l16 in precompile_flags(ws):
            c.col(flag)
    c.col("rd_nonzero")
    c.col("rd_inv")
    c.col("rd_write_mult")
    return c


def _aff(idx, w=1):
    return Affine.col(main_col(idx), w)


def _aff_sum(idxs, consts=0):
    terms = tuple((main_col(i), 1) for i in idxs)
    return Affine(consts % kb.P, terms)


class CpuChip(Chip):
    """One instruction-class chip (see CPU_CLASSES). Every chip carries
    the shared adapter (state chain, ROM fetch, register file traffic);
    constraint blocks whose columns are absent from this class's layout
    are skipped, and absent selectors read as structural zero."""

    def __init__(self, ws: WordSpec, name: str = "Cpu", sel_names=None, fams=None):
        self.ws = ws
        self.sel_names = tuple(SEL_NAMES if sel_names is None else sel_names)
        self.layout = cpu_layout(ws, sel_names, fams)
        self.name = name
        self.width = self.layout.n
        self.preprocessed_width = 0

    def _has(self, *names) -> bool:
        return all(nm in self.layout.names for nm in names)

    def _present(self, names) -> list:
        """The subset of op names this chip carries."""
        mine = set(self.sel_names)
        return [s for s in names if s in mine]

    # -- constraints --------------------------------------------------------
    def eval(self, f):
        ws, L = self.ws, self.layout
        nl = ws.num_limbs
        ops = f.ops
        m = f.main
        has = self._has
        present = set(self.sel_names)

        def g(name):
            v = L[name]
            if isinstance(v, slice):
                return [m[i] for i in range(v.start, v.stop)]
            return m[v]

        one = ops.one()
        base = ops.const(1 << ws.limb_bits)
        lb = ws.limb_bits

        is_real = g("is_real")
        # absent selectors are structural zeros so every selector-sum
        # below stays correct without per-block surgery
        zero = ops.zero()
        sels = {
            s: (g(f"sel_{s}") if s in present else zero) for s in SEL_NAMES
        }
        # selectors boolean; sum == is_real
        total = ops.zero()
        for s in self.sel_names:
            f.assert_bool(sels[s])
            total = ops.add(total, sels[s])
        f.assert_eq(total, is_real)
        f.assert_bool(is_real)

        clk, pc, next_pc = g("clk"), g("pc"), g("next_pc")
        b, c, a = g("b"), g("c"), g("a")
        imm = g("imm")
        imm_f = g("imm_f")
        carry = g("carry") if has("carry") else None
        rd_nonzero_c = g("rd_nonzero")
        hbm = g("hbm") if has("hbm") else None
        if hbm is not None:
            f.assert_bool(hbm)
        hb_b = g("hb_b") if has("hb_b") else None
        hb_c = g("hb_c") if has("hb_c") else None
        whb = g("whb") if has("whb") else None
        for x in (hb_b, hb_c, whb):
            if x is not None:
                f.assert_bool(x)

        def sel_sum(names):
            acc = ops.zero()
            for s in names:
                acc = ops.add(acc, sels[s])
            return acc

        # cross-block selector sums (absent selectors are zeros)
        sel_alu_add = ops.add(sels["add"], sels["addi"])
        sel_bw = sel_sum(BITWISE_SELS)
        sel_mul = ops.add(sels["mul"], sels["muli"])
        sel_slt = sel_sum(SLT_SELS)
        sel_shift = sel_sum(SHIFT_SELS)
        sel_wshift = sel_sum(WSHIFT_SELS)
        sel_anyshift = ops.add(sel_shift, sel_wshift)
        sel_div = ops.add(sels["divu"], sels["remu"])
        sel_sdiv = ops.add(sels["div"], sels["rem"])
        sel_divany = ops.add(sel_div, sel_sdiv)
        sel_wudiv = ops.add(sels["divuw"], sels["remuw"])
        sel_wsdiv = ops.add(sels["divw"], sels["remw"])
        sel_wdiv = ops.add(sel_wudiv, sel_wsdiv)
        sel_mulh_any = sel_sum(MULH_SELS)
        sel_warith = sel_sum(W_ARITH_SELS)

        # Byte views: mul/shift/div arithmetic runs at byte granularity
        # (NB = 8 bytes/word) so convolution sums stay far below the
        # field modulus at any limb width. At limb_bits=8 a byte view IS
        # the limb array; at limb_bits=16 it is a bv* witness column set
        # bound to the limbs here and byte-checked in sends().
        NB = 8
        bpl = lb // 8
        base8 = ops.const(1 << 8)

        def _bytes(name, limbs_):
            return limbs_ if bpl == 1 else g(name)

        def _bind_bytes(cols, limbs_, gate, lo=0, hi=None):
            if bpl == 1:
                return
            hi = nl if hi is None else hi
            for i in range(lo, hi):
                f.assert_zero(
                    ops.mul(
                        gate,
                        ops.sub(
                            limbs_[i],
                            ops.add(
                                cols[2 * i], ops.scale_base(cols[2 * i + 1], 1 << 8)
                            ),
                        ),
                    )
                )

        if self._present(("add", "addi", "sub")):
            # addi uses c = imm
            for i in range(nl):
                f.assert_zero(ops.mul(sels["addi"], ops.sub(c[i], imm[i])))
            # add/addi: b + c = a with carries
            for i in range(nl):
                cin = carry[i - 1] if i > 0 else ops.zero()
                expr = ops.sub(
                    ops.add(ops.add(b[i], c[i]), cin),
                    ops.add(a[i], ops.mul(carry[i], base)),
                )
                f.assert_zero(ops.mul(sel_alu_add, expr))
            # sub: b - c = a with borrows (reuse carry columns)
            for i in range(nl):
                bin_ = carry[i - 1] if i > 0 else ops.zero()
                expr = ops.sub(
                    ops.sub(ops.sub(b[i], c[i]), bin_),
                    ops.sub(a[i], ops.mul(carry[i], base)),
                )
                f.assert_zero(ops.mul(sels["sub"], expr))
        if carry is not None:
            for i in range(nl):
                f.assert_bool(carry[i])

        # equality flags for branches
        sel_br = ops.add(sels["beq"], sels["bne"])
        for s in CMP_BRANCH_SELS:
            sel_br = ops.add(sel_br, sels[s])
        if has("eqf"):
            eqf, eqi = g("eqf"), g("eqi")
            for i in range(nl):
                d = ops.sub(b[i], c[i])
                f.assert_bool(eqf[i])
                f.assert_zero(ops.mul(eqf[i], d))
                # d*eqi == 1 - eqf (degree 2, ungated): tracegen sets
                # eqf=1 everywhere except differing limbs on branch rows;
                # eqi = inverse(d) there.
                f.assert_eq(ops.mul(d, eqi[i]), ops.sub(one, eqf[i]))
            # all_eq chain
            if nl > 2:
                chain = g("eqchain")
                f.assert_eq(chain[0], ops.mul(eqf[0], eqf[1]))
                for k in range(1, nl - 2):
                    f.assert_eq(chain[k], ops.mul(chain[k - 1], eqf[k + 1]))
                all_eq = ops.mul(chain[nl - 3], eqf[nl - 1])
            else:
                all_eq = ops.mul(eqf[0], eqf[1]) if nl == 2 else eqf[0]
            taken = g("taken")
            f.assert_bool(taken)
            f.assert_zero(ops.mul(sels["beq"], ops.sub(taken, all_eq)))
            f.assert_zero(
                ops.mul(sels["bne"], ops.sub(taken, ops.sub(one, all_eq)))
            )

        # next_pc
        four = ops.const(4)
        seq_sels = ops.zero()
        for s in self.sel_names:
            if s not in ("jal", "jalr", "beq", "bne", "blt", "bge", "bltu", "bgeu"):
                seq_sels = ops.add(seq_sels, sels[s])
        f.assert_zero(
            ops.mul(seq_sels, ops.sub(next_pc, ops.add(pc, four)))
        )
        if "jal" in present:
            f.assert_zero(
                ops.mul(sels["jal"], ops.sub(next_pc, ops.add(pc, imm_f)))
            )
        if has("taken"):
            br_target = ops.add(pc, imm_f)
            br_next = ops.add(
                ops.mul(taken, br_target),
                ops.mul(ops.sub(one, taken), ops.add(pc, four)),
            )
            f.assert_zero(ops.mul(sel_br, ops.sub(next_pc, br_next)))

        if self._present(("jal", "jalr")):
            # jal/jalr: a = pc + 4 decomposed into the low pc_limbs (the
            # executor records the link value even when rd == x0; only the
            # register write send is rd-gated)
            pcl = ws.pc_limbs
            acc = ops.zero()
            for i in range(pcl):
                acc = ops.add(acc, ops.scale_base(a[i], 1 << (ws.limb_bits * i)))
            sel_link = ops.add(sels["jal"], sels["jalr"])
            f.assert_zero(ops.mul(sel_link, ops.sub(acc, ops.add(pc, four))))
            for i in range(pcl, nl):
                f.assert_zero(ops.mul(sel_link, a[i]))
        if "lui" in present:
            # lui: a = imm (full 64-bit sign-extended constant)
            for i in range(nl):
                f.assert_zero(ops.mul(sels["lui"], ops.sub(a[i], imm[i])))
        if "auipc" in present:
            # auipc: low pc_limbs of a reconstruct pc + imm_f; rest zero
            pcl = ws.pc_limbs
            acc_au = ops.zero()
            for i in range(pcl):
                acc_au = ops.add(acc_au, ops.scale_base(a[i], 1 << (ws.limb_bits * i)))
            f.assert_zero(
                ops.mul(sels["auipc"], ops.sub(acc_au, ops.add(pc, imm_f)))
            )
            for i in range(pcl, nl):
                f.assert_zero(ops.mul(sels["auipc"], a[i]))

        if has("is_halt"):
            # ecall routing: runtime witness bits select HALT (a7==0) or
            # READ (a7==3); exactly one must be set on ecall rows, which
            # makes any other syscall id unprovable.
            is_halt, is_read = g("is_halt"), g("is_read")
            ecall_flags = [(is_halt, 0), (is_read, 3)] + [
                (g(flag), sid) for flag, sid, _w, _l in precompile_flags(ws)
            ]
            flag_sum = ops.zero()
            for flag, sid in ecall_flags:
                f.assert_bool(flag)
                flag_sum = ops.add(flag_sum, flag)
                for i in range(nl):
                    tgt = b[i] if (i > 0 or sid == 0) else ops.sub(b[0], ops.const(sid))
                    f.assert_zero(ops.mul(flag, tgt))
            f.assert_eq(flag_sum, sels["ecall"])
            # ecall register indices fixed by ROM decode (rs1=17, rs2=10,
            # rd=10); halt: the exit code (a0 = c) must match the public
            # values, and the public halted flag must be set on halt rows.
            pv = f.public_values
            for i in range(nl):
                f.assert_zero(ops.mul(is_halt, ops.sub(c[i], pv[PV_EXIT_CODE + i])))
            f.assert_zero(ops.mul(is_halt, ops.sub(pv[PV_IS_HALTED], one)))

        # c = imm for immediate-operand ops
        if self._present(CIMM_SELS):
            sel_cimm = ops.zero()
            for s in CIMM_SELS:
                sel_cimm = ops.add(sel_cimm, sels[s])
            for i in range(nl):
                f.assert_zero(ops.mul(sel_cimm, ops.sub(c[i], imm[i])))

        # ---- loads/stores (8-byte aligned) + jalr target ------------------
        sel_mem = ops.add(sels["ld"], sels["sd"])
        sel_subw = ops.zero()
        for sname in SUBW_SELS:
            sel_subw = ops.add(sel_subw, sels[sname])
        sel_anymem = ops.add(sel_mem, sel_subw)
        sel_addr = ops.add(ops.add(sel_mem, sels["jalr"]), sel_subw)
        if has("maddr"):
            maddr = g("maddr")
            # addr = b + imm with the shared carry chain (memory target, or
            # the jalr jump target)
            for i in range(nl):
                cin = carry[i - 1] if i > 0 else ops.zero()
                expr = ops.sub(
                    ops.add(ops.add(b[i], imm[i]), cin),
                    ops.add(maddr[i], ops.mul(carry[i], base)),
                )
                f.assert_zero(ops.mul(sel_addr, expr))
            # address space bound: limbs covering >= 32 bits must be zero
            # (the full reference guest address space; the memory argument
            # keys cells as 32 + addr/8 < 2^29 + 32, injective in the field)
            for i in range(nl):
                if ws.limb_bits * i >= 32:
                    f.assert_zero(ops.mul(sel_addr, maddr[i]))
        if "jalr" in present:
            # jalr: next_pc = target (reconstructed from the address limbs;
            # the ROM lookup of next_pc enforces 4-alignment and code range)
            acc_j = ops.zero()
            for i in range(nl):
                if ws.limb_bits * i < 32:
                    acc_j = ops.add(
                        acc_j, ops.scale_base(maddr[i], 1 << (ws.limb_bits * i))
                    )
            f.assert_zero(ops.mul(sels["jalr"], ops.sub(next_pc, acc_j)))
        if has("mem_prev_val"):
            maddr0_div = g("maddr0_div")
            mem_prev_val = g("mem_prev_val")
            # 8-byte alignment: maddr_0 = 8 * maddr0_div (range-checked)
            f.assert_zero(
                ops.mul(sel_mem, ops.sub(maddr[0], ops.scale_base(maddr0_div, 8)))
            )
            # ld result: a = loaded value
            for i in range(nl):
                f.assert_zero(ops.mul(sels["ld"], ops.sub(a[i], mem_prev_val[i])))

        if has("moff"):
            # ---- sub-word memory (lb/lh/lw families, sb/sh/sw) ----------------
            # moff is a one-hot over the 8 *byte* offsets of the 8-byte cell.
            # bpl = bytes per limb: 1 (limb_bits=8, limbs are bytes — the byte
            # loops below degenerate to the limb loops) or 2 (limb_bits=16,
            # where byte-granular lb/lbu/sb operate through the mpb/cb byte
            # split witnesses). Reference handles the same split with
            # per-width memory chips (crates/core/machine/src/memory/).
            assert ws.limb_bits in (8, 16), "sub-word memory supports 8/16-bit limbs"
            bpl = ws.limb_bits // 8
            NB = 8
            moff = g("moff")
            nw = g("nw")
            hbm = g("hbm")
            f.assert_bool(hbm)
            sum_off = ops.zero()
            off_val = ops.zero()
            for k in range(NB):
                f.assert_bool(moff[k])
                sum_off = ops.add(sum_off, moff[k])
                off_val = ops.add(off_val, ops.scale_base(moff[k], k))
            f.assert_eq(sum_off, sel_subw)
            # maddr_0 = 8*div + offset  (offset one-hot in [0, 8))
            f.assert_zero(
                ops.mul(
                    sel_subw,
                    ops.sub(maddr[0], ops.add(ops.scale_base(maddr0_div, 8), off_val)),
                )
            )
            # natural alignment per access width
            sel_half = ops.add(ops.add(sels["lh"], sels["lhu"]), sels["sh"])
            sel_word = ops.add(ops.add(sels["lw"], sels["lwu"]), sels["sw"])
            odd = ops.zero()
            for k in (1, 3, 5, 7):
                odd = ops.add(odd, moff[k])
            f.assert_zero(ops.mul(sel_half, odd))
            nonw = ops.zero()
            for k in range(NB):
                if k % 4:
                    nonw = ops.add(nonw, moff[k])
            f.assert_zero(ops.mul(sel_word, nonw))
            # byte split of the previous word / stored low limb (bpl == 2):
            # mpv_i = mpb_{2i} + 256*mpb_{2i+1} on lb/lbu/sb rows,
            # c_0 = cb0 + 256*cb1 on sb rows; all bytes checked < 256 through
            # the byte table (see sends()).
            if bpl == 2:
                mpb = g("mpb")
                cb0, cb1 = g("cb0"), g("cb1")
                sel_bytemem = ops.add(
                    ops.add(sels["lb"], sels["lbu"]), sels["sb"]
                )
                for i in range(nl):
                    f.assert_zero(
                        ops.mul(
                            sel_bytemem,
                            ops.sub(
                                mem_prev_val[i],
                                ops.add(mpb[2 * i], ops.scale_base(mpb[2 * i + 1], 256)),
                            ),
                        )
                    )
                f.assert_zero(
                    ops.mul(
                        sels["sb"],
                        ops.sub(c[0], ops.add(cb0, ops.scale_base(cb1, 256))),
                    )
                )
            # loads: a = selected byte(s) of the (unchanged) word + extension
            full_limb = (1 << ws.limb_bits) - 1
            for sname in SUBW_LOAD_SELS:
                size = SUBW_SIZE[sname]  # bytes
                signed = sname in SUBW_SIGNED_LOADS
                if size >= bpl:
                    sl = size // bpl  # limbs occupied by the loaded value
                    for i in range(sl):
                        val = ops.zero()
                        for k in range(0, NB - size + 1, size):
                            val = ops.add(
                                val, ops.mul(moff[k], mem_prev_val[k // bpl + i])
                            )
                        f.assert_zero(ops.mul(sels[sname], ops.sub(a[i], val)))
                    ext_start = sl
                else:
                    # lb/lbu with 16-bit limbs: select a byte; the low limb is
                    # that byte plus an in-limb sign fill of 0xFF00 * hbm.
                    eb0 = ops.zero()
                    for k in range(NB):
                        eb0 = ops.add(eb0, ops.mul(moff[k], mpb[k]))
                    fill = (
                        ops.scale_base(hbm, full_limb - 0xFF) if signed else ops.zero()
                    )
                    f.assert_zero(
                        ops.mul(sels[sname], ops.sub(a[0], ops.add(eb0, fill)))
                    )
                    ext_start = 1
                for i in range(ext_start, nl):
                    if signed:
                        f.assert_zero(
                            ops.mul(
                                sels[sname],
                                ops.sub(a[i], ops.scale_base(hbm, full_limb)),
                            )
                        )
                    else:
                        f.assert_zero(ops.mul(sels[sname], a[i]))
            # stores: nw = prev with the addressed bytes replaced by c
            for sname in SUBW_STORE_SELS:
                size = SUBW_SIZE[sname]
                if size >= bpl:
                    sl = size // bpl
                    for i in range(nl):
                        delta = ops.zero()
                        for k in range(0, NB - size + 1, size):
                            li = k // bpl
                            if li <= i < li + sl:
                                delta = ops.add(
                                    delta,
                                    ops.mul(
                                        moff[k], ops.sub(c[i - li], mem_prev_val[i])
                                    ),
                                )
                        f.assert_zero(
                            ops.mul(
                                sels[sname],
                                ops.sub(nw[i], ops.add(mem_prev_val[i], delta)),
                            )
                        )
                else:
                    # sb with 16-bit limbs: replace one byte of one limb.
                    for i in range(nl):
                        delta = ops.add(
                            ops.mul(moff[2 * i], ops.sub(cb0, mpb[2 * i])),
                            ops.scale_base(
                                ops.mul(moff[2 * i + 1], ops.sub(cb0, mpb[2 * i + 1])),
                                256,
                            ),
                        )
                        f.assert_zero(
                            ops.mul(
                                sels[sname],
                                ops.sub(nw[i], ops.add(mem_prev_val[i], delta)),
                            )
                        )

        if has("bh"):
            # ---- bitwise (half-limb decomposition; results via byte table) ----
            sel_bw = ops.zero()
            for s in BITWISE_SELS:
                sel_bw = ops.add(sel_bw, sels[s])
            bh, ch_, ah = g("bh"), g("ch"), g("ah")
            half = ops.const(1 << (ws.limb_bits // 2))
            for i in range(nl):
                f.assert_zero(
                    ops.mul(sel_bw, ops.sub(b[i], ops.add(bh[2 * i], ops.mul(bh[2 * i + 1], half))))
                )
                f.assert_zero(
                    ops.mul(sel_bw, ops.sub(c[i], ops.add(ch_[2 * i], ops.mul(ch_[2 * i + 1], half))))
                )
                f.assert_zero(
                    ops.mul(sel_bw, ops.sub(a[i], ops.add(ah[2 * i], ops.mul(ah[2 * i + 1], half))))
                )

        # Byte views of the mul-family operands (shared by mul/mulw/mulh).
        if self._present(MUL_SELS + ("mulw",) + MULH_SELS) and has("mc_lo"):
            sel_mulfam = ops.add(ops.add(sel_mul, sels["mulw"]), sel_mulh_any)
            mulB = _bytes("bvb", b)
            mulC = _bytes("bvc", c)
            mulA = _bytes("bva", a)
            _bind_bytes(mulB, b, sel_mulfam)
            _bind_bytes(mulC, c, sel_mulfam)
            _bind_bytes(mulA, a, sel_mul)

        if self._present(MUL_SELS):
            # ---- mul (mod 2^64): byte-granular convolution --------------------
            sel_mul = ops.add(sels["mul"], sels["muli"])
            mc_lo, mc_hi = g("mc_lo"), g("mc_hi")
            for k in range(NB):
                conv = ops.zero()
                for i in range(k + 1):
                    j = k - i
                    conv = ops.add(conv, ops.mul(mulB[i], mulC[j]))
                cin = (
                    ops.add(mc_lo[k - 1], ops.mul(mc_hi[k - 1], base8))
                    if k > 0
                    else ops.zero()
                )
                cout = ops.add(mc_lo[k], ops.mul(mc_hi[k], base8))
                f.assert_zero(
                    ops.mul(
                        sel_mul,
                        ops.sub(
                            ops.add(conv, cin), ops.add(mulA[k], ops.mul(cout, base8))
                        ),
                    )
                )

        if has("dcmp"):
            # ---- comparisons (slt family + signed/unsigned branches) ----------
            sel_cmp = ops.zero()
            for s in CMP_SELS:
                sel_cmp = ops.add(sel_cmp, sels[s])
            sel_signed = ops.zero()
            for s in SIGNED_CMP_SELS:
                sel_signed = ops.add(sel_signed, sels[s])
            dcmp, cborrow = g("dcmp"), g("cborrow")
            ltres = g("ltres")
            f.assert_bool(ltres)
            half_top = 1 << (ws.limb_bits - 1)
            # effective top limbs: signed ops flip the sign bit
            top = nl - 1
            eb_top = ops.add(
                b[top],
                ops.mul(
                    sel_signed,
                    ops.sub(
                        ops.const(half_top), ops.scale_base(hb_b, 2 * half_top)
                    ),
                ),
            )
            ec_top = ops.add(
                c[top],
                ops.mul(
                    sel_signed,
                    ops.sub(
                        ops.const(half_top), ops.scale_base(hb_c, 2 * half_top)
                    ),
                ),
            )
            for i in range(nl):
                ebi = b[i] if i < top else eb_top
                eci = c[i] if i < top else ec_top
                bin_ = cborrow[i - 1] if i > 0 else ops.zero()
                f.assert_bool(cborrow[i])
                expr = ops.sub(
                    ops.sub(ops.sub(ebi, eci), bin_),
                    ops.sub(dcmp[i], ops.mul(cborrow[i], base)),
                )
                f.assert_zero(ops.mul(sel_cmp, expr))
            f.assert_zero(ops.mul(sel_cmp, ops.sub(ltres, cborrow[top])))
            # slt-family result: a = ltres
            sel_slt = ops.zero()
            for s in SLT_SELS:
                sel_slt = ops.add(sel_slt, sels[s])
            f.assert_zero(ops.mul(sel_slt, ops.sub(a[0], ltres)))
            for i in range(1, nl):
                f.assert_zero(ops.mul(sel_slt, a[i]))
            # comparison branches
            f.assert_zero(ops.mul(ops.add(sels["blt"], sels["bltu"]), ops.sub(taken, ltres)))
            f.assert_zero(
                ops.mul(
                    ops.add(sels["bge"], sels["bgeu"]),
                    ops.sub(taken, ops.sub(one, ltres)),
                )
            )

        if has("shq"):
            # ---- shifts (sll/srl/sra/srli/srai), byte-granular -----------------
            # s = 8*q + r with q (byte positions) and r (bit-in-byte) one-hot;
            # decompose per-byte products by 2^r (left) / 2^(8-r) (right); the
            # byte-level shift is then a one-hot select over byte positions.
            sel_shift = ops.zero()
            for sname in SHIFT_SELS:
                sel_shift = ops.add(sel_shift, sels[sname])
            sel_wshift = ops.zero()
            for sname in WSHIFT_SELS:
                sel_wshift = ops.add(sel_wshift, sels[sname])
            sel_anyshift = ops.add(sel_shift, sel_wshift)
            sel_right = ops.zero()
            for sname in SHIFT_RIGHT_SELS:
                sel_right = ops.add(sel_right, sels[sname])
            sel_srl_cls = ops.add(sels["srl"], sels["srli"])
            sel_sra_cls = ops.add(sels["sra"], sels["srai"])
            shq, shr = g("shq"), g("shr")
            shb0, shb1 = g("shb0"), g("shb1")
            sll_lo, sll_hi = g("sll_lo"), g("sll_hi")
            srw_lo, srw_hi = g("srw_lo"), g("srw_hi")
            sgp = g("sgp")
            shB = _bytes("bvb", b)
            shA = _bytes("bva", a)
            _bind_bytes(shB, b, sel_anyshift)
            _bind_bytes(shA, a, sel_shift)
            for x in shq + shr + [shb0, shb1]:
                f.assert_bool(x)
            sum_q = ops.zero()
            for k in range(NB):
                sum_q = ops.add(sum_q, shq[k])
            f.assert_eq(sum_q, sel_anyshift)
            sum_r = ops.zero()
            for j in range(8):
                sum_r = ops.add(sum_r, shr[j])
            f.assert_eq(sum_r, sel_anyshift)
            # amount binding: c_0 = s + 64*(2*shb1 + shb0) (+ 256*rest of the
            # 16-bit limb)  (RV64 takes c & 63)
            shrest = g("shrest") if bpl == 2 else None
            s_val = ops.zero()
            for k in range(NB):
                s_val = ops.add(s_val, ops.scale_base(shq[k], 8 * k))
            for j in range(8):
                s_val = ops.add(s_val, ops.scale_base(shr[j], j))
            s_val = ops.add(s_val, ops.scale_base(shb0, 64))
            s_val = ops.add(s_val, ops.scale_base(shb1, 128))
            if shrest is not None:
                s_val = ops.add(s_val, ops.scale_base(shrest, 256))
            f.assert_zero(ops.mul(sel_shift, ops.sub(c[0], s_val)))
            # p2r = 2^r, p2rc = 2^(8-r)  (affine in the r one-hot)
            p2r = ops.zero()
            p2rc = ops.zero()
            for j in range(8):
                p2r = ops.add(p2r, ops.scale_base(shr[j], 1 << j))
                p2rc = ops.add(p2rc, ops.scale_base(shr[j], 1 << (8 - j)))
            # left: b_i * 2^r = 256*hi + lo (lo/hi byte-checked)
            for i in range(NB):
                f.assert_zero(
                    ops.mul(
                        sels["sll"],
                        ops.sub(
                            ops.mul(shB[i], p2r),
                            ops.add(sll_lo[i], ops.scale_base(sll_hi[i], 1 << 8)),
                        ),
                    )
                )
            # right: b_i * 2^(8-r) = 256*hi + lo
            for i in range(NB):
                f.assert_zero(
                    ops.mul(
                        sel_right,
                        ops.sub(
                            ops.mul(shB[i], p2rc),
                            ops.add(srw_lo[i], ops.scale_base(srw_hi[i], 1 << 8)),
                        ),
                    )
                )
            # sgp = hb_b * (2^8 - 2^(8-r)): the partial sign-fill byte (ungated;
            # tracegen maintains it on every row, incl. cmp rows that set hb_b)
            f.assert_eq(
                ops.mul(hb_b, ops.sub(ops.const(1 << 8), p2rc)), sgp
            )
            # sll result: a_i = select_q( (b*2^r) bytes with carry chaining )
            def c16(m):
                if m < 0 or m > NB:
                    return ops.zero()
                t = sll_lo[m] if m < NB else ops.zero()
                if m > 0:
                    t = ops.add(t, sll_hi[m - 1])
                return t
            for i in range(NB):
                sel_v = ops.zero()
                for k in range(NB):
                    if i - k >= 0:
                        sel_v = ops.add(sel_v, ops.mul(shq[k], c16(i - k)))
                f.assert_zero(ops.mul(sels["sll"], ops.sub(shA[i], sel_v)))
            # right-shift-by-r bytes: d_j = hi_j + lo_{j+1}
            def dlimb(j):
                if j < 0 or j >= NB:
                    return ops.zero()
                t = srw_hi[j]
                if j + 1 < NB:
                    t = ops.add(t, srw_lo[j + 1])
                return t
            for i in range(NB):
                sel_v = ops.zero()
                for k in range(NB):
                    sel_v = ops.add(sel_v, ops.mul(shq[k], dlimb(i + k)))
                f.assert_zero(ops.mul(sel_srl_cls, ops.sub(shA[i], sel_v)))
                # sra: add the sign fill: full bytes above the boundary + the
                # partial boundary byte shq_{NB-1-i} * sgp
                filled = ops.zero()
                for k in range(NB - i, NB):
                    filled = ops.add(filled, shq[k])
                fill = ops.add(
                    ops.scale_base(ops.mul(hb_b, filled), (1 << 8) - 1),
                    ops.mul(shq[NB - 1 - i], sgp),
                )
                f.assert_zero(
                    ops.mul(sel_sra_cls, ops.sub(shA[i], ops.add(sel_v, fill)))
                )

        if has("shq"):
            # ---- W-form shifts (sllw/srlw/sraw + immediate forms) -------------
            # Same q/r machinery restricted to the low 4 bytes; result is
            # sign-extended from bit 31 via the shared hbm witness.
            shb2 = g("shb2")
            sgpw = g("sgpw")
            f.assert_bool(shb2)
            half32s = NB // 2
            sel_wl = ops.add(sels["sllw"], sels["slliw"])
            sel_wr = ops.zero()
            for sname in WSHIFT_RIGHT_SELS:
                sel_wr = ops.add(sel_wr, sels[sname])
            sel_wsrl = ops.add(sels["srlw"], sels["srliw"])
            sel_wsra = ops.add(sels["sraw"], sels["sraiw"])
            _bind_bytes(shA, a, sel_wshift, hi=nl // 2)
            # byte shift < 4 on W rows
            hi_q = ops.zero()
            for k in range(half32s, NB):
                hi_q = ops.add(hi_q, shq[k])
            f.assert_zero(ops.mul(sel_wshift, hi_q))
            # amount binding: c_0 = s + 32*(4*shb2 + 2*shb1 + shb0) (+ 256*rest)
            s_val_w = ops.zero()
            for k in range(half32s):
                s_val_w = ops.add(s_val_w, ops.scale_base(shq[k], 8 * k))
            for j in range(8):
                s_val_w = ops.add(s_val_w, ops.scale_base(shr[j], j))
            s_val_w = ops.add(s_val_w, ops.scale_base(shb0, 32))
            s_val_w = ops.add(s_val_w, ops.scale_base(shb1, 64))
            s_val_w = ops.add(s_val_w, ops.scale_base(shb2, 128))
            if shrest is not None:
                s_val_w = ops.add(s_val_w, ops.scale_base(shrest, 256))
            f.assert_zero(ops.mul(sel_wshift, ops.sub(c[0], s_val_w)))
            # left: decompose low bytes by 2^r
            for i in range(half32s):
                f.assert_zero(
                    ops.mul(
                        sel_wl,
                        ops.sub(
                            ops.mul(shB[i], p2r),
                            ops.add(sll_lo[i], ops.scale_base(sll_hi[i], 1 << 8)),
                        ),
                    )
                )
                sel_v = ops.zero()
                for k in range(half32s):
                    if i - k >= 0:
                        sel_v = ops.add(sel_v, ops.mul(shq[k], c16(i - k)))
                f.assert_zero(ops.mul(sel_wl, ops.sub(shA[i], sel_v)))
            # right: decompose low bytes by 2^(8-r)
            for i in range(half32s):
                f.assert_zero(
                    ops.mul(
                        sel_wr,
                        ops.sub(
                            ops.mul(shB[i], p2rc),
                            ops.add(srw_lo[i], ops.scale_base(srw_hi[i], 1 << 8)),
                        ),
                    )
                )

            def dlimb_w(j):
                if j < 0 or j >= half32s:
                    return ops.zero()
                t = srw_hi[j]
                if j + 1 < half32s:
                    t = ops.add(t, srw_lo[j + 1])
                return t

            # sgpw = whb * (2^8 - 2^(8-r)) (ungated; whb is zero off W-sra rows)
            f.assert_eq(ops.mul(whb, ops.sub(ops.const(1 << 8), p2rc)), sgpw)
            for i in range(half32s):
                sel_v = ops.zero()
                for k in range(half32s):
                    sel_v = ops.add(sel_v, ops.mul(shq[k], dlimb_w(i + k)))
                f.assert_zero(ops.mul(sel_wsrl, ops.sub(shA[i], sel_v)))
                filled = ops.zero()
                for k in range(half32s - i, half32s):
                    filled = ops.add(filled, shq[k])
                fill = ops.add(
                    ops.scale_base(ops.mul(whb, filled), (1 << 8) - 1),
                    ops.mul(shq[half32s - 1 - i], sgpw),
                )
                f.assert_zero(
                    ops.mul(sel_wsra, ops.sub(shA[i], ops.add(sel_v, fill)))
                )
            # sign extension of the 32-bit result into the high limbs
            for i in range(nl // 2, nl):
                f.assert_zero(
                    ops.mul(
                        sel_wshift,
                        ops.sub(a[i], ops.scale_base(hbm, (1 << lb) - 1)),
                    )
                )

        if has("dr"):
            # ---- unsigned division (divu/remu) --------------------------------
            # Witness q, r with q*c + r = b proven by a 2nl-limb convolution
            # carry chain (exact over the integers: all sums < 2^24 << p), plus
            # r < c via a (c - 1 - r) borrow chain; c == 0 takes the RV64
            # special case q = 2^64-1, r = b through the is_div0 flag.
            sel_div = ops.add(sels["divu"], sels["remu"])
            sel_sdiv = ops.add(sels["div"], sels["rem"])
            sel_divany = ops.add(sel_div, sel_sdiv)
            sel_wudiv = ops.add(sels["divuw"], sels["remuw"])
            sel_wsdiv = ops.add(sels["divw"], sels["remw"])
            sel_wdiv = ops.add(sel_wudiv, sel_wsdiv)
            dq, dr = g("dq"), g("dr")
            dvc_lo, dvc_hi = g("dvc_lo"), g("dvc_hi")
            ddr, dbor = g("ddr"), g("dbor")
            is_div0, dz_inv = g("is_div0"), g("dz_inv")
            # byte views for the q*divisor + r = dividend convolutions
            sel_div_allfam = ops.add(sel_divany, sel_wdiv)
            divB = _bytes("bvb", b)
            divC = _bytes("bvc", c)
            divQ = _bytes("bvq", dq)
            divR = _bytes("bvr", dr)
            _bind_bytes(divB, b, sel_div_allfam)
            _bind_bytes(divC, c, sel_div_allfam)
            _bind_bytes(divQ, dq, sel_div_allfam)
            _bind_bytes(divR, dr, sel_div_allfam)
            f.assert_bool(is_div0)
            f.assert_zero(
                ops.mul(is_div0, ops.sub(ops.add(sel_divany, sel_wdiv), one))
            )
            s_c = ops.zero()
            for i in range(nl):
                s_c = ops.add(s_c, c[i])
            f.assert_zero(
                ops.mul(sel_divany, ops.sub(ops.add(ops.mul(s_c, dz_inv), is_div0), one))
            )
            d0_wu, d0_ws = g("d0_wu"), g("d0_ws")
            d0_remw = g("d0_remw")
            whc = g("whc")
            f.assert_bool(whc)
            f.assert_eq(ops.mul(is_div0, sel_wudiv), d0_wu)
            f.assert_eq(ops.mul(is_div0, sel_wsdiv), d0_ws)
            f.assert_eq(ops.mul(is_div0, sels["remw"]), d0_remw)
            # div0 detection: full-width sum off W rows, low-half sum on W rows
            f.assert_zero(
                ops.mul(ops.sub(is_div0, ops.add(d0_wu, d0_ws)), s_c)
            )
            s_c4 = ops.zero()
            for i in range(nl // 2):
                s_c4 = ops.add(s_c4, c[i])
            f.assert_zero(ops.mul(ops.add(d0_wu, d0_ws), s_c4))
            f.assert_zero(
                ops.mul(sel_wdiv, ops.sub(ops.add(ops.mul(s_c4, dz_inv), is_div0), one))
            )
            for k in range(2 * NB):
                conv = ops.zero()
                for i in range(max(0, k - NB + 1), min(NB, k + 1)):
                    conv = ops.add(conv, ops.mul(divQ[i], divC[k - i]))
                if k < NB:
                    conv = ops.add(conv, divR[k])
                if k > 0:
                    conv = ops.add(
                        conv, ops.add(dvc_lo[k - 1], ops.scale_base(dvc_hi[k - 1], 1 << 8))
                    )
                out_k = divB[k] if k < NB else ops.zero()
                cout = ops.add(dvc_lo[k], ops.scale_base(dvc_hi[k], 1 << 8))
                f.assert_zero(
                    ops.mul(
                        sel_div,
                        ops.sub(conv, ops.add(out_k, ops.scale_base(cout, 1 << 8))),
                    )
                )
            f.assert_zero(ops.mul(sel_div, dvc_lo[2 * NB - 1]))
            f.assert_zero(ops.mul(sel_div, dvc_hi[2 * NB - 1]))
            # div-by-zero forcing
            for i in range(nl):
                f.assert_zero(ops.mul(is_div0, ops.sub(dq[i], ops.const((1 << lb) - 1))))
                f.assert_zero(ops.mul(is_div0, ops.sub(dr[i], b[i])))
            # r < c when c != 0:  c - 1 - r has no final borrow.
            # Gate by sel_div minus (is_div0 AND unsigned): is_div0 alone would
            # drive this gate to -1 on SIGNED divide-by-zero rows.
            d0u = g("d0u")
            f.assert_eq(ops.mul(is_div0, sel_div), d0u)
            sel_nz = ops.sub(sel_div, d0u)
            for i in range(nl):
                f.assert_bool(dbor[i])
                bin_ = dbor[i - 1] if i > 0 else one
                f.assert_zero(
                    ops.mul(
                        sel_nz,
                        ops.sub(
                            ops.sub(ops.sub(c[i], dr[i]), bin_),
                            ops.sub(ddr[i], ops.scale_base(dbor[i], 1 << lb)),
                        ),
                    )
                )
            f.assert_zero(ops.mul(sel_nz, dbor[nl - 1]))
            # results
            for i in range(nl):
                f.assert_zero(ops.mul(sels["divu"], ops.sub(a[i], dq[i])))
                f.assert_zero(ops.mul(sels["remu"], ops.sub(a[i], dr[i])))

        if has("dr"):
            # ---- signed division (div/rem) ------------------------------------
            # Magnitudes via sign-conditional negate chains (x = b xor sign,
            # +sign with carries), the UNSIGNED identity on magnitudes reusing
            # the dq/dr/dvc/ddr columns, then a sign-conditional negate of the
            # result: quotient sign = sb xor sc, remainder sign = sb. The RV64
            # overflow case (INT64_MIN / -1) needs no special path: magnitudes
            # give mq = 2^63 whose two's complement bits already equal the
            # mandated result.
            mb, mc2 = g("mb"), g("mc2")
            ncb, ncc = g("ncb"), g("ncc")
            sel_any_signed = ops.add(sel_sdiv, sel_wsdiv)
            divM = _bytes("bvm", mb)
            divMC = _bytes("bvmc", mc2)
            _bind_bytes(divM, mb, sel_any_signed)
            _bind_bytes(divMC, mc2, sel_any_signed)
            qs = g("qs")
            d0_div, d0_rem = g("d0_div"), g("d0_rem")
            f.assert_bool(qs)
            f.assert_eq(ops.mul(is_div0, sels["div"]), d0_div)
            f.assert_eq(ops.mul(is_div0, sels["rem"]), d0_rem)
            sel_sdiv_live = ops.sub(ops.sub(sel_sdiv, d0_div), d0_rem)
            # qs = sb + sc - 2 sb sc away from div0
            f.assert_zero(
                ops.mul(
                    sel_sdiv_live,
                    ops.sub(
                        qs,
                        ops.sub(
                            ops.add(hb_b, hb_c),
                            ops.scale_base(ops.mul(hb_b, hb_c), 2),
                        ),
                    ),
                )
            )
            two55 = (1 << ws.limb_bits) - 1

            def neg_chain(src, dst, carr, sign, gate, extra0):
                for i in range(nl):
                    x = ops.add(src[i], ops.mul(sign, ops.sub(ops.const(two55), ops.scale_base(src[i], 2))))
                    cin = extra0 if i == 0 else carr[i - 1]
                    f.assert_bool(carr[i])
                    f.assert_zero(
                        ops.mul(
                            gate,
                            ops.sub(
                                ops.add(x, cin),
                                ops.add(dst[i], ops.mul(carr[i], base)),
                            ),
                        )
                    )

            # mb = |b|, mc2 = |c|
            neg_chain(b, mb, ncb, hb_b, sel_sdiv, hb_b)
            neg_chain(c, mc2, ncc, hb_c, sel_sdiv, hb_c)
            # magnitude identity: dq*mc2 + dr = mb  (off div0)
            for k in range(2 * NB):
                conv = ops.zero()
                for i in range(max(0, k - NB + 1), min(NB, k + 1)):
                    conv = ops.add(conv, ops.mul(divQ[i], divMC[k - i]))
                if k < NB:
                    conv = ops.add(conv, divR[k])
                if k > 0:
                    conv = ops.add(
                        conv, ops.add(dvc_lo[k - 1], ops.scale_base(dvc_hi[k - 1], 1 << 8))
                    )
                out_k = divM[k] if k < NB else ops.zero()
                cout = ops.add(dvc_lo[k], ops.scale_base(dvc_hi[k], 1 << 8))
                f.assert_zero(
                    ops.mul(
                        sel_sdiv_live,
                        ops.sub(conv, ops.add(out_k, ops.scale_base(cout, 1 << 8))),
                    )
                )
            f.assert_zero(ops.mul(sel_sdiv_live, dvc_lo[2 * NB - 1]))
            f.assert_zero(ops.mul(sel_sdiv_live, dvc_hi[2 * NB - 1]))
            # dr < mc2 off div0
            for i in range(nl):
                bin_ = dbor[i - 1] if i > 0 else one
                f.assert_zero(
                    ops.mul(
                        sel_sdiv_live,
                        ops.sub(
                            ops.sub(ops.sub(mc2[i], dr[i]), bin_),
                            ops.sub(ddr[i], ops.scale_base(dbor[i], 1 << lb)),
                        ),
                    )
                )
            f.assert_zero(ops.mul(sel_sdiv_live, dbor[nl - 1]))
            # result negate chains (reuse the add/sub carry columns)
            neg_chain(dq, a, carry, qs, ops.sub(sels["div"], d0_div), qs)
            neg_chain(dr, a, carry, hb_b, ops.sub(sels["rem"], d0_rem), hb_b)
            # div0: q = -1, r = b (dq/dr forcing is shared with divu; bind a)
            for i in range(nl):
                f.assert_zero(ops.mul(d0_div, ops.sub(a[i], ops.const(two55))))
                f.assert_zero(ops.mul(d0_rem, ops.sub(a[i], b[i])))

        # ---- W-form arithmetic (addw/addiw/subw/mulw) ---------------------
        # 32-bit result in the low 4 limbs (carry out of limb 3 discarded),
        # then limbs 4..7 replicate the hbm sign witness.
        half32 = nl // 2
        if self._present(("addw", "addiw", "subw")):
            sel_wadd = ops.add(sels["addw"], sels["addiw"])
            for i in range(half32):
                cin = carry[i - 1] if i > 0 else ops.zero()
                expr = ops.sub(
                    ops.add(ops.add(b[i], c[i]), cin),
                    ops.add(a[i], ops.mul(carry[i], base)),
                )
                f.assert_zero(ops.mul(sel_wadd, expr))
                bin_ = carry[i - 1] if i > 0 else ops.zero()
                expr_s = ops.sub(
                    ops.sub(ops.sub(b[i], c[i]), bin_),
                    ops.sub(a[i], ops.mul(carry[i], base)),
                )
                f.assert_zero(ops.mul(sels["subw"], expr_s))
        if "mulw" in present:
            # 32-bit product: byte conv over the low NB//2 byte positions
            mc_lo_, mc_hi_ = g("mc_lo"), g("mc_hi")
            _bind_bytes(mulA, a, sels["mulw"], hi=half32)
            for k in range(NB // 2):
                conv = ops.zero()
                for i in range(k + 1):
                    conv = ops.add(conv, ops.mul(mulB[i], mulC[k - i]))
                cin = (
                    ops.add(mc_lo_[k - 1], ops.mul(mc_hi_[k - 1], base8))
                    if k > 0
                    else ops.zero()
                )
                cout = ops.add(mc_lo_[k], ops.mul(mc_hi_[k], base8))
                f.assert_zero(
                    ops.mul(
                        sels["mulw"],
                        ops.sub(
                            ops.add(conv, cin), ops.add(mulA[k], ops.mul(cout, base8))
                        ),
                    )
                )
        if self._present(W_ARITH_SELS):
            for i in range(half32, nl):
                f.assert_zero(
                    ops.mul(
                        sel_warith,
                        ops.sub(a[i], ops.scale_base(hbm, (1 << ws.limb_bits) - 1)),
                    )
                )

        if has("dr"):
            # ---- W-form division (divw/divuw/remw/remuw) ----------------------
            # The 64-bit division machinery at width 4: unsigned identity on
            # (b32, c32) or on witnessed magnitudes, then sext32 through hbm.
            # div0 falls out of the shared dq=all-ones / dr=b forcing.
            h4 = nl // 2
            sel_wu_live = ops.sub(sel_wudiv, d0_wu)
            sel_ws_live = ops.sub(sel_wsdiv, d0_ws)
            # signed sign witness binding handled by the whb/whc range sends;
            # qs = whb xor whc away from div0
            f.assert_zero(
                ops.mul(
                    sel_ws_live,
                    ops.sub(
                        qs,
                        ops.sub(
                            ops.add(whb, whc),
                            ops.scale_base(ops.mul(whb, whc), 2),
                        ),
                    ),
                )
            )
            # 4-limb magnitude negate chains for the signed path
            for src, dst, carr, sign in ((b, mb, ncb, whb), (c, mc2, ncc, whc)):
                for i in range(h4):
                    x = ops.add(
                        src[i],
                        ops.mul(sign, ops.sub(ops.const(two55), ops.scale_base(src[i], 2))),
                    )
                    cin = sign if i == 0 else carr[i - 1]
                    f.assert_zero(
                        ops.mul(
                            sel_wsdiv,
                            ops.sub(
                                ops.add(x, cin),
                                ops.add(dst[i], ops.mul(carr[i], base)),
                            ),
                        )
                    )
            # convolution identities over 8 byte positions (q, divisor, r,
            # dividend all 4-byte): unsigned on (c, b), signed on (mc2, mb)
            hb4 = NB // 2
            for gate, dv, dd in ((sel_wu_live, divC, divB), (sel_ws_live, divMC, divM)):
                for k in range(NB):
                    conv = ops.zero()
                    for i in range(max(0, k - hb4 + 1), min(hb4, k + 1)):
                        conv = ops.add(conv, ops.mul(divQ[i], dv[k - i]))
                    if k < hb4:
                        conv = ops.add(conv, divR[k])
                    if k > 0:
                        conv = ops.add(
                            conv,
                            ops.add(dvc_lo[k - 1], ops.scale_base(dvc_hi[k - 1], 1 << 8)),
                        )
                    out_k = dd[k] if k < hb4 else ops.zero()
                    cout = ops.add(dvc_lo[k], ops.scale_base(dvc_hi[k], 1 << 8))
                    f.assert_zero(
                        ops.mul(
                            gate,
                            ops.sub(conv, ops.add(out_k, ops.scale_base(cout, 1 << 8))),
                        )
                    )
                f.assert_zero(ops.mul(gate, dvc_lo[NB - 1]))
                f.assert_zero(ops.mul(gate, dvc_hi[NB - 1]))
                # r < divisor via (divisor - 1 - r), 4 limbs
                for i in range(h4):
                    bin_ = dbor[i - 1] if i > 0 else one
                    f.assert_zero(
                        ops.mul(
                            gate,
                            ops.sub(
                                ops.sub(ops.sub(dv[i], dr[i]), bin_),
                                ops.sub(ddr[i], ops.scale_base(dbor[i], 1 << lb)),
                            ),
                        )
                    )
                f.assert_zero(ops.mul(gate, dbor[h4 - 1]))
            # results (low half); div0 rows satisfy these via the dq/dr forcing
            for i in range(h4):
                f.assert_zero(ops.mul(sels["divuw"], ops.sub(a[i], dq[i])))
                f.assert_zero(ops.mul(sels["remuw"], ops.sub(a[i], dr[i])))
            # signed results: 4-limb negate chains (reuse the carry columns)
            for gate, src, sign in (
                (sels["divw"], dq, qs),
                (ops.sub(sels["remw"], d0_remw), dr, whb),
            ):
                for i in range(h4):
                    x = ops.add(
                        src[i],
                        ops.mul(sign, ops.sub(ops.const(two55), ops.scale_base(src[i], 2))),
                    )
                    cin = sign if i == 0 else carry[i - 1]
                    f.assert_zero(
                        ops.mul(
                            gate,
                            ops.sub(
                                ops.add(x, cin),
                                ops.add(a[i], ops.mul(carry[i], base)),
                            ),
                        )
                    )
            for i in range(h4):
                f.assert_zero(ops.mul(d0_remw, ops.sub(a[i], b[i])))
            # sext32 into the high limbs through hbm (holds on div0 rows too)
            for i in range(h4, nl):
                f.assert_zero(
                    ops.mul(
                        sel_wdiv,
                        ops.sub(a[i], ops.scale_base(hbm, (1 << ws.limb_bits) - 1)),
                    )
                )

        if self._present(MULH_SELS):
            # ---- high multiplication (mulh/mulhu/mulhsu) ----------------------
            # Full 128-bit product via the division convolution columns:
            # b*c = dq (low 64) + 2^64 * mb (high 64). Signed variants correct
            # the unsigned high half: mulh = uh - sb*c - sc*b, mulhsu = uh - sb*c
            # (mod 2^64), proven limb-wise with small witnessed carries in mc_lo.
            # self-fetch: in the Mul class chip the division blocks that
            # bound these names are skipped
            dq, mb = g("dq"), g("mb")
            dvc_lo, dvc_hi = g("dvc_lo"), g("dvc_hi")
            mc_lo = g("mc_lo")
            mulhQ = _bytes("bvq", dq)
            mulhM = _bytes("bvm", mb)
            _bind_bytes(mulhQ, dq, sel_mulh_any)
            _bind_bytes(mulhM, mb, sel_mulh_any)
            for k in range(2 * NB):
                conv = ops.zero()
                for i in range(max(0, k - NB + 1), min(NB, k + 1)):
                    conv = ops.add(conv, ops.mul(mulB[i], mulC[k - i]))
                if k > 0:
                    conv = ops.add(
                        conv,
                        ops.add(dvc_lo[k - 1], ops.scale_base(dvc_hi[k - 1], 1 << 8)),
                    )
                out_k = mulhQ[k] if k < NB else mulhM[k - NB]
                cout = ops.add(dvc_lo[k], ops.scale_base(dvc_hi[k], 1 << 8))
                f.assert_zero(
                    ops.mul(
                        sel_mulh_any,
                        ops.sub(conv, ops.add(out_k, ops.scale_base(cout, 1 << 8))),
                    )
                )
            f.assert_zero(ops.mul(sel_mulh_any, dvc_lo[2 * NB - 1]))
            f.assert_zero(ops.mul(sel_mulh_any, dvc_hi[2 * NB - 1]))
            # mulhu: the high half is the result
            for i in range(nl):
                f.assert_zero(ops.mul(sels["mulhu"], ops.sub(a[i], mb[i])))
            # signed corrections: a + sb*c (+ sc*b) = mb + carries*2^L chain
            for gate, use_sc in ((sels["mulh"], True), (sels["mulhsu"], False)):
                for i in range(nl):
                    lhs = ops.add(a[i], ops.mul(hb_b, c[i]))
                    if use_sc:
                        lhs = ops.add(lhs, ops.mul(hb_c, b[i]))
                    if i > 0:
                        lhs = ops.add(lhs, mc_lo[i - 1])
                    f.assert_zero(
                        ops.mul(
                            gate,
                            ops.sub(
                                lhs,
                                ops.add(mb[i], ops.scale_base(mc_lo[i], 1 << lb)),
                            ),
                        )
                    )

        # ts difference decompositions: new_ts - prev_ts - 1 = sum(tsd)
        uses_rs1 = self._uses_rs1(sels, ops)
        uses_rs2 = self._uses_rs2(sels, ops)
        eight = ops.const(8)
        ts1 = ops.add(ops.mul(clk, eight), one)
        ts2 = ops.add(ops.mul(clk, eight), ops.const(2))
        ts4 = ops.add(ops.mul(clk, eight), four)
        ts3 = ops.add(ops.mul(clk, eight), ops.const(3))
        ts_rows = [
            ("tsd_rs1", uses_rs1, ts1, g("rs1_prev_ts")),
            ("tsd_rs2", uses_rs2, ts2, g("rs2_prev_ts")),
            ("tsd_rd", g("rd_write_mult"), ts4, g("rd_prev_ts")),
        ]
        if has("tsd_mem"):
            ts_rows.append(("tsd_mem", sel_anymem, ts3, g("mem_prev_ts")))
        for nm, uses, newts, prevts in ts_rows:
            tsd = g(nm)
            acc = ops.zero()
            for i in range(ws.ts_limbs):
                acc = ops.add(acc, ops.scale_base(tsd[i], 1 << (ws.limb_bits * i)))
            f.assert_zero(
                ops.mul(uses, ops.sub(ops.sub(ops.sub(newts, prevts), one), acc))
            )

        # rd-nonzero machinery
        rd = g("rd")
        rd_nonzero, rd_inv = g("rd_nonzero"), g("rd_inv")
        f.assert_bool(rd_nonzero)
        f.assert_eq(ops.mul(rd, rd_inv), rd_nonzero)
        f.assert_zero(ops.mul(ops.sub(one, rd_nonzero), rd))
        writes = ops.add(ops.add(sel_alu_add, sels["sub"]), sels["jal"])
        if has("is_halt"):
            writes = ops.add(writes, g("is_read"))
        writes = ops.add(writes, sels["ld"])
        writes = ops.add(writes, sel_bw)
        writes = ops.add(writes, sel_mul)
        writes = ops.add(writes, sel_slt)
        writes = ops.add(writes, sel_shift)
        writes = ops.add(writes, sel_div)
        writes = ops.add(writes, sels["jalr"])
        writes = ops.add(writes, sels["lui"])
        writes = ops.add(writes, sels["auipc"])
        for sname in SUBW_LOAD_SELS:
            writes = ops.add(writes, sels[sname])
        for sname in W_ARITH_SELS:
            writes = ops.add(writes, sels[sname])
        writes = ops.add(writes, sel_wshift)
        writes = ops.add(writes, sel_sdiv)
        writes = ops.add(writes, sel_wdiv)
        writes = ops.add(writes, sel_mulh_any)
        f.assert_eq(g("rd_write_mult"), ops.mul(writes, rd_nonzero))

    USES_RS1 = (
        "add", "addi", "sub", "beq", "bne", "ecall",
        "ld", "sd", "and", "or", "xor", "andi", "ori", "xori", "mul", "muli",
        "slt", "sltu", "slti", "sltiu", "blt", "bge", "bltu", "bgeu",
        "sll", "srl", "sra", "srli", "srai", "divu", "remu", "jalr",
        "lb", "lbu", "lh", "lhu", "lw", "lwu", "sb", "sh", "sw",
        "addw", "addiw", "subw", "mulw",
        "sllw", "srlw", "sraw", "slliw", "srliw", "sraiw",
        "div", "rem", "divw", "divuw", "remw", "remuw",
        "mulh", "mulhu", "mulhsu",
    )
    USES_RS2 = (
        "add", "sub", "beq", "bne", "ecall", "sd", "and", "or", "xor", "mul",
        "slt", "sltu", "blt", "bge", "bltu", "bgeu",
        "sll", "srl", "sra", "divu", "remu", "sb", "sh", "sw",
        "addw", "subw", "mulw", "sllw", "srlw", "sraw", "div", "rem",
        "divw", "divuw", "remw", "remuw", "mulh", "mulhu", "mulhsu",
    )

    def _uses_rs1(self, sels, ops):
        acc = ops.zero()
        for s in self.USES_RS1:
            acc = ops.add(acc, sels[s])
        return acc

    def _uses_rs2(self, sels, ops):
        acc = ops.zero()
        for s in self.USES_RS2:
            acc = ops.add(acc, sels[s])
        return acc

    # -- interactions -------------------------------------------------------
    def _sel_aff(self, names):
        """Affine sum over the present subset of selector names, or None
        when this class carries none of them."""
        mine = self._present(names)
        if not mine:
            return None
        return _aff_sum([self.layout[f"sel_{s}"] for s in mine])

    def _uses_rs1_aff(self):
        return self._sel_aff(self.USES_RS1)

    def _uses_rs2_aff(self):
        return self._sel_aff(self.USES_RS2)

    def _word_addr_aff(self):
        """32 + word index of the memory access, affine in address columns."""
        ws, L = self.ws, self.layout
        terms = [(main_col(L["maddr0_div"]), 1)]
        for i in range(1, ws.num_limbs):
            if ws.limb_bits * i < 32:
                terms.append((main_col(L["maddr"].start + i), 1 << (ws.limb_bits * i - 3)))
        return Affine(32, tuple(terms))

    def _sel_mem_aff(self):
        return self._sel_aff(("ld", "sd"))

    def _sel_anymem_aff(self):
        return self._sel_aff(("ld", "sd") + SUBW_SELS)

    def _sel_bw_aff(self):
        return self._sel_aff(BITWISE_SELS)

    def _sel_mul_aff(self):
        return self._sel_aff(MUL_SELS + ("mulw",) + MULH_SELS)

    def sends(self) -> list:
        ws, L = self.ws, self.layout
        nl = ws.num_limbs
        out = []
        present = set(self.sel_names)
        has = self._has
        # program lookup (op_id over this class's selectors, with the
        # global SEL_NAMES numbering)
        op_id = Affine(
            0,
            tuple(
                (main_col(L[f"sel_{s}"]), k)
                for k, s in enumerate(SEL_NAMES)
                if k > 0 and s in present
            ),
        )
        values = [
            _aff(L["pc"]),
            op_id,
            _aff(L["rd"]),
            _aff(L["rs1"]),
            _aff(L["rs2"]),
            _aff(L["imm_f"]),
        ] + [_aff(L["imm"].start + i) for i in range(nl)]
        out.append(
            Interaction(tuple(values), _aff(L["is_real"]), KIND_PROGRAM)
        )
        # state chain: each row produces (next_pc, clk + 1). A precompile
        # ecall's rounds occupy the next N cycles, so its send skips the
        # window (sha extend: +48, sha compress: +80).
        clk_next_terms = [(main_col(L["clk"]), 1)]
        if has("is_sha_extend"):
            for flag, _sid, win, _l in precompile_flags(self.ws):
                clk_next_terms.append((main_col(L[flag]), win))
        out.append(
            Interaction(
                (
                    _aff(L["next_pc"]),
                    Affine(1, tuple(clk_next_terms)),
                ),
                _aff(L["is_real"]),
                KIND_STATE,
            )
        )
        # precompile dispatch: (syscall id, clk, raw pointer limbs in a0)
        if has("is_sha_extend"):
            for flag, sid, _win, _l in precompile_flags(self.ws):
                out.append(
                    Interaction(
                        tuple(
                            [Affine.const(sid), _aff(L["clk"])]
                            + [_aff(L["c"].start + i) for i in range(nl)]
                        ),
                        _aff(L[flag]),
                        KIND_SYSCALL,
                    )
                )
        # register writes (memory sends of the new state)
        clk8_1 = Affine(1, ((main_col(L["clk"]), 8),))
        clk8_2 = Affine(2, ((main_col(L["clk"]), 8),))
        clk8_4 = Affine(4, ((main_col(L["clk"]), 8),))
        bvals = [_aff(L["b"].start + i) for i in range(nl)]
        cvals = [_aff(L["c"].start + i) for i in range(nl)]
        avals = [_aff(L["a"].start + i) for i in range(nl)]
        if self._uses_rs1_aff() is not None:
            out.append(
                Interaction(
                    tuple([_aff(L["rs1"]), clk8_1] + bvals),
                    self._uses_rs1_aff(),
                    KIND_MEMORY,
                )
            )
        if self._uses_rs2_aff() is not None:
            out.append(
                Interaction(
                    tuple([_aff(L["rs2"]), clk8_2] + cvals),
                    self._uses_rs2_aff(),
                    KIND_MEMORY,
                )
            )
        out.append(
            Interaction(
                tuple([_aff(L["rd"]), clk8_4] + avals),
                _aff(L["rd_write_mult"]),
                KIND_MEMORY,
            )
        )
        # memory-op state updates
        if has("mem_prev_val"):
            clk8_3 = Affine(3, ((main_col(L["clk"]), 8),))
            waddr = self._word_addr_aff()
            mpv = [_aff(L["mem_prev_val"].start + i) for i in range(nl)]
            loads_aff = self._sel_aff(("ld",) + SUBW_LOAD_SELS)
            out.append(
                Interaction(tuple([waddr, clk8_3] + mpv), loads_aff, KIND_MEMORY)
            )
            out.append(
                Interaction(
                    tuple([waddr, clk8_3] + cvals), _aff(L["sel_sd"]), KIND_MEMORY
                )
            )
            nwvals = [_aff(L["nw"].start + i) for i in range(nl)]
            subw_stores_aff = self._sel_aff(SUBW_STORE_SELS)
            out.append(
                Interaction(
                    tuple([waddr, clk8_3] + nwvals), subw_stores_aff, KIND_MEMORY
                )
            )
        # bitwise byte-table lookups: (op, x, y, z) per half-limb
        if has("bh"):
            bw_op = Affine(
                0,
                (
                    (main_col(L["sel_or"]), 1),
                    (main_col(L["sel_ori"]), 1),
                    (main_col(L["sel_xor"]), 2),
                    (main_col(L["sel_xori"]), 2),
                ),
            )
            sel_bw = self._sel_bw_aff()
            for k in range(2 * nl):
                out.append(
                    Interaction(
                        (
                            bw_op,
                            _aff(L["bh"].start + k),
                            _aff(L["ch"].start + k),
                            _aff(L["ah"].start + k),
                        ),
                        sel_bw,
                        KIND_BYTE,
                    )
                )
        # range checks: a limbs (on writes), ts diff limbs, addr + mul aux
        writes_names = (
            ("add", "addi", "sub", "jal", "ld", "jalr", "lui", "auipc")
            + BITWISE_SELS + MUL_SELS + SLT_SELS + SHIFT_SELS + DIV_SELS
            + SUBW_LOAD_SELS + W_ARITH_SELS + WSHIFT_SELS + SDIV_SELS
            + WDIV_SELS + MULH_SELS
        )
        writes_idx = [L[f"sel_{s}"] for s in self._present(writes_names)]
        if has("is_halt"):
            writes_idx.append(L["is_read"])
        writes = _aff_sum(writes_idx) if writes_idx else None
        # comparison aux: difference limbs + sign-bit rests
        half_top = 1 << (ws.limb_bits - 1)
        top_idx = L["b"].start + nl - 1
        topc_idx = L["c"].start + nl - 1
        if has("dcmp"):
            sel_cmp_aff = self._sel_aff(CMP_SELS)
            for i in range(nl):
                out.append(
                    Interaction((_aff(L["dcmp"].start + i),), sel_cmp_aff, KIND_RANGE)
                )
        # hb_b is also the operand sign bit for arithmetic right shifts
        hb_b_mult = self._sel_aff(
            SIGNED_CMP_SELS + SRA_CLS_SELS + SDIV_SELS + ("mulh", "mulhsu")
        )
        if hb_b_mult is not None:
            # 2*(top - half*hb) < 2^L  <=>  rest < 2^(L-1)
            out.append(
                Interaction(
                    (
                        Affine(
                            0,
                            (
                                (main_col(top_idx), 2),
                                (main_col(L["hb_b"]), (-2 * half_top) % kb.P),
                            ),
                        ),
                    ),
                    hb_b_mult,
                    KIND_RANGE,
                )
            )
        hb_c_mult = self._sel_aff(SIGNED_CMP_SELS + SDIV_SELS + ("mulh",))
        if hb_c_mult is not None:
            out.append(
                Interaction(
                    (
                        Affine(
                            0,
                            (
                                (main_col(topc_idx), 2),
                                (main_col(L["hb_c"]), (-2 * half_top) % kb.P),
                            ),
                        ),
                    ),
                    hb_c_mult,
                    KIND_RANGE,
                )
            )
        if writes is not None:
            for i in range(nl):
                out.append(
                    Interaction((_aff(L["a"].start + i),), writes, KIND_RANGE)
                )
        sel_anymem = self._sel_anymem_aff()
        if has("maddr0_div"):
            out.append(Interaction((_aff(L["maddr0_div"]),), sel_anymem, KIND_RANGE))
        sel_addr = self._sel_aff(("ld", "sd", "jalr") + SUBW_SELS)
        if has("maddr") and sel_addr is not None:
            for i in range(nl):
                if ws.limb_bits * i < 32:
                    out.append(
                        Interaction((_aff(L["maddr"].start + i),), sel_addr, KIND_RANGE)
                    )
        # 8-bit checks: the byte-position aux columns of the mul/shift/div
        # machinery. At limb_bits=8 the range table IS an 8-bit table; at
        # limb_bits=16 they go through the byte table as AND-identity rows
        # (op=0, v, v, v), like the sub-word memory byte splits below.
        NB = 8
        bpl = ws.limb_bits // 8

        def _bcheck(aff, mult):
            if mult is None:
                return
            if bpl == 1:
                out.append(Interaction((aff,), mult, KIND_RANGE))
            else:
                out.append(
                    Interaction((Affine.const(0), aff, aff, aff), mult, KIND_BYTE)
                )

        sel_mul = self._sel_mul_aff()
        if has("mc_lo"):
            for i in range(NB):
                _bcheck(_aff(L["mc_lo"].start + i), sel_mul)
                _bcheck(_aff(L["mc_hi"].start + i), sel_mul)
        # shift decomposition bytes
        if has("shq"):
            sel_sll_aff = self._sel_aff(("sll",) + WSHIFT_LEFT_SELS)
            sel_right_aff = self._sel_aff(SHIFT_RIGHT_SELS + WSHIFT_RIGHT_SELS)
            for i in range(NB):
                _bcheck(_aff(L["sll_lo"].start + i), sel_sll_aff)
                _bcheck(_aff(L["sll_hi"].start + i), sel_sll_aff)
                _bcheck(_aff(L["srw_lo"].start + i), sel_right_aff)
                _bcheck(_aff(L["srw_hi"].start + i), sel_right_aff)
        # division aux limbs
        sel_div_aff = self._sel_aff(DIV_SELS + SDIV_SELS + WDIV_SELS + MULH_SELS)
        sel_sdiv_aff = self._sel_aff(SDIV_SELS + WSDIV_SELS + MULH_SELS)
        if has("dq"):
            for i in range(nl):
                out.append(Interaction((_aff(L["dq"].start + i),), sel_div_aff, KIND_RANGE))
                out.append(Interaction((_aff(L["mb"].start + i),), sel_sdiv_aff, KIND_RANGE))
            for i in range(2 * NB):
                _bcheck(_aff(L["dvc_lo"].start + i), sel_div_aff)
                _bcheck(_aff(L["dvc_hi"].start + i), sel_div_aff)
        # byte-view witnesses (limb_bits=16 only): genuine-byte checks with
        # the same multiplicity as their binding gates in eval()
        if bpl == 2:
            sel_mulw_aff = self._sel_aff(MUL_SELS + ("mulw",))
            sel_anyshift_aff = self._sel_aff(SHIFT_SELS + WSHIFT_SELS)
            sel_divfam_aff = self._sel_aff(DIV_SELS + SDIV_SELS + WDIV_SELS)
            sel_anysigned_aff = self._sel_aff(SDIV_SELS + WSDIV_SELS)
            sel_mulh_aff = self._sel_aff(MULH_SELS)
            bv_checks = []
            if has("mc_lo"):  # mul family (bv cols shared per byte content)
                bv_checks += [
                    ("bvb", sel_mul), ("bvc", sel_mul), ("bva", sel_mulw_aff),
                    ("bvq", sel_mulh_aff), ("bvm", sel_mulh_aff),
                ]
            if has("shq"):
                bv_checks += [("bvb", sel_anyshift_aff), ("bva", sel_anyshift_aff)]
            if has("dr"):
                bv_checks += [
                    ("bvb", sel_divfam_aff), ("bvc", sel_divfam_aff),
                    ("bvq", sel_divfam_aff), ("bvr", sel_divfam_aff),
                    ("bvm", sel_anysigned_aff), ("bvmc", sel_anysigned_aff),
                ]
            for nm, mult in bv_checks:
                if nm in L.names:
                    for i in range(NB):
                        _bcheck(_aff(L[nm].start + i), mult)
            if "shrest" in L.names:
                _bcheck(_aff(L["shrest"]), sel_anyshift_aff)
        if has("dr"):
            for i in range(nl):
                out.append(Interaction((_aff(L["dr"].start + i),), sel_div_aff, KIND_RANGE))
                out.append(Interaction((_aff(L["ddr"].start + i),), sel_div_aff, KIND_RANGE))
                out.append(Interaction((_aff(L["mc2"].start + i),), sel_sdiv_aff, KIND_RANGE))
        sel_subw_aff = self._sel_aff(SUBW_SELS)
        if sel_subw_aff is not None:
            for i in range(nl):
                out.append(
                    Interaction((_aff(L["mem_prev_val"].start + i),), sel_subw_aff, KIND_RANGE)
                )
        # load sign bit: rest check on the top loaded byte per signed class
        half_top2 = 1 << (ws.limb_bits - 1)
        warith_aff = self._sel_aff(W_ARITH_SELS + WSHIFT_SELS + WDIV_SELS)
        # 32-bit operand sign bit for sraw/sraiw (and W signed division)
        whb_mult = self._sel_aff(WSRA_CLS_SELS + WDIV_SELS)
        if whb_mult is not None:
            out.append(
                Interaction(
                    (
                        Affine(
                            0,
                            (
                                (main_col(L["b"].start + nl // 2 - 1), 2),
                                (main_col(L["whb"]), (-(1 << ws.limb_bits)) % kb.P),
                            ),
                        ),
                    ),
                    whb_mult,
                    KIND_RANGE,
                )
            )
        # 32-bit divisor sign for divw/remw
        whc_mult = self._sel_aff(WSDIV_SELS)
        if whc_mult is not None:
            out.append(
                Interaction(
                    (
                        Affine(
                            0,
                            (
                                (main_col(L["c"].start + nl // 2 - 1), 2),
                                (main_col(L["whc"]), (-(1 << ws.limb_bits)) % kb.P),
                            ),
                        ),
                    ),
                    whc_mult,
                    KIND_RANGE,
                )
            )
        if warith_aff is not None:
            out.append(
                Interaction(
                    (
                        Affine(
                            0,
                            (
                                (main_col(L["a"].start + nl // 2 - 1), 2),
                                (main_col(L["hbm"]), (-(1 << ws.limb_bits)) % kb.P),
                            ),
                        ),
                    ),
                    warith_aff,
                    KIND_RANGE,
                )
            )
        bpl = ws.limb_bits // 8
        for sname, size in (("lb", 1), ("lh", 2), ("lw", 4)):
            if sname not in present:
                continue
            if size >= bpl:
                # top loaded byte is the high byte of limb (size-1)//bpl:
                # 2*limb - 2^limb_bits * hbm must stay in the range table.
                out.append(
                    Interaction(
                        (
                            Affine(
                                0,
                                (
                                    (main_col(L["a"].start + (size - 1) // bpl), 2),
                                    (main_col(L["hbm"]), (-2 * half_top2) % kb.P),
                                ),
                            ),
                        ),
                        _aff_sum([L[f"sel_{sname}"]]),
                        KIND_RANGE,
                    )
                )
            else:
                # lb with 16-bit limbs: a_0 = byte + 0xFF00*hbm, so
                # 2*(a_0 - 0xFF00*hbm) - 256*hbm in [0, 256) pins hbm to
                # the byte's bit 7; enforced as an AND-identity row of the
                # byte table (whose halves are 8-bit here).
                e = Affine(
                    0,
                    (
                        (main_col(L["a"].start), 2),
                        (
                            main_col(L["hbm"]),
                            (-(2 * (((1 << ws.limb_bits) - 1) - 0xFF) + 256))
                            % kb.P,
                        ),
                    ),
                )
                out.append(
                    Interaction(
                        (Affine.const(0), e, e, e),
                        _aff_sum([L[f"sel_{sname}"]]),
                        KIND_BYTE,
                    )
                )
        if bpl == 2 and has("mpb"):
            # byte-split witnesses must be genuine bytes: AND-identity
            # lookups (op=0, v, v, v) in the byte table.
            sel_bytemem_aff = _aff_sum([L["sel_lb"], L["sel_lbu"], L["sel_sb"]])
            for k in range(8):
                v = _aff(L["mpb"].start + k)
                out.append(
                    Interaction(
                        (Affine.const(0), v, v, v), sel_bytemem_aff, KIND_BYTE
                    )
                )
            for nm in ("cb0", "cb1"):
                v = _aff(L[nm])
                out.append(
                    Interaction(
                        (Affine.const(0), v, v, v),
                        _aff_sum([L["sel_sb"]]),
                        KIND_BYTE,
                    )
                )
        ts_sends = [
            ("tsd_rs1", self._uses_rs1_aff()),
            ("tsd_rs2", self._uses_rs2_aff()),
            ("tsd_rd", _aff(L["rd_write_mult"])),
        ]
        if has("tsd_mem"):
            ts_sends.append(("tsd_mem", sel_anymem))
        for nm, mult in ts_sends:
            if mult is None:
                continue
            for i in range(ws.ts_limbs):
                out.append(
                    Interaction((_aff(L[nm].start + i),), mult, KIND_RANGE)
                )
        return out

    def receives(self) -> list:
        ws, L = self.ws, self.layout
        nl = ws.num_limbs
        out = []
        # state chain: each row consumes (pc, clk)
        out.append(
            Interaction(
                (_aff(L["pc"]), _aff(L["clk"])), _aff(L["is_real"]), KIND_STATE
            )
        )
        bvals = [_aff(L["b"].start + i) for i in range(nl)]
        cvals = [_aff(L["c"].start + i) for i in range(nl)]
        pvals = [_aff(L["rd_prev_val"].start + i) for i in range(nl)]
        if self._uses_rs1_aff() is not None:
            out.append(
                Interaction(
                    tuple([_aff(L["rs1"]), _aff(L["rs1_prev_ts"])] + bvals),
                    self._uses_rs1_aff(),
                    KIND_MEMORY,
                )
            )
        if self._uses_rs2_aff() is not None:
            out.append(
                Interaction(
                    tuple([_aff(L["rs2"]), _aff(L["rs2_prev_ts"])] + cvals),
                    self._uses_rs2_aff(),
                    KIND_MEMORY,
                )
            )
        out.append(
            Interaction(
                tuple([_aff(L["rd"]), _aff(L["rd_prev_ts"])] + pvals),
                _aff(L["rd_write_mult"]),
                KIND_MEMORY,
            )
        )
        if self._has("mem_prev_val"):
            waddr = self._word_addr_aff()
            mpv = [_aff(L["mem_prev_val"].start + i) for i in range(nl)]
            out.append(
                Interaction(
                    tuple([waddr, _aff(L["mem_prev_ts"])] + mpv),
                    self._sel_anymem_aff(),
                    KIND_MEMORY,
                )
            )
        return out


class ProgramChip(Chip):
    """Preprocessed decoded-instruction ROM; main = fetch multiplicity."""

    name = "Program"
    width = 1

    def __init__(self, ws: WordSpec):
        self.ws = ws
        self.preprocessed_width = 6 + ws.num_limbs + 1  # + is_real

    def eval(self, f):
        pass

    def receives(self) -> list:
        nl = self.ws.num_limbs
        values = [Affine.col(prep_col(i)) for i in range(6 + nl)]
        return [Interaction(tuple(values), Affine.col(main_col(0)), KIND_PROGRAM)]


class RangeChip(Chip):
    """Preprocessed 0..2^L-1 value table; main = multiplicity."""

    name = "Range"
    width = 1
    preprocessed_width = 1

    def __init__(self, ws: WordSpec):
        self.ws = ws

    def eval(self, f):
        pass

    def receives(self) -> list:
        return [
            Interaction((Affine.col(prep_col(0)),), Affine.col(main_col(0)), KIND_RANGE)
        ]


class ByteChip(Chip):
    """Preprocessed half-limb pair table: (x, y, x&y, x|y, x^y).

    Serves AND/OR/XOR lookups (op encoded in the first value), mirroring
    the reference's byte-operation table
    (crates/core/machine/src/bytes/). Height 2^limb_bits (pairs of
    limb_bits/2-bit halves).
    """

    name = "Byte"
    width = 3  # multiplicities for and/or/xor
    preprocessed_width = 5

    def __init__(self, ws: WordSpec):
        self.ws = ws

    def eval(self, f):
        pass

    def receives(self) -> list:
        out = []
        for op, (mult_col, res_col) in enumerate(((0, 2), (1, 3), (2, 4))):
            out.append(
                Interaction(
                    (
                        Affine.const(op),
                        Affine.col(prep_col(0)),
                        Affine.col(prep_col(1)),
                        Affine.col(prep_col(res_col)),
                    ),
                    Affine.col(main_col(mult_col)),
                    KIND_BYTE,
                )
            )
        return out


def _state_tuple(nl):
    """(addr, ts, value limbs) column layout shared by the memory-state
    chips: col0 addr, col1 is_real, col2 ts, col3.. value limbs."""
    return [Affine.col(main_col(0)), Affine.col(main_col(2))] + [
        Affine.col(main_col(3 + i)) for i in range(nl)
    ]


def _global_msg(ws: WordSpec, is_send: int) -> tuple:
    """The 8-element global message + direction flags + kind for a memory
    state row (col0 addr, col2 ts, col3.. value limbs).

    message = [addr, ts, packed value limbs..., 0...]; at limb_bits=8
    limb pairs pack into 16-bit elements (injective, since each limb is
    range-checked to 8 bits by the memory argument)."""
    msg = [Affine.col(main_col(0)), Affine.col(main_col(2))]
    if ws.limb_bits == 16:
        msg += [Affine.col(main_col(3 + i)) for i in range(ws.num_limbs)]
    else:
        for i in range(0, ws.num_limbs, 2):
            msg.append(
                Affine(0, ((main_col(3 + i), 1), (main_col(3 + i + 1), 256)))
            )
    while len(msg) < 8:
        msg.append(Affine.const(0))
    return tuple(
        msg
        + [
            Affine.const(is_send),
            Affine.const(1 - is_send),
            Affine.const(KIND_GLOBAL_MEMORY),
        ]
    )


class MemoryInitChip(Chip):
    """The shard-start state of touched cells.

    Locally SENDS (addr, ts, value) to start the shard's timestamped
    chain; globally RECEIVES the same tuple so that, across shards, a
    previous shard's final-state send (or the genesis chip) cancels it.
    """

    name = "MemoryInit"

    def __init__(self, ws: WordSpec):
        self.ws = ws
        self.width = 3 + ws.num_limbs  # addr, is_real, ts, value limbs

    def eval(self, f):
        f.assert_bool(f.main[1])

    def sends(self) -> list:
        return [
            Interaction(
                tuple(_state_tuple(self.ws.num_limbs)),
                Affine.col(main_col(1)),
                KIND_MEMORY,
            ),
            # Route the boundary state to the Global chip as a RECEIVE
            # (a previous shard's final-state send cancels it in the
            # septic digest sum).
            Interaction(
                _global_msg(self.ws, is_send=0),
                Affine.col(main_col(1)),
                KIND_GLOBAL,
            ),
        ]


class MemoryFinalChip(Chip):
    """The shard-end state of touched cells.

    Locally RECEIVES (addr, ts, value), closing the shard's chain;
    globally SENDS the same tuple for the next shard's init (or the
    final-global chip) to absorb.
    """

    name = "MemoryFinal"

    def __init__(self, ws: WordSpec):
        self.ws = ws
        self.width = 3 + ws.num_limbs  # addr, is_real, ts, value limbs

    def eval(self, f):
        f.assert_bool(f.main[1])

    def receives(self) -> list:
        return [
            Interaction(
                tuple(_state_tuple(self.ws.num_limbs)),
                Affine.col(main_col(1)),
                KIND_MEMORY,
            )
        ]

    def sends(self) -> list:
        return [
            Interaction(
                _global_msg(self.ws, is_send=1),
                Affine.col(main_col(1)),
                KIND_GLOBAL,
            )
        ]


class MemoryGenesisChip(Chip):
    """Global sends of the genesis (addr, 0, 0) state for every cell the
    whole execution touches; appears in the first shard only
    (reference role: controller/global.rs memory init shards)."""

    name = "MemoryGenesis"

    def __init__(self, ws: WordSpec):
        self.ws = ws
        self.width = 2  # addr, is_real

    def eval(self, f):
        f.assert_bool(f.main[1])

    def sends(self) -> list:
        values = [Affine.col(main_col(0))] + [Affine.const(0)] * 7
        return [
            Interaction(
                tuple(
                    values
                    + [
                        Affine.const(1),  # is_send
                        Affine.const(0),  # is_receive
                        Affine.const(KIND_GLOBAL_MEMORY),
                    ]
                ),
                Affine.col(main_col(1)),
                KIND_GLOBAL,
            )
        ]


class SyscallDeferChip(Chip):
    """Bridge moving a precompile dispatch across shards (reference role:
    crates/prover/src/worker/controller/precompiles.rs:35-111 deferred
    precompile shards + deferred.rs).

    A deferred call's precompile rows live in a standalone precompile
    shard. The CPU shard's ecall row still SENDS its local KIND_SYSCALL
    message; here an `is_out` row receives it and re-sends the same
    (id, clk, ptr) tuple through the septic global argument. In the
    precompile shard an `is_in` row receives the global message and
    re-sends it locally, where the precompile chip's own KIND_SYSCALL
    receive absorbs it. Memory traffic needs no bridging: the deferred
    rounds' cells flow through the ordinary MemoryInit/MemoryFinal
    global chaining (per-access-segment rows, tracegen.compute_segment_states).

    Columns: [is_out, is_in, id, clk, ptr limbs...].
    """

    name = "SyscallDefer"

    def __init__(self, ws: WordSpec):
        self.ws = ws
        self.width = 4 + ws.num_limbs

    def eval(self, f):
        f.assert_bool(f.main[0])
        f.assert_bool(f.main[1])
        # a row is out- or in-facing, never both
        f.assert_zero(f.ops.mul(f.main[0], f.main[1]))

    def _syscall_tuple(self):
        nl = self.ws.num_limbs
        return tuple(
            [Affine.col(main_col(2)), Affine.col(main_col(3))]
            + [Affine.col(main_col(4 + i)) for i in range(nl)]
        )

    def _global_tuple(self):
        nl = self.ws.num_limbs
        msg = [Affine.col(main_col(2)), Affine.col(main_col(3))]
        if self.ws.limb_bits == 16:
            msg += [Affine.col(main_col(4 + i)) for i in range(nl)]
        else:
            # pack 8-bit limb pairs (range-checked by the Cpu memory
            # argument they mirror) into 16-bit elements, _global_msg-style
            for i in range(0, nl, 2):
                msg.append(
                    Affine(0, ((main_col(4 + i), 1), (main_col(4 + i + 1), 256)))
                )
        while len(msg) < 8:
            msg.append(Affine.const(0))
        return tuple(
            msg
            + [
                Affine.col(main_col(0)),  # is_send: the CPU-shard side
                Affine.col(main_col(1)),  # is_receive: the px-shard side
                Affine.const(KIND_GLOBAL_SYSCALL),
            ]
        )

    def receives(self) -> list:
        return [
            Interaction(
                self._syscall_tuple(), Affine.col(main_col(0)), KIND_SYSCALL
            )
        ]

    def sends(self) -> list:
        either = Affine(0, ((main_col(0), 1), (main_col(1), 1)))
        out = [
            Interaction(
                self._syscall_tuple(), Affine.col(main_col(1)), KIND_SYSCALL
            ),
            Interaction(self._global_tuple(), either, KIND_GLOBAL),
        ]
        # ptr limbs range-checked so the packed global message is a
        # canonical (injective) encoding on both sides of the bridge
        for i in range(self.ws.num_limbs):
            out.append(
                Interaction((Affine.col(main_col(4 + i)),), either, KIND_RANGE)
            )
        return out


class MemoryFinalGlobalChip(Chip):
    """Global receives of the true end-of-execution states; appears in
    the last shard only (reference role: memory finalize shards)."""

    name = "MemoryFinalGlobal"

    def __init__(self, ws: WordSpec):
        self.ws = ws
        self.width = 3 + ws.num_limbs

    def eval(self, f):
        f.assert_bool(f.main[1])

    def sends(self) -> list:
        return [
            Interaction(
                _global_msg(self.ws, is_send=0),
                Affine.col(main_col(1)),
                KIND_GLOBAL,
            )
        ]


class RiscvMachine(Machine):
    """Machine with the execution-state public-values digest.

    The public values "send" the initial (pc_start, clk_start) state and
    "receive" the final (next_pc, clk_end) state, balancing the per-row
    state-chain interactions (reference:
    LogUpGkrVerifier::verify_public_values + Record::eval_public_values).
    """

    def max_pv_interaction_arity(self) -> int:
        return 16  # GlobalAccumulation boundary: (index, digest[14]) + 1

    def eval_public_values(self, public_values, challenge, alpha, betas):
        import numpy as np

        from ..field import extension as ext

        E4 = ext.npext4

        def fp(kind, vals):
            acc = E4.add(
                np.asarray(alpha, np.uint32),
                kb.npf.mul(np.asarray(betas[0], np.uint32), np.uint32(kind)),
            )
            for k, v in enumerate(vals):
                acc = E4.add(
                    acc, kb.npf.mul(np.asarray(betas[k + 1], np.uint32), np.uint32(int(v) % kb.P))
                )
            return acc

        pv = [int(v) for v in public_values]
        # constraint checks on the public values themselves
        if pv[PV_IS_HALTED] not in (0, 1):
            return False, None
        digest = np.zeros(4, np.uint32)
        # send (pc_start, clk_start)
        digest = E4.add(digest, E4.inv(fp(KIND_STATE, [pv[PV_PC_START], pv[PV_CLK_START]])))
        # receive (next_pc, clk_end)
        digest = E4.sub(digest, E4.inv(fp(KIND_STATE, [pv[PV_NEXT_PC], pv[PV_CLK_END]])))
        # GlobalAccumulation chain boundary: send the start digest at
        # index 0, receive the claimed final digest at index count.
        start = _GLOBAL_ACC_START
        digest = E4.add(digest, E4.inv(fp(KIND_GLOBAL_ACC, [0] + start)))
        digest = E4.sub(
            digest,
            E4.inv(
                fp(
                    KIND_GLOBAL_ACC,
                    [pv[PV_GLOBAL_COUNT]]
                    + pv[PV_GLOBAL_SUM : PV_GLOBAL_SUM + 14],
                )
            ),
        )
        return True, digest

    def pv_digest_spec(self):
        """See Machine.pv_digest_spec: the state chain sends the initial
        (pc_start, clk_start) and receives the final (next_pc, clk_end);
        the Global accumulation chain sends (0, start digest) and
        receives (count, claimed final digest)."""
        start = [("c", v) for v in _GLOBAL_ACC_START]
        return (
            [PV_IS_HALTED],
            [
                (KIND_STATE, [PV_PC_START, PV_CLK_START], +1),
                (KIND_STATE, [PV_NEXT_PC, PV_CLK_END], -1),
                (KIND_GLOBAL_ACC, [("c", 0)] + start, +1),
                (
                    KIND_GLOBAL_ACC,
                    [PV_GLOBAL_COUNT]
                    + list(range(PV_GLOBAL_SUM, PV_GLOBAL_SUM + 14)),
                    -1,
                ),
            ],
        )


_MACHINE_CACHE = {}


# Optional curve/uint256 chip clusters selectable via the machine shape
# (reference role: MachineShape cluster selection,
# crates/hypercube/src/machine.rs:10-42 — a shape names the chips a shard
# carries; the Cpu ecall flag structure makes a syscall whose table chip
# is absent unprovable, so shapes are sound as long as the core chips
# are always present). Syscall id -> shape name.
SHAPE_SYSCALLS = {
    11: "ed25519",
    12: "secp256k1_add",
    13: "secp256k1_double",
    14: "uint256",
    15: "bn254_add",
    16: "ed25519_decompress",
    17: "secp256k1_decompress",
    18: "secp256r1_add",
    19: "secp256r1_double",
    20: "secp256r1_decompress",
    21: "bn254_double",
    22: "bls12381_add",
    23: "bls12381_double",
    24: "bls12381_decompress",
    25: "bn254_fp_add",
    26: "bn254_fp_sub",
    27: "bn254_fp_mul",
    28: "bn254_fp2_add",
    29: "bn254_fp2_sub",
    30: "bn254_fp2_mul",
    31: "bls12381_fp_add",
    32: "bls12381_fp_sub",
    33: "bls12381_fp_mul",
    34: "bls12381_fp2_add",
    35: "bls12381_fp2_sub",
    36: "bls12381_fp2_mul",
    37: "u256x2048",
    38: "poseidon2",
}


def shape_of_syscalls(syscall_ids) -> frozenset:
    """The minimal machine shape covering a set of executed syscall ids."""
    return frozenset(
        SHAPE_SYSCALLS[i] for i in syscall_ids if i in SHAPE_SYSCALLS
    )


def build_machine(ws: WordSpec = WordSpec(), shape: frozenset = frozenset()) -> Machine:
    """Cached per (WordSpec, shape) so chip jit kernels compile once per
    process. `shape` names the optional precompile chips to include."""
    shape = frozenset(shape)
    key = (ws, shape)
    if key in _MACHINE_CACHE:
        return _MACHINE_CACHE[key]
    m = _build_machine_uncached(ws, shape)
    _MACHINE_CACHE[key] = m
    return m


def _build_machine_uncached(ws: WordSpec, shape: frozenset) -> Machine:
    from .global_chip import GlobalChip
    from .keccak import KeccakPermChip
    from .sha import ShaCompressChip, ShaExtendChip, ShaKChip

    optional = []
    if shape:
        from .curvechip import (
            Bn254AddChip,
            EdAddChip,
            Secp256k1AddChip,
            Secp256k1DoubleChip,
            Uint256MulChip,
        )

        from .curvechip import EdDecompressChip, Secp256k1DecompressChip
        from .curvechip import (
            Bls12381AddChip,
            Bls12381DecompressChip,
            Bls12381DoubleChip,
            Bn254DoubleChip,
            Secp256r1AddChip,
            Secp256r1DecompressChip,
            Secp256r1DoubleChip,
        )

        by_name = {
            "ed25519": EdAddChip,
            "secp256k1_add": Secp256k1AddChip,
            "secp256k1_double": Secp256k1DoubleChip,
            "uint256": Uint256MulChip,
            "bn254_add": Bn254AddChip,
            "ed25519_decompress": EdDecompressChip,
            "secp256k1_decompress": Secp256k1DecompressChip,
            "secp256r1_add": Secp256r1AddChip,
            "secp256r1_double": Secp256r1DoubleChip,
            "secp256r1_decompress": Secp256r1DecompressChip,
            "bn254_double": Bn254DoubleChip,
            "bls12381_add": Bls12381AddChip,
            "bls12381_double": Bls12381DoubleChip,
            "bls12381_decompress": Bls12381DecompressChip,
        }
        from .curvechip import TOWER_CHIPS, U256x2048MulChip

        by_name.update(TOWER_CHIPS)
        by_name["u256x2048"] = U256x2048MulChip
        from .poseidon2chip import Poseidon2PermChip

        by_name["poseidon2"] = Poseidon2PermChip
        unknown = shape - set(by_name)
        if unknown:
            raise ValueError(f"unknown shape entries: {sorted(unknown)}")
        optional = [by_name[n](ws) for n in sorted(shape)]

    return RiscvMachine(
        [
            CpuChip(ws, name, sel_names, fams)
            for name, (sel_names, fams) in CPU_CLASSES.items()
        ]
        + [
            ProgramChip(ws),
            RangeChip(ws),
            ByteChip(ws),
            ShaKChip(ws),
            ShaExtendChip(ws),
            ShaCompressChip(ws),
            KeccakPermChip(ws),
        ]
        + optional
        + [
            SyscallDeferChip(ws),
            MemoryInitChip(ws),
            MemoryFinalChip(ws),
            MemoryGenesisChip(ws),
            MemoryFinalGlobalChip(ws),
            GlobalChip(ws),
        ],
        num_pv_elts=NUM_PV_ELTS,
    )

"""Trace generation: executor events -> AIR trace matrices.

Vectorized numpy over the event arrays, then one conversion to monty
jnp per chip (reference role: crates/core/machine per-chip trace.rs and
crates/hypercube/src/prover/trace.rs DefaultTraceGenerator).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..field import koalabear as kb
from .machine import (
    BITWISE_SELS,
    CIMM_SELS,
    CMP_SELS,
    MUL_SELS,
    OP_BGE,
    OP_BGEU,
    OP_BLT,
    OP_BLTU,
    OP_SLT,
    OP_SLTI,
    OP_SLTIU,
    OP_SLTU,
    NUM_OPS,
    OP_ADD,
    OP_ADDI,
    OP_AND,
    OP_ANDI,
    OP_BEQ,
    OP_BNE,
    OP_ECALL,
    OP_JAL,
    OP_LD,
    OP_MUL,
    OP_MULI,
    OP_SLL,
    OP_SRL,
    OP_SRA,
    OP_SRLI,
    OP_SRAI,
    OP_DIVU,
    OP_REMU,
    OP_DIV,
    OP_REM,
    OP_DIVW,
    OP_DIVUW,
    OP_REMW,
    OP_REMUW,
    OP_MULH,
    OP_MULHU,
    OP_MULHSU,
    OP_JALR,
    OP_LUI,
    OP_AUIPC,
    OP_LB,
    OP_LBU,
    OP_LH,
    OP_LHU,
    OP_LW,
    OP_LWU,
    OP_SB,
    OP_SH,
    OP_SW,
    OP_ADDW,
    OP_ADDIW,
    OP_SUBW,
    OP_MULW,
    OP_SLLW,
    OP_SRLW,
    OP_SRAW,
    OP_SLLIW,
    OP_SRLIW,
    OP_SRAIW,
    OP_OR,
    OP_ORI,
    OP_SD,
    OP_SUB,
    OP_XOR,
    OP_XORI,
    PV_CLK_END,
    PV_CLK_START,
    PV_EXIT_CODE,
    PV_IS_HALTED,
    PV_NEXT_PC,
    PV_PC_START,
    SEL_NAMES,
    WordSpec,
    cpu_layout,
)


def set_global_pv(pv: list, traces: dict, ws: WordSpec) -> list:
    """Fill PV_GLOBAL_COUNT / PV_GLOBAL_SUM from the shard's Global trace
    (count = chain length; sum = the last real row's cumulative digest,
    or the start point Z when the chain is empty)."""
    from .machine import PV_GLOBAL_COUNT, PV_GLOBAL_SUM, _GLOBAL_ACC_START, build_machine

    gtrace, gcount = traces["Global"]
    pv[PV_GLOBAL_COUNT] = gcount
    if gcount == 0:
        pv[PV_GLOBAL_SUM : PV_GLOBAL_SUM + 14] = _GLOBAL_ACC_START
        return pv
    # last real row's cum_sum columns (trace is monty)
    c0 = build_machine(ws).chip("Global").cols["cum_sum"]
    row = np.asarray(gtrace[gcount - 1, c0 : c0 + 14], np.uint64)
    rinv = pow(1 << 32, -1, kb.P)
    digest = (row * rinv % kb.P).astype(np.uint32)
    pv[PV_GLOBAL_SUM : PV_GLOBAL_SUM + 14] = [int(v) for v in digest]
    return pv


# clk window owned by each precompile ecall (rounds run at clk+1..clk+N)
PX_WINDOW = {8: 48, 9: 80, 10: 74}


def segment_clk_end(events) -> int:
    """clk of the instruction after the segment's last event. Precompile
    ecalls own the following round window, so they advance clk by
    1 + window instead of 1."""
    last = events[-1]
    bump = 1
    if int(last["instr"]) & 0x7F == 0x73:
        bump += PX_WINDOW.get(int(last["b"]), 0)
    return int(last["clk"]) + bump


def make_public_values(result, pc_base: int, ws: WordSpec, traces: dict | None = None) -> list:
    """Build the shard's public values from an execution result."""
    from .machine import NUM_PV_ELTS

    ev = result.events
    pv = [0] * NUM_PV_ELTS
    pv[PV_PC_START] = int(ev["pc"][0]) if len(ev) else pc_base
    pv[PV_NEXT_PC] = int(ev["next_pc"][-1]) if len(ev) else pc_base
    pv[PV_CLK_START] = int(ev["clk"][0]) if len(ev) else 1
    pv[PV_CLK_END] = segment_clk_end(ev) if len(ev) else 1
    code = int(result.exit_code)
    for i in range(ws.num_limbs):
        pv[PV_EXIT_CODE + i] = (code >> (ws.limb_bits * i)) & ((1 << ws.limb_bits) - 1)
    pv[PV_IS_HALTED] = 1
    if traces is not None:
        set_global_pv(pv, traces, ws)
    return pv


def to_monty(x):
    return ((np.asarray(x, np.uint64) << 32) % kb.P).astype(np.uint32)


def limbs_of(vals: np.ndarray, ws: WordSpec) -> np.ndarray:
    """(N,) uint64 -> (N, num_limbs) limbs, little-endian."""
    out = np.zeros((len(vals), ws.num_limbs), np.uint32)
    mask = np.uint64((1 << ws.limb_bits) - 1)
    v = vals.copy()
    for i in range(ws.num_limbs):
        out[:, i] = (v & mask).astype(np.uint32)
        v = v >> np.uint64(ws.limb_bits)
    return out


def decode_program(words: np.ndarray, pc_base: int, ws: WordSpec):
    """Decode instruction words into ROM rows.

    Returns dict with arrays: pc, op_id, rd, rs1, rs2, imm_f, imm_limbs.
    Raises on instructions outside the supported set.
    """
    n = len(words)
    pc = pc_base + 4 * np.arange(n, dtype=np.uint64)
    op_id = np.zeros(n, np.uint32)
    rd = np.zeros(n, np.uint32)
    rs1 = np.zeros(n, np.uint32)
    rs2 = np.zeros(n, np.uint32)
    imm_f = np.zeros(n, np.uint32)
    imm = np.zeros((n, ws.num_limbs), np.uint32)

    def sext(v, bits):
        v = int(v)
        if v >> (bits - 1):
            v -= 1 << bits
        return v

    for i, w in enumerate(int(x) for x in words):
        opc = w & 0x7F
        f3 = (w >> 12) & 7
        f7 = (w >> 25) & 0x7F
        rd_i = (w >> 7) & 31
        rs1_i = (w >> 15) & 31
        rs2_i = (w >> 20) & 31
        if opc == 0x33 and f7 == 0x00 and f3 in (0, 1, 2, 3, 4, 6, 7):
            op_id[i] = {0: OP_ADD, 1: OP_SLL, 2: OP_SLT, 3: OP_SLTU,
                        4: OP_XOR, 6: OP_OR, 7: OP_AND}[f3]
            rd[i], rs1[i], rs2[i] = rd_i, rs1_i, rs2_i
        elif opc == 0x33 and f7 == 0x00 and f3 == 5:
            op_id[i] = OP_SRL
            rd[i], rs1[i], rs2[i] = rd_i, rs1_i, rs2_i
        elif opc == 0x33 and f7 == 0x20 and f3 == 5:
            op_id[i] = OP_SRA
            rd[i], rs1[i], rs2[i] = rd_i, rs1_i, rs2_i
        elif opc == 0x13 and f3 == 5:  # srli / srai (shamt as plain imm)
            op_id[i] = OP_SRAI if ((w >> 26) & 0x3F) == 0x10 else OP_SRLI
            rd[i], rs1[i] = rd_i, rs1_i
            sh = (w >> 20) & 63
            imm[i] = limbs_of(np.array([sh], np.uint64), ws)[0]
        elif opc == 0x33 and f7 == 0x20 and f3 == 0:
            op_id[i] = OP_SUB
            rd[i], rs1[i], rs2[i] = rd_i, rs1_i, rs2_i
        elif opc == 0x33 and f7 == 0x01 and f3 == 0:
            op_id[i] = OP_MUL
            rd[i], rs1[i], rs2[i] = rd_i, rs1_i, rs2_i
        elif opc == 0x33 and f7 == 0x01 and f3 in (4, 5, 6, 7):
            op_id[i] = {4: OP_DIV, 5: OP_DIVU, 6: OP_REM, 7: OP_REMU}[f3]
            rd[i], rs1[i], rs2[i] = rd_i, rs1_i, rs2_i
        elif opc == 0x33 and f7 == 0x01 and f3 in (1, 2, 3):
            op_id[i] = {1: OP_MULH, 2: OP_MULHSU, 3: OP_MULHU}[f3]
            rd[i], rs1[i], rs2[i] = rd_i, rs1_i, rs2_i
        elif opc == 0x13 and f3 in (0, 2, 3, 4, 6, 7):
            op_id[i] = {
                0: OP_ADDI, 2: OP_SLTI, 3: OP_SLTIU, 4: OP_XORI, 6: OP_ORI, 7: OP_ANDI
            }[f3]
            rd[i], rs1[i] = rd_i, rs1_i
            v = sext(w >> 20, 12)
            imm[i] = limbs_of(np.array([v % (1 << 64)], np.uint64), ws)[0]
        elif opc == 0x13 and f3 == 1:  # slli -> multiply by 2^sh
            op_id[i] = OP_MULI
            rd[i], rs1[i] = rd_i, rs1_i
            sh = (w >> 20) & 63
            imm[i] = limbs_of(np.array([(1 << sh) % (1 << 64)], np.uint64), ws)[0]
        elif opc == 0x3B and f7 == 0x00 and f3 == 0:
            op_id[i] = OP_ADDW
            rd[i], rs1[i], rs2[i] = rd_i, rs1_i, rs2_i
        elif opc == 0x3B and f7 == 0x20 and f3 == 0:
            op_id[i] = OP_SUBW
            rd[i], rs1[i], rs2[i] = rd_i, rs1_i, rs2_i
        elif opc == 0x3B and f7 == 0x01 and f3 == 0:
            op_id[i] = OP_MULW
            rd[i], rs1[i], rs2[i] = rd_i, rs1_i, rs2_i
        elif opc == 0x3B and f7 == 0x01 and f3 in (4, 5, 6, 7):
            op_id[i] = {4: OP_DIVW, 5: OP_DIVUW, 6: OP_REMW, 7: OP_REMUW}[f3]
            rd[i], rs1[i], rs2[i] = rd_i, rs1_i, rs2_i
        elif opc == 0x3B and f7 == 0x00 and f3 == 1:
            op_id[i] = OP_SLLW
            rd[i], rs1[i], rs2[i] = rd_i, rs1_i, rs2_i
        elif opc == 0x3B and f7 == 0x00 and f3 == 5:
            op_id[i] = OP_SRLW
            rd[i], rs1[i], rs2[i] = rd_i, rs1_i, rs2_i
        elif opc == 0x3B and f7 == 0x20 and f3 == 5:
            op_id[i] = OP_SRAW
            rd[i], rs1[i], rs2[i] = rd_i, rs1_i, rs2_i
        elif opc == 0x1B and f3 == 1:  # slliw
            op_id[i] = OP_SLLIW
            rd[i], rs1[i] = rd_i, rs1_i
            sh = (w >> 20) & 31
            imm[i] = limbs_of(np.array([sh], np.uint64), ws)[0]
        elif opc == 0x1B and f3 == 5:  # srliw / sraiw
            op_id[i] = OP_SRAIW if ((w >> 26) & 0x3F) == 0x10 else OP_SRLIW
            rd[i], rs1[i] = rd_i, rs1_i
            sh = (w >> 20) & 31
            imm[i] = limbs_of(np.array([sh], np.uint64), ws)[0]
        elif opc == 0x1B and f3 == 0:  # addiw
            op_id[i] = OP_ADDIW
            rd[i], rs1[i] = rd_i, rs1_i
            v = sext(w >> 20, 12)
            imm[i] = limbs_of(np.array([v % (1 << 64)], np.uint64), ws)[0]
        elif opc == 0x67 and f3 == 0:  # jalr
            op_id[i] = OP_JALR
            rd[i], rs1[i] = rd_i, rs1_i
            v = sext(w >> 20, 12)
            imm[i] = limbs_of(np.array([v % (1 << 64)], np.uint64), ws)[0]
        elif opc == 0x37:  # lui
            op_id[i] = OP_LUI
            rd[i] = rd_i
            v = sext(w & 0xFFFFF000, 32)
            imm[i] = limbs_of(np.array([v % (1 << 64)], np.uint64), ws)[0]
        elif opc == 0x17:  # auipc
            op_id[i] = OP_AUIPC
            rd[i] = rd_i
            off = sext(w & 0xFFFFF000, 32)
            imm_f[i] = off % kb.P
        elif opc == 0x03 and f3 in (0, 1, 2, 4, 5, 6):  # sub-word loads
            op_id[i] = {0: OP_LB, 1: OP_LH, 2: OP_LW,
                        4: OP_LBU, 5: OP_LHU, 6: OP_LWU}[f3]
            rd[i], rs1[i] = rd_i, rs1_i
            v = sext(w >> 20, 12)
            imm[i] = limbs_of(np.array([v % (1 << 64)], np.uint64), ws)[0]
        elif opc == 0x23 and f3 in (0, 1, 2):  # sub-word stores
            op_id[i] = {0: OP_SB, 1: OP_SH, 2: OP_SW}[f3]
            rs1[i], rs2[i] = rs1_i, rs2_i
            v = sext((((w >> 25) & 0x7F) << 5) | ((w >> 7) & 0x1F), 12)
            imm[i] = limbs_of(np.array([v % (1 << 64)], np.uint64), ws)[0]
        elif opc == 0x03 and f3 == 3:  # ld
            op_id[i] = OP_LD
            rd[i], rs1[i] = rd_i, rs1_i
            v = sext(w >> 20, 12)
            imm[i] = limbs_of(np.array([v % (1 << 64)], np.uint64), ws)[0]
        elif opc == 0x23 and f3 == 3:  # sd
            op_id[i] = OP_SD
            rs1[i], rs2[i] = rs1_i, rs2_i
            v = sext((((w >> 25) & 0x7F) << 5) | ((w >> 7) & 0x1F), 12)
            imm[i] = limbs_of(np.array([v % (1 << 64)], np.uint64), ws)[0]
        elif opc == 0x63 and f3 in (0, 1, 4, 5, 6, 7):
            op_id[i] = {
                0: OP_BEQ, 1: OP_BNE, 4: OP_BLT, 5: OP_BGE, 6: OP_BLTU, 7: OP_BGEU
            }[f3]
            rs1[i], rs2[i] = rs1_i, rs2_i
            off = sext(
                (((w >> 31) & 1) << 12)
                | (((w >> 7) & 1) << 11)
                | (((w >> 25) & 0x3F) << 5)
                | (((w >> 8) & 0xF) << 1),
                13,
            )
            imm_f[i] = off % kb.P
        elif opc == 0x6F:
            op_id[i] = OP_JAL
            rd[i] = rd_i
            off = sext(
                (((w >> 31) & 1) << 20)
                | (((w >> 12) & 0xFF) << 12)
                | (((w >> 20) & 1) << 11)
                | (((w >> 21) & 0x3FF) << 1),
                21,
            )
            imm_f[i] = off % kb.P
        elif opc == 0x73:
            op_id[i] = OP_ECALL
            rd[i], rs1[i], rs2[i] = 10, 17, 10
        else:
            raise ValueError(f"unsupported instruction for proving: {w:#010x}")
    return {
        "pc": pc,
        "op_id": op_id,
        "rd": rd,
        "rs1": rs1,
        "rs2": rs2,
        "imm_f": imm_f,
        "imm": imm,
    }


def make_preprocessed(program_words, pc_base: int, ws: WordSpec, mlrc: int) -> dict:
    """Execution-independent preprocessed tables (ROM, range, byte)."""
    rom = decode_program(program_words, pc_base, ws)
    nl = ws.num_limbs
    rom_h = _pad_pow2(len(program_words), mlrc)
    prep_prog = np.zeros((rom_h, 7 + nl), np.uint32)
    npr = len(program_words)
    prep_prog[:npr, 0] = rom["pc"].astype(np.uint32)
    prep_prog[:npr, 1] = rom["op_id"]
    prep_prog[:npr, 2] = rom["rd"]
    prep_prog[:npr, 3] = rom["rs1"]
    prep_prog[:npr, 4] = rom["rs2"]
    prep_prog[:npr, 5] = rom["imm_f"]
    prep_prog[:npr, 6 : 6 + nl] = rom["imm"]
    prep_prog[:npr, 6 + nl] = 1
    rng_h = _pad_pow2(1 << ws.limb_bits, mlrc)
    prep_rng = np.zeros((rng_h, 1), np.uint32)
    prep_rng[: 1 << ws.limb_bits, 0] = np.arange(1 << ws.limb_bits)
    byte_h = _pad_pow2(1 << ws.limb_bits, mlrc)
    hb = ws.limb_bits // 2
    xs = np.arange(1 << ws.limb_bits, dtype=np.uint32)
    bx, by = xs >> hb, xs & ((1 << hb) - 1)
    prep_byte = np.zeros((byte_h, 5), np.uint32)
    prep_byte[: 1 << ws.limb_bits, 0] = bx
    prep_byte[: 1 << ws.limb_bits, 1] = by
    prep_byte[: 1 << ws.limb_bits, 2] = bx & by
    prep_byte[: 1 << ws.limb_bits, 3] = bx | by
    prep_byte[: 1 << ws.limb_bits, 4] = bx ^ by
    from .sha import make_sha_k_preprocessed

    prep_shak, _ = make_sha_k_preprocessed(ws, _pad_pow2(64, mlrc))
    return {
        "Program": (jnp.asarray(to_monty(prep_prog)), npr),
        "Range": (jnp.asarray(to_monty(prep_rng)), 1 << ws.limb_bits),
        "Byte": (jnp.asarray(to_monty(prep_byte)), 1 << ws.limb_bits),
        "ShaK": (jnp.asarray(to_monty(prep_shak)), 64),
    }


# reads per round, by precompile syscall id (sha extend: w[i-15], w[i-2],
# w[i-16], w[i-7])
PX_NUM_READS = {8: 4}


def px_row_ops(kind: int, step: int) -> tuple:
    """(n_reads, has_write) for one precompile round row."""
    if kind == 8:  # sha extend: 4 reads + 1 write every round
        return 4, True
    if kind == 9:  # sha compress: init/compress read, finalize writes
        return (1, False) if step < 72 else (0, True)
    if kind == 10:  # keccak: 25 lane reads, 24 rounds, 25 lane writes
        if step < 25:
            return 1, False
        return (0, False) if step < 49 else (0, True)
    if kind in range(11, 39):
        # curve/uint256/tower calls: N_READ single-read steps then write
        # steps (curvechip.py CallChip window layout)
        n_read = {11: 16, 12: 16, 13: 8, 14: 12, 15: 16, 16: 5, 17: 5,
                  18: 16, 19: 8, 20: 5, 21: 8, 22: 24, 23: 12, 24: 7,
                  25: 8, 26: 8, 27: 8, 28: 16, 29: 16, 30: 16,
                  31: 12, 32: 12, 33: 12, 34: 24, 35: 24, 36: 24,
                  37: 36, 38: 16}[kind]
        return (1, False) if step < n_read else (0, True)
    raise ValueError(f"unknown precompile kind {kind}")


def shape_of_px(px_events) -> frozenset:
    """Machine shape (optional precompile chips) needed by an execution's
    precompile events (machine.shape_of_syscalls)."""
    from .machine import shape_of_syscalls

    if px_events is None or len(px_events) == 0:
        return frozenset()
    return shape_of_syscalls({int(k) for k in np.unique(px_events["kind"])})


def px_events_of_segment(px_events, events):
    """Precompile rounds whose parent ecall lies inside the event slice."""
    if px_events is None or len(px_events) == 0 or len(events) == 0:
        return None
    parent = px_events["clk"] - 1 - px_events["step"]
    lo, hi = int(events["clk"][0]), int(events["clk"][-1])
    return px_events[(parent >= lo) & (parent <= hi)]


def compute_segment_states(
    events, rom, pc_base: int, ws: WordSpec, px_events=None,
    defer_kinds=frozenset(),
):
    """(init_chain, final_chain): lists of (cell, ts, value) rows for the
    MemoryInit / MemoryFinal tables of one shard.

    Cells: registers at addresses 0..31, RAM words at 32 + byte_addr/8.
    A cell contributes one (init, final) pair per CONTIGUOUS access
    chain: each access's recorded prev_ts must equal the previous access's
    ts, otherwise the chain closes (final row) and a new one opens (init
    row). With a plain segment every cell has exactly one chain; with
    deferred precompiles (defer_kinds — reference role:
    crates/prover/src/worker/controller/precompiles.rs deferred shards)
    the foreign shard's accesses interleave, and the extra init/final
    pairs are exactly the global boundary messages that stitch the two
    shards' chains back together in the septic argument.

    This is what makes event-stream splicing possible without
    re-execution (reference role: crates/core/executor/src/splicing.rs).
    Precompile rounds (px_events) touch cells between their parent ecall
    and the next instruction. px rounds whose kind is in `defer_kinds`
    are skipped (they belong to a precompile shard); with an EMPTY event
    slice, px_events are processed standalone in clk order (the
    precompile shard side).
    """
    init_chain, final_chain = [], []
    last = {}  # cell -> (ts, val) of its open chain

    def touch(cell, prev_ts, prev_val, new_ts, new_val):
        prev = last.get(cell)
        if prev is None or prev[0] != int(prev_ts):
            if prev is not None:
                final_chain.append((cell, prev[0], prev[1]))
            init_chain.append((cell, int(prev_ts), int(prev_val)))
        last[cell] = (int(new_ts), int(new_val))

    def close_chains():
        for cell, (ts, val) in last.items():
            final_chain.append((cell, ts, val))
        # deterministic table order
        init_chain.sort()
        final_chain.sort()
        return init_chain, final_chain

    if len(events) == 0:
        # standalone precompile-shard side: walk the px rounds directly
        if px_events is not None:
            order = np.argsort(px_events["clk"], kind="stable")
            for j in order:
                row = px_events[j]
                if defer_kinds and int(row["kind"]) not in defer_kinds:
                    continue
                rclk = int(row["clk"])
                n_reads, has_write = px_row_ops(int(row["kind"]), int(row["step"]))
                for k in range(n_reads):
                    c_ = 32 + int(row["r_addr"][k]) // 8
                    touch(c_, row["r_prev_ts"][k], row["r_val"][k],
                          rclk * 8 + k, row["r_val"][k])
                if has_write:
                    c_ = 32 + int(row["w_addr"]) // 8
                    touch(c_, row["w_prev_ts"], row["w_prev_val"],
                          rclk * 8 + 4, row["w_val"])
        return close_chains()

    px = px_events_of_segment(px_events, events)
    px_by_parent = {}
    if px is not None:
        parents = px["clk"] - 1 - px["step"]
        for j in range(len(px)):
            if int(px[j]["kind"]) in defer_kinds:
                continue
            px_by_parent.setdefault(int(parents[j]), []).append(j)

    pc_idx = ((events["pc"] - pc_base) // 4).astype(np.int64)
    ops = rom["op_id"][pc_idx]
    rds = rom["rd"][pc_idx]
    rs1s = rom["rs1"][pc_idx]
    rs2s = rom["rs2"][pc_idx]
    uses_rs1_ops = {OP_ADD, OP_ADDI, OP_SUB, OP_BEQ, OP_BNE, OP_ECALL,
                    OP_LD, OP_SD, OP_AND, OP_OR, OP_XOR, OP_ANDI, OP_ORI,
                    OP_XORI, OP_MUL, OP_MULI, OP_SLT, OP_SLTU, OP_SLTI,
                    OP_SLTIU, OP_BLT, OP_BGE, OP_BLTU, OP_BGEU,
                    OP_SLL, OP_SRL, OP_SRA, OP_SRLI, OP_SRAI, OP_DIVU, OP_REMU,
                    OP_JALR, OP_LB, OP_LBU, OP_LH, OP_LHU, OP_LW, OP_LWU,
                    OP_SB, OP_SH, OP_SW, OP_ADDW, OP_ADDIW, OP_SUBW, OP_MULW,
                    OP_SLLW, OP_SRLW, OP_SRAW, OP_SLLIW, OP_SRLIW, OP_SRAIW,
                    OP_DIV, OP_REM, OP_DIVW, OP_DIVUW, OP_REMW, OP_REMUW,
                    OP_MULH, OP_MULHU, OP_MULHSU}
    uses_rs2_ops = {OP_ADD, OP_SUB, OP_BEQ, OP_BNE, OP_ECALL, OP_SD,
                    OP_AND, OP_OR, OP_XOR, OP_MUL, OP_SLT, OP_SLTU,
                    OP_BLT, OP_BGE, OP_BLTU, OP_BGEU, OP_SLL, OP_SRL, OP_SRA,
                    OP_DIVU, OP_REMU, OP_SB, OP_SH, OP_SW,
                    OP_ADDW, OP_SUBW, OP_MULW, OP_SLLW, OP_SRLW, OP_SRAW,
                    OP_DIV, OP_REM, OP_DIVW, OP_DIVUW, OP_REMW, OP_REMUW,
                    OP_MULH, OP_MULHU, OP_MULHSU}
    writes_ops = {OP_ADD, OP_ADDI, OP_SUB, OP_JAL, OP_LD, OP_AND, OP_OR,
                  OP_XOR, OP_ANDI, OP_ORI, OP_XORI, OP_MUL, OP_MULI,
                  OP_SLT, OP_SLTU, OP_SLTI, OP_SLTIU,
                  OP_SLL, OP_SRL, OP_SRA, OP_SRLI, OP_SRAI, OP_DIVU, OP_REMU,
                  OP_JALR, OP_LUI, OP_AUIPC,
                  OP_LB, OP_LBU, OP_LH, OP_LHU, OP_LW, OP_LWU,
                  OP_ADDW, OP_ADDIW, OP_SUBW, OP_MULW,
                  OP_SLLW, OP_SRLW, OP_SRAW, OP_SLLIW, OP_SRLIW, OP_SRAIW,
                  OP_DIV, OP_REM, OP_DIVW, OP_DIVUW, OP_REMW, OP_REMUW,
                  OP_MULH, OP_MULHU, OP_MULHSU}
    for j in range(len(events)):
        ev = events[j]
        op = int(ops[j])
        clk = int(ev["clk"])
        if op in uses_rs1_ops:
            r = int(rs1s[j])
            touch(r, ev["rs1_prev_ts"], ev["b"], clk * 8 + 1, ev["b"])
        if op in uses_rs2_ops:
            r = int(rs2s[j])
            touch(r, ev["rs2_prev_ts"], ev["c"], clk * 8 + 2, ev["c"])
        if ev["flags"] & 1:  # memory access
            cell = 32 + int(ev["mem_addr"]) // 8
            touch(cell, ev["mem_prev_ts"], ev["mem_prev_val"], clk * 8 + 3, ev["mem_val"])
        wrote = (op in writes_ops and int(rds[j]) != 0) or (
            op == OP_ECALL and int(ev["b"]) == 3
        )
        if wrote:
            r = int(rds[j])
            touch(r, ev["rd_prev_ts"], ev["rd_prev_val"], clk * 8 + 4, ev["a"])
        # precompile rounds owned by this ecall (they run at clk+1..)
        for pj in px_by_parent.get(clk, ()) if op == OP_ECALL else ():
            row = px[pj]
            rclk = int(row["clk"])
            n_reads, has_write = px_row_ops(int(row["kind"]), int(row["step"]))
            for k in range(n_reads):
                c_ = 32 + int(row["r_addr"][k]) // 8
                touch(
                    c_,
                    row["r_prev_ts"][k],
                    row["r_val"][k],
                    rclk * 8 + k,
                    row["r_val"][k],
                )
            if has_write:
                c_ = 32 + int(row["w_addr"]) // 8
                touch(
                    c_, row["w_prev_ts"], row["w_prev_val"], rclk * 8 + 4, row["w_val"]
                )
    return close_chains()


def final_state_dict(final_chain) -> dict:
    """cell -> (ts, value) of the LAST chain (true end-of-segment state)."""
    out = {}
    for cell, ts, val in final_chain:
        cur = out.get(cell)
        if cur is None or ts > cur[0]:
            out[cell] = (ts, val)
    return out


def _pad_pow2(n: int, mlrc: int) -> int:
    assert n <= 1 << mlrc, f"trace height {n} exceeds 2^{mlrc}"
    return 1 << mlrc


def _fill_cpu_class(ev, pc_idx, op, rom, ws: WordSpec, L, height: int):
    """Fill one instruction-class chip trace from its event subset.

    Returns (trace, range_lookups, byte_pairs, byte_identity_lookups);
    the caller tallies the lookup lists into the shared Range/Byte
    table multiplicities. Column blocks absent from this class's layout
    are skipped (see machine.CPU_CLASSES)."""
    n = len(ev)
    nl = ws.num_limbs
    cpu = np.zeros((height, L.n), np.uint32)

    def setc(name, val):
        idx = L[name]
        cpu[:n, idx] = val


    setc("is_real", 1)
    setc("clk", ev["clk"].astype(np.uint32))
    setc("pc", ev["pc"].astype(np.uint32))
    setc("next_pc", ev["next_pc"].astype(np.uint32))
    for k, s in enumerate(SEL_NAMES):
        if f"sel_{s}" in L.names:
            cpu[:n, L[f"sel_{s}"]] = (op == k).astype(np.uint32)
    setc("rd", rom["rd"][pc_idx])
    setc("rs1", rom["rs1"][pc_idx])
    setc("rs2", rom["rs2"][pc_idx])
    setc("imm_f", rom["imm_f"][pc_idx])
    if "imm" in L.names:
        cpu[:n, L["imm"]] = rom["imm"][pc_idx]
    b_l = limbs_of(ev["b"], ws)
    c_l = limbs_of(ev["c"], ws)
    a_l = limbs_of(ev["a"], ws)
    # Immediate-operand rows carry c = ROM imm (for slli->muli the ROM imm
    # is 2^shift, not the executor's raw shift amount).
    imm_l_all = rom["imm"][pc_idx]
    cimm_mask = np.isin(
        op, [OP_ADDI, OP_ANDI, OP_ORI, OP_XORI, OP_MULI, OP_LD, OP_SLTI, OP_SLTIU,
             OP_SRLI, OP_SRAI, OP_LB, OP_LBU, OP_LH, OP_LHU, OP_LW, OP_LWU,
             OP_ADDIW, OP_SLLIW, OP_SRLIW, OP_SRAIW]
    )
    c_l = np.where(cimm_mask[:, None], imm_l_all, c_l)
    if "b" in L.names:
        cpu[:n, L["b"]] = b_l
    if "c" in L.names:
        cpu[:n, L["c"]] = c_l
    if "a" in L.names:
        cpu[:n, L["a"]] = a_l
    if "rd_prev_val" in L.names:
        cpu[:n, L["rd_prev_val"]] = limbs_of(ev["rd_prev_val"], ws)
    setc("rs1_prev_ts", ev["rs1_prev_ts"].astype(np.uint32))
    setc("rs2_prev_ts", ev["rs2_prev_ts"].astype(np.uint32))
    setc("rd_prev_ts", ev["rd_prev_ts"].astype(np.uint32))

    is_addi = op == OP_ADDI
    # carries for add/addi: (b + c) limb-wise
    is_add = (op == OP_ADD) | is_addi
    is_sub = op == OP_SUB
    is_mem = (op == OP_LD) | (op == OP_SD)
    is_jalr = op == OP_JALR
    is_subw_load = np.isin(op, [OP_LB, OP_LBU, OP_LH, OP_LHU, OP_LW, OP_LWU])
    is_subw_store = np.isin(op, [OP_SB, OP_SH, OP_SW])
    is_subw = is_subw_load | is_subw_store
    is_anymem = is_mem | is_subw
    is_addr = is_anymem | is_jalr
    imm_l = imm_l_all
    carry = np.zeros((n, nl), np.uint64)
    acc = np.zeros(n, np.uint64)
    for i in range(nl):
        s = b_l[:, i].astype(np.uint64) + c_l[:, i] + acc
        carry[:, i] = s >> np.uint64(ws.limb_bits)
        acc = carry[:, i]
    borrow = np.zeros((n, nl), np.uint64)
    acc = np.zeros(n, np.uint64)
    for i in range(nl):
        d = b_l[:, i].astype(np.int64) - c_l[:, i].astype(np.int64) - acc.astype(np.int64)
        borrow[:, i] = (d < 0).astype(np.uint64)
        acc = borrow[:, i]
    # address carries for ld/sd: b + imm
    addr_carry = np.zeros((n, nl), np.uint64)
    addr_limb = np.zeros((n, nl), np.uint32)
    acc = np.zeros(n, np.uint64)
    for i in range(nl):
        s = b_l[:, i].astype(np.uint64) + imm_l[:, i] + acc
        addr_limb[:, i] = (s & np.uint64((1 << ws.limb_bits) - 1)).astype(np.uint32)
        addr_carry[:, i] = s >> np.uint64(ws.limb_bits)
        acc = addr_carry[:, i]
    is_wadd = (op == OP_ADDW) | (op == OP_ADDIW)
    is_wsub = op == OP_SUBW
    w_carry = np.zeros((n, nl), np.uint64)
    half32 = nl // 2
    accw = np.zeros(n, np.uint64)
    for i in range(half32):
        t = b_l[:, i].astype(np.uint64) + c_l[:, i] + accw
        w_carry[:, i] = t >> np.uint64(ws.limb_bits)
        accw = w_carry[:, i]
    w_borrow = np.zeros((n, nl), np.uint64)
    accw = np.zeros(n, np.uint64)
    for i in range(half32):
        d = b_l[:, i].astype(np.int64) - c_l[:, i].astype(np.int64) - accw.astype(np.int64)
        w_borrow[:, i] = (d < 0).astype(np.uint64)
        accw = w_borrow[:, i]
    if "carry" in L.names:
        cpu[:n, L["carry"]] = np.where(
            is_sub[:, None],
            borrow,
            np.where(
                is_add[:, None],
                carry,
                np.where(
                    is_addr[:, None],
                    addr_carry,
                    np.where(
                        is_wadd[:, None],
                        w_carry,
                        np.where(is_wsub[:, None], w_borrow, 0),
                    ),
                ),
            ),
        ).astype(np.uint32)
    if "maddr" in L.names:
        cpu[:n, L["maddr"]] = np.where(is_addr[:, None], addr_limb, 0)
    if "maddr0_div" in L.names:
        cpu[:n, L["maddr0_div"]] = np.where(is_anymem, addr_limb[:, 0] >> 3, 0)
    if "mem_prev_ts" in L.names:
        cpu[:n, L["mem_prev_ts"]] = np.where(is_anymem, ev["mem_prev_ts"], 0).astype(np.uint32)
    if "mem_prev_val" in L.names:
        cpu[:n, L["mem_prev_val"]] = np.where(
            is_anymem[:, None], limbs_of(ev["mem_prev_val"], ws), 0
        )
    # sub-word machinery: byte-offset one-hot, new stored word, load sign
    # bit; with 16-bit limbs also the byte splits of the previous word
    # (lb/lbu/sb rows) and of the stored register's low limb (sb rows).
    offs = (addr_limb[:, 0] & 7).astype(np.uint32)
    for k in range(8):
        if "moff" in L.names:
            cpu[:n, L["moff"].start + k] = (is_subw & (offs == k)).astype(np.uint32)
    if "nw" in L.names:
        cpu[:n, L["nw"]] = np.where(
            is_subw_store[:, None], limbs_of(ev["mem_val"], ws), 0
        )
    bpl = ws.limb_bits // 8
    if bpl == 2:
        is_bytemem = np.isin(op, [OP_LB, OP_LBU, OP_SB])
        mpv_l = limbs_of(ev["mem_prev_val"], ws)
        for i in range(nl):
            if "mpb" in L.names:
                cpu[:n, L["mpb"].start + 2 * i] = np.where(
                    is_bytemem, mpv_l[:, i] & 0xFF, 0
                )
            if "mpb" in L.names:
                cpu[:n, L["mpb"].start + 2 * i + 1] = np.where(
                    is_bytemem, mpv_l[:, i] >> 8, 0
                )
        is_sb = op == OP_SB
        if "cb0" in L.names:
            cpu[:n, L["cb0"]] = np.where(is_sb, c_l[:, 0] & 0xFF, 0)
        if "cb1" in L.names:
            cpu[:n, L["cb1"]] = np.where(is_sb, c_l[:, 0] >> 8, 0)

    # bitwise half decompositions
    is_bw = np.isin(op, [OP_AND, OP_OR, OP_XOR, OP_ANDI, OP_ORI, OP_XORI])
    hb = ws.limb_bits // 2
    hmask = (1 << hb) - 1
    for src_l, dst in ((b_l, "bh"), (c_l, "ch"), (a_l, "ah")):
        if dst not in L.names:
            continue
        halves = np.zeros((n, 2 * nl), np.uint32)
        for i in range(nl):
            halves[:, 2 * i] = src_l[:, i] & hmask
            halves[:, 2 * i + 1] = src_l[:, i] >> hb
        cpu[:n, L[dst]] = np.where(is_bw[:, None], halves, 0)

    # Byte views: mul/shift/div arithmetic is byte-granular in the AIR
    # (NB = 8 bytes/word; see machine.cpu_layout). At limb_bits=8 the
    # byte arrays ARE the limb arrays; at limb_bits=16 they additionally
    # fill the bv* witness columns and are byte-checked (bcheckables).
    NB = 8
    bcheckables = []  # (vals, mult) 8-bit checks -> range table | byte table

    def bytes_from_limbs(limb_arr):
        if bpl == 1:
            return limb_arr
        out_ = np.zeros((n, NB), np.uint32)
        for i in range(nl):
            out_[:, 2 * i] = limb_arr[:, i] & 0xFF
            out_[:, 2 * i + 1] = limb_arr[:, i] >> 8
        return out_

    b_B = bytes_from_limbs(b_l)
    c_B = bytes_from_limbs(c_l)
    a_B = bytes_from_limbs(a_l)

    # mul carries (per byte position)
    is_mul = (op == OP_MUL) | (op == OP_MULI)
    mc_lo = np.zeros((n, NB), np.uint32)
    mc_hi = np.zeros((n, NB), np.uint32)
    acc = np.zeros(n, np.uint64)
    for k in range(NB):
        conv = acc.copy()
        for i in range(k + 1):
            conv = conv + b_B[:, i].astype(np.uint64) * c_B[:, k - i]
        cout = (conv - a_B[:, k]) >> np.uint64(8)
        mc_lo[:, k] = (cout & np.uint64(0xFF)).astype(np.uint32)
        mc_hi[:, k] = (cout >> np.uint64(8)).astype(np.uint32)
        acc = cout
    is_mulw = op == OP_MULW
    mcw_lo = np.zeros((n, NB), np.uint32)
    mcw_hi = np.zeros((n, NB), np.uint32)
    accm = np.zeros(n, np.uint64)
    for k in range(NB // 2):
        conv = accm.copy()
        for i in range(k + 1):
            conv = conv + b_B[:, i].astype(np.uint64) * c_B[:, k - i]
        cout = (conv - a_B[:, k]) >> np.uint64(8)
        mcw_lo[:, k] = (cout & np.uint64(0xFF)).astype(np.uint32)
        mcw_hi[:, k] = (cout >> np.uint64(8)).astype(np.uint32)
        accm = cout
    if "mc_lo" in L.names:
        cpu[:n, L["mc_lo"]] = np.where(
            is_mul[:, None], mc_lo, np.where(is_mulw[:, None], mcw_lo, 0)
        )
    if "mc_hi" in L.names:
        cpu[:n, L["mc_hi"]] = np.where(
            is_mul[:, None], mc_hi, np.where(is_mulw[:, None], mcw_hi, 0)
        )

    # equality aux (for all real rows)
    d = (b_l.astype(np.int64) - c_l.astype(np.int64)) % kb.P
    eqf = (d == 0).astype(np.uint32)
    eqi = np.zeros_like(d)
    nz = d != 0
    # vectorized modular inverse via pow
    dd = d[nz].astype(np.uint64)
    inv = np.ones_like(dd)
    base_ = dd.copy()
    e = kb.P - 2
    while e:
        if e & 1:
            inv = inv * base_ % kb.P
        base_ = base_ * base_ % kb.P
        e >>= 1
    eqi[nz] = inv
    if "eqf" in L.names:
        cpu[:n, L["eqf"]] = eqf
    if "eqi" in L.names:
        cpu[:n, L["eqi"]] = eqi.astype(np.uint32)
    if nl > 2:
        chain = np.zeros((n, nl - 2), np.uint32)
        chain[:, 0] = eqf[:, 0] * eqf[:, 1]
        for k in range(1, nl - 2):
            chain[:, k] = chain[:, k - 1] * eqf[:, k + 1]
        if "eqchain" in L.names:
            cpu[:n, L["eqchain"]] = chain
        all_eq = chain[:, nl - 3] * eqf[:, nl - 1]
    else:
        all_eq = eqf[:, 0] * eqf[:, 1] if nl == 2 else eqf[:, 0]

    is_br = (op == OP_BEQ) | (op == OP_BNE)
    taken = np.where(
        op == OP_BEQ, all_eq, np.where(op == OP_BNE, 1 - all_eq, 0)
    )
    if "taken" in L.names:
        cpu[:n, L["taken"]] = np.where(is_br, taken, 0)

    # comparison machinery
    is_cmp = np.isin(op, [OP_SLT, OP_SLTU, OP_SLTI, OP_SLTIU, OP_BLT, OP_BGE, OP_BLTU, OP_BGEU])
    is_signed = np.isin(op, [OP_SLT, OP_SLTI, OP_BLT, OP_BGE])
    half_top = 1 << (ws.limb_bits - 1)
    top = nl - 1
    hb_b = (b_l[:, top] >> (ws.limb_bits - 1)) & 1
    hb_c = (c_l[:, top] >> (ws.limb_bits - 1)) & 1
    is_sra_cls = np.isin(op, [OP_SRA, OP_SRAI])
    is_sdiv = np.isin(op, [OP_DIV, OP_REM])
    is_mulh_b = np.isin(op, [OP_MULH, OP_MULHSU])
    is_mulh_bc = op == OP_MULH
    hb_b_eff = np.where(is_signed | is_sra_cls | is_sdiv | is_mulh_b, hb_b, 0)
    if "hb_b" in L.names:
        cpu[:n, L["hb_b"]] = hb_b_eff
    if "hb_c" in L.names:
        cpu[:n, L["hb_c"]] = np.where(is_signed | is_sdiv | is_mulh_bc, hb_c, 0)
    eb = b_l.astype(np.int64).copy()
    ec = c_l.astype(np.int64).copy()
    flip_b = np.where(is_signed, half_top - 2 * half_top * hb_b.astype(np.int64), 0)
    flip_c = np.where(is_signed, half_top - 2 * half_top * hb_c.astype(np.int64), 0)
    eb[:, top] += flip_b
    ec[:, top] += flip_c
    dl = np.zeros((n, nl), np.uint32)
    cb = np.zeros((n, nl), np.uint32)
    accb = np.zeros(n, np.int64)
    for i in range(nl):
        d = eb[:, i] - ec[:, i] - accb
        borrow_i = (d < 0).astype(np.int64)
        dl[:, i] = (d + borrow_i * (1 << ws.limb_bits)).astype(np.uint32)
        cb[:, i] = borrow_i.astype(np.uint32)
        accb = borrow_i
    if "dcmp" in L.names:
        cpu[:n, L["dcmp"]] = np.where(is_cmp[:, None], dl, 0)
    if "cborrow" in L.names:
        cpu[:n, L["cborrow"]] = np.where(is_cmp[:, None], cb, 0)
    ltres = np.where(is_cmp, cb[:, top], 0)
    if "ltres" in L.names:
        cpu[:n, L["ltres"]] = ltres
    # comparison branch taken
    is_cmp_br = np.isin(op, [OP_BLT, OP_BGE, OP_BLTU, OP_BGEU])
    taken_cmp = np.where(
        np.isin(op, [OP_BLT, OP_BLTU]), ltres, np.where(
            np.isin(op, [OP_BGE, OP_BGEU]), 1 - ltres, 0
        )
    )
    if "taken" in L.names:
        cpu[:n, L["taken"]] = np.where(
            is_cmp_br, taken_cmp, cpu[:n, L["taken"]]
        )

    # shift machinery (64-bit and W forms)
    is_shift = np.isin(op, [OP_SLL, OP_SRL, OP_SRA, OP_SRLI, OP_SRAI])
    is_wshift = np.isin(op, [OP_SLLW, OP_SRLW, OP_SRAW, OP_SLLIW, OP_SRLIW, OP_SRAIW])
    is_anyshift = is_shift | is_wshift
    is_sll = op == OP_SLL
    is_wl = np.isin(op, [OP_SLLW, OP_SLLIW])
    is_right = np.isin(op, [OP_SRL, OP_SRA, OP_SRLI, OP_SRAI])
    is_wr = np.isin(op, [OP_SRLW, OP_SRAW, OP_SRLIW, OP_SRAIW])
    is_wsra = np.isin(op, [OP_SRAW, OP_SRAIW])
    lb = ws.limb_bits
    s_amt = np.where(is_wshift, c_l[:, 0] & 31, c_l[:, 0] & 63).astype(np.uint32)
    q_amt = s_amt // 8
    r_amt = s_amt % 8
    for k in range(NB):
        if "shq" in L.names:
            cpu[:n, L["shq"].start + k] = (is_anyshift & (q_amt == k)).astype(np.uint32)
    for j in range(8):
        if "shr" in L.names:
            cpu[:n, L["shr"].start + j] = (is_anyshift & (r_amt == j)).astype(np.uint32)
    hi2 = (c_l[:, 0] >> 6).astype(np.uint32)
    hi3 = (c_l[:, 0] >> 5).astype(np.uint32)
    if "shb0" in L.names:
        cpu[:n, L["shb0"]] = np.where(
            is_shift, hi2 & 1, np.where(is_wshift, hi3 & 1, 0)
        )
    if "shb1" in L.names:
        cpu[:n, L["shb1"]] = np.where(
            is_shift, (hi2 >> 1) & 1, np.where(is_wshift, (hi3 >> 1) & 1, 0)
        )
    if "shb2" in L.names:
        cpu[:n, L["shb2"]] = np.where(is_wshift, (hi3 >> 2) & 1, 0)
    if "shrest" in L.names:
        cpu[:n, L["shrest"]] = np.where(is_anyshift, c_l[:, 0] >> 8, 0)
        bcheckables.append((cpu[:n, L["shrest"]], is_anyshift.astype(np.int64)))
    p2r = (np.uint64(1) << r_amt.astype(np.uint64)).astype(np.uint64)
    p2rc = (np.uint64(1) << (8 - r_amt).astype(np.uint64)).astype(np.uint64)
    half32w = NB // 2
    for i in range(NB):
        left_m = is_sll | (is_wl & (i < half32w))
        right_m = is_right | (is_wr & (i < half32w))
        t = b_B[:, i].astype(np.uint64) * p2r
        if "sll_lo" in L.names:
            cpu[:n, L["sll_lo"].start + i] = np.where(left_m, t & np.uint64(0xFF), 0).astype(np.uint32)
        if "sll_hi" in L.names:
            cpu[:n, L["sll_hi"].start + i] = np.where(left_m, t >> np.uint64(8), 0).astype(np.uint32)
        t = b_B[:, i].astype(np.uint64) * p2rc
        if "srw_lo" in L.names:
            cpu[:n, L["srw_lo"].start + i] = np.where(right_m, t & np.uint64(0xFF), 0).astype(np.uint32)
        if "srw_hi" in L.names:
            cpu[:n, L["srw_hi"].start + i] = np.where(right_m, t >> np.uint64(8), 0).astype(np.uint32)
    is_wdiv_pre = np.isin(op, [OP_DIVW, OP_DIVUW, OP_REMW, OP_REMUW])
    whb_v = np.where(
        is_wsra | is_wdiv_pre, (b_l[:, nl // 2 - 1] >> (lb - 1)) & 1, 0
    ).astype(np.int64)
    if "whb" in L.names:
        cpu[:n, L["whb"]] = whb_v.astype(np.uint32)
    # sgp = hb_b * (2^8 - 2^(8-r)) holds UNGATED: on rows without shift
    # selectors the r one-hot is all-zero, so the affine 2^(8-r) is 0 and
    # sgp must equal hb_b * 2^8 there (e.g. signed-cmp rows with negative b)
    p2rc_eff = np.where(is_anyshift, p2rc, 0).astype(np.int64)
    sgp_v = (
        hb_b_eff.astype(np.int64) * (((1 << 8) - p2rc_eff) % kb.P)
    ) % kb.P
    if "sgp" in L.names:
        cpu[:n, L["sgp"]] = sgp_v.astype(np.uint32)
    sgpw_v = (whb_v * (((1 << 8) - p2rc_eff) % kb.P)) % kb.P
    if "sgpw" in L.names:
        cpu[:n, L["sgpw"]] = sgpw_v.astype(np.uint32)

    # division machinery (unsigned + signed, 64-bit + W forms)
    is_div = np.isin(op, [OP_DIVU, OP_REMU])
    is_wudiv = np.isin(op, [OP_DIVUW, OP_REMUW])
    is_wsdiv = np.isin(op, [OP_DIVW, OP_REMW])
    is_wdiv = is_wudiv | is_wsdiv
    is_divany = is_div | is_sdiv | is_wdiv
    M64 = np.uint64((1 << 64) - 1)
    M32 = np.uint64((1 << 32) - 1)
    bv_full = ev["b"].astype(np.uint64)
    cv_full = ev["c"].astype(np.uint64)
    # W ops operate on the low 32 bits
    bv = np.where(is_wdiv, bv_full & M32, bv_full)
    cv = np.where(is_wdiv, cv_full & M32, cv_full)
    c_nz = cv != 0
    # magnitudes for the signed paths (64-bit two's complement / 32-bit)
    sb = np.where(
        is_wsdiv, (bv >> np.uint64(31)) & np.uint64(1), bv >> np.uint64(63)
    ).astype(np.uint64)
    sc = np.where(
        is_wsdiv, (cv >> np.uint64(31)) & np.uint64(1), cv >> np.uint64(63)
    ).astype(np.uint64)
    negw = lambda v: (~v + np.uint64(1)) & M32
    mbv = np.where(sb == 1, np.where(is_wsdiv, negw(bv), (~bv + np.uint64(1)) & M64), bv)
    mcv = np.where(sc == 1, np.where(is_wsdiv, negw(cv), (~cv + np.uint64(1)) & M64), cv)
    is_any_signed = is_sdiv | is_wsdiv
    # effective dividend/divisor for the quotient witness
    ubv = np.where(is_any_signed, mbv, bv)
    ucv = np.where(is_any_signed, mcv, cv)
    qv = np.zeros(n, np.uint64)
    np.floor_divide(ubv, ucv, out=qv, where=c_nz)
    qv = np.where(c_nz, qv, M64)
    rv = np.where(c_nz, ubv - qv * ucv, bv_full)
    # div0: dq forced to all-ones, dr forced to the raw full-width b
    qv = np.where(~c_nz, M64, qv)
    dq_l = limbs_of(qv, ws)
    dr_l = limbs_of(rv, ws)
    if "dq" in L.names:
        cpu[:n, L["dq"]] = np.where(is_divany[:, None], dq_l, 0)
    if "dr" in L.names:
        cpu[:n, L["dr"]] = np.where(is_divany[:, None], dr_l, 0)
    mb_l = limbs_of(mbv, ws)
    mc_l = limbs_of(mcv, ws)
    if "mb" in L.names:
        cpu[:n, L["mb"]] = np.where(is_any_signed[:, None], mb_l, 0)
    if "mc2" in L.names:
        cpu[:n, L["mc2"]] = np.where(is_any_signed[:, None], mc_l, 0)
    # negate-chain carries: x(+sign) accumulation
    def _neg_carries(src_l, sign):
        outc = np.zeros((n, nl), np.uint32)
        acc = sign.astype(np.uint64)
        for i in range(nl):
            x = np.where(
                sign == 1,
                np.uint64((1 << ws.limb_bits) - 1) - src_l[:, i].astype(np.uint64),
                src_l[:, i].astype(np.uint64),
            )
            t = x + acc
            outc[:, i] = (t >> np.uint64(ws.limb_bits)).astype(np.uint32)
            acc = outc[:, i]
        return outc
    if "ncb" in L.names:
        cpu[:n, L["ncb"]] = np.where(is_any_signed[:, None], _neg_carries(b_l, sb), 0)
    if "ncc" in L.names:
        cpu[:n, L["ncc"]] = np.where(is_any_signed[:, None], _neg_carries(c_l, sc), 0)
    qs_v = np.where(is_any_signed & c_nz, sb ^ sc, 0).astype(np.uint32)
    if "qs" in L.names:
        cpu[:n, L["qs"]] = qs_v
    if "d0_div" in L.names:
        cpu[:n, L["d0_div"]] = ((op == OP_DIV) & ~c_nz).astype(np.uint32)
    if "d0_rem" in L.names:
        cpu[:n, L["d0_rem"]] = ((op == OP_REM) & ~c_nz).astype(np.uint32)
    if "d0u" in L.names:
        cpu[:n, L["d0u"]] = (is_div & ~c_nz).astype(np.uint32)
    if "d0_wu" in L.names:
        cpu[:n, L["d0_wu"]] = (is_wudiv & ~c_nz).astype(np.uint32)
    if "d0_ws" in L.names:
        cpu[:n, L["d0_ws"]] = (is_wsdiv & ~c_nz).astype(np.uint32)
    if "d0_remw" in L.names:
        cpu[:n, L["d0_remw"]] = ((op == OP_REMW) & ~c_nz).astype(np.uint32)
    if "whc" in L.names:
        cpu[:n, L["whc"]] = np.where(is_wsdiv, sc, 0).astype(np.uint32)
    # result negate-chain carries go into the shared `carry` columns;
    # divw on div0 uses qs=0, dq=all-ones so the chain closes with a=~0
    is_qop = (op == OP_DIV) | (op == OP_DIVW)
    res_sign = np.where(is_qop, qs_v.astype(np.uint64),
                        np.where((op == OP_REM) | (op == OP_REMW), sb, 0))
    res_src = np.where(is_qop[:, None], dq_l, dr_l)
    sdiv_live = is_sdiv & c_nz
    wsdiv_chain = is_wsdiv & (c_nz | is_qop)  # divw div0 still runs its chain
    res_carr = _neg_carries(res_src, res_sign)
    if "carry" in L.names:
        cpu[:n, L["carry"]] = np.where(
            (sdiv_live | wsdiv_chain)[:, None], res_carr, cpu[:n, L["carry"]]
        )
    # convolution carries for q*divisor + r = dividend over 2*NB byte
    # positions (W rows: only the low-half bytes participate; high bytes
    # of q/divisor are zero there so the full-width loop degenerates)
    conv_c = np.where(is_any_signed[:, None], mc_l, np.where(is_wdiv[:, None], limbs_of(cv, ws), c_l))
    conv_out = np.where(is_any_signed[:, None], mb_l, np.where(is_wdiv[:, None], limbs_of(bv, ws), b_l))
    conv_c_B = bytes_from_limbs(conv_c)
    conv_out_B = bytes_from_limbs(conv_out)
    dq_B = bytes_from_limbs(dq_l)
    dr_B = bytes_from_limbs(dr_l)
    mb_B = bytes_from_limbs(mb_l)
    mc2_B = bytes_from_limbs(mc_l)
    dvc_lo = np.zeros((n, 2 * NB), np.uint32)
    dvc_hi = np.zeros((n, 2 * NB), np.uint32)
    accd = np.zeros(n, np.uint64)
    for k in range(2 * NB):
        conv = accd.copy()
        for i in range(max(0, k - NB + 1), min(NB, k + 1)):
            conv = conv + dq_B[:, i].astype(np.uint64) * conv_c_B[:, k - i]
        if k < NB:
            conv = conv + dr_B[:, k]
        out_k = conv_out_B[:, k].astype(np.uint64) if k < NB else np.uint64(0)
        cout = (conv - out_k) >> np.uint64(8)
        dvc_lo[:, k] = (cout & np.uint64(0xFF)).astype(np.uint32)
        dvc_hi[:, k] = (cout >> np.uint64(8)).astype(np.uint32)
        accd = cout
    conv_mask = is_div | sdiv_live | (is_wdiv & c_nz)
    if "dvc_lo" in L.names:
        cpu[:n, L["dvc_lo"]] = np.where(conv_mask[:, None], dvc_lo, 0)
    if "dvc_hi" in L.names:
        cpu[:n, L["dvc_hi"]] = np.where(conv_mask[:, None], dvc_hi, 0)
    # (divisor - 1 - r) borrow chain on c != 0 rows
    ddr = np.zeros((n, nl), np.uint32)
    dbor = np.zeros((n, nl), np.uint32)
    accb2 = np.ones(n, np.int64)
    for i in range(nl):
        d = conv_c[:, i].astype(np.int64) - dr_l[:, i].astype(np.int64) - accb2
        bo = (d < 0).astype(np.int64)
        ddr[:, i] = (d + bo * (1 << ws.limb_bits)).astype(np.uint32)
        dbor[:, i] = bo.astype(np.uint32)
        accb2 = bo
    div_nz = is_divany & c_nz
    if "ddr" in L.names:
        cpu[:n, L["ddr"]] = np.where(div_nz[:, None], ddr, 0)
    if "dbor" in L.names:
        cpu[:n, L["dbor"]] = np.where(div_nz[:, None], dbor, 0)
    if "is_div0" in L.names:
        cpu[:n, L["is_div0"]] = (is_divany & ~c_nz).astype(np.uint32)
    s_c = np.where(
        is_wdiv,
        c_l[:, : nl // 2].sum(axis=1).astype(np.uint64),
        c_l.sum(axis=1).astype(np.uint64),
    ) % kb.P
    dz = np.zeros(n, np.uint64)
    nzm = is_divany & (s_c != 0)
    if np.any(nzm):
        vv = s_c[nzm]
        inv = np.ones_like(vv)
        base_ = vv.copy()
        e = kb.P - 2
        while e:
            if e & 1:
                inv = inv * base_ % kb.P
            base_ = base_ * base_ % kb.P
            e >>= 1
        dz[nzm] = inv
    if "dz_inv" in L.names:
        cpu[:n, L["dz_inv"]] = dz.astype(np.uint32)

    # high multiplication: full product halves + conv carries + correction
    is_mulh_any = np.isin(op, [OP_MULH, OP_MULHU, OP_MULHSU])
    mulh_lo_B = np.zeros((n, NB), np.uint32)
    mulh_uh_B = np.zeros((n, NB), np.uint32)
    if np.any(is_mulh_any):
        idxs = np.nonzero(is_mulh_any)[0]
        lo_l = np.zeros((n, nl), np.uint32)
        uh_l = np.zeros((n, nl), np.uint32)
        hc_l = np.zeros((n, NB), np.uint32)
        dvcm_lo = np.zeros((n, 2 * NB), np.uint32)
        dvcm_hi = np.zeros((n, 2 * NB), np.uint32)
        lmask = (1 << lb) - 1
        for j in idxs:
            bi, ci = int(bv_full[j]), int(cv_full[j])
            prod = bi * ci
            uh = prod >> 64
            sbj, scj = bi >> 63, ci >> 63
            for i in range(nl):
                lo_l[j, i] = (prod >> (lb * i)) & lmask
                uh_l[j, i] = (uh >> (lb * i)) & lmask
            for i in range(NB):
                mulh_lo_B[j, i] = (prod >> (8 * i)) & 0xFF
                mulh_uh_B[j, i] = (uh >> (8 * i)) & 0xFF
            opj = int(op[j])
            av = int(ev["a"][j])
            accj = 0
            # signed-correction carries: limb-granular
            for i in range(nl):
                lhs = (av >> (lb * i)) & lmask
                if opj in (OP_MULH, OP_MULHSU):
                    lhs += sbj * ((ci >> (lb * i)) & lmask)
                if opj == OP_MULH:
                    lhs += scj * ((bi >> (lb * i)) & lmask)
                lhs += accj
                hc_l[j, i] = (lhs - ((uh >> (lb * i)) & lmask)) >> lb
                accj = int(hc_l[j, i])
            # full-product convolution carries: byte-granular
            acc2 = 0
            for k in range(2 * NB):
                conv = acc2
                for i in range(max(0, k - NB + 1), min(NB, k + 1)):
                    conv += ((bi >> (8 * i)) & 0xFF) * ((ci >> (8 * (k - i))) & 0xFF)
                outk = (prod >> (8 * k)) & 0xFF
                cout = (conv - outk) >> 8
                dvcm_lo[j, k] = cout & 0xFF
                dvcm_hi[j, k] = cout >> 8
                acc2 = cout
        if "dq" in L.names:
            cpu[:n, L["dq"]] = np.where(is_mulh_any[:, None], lo_l, cpu[:n, L["dq"]])
        if "mb" in L.names:
            cpu[:n, L["mb"]] = np.where(is_mulh_any[:, None], uh_l, cpu[:n, L["mb"]])
        if "mc_lo" in L.names:
            cpu[:n, L["mc_lo"]] = np.where(
                is_mulh_any[:, None], hc_l, cpu[:n, L["mc_lo"]]
            )
        if "dvc_lo" in L.names:
            cpu[:n, L["dvc_lo"]] = np.where(
                is_mulh_any[:, None], dvcm_lo, cpu[:n, L["dvc_lo"]]
            )
        if "dvc_hi" in L.names:
            cpu[:n, L["dvc_hi"]] = np.where(
                is_mulh_any[:, None], dvcm_hi, cpu[:n, L["dvc_hi"]]
            )

    # byte-view witness columns (limb_bits=16): one consolidated fill per
    # column with the union of its family masks; byte checks are tallied
    # per family to mirror the per-family interactions in CpuChip.sends.
    if bpl == 2:
        is_mulfam = is_mul | is_mulw | is_mulh_any
        is_divfam = is_divany
        is_anysigned = is_any_signed

        def _fill_bv(name, fills, checks):
            """fills: [(mask, byte_array)] first-match-wins; checks: [mask]."""
            if name not in L.names:
                return
            sl = L[name]
            acc_ = np.zeros((n, NB), np.uint32)
            taken_ = np.zeros(n, bool)
            for mask_, arr_ in fills:
                use = mask_ & ~taken_
                acc_ = np.where(use[:, None], arr_, acc_)
                taken_ |= mask_
            cpu[:n, sl] = acc_
            for mask_ in checks:
                m64 = mask_.astype(np.int64)
                for i in range(NB):
                    bcheckables.append((cpu[:n, sl.start + i], m64))

        has_mul_cls = "mc_lo" in L.names
        has_shift_cls = "shq" in L.names
        has_div_cls = "dr" in L.names
        bvb_fills, bvb_checks = [], []
        bvc_fills, bvc_checks = [], []
        bva_fills, bva_checks = [], []
        bvq_fills, bvq_checks = [], []
        bvm_fills, bvm_checks = [], []
        if has_mul_cls:
            bvb_fills.append((is_mulfam, b_B))
            bvb_checks.append(is_mulfam)
            bvc_fills.append((is_mulfam, c_B))
            bvc_checks.append(is_mulfam)
            bva_fills.append((is_mul | is_mulw, a_B))
            bva_checks.append(is_mul | is_mulw)
            bvq_fills.append((is_mulh_any, mulh_lo_B))
            bvq_checks.append(is_mulh_any)
            bvm_fills.append((is_mulh_any, mulh_uh_B))
            bvm_checks.append(is_mulh_any)
        if has_shift_cls:
            bvb_fills.append((is_anyshift, b_B))
            bvb_checks.append(is_anyshift)
            bva_fills.append((is_anyshift, a_B))
            bva_checks.append(is_anyshift)
        if has_div_cls:
            bvb_fills.append((is_divfam, b_B))
            bvb_checks.append(is_divfam)
            bvc_fills.append((is_divfam, c_B))
            bvc_checks.append(is_divfam)
            bvq_fills.append((is_divfam, dq_B))
            bvq_checks.append(is_divfam)
            bvm_fills.append((is_anysigned, mb_B))
            bvm_checks.append(is_anysigned)
            _fill_bv("bvr", [(is_divfam, dr_B)], [is_divfam])
            _fill_bv("bvmc", [(is_anysigned, mc2_B)], [is_anysigned])
        _fill_bv("bvb", bvb_fills, bvb_checks)
        _fill_bv("bvc", bvc_fills, bvc_checks)
        _fill_bv("bva", bva_fills, bva_checks)
        _fill_bv("bvq", bvq_fills, bvq_checks)
        _fill_bv("bvm", bvm_fills, bvm_checks)

    hbm_v = np.zeros(n, np.uint32)
    for opc_, size in ((OP_LB, 1), (OP_LH, 2), (OP_LW, 4)):
        m = op == opc_
        top_i = max(size // (ws.limb_bits // 8), 1) - 1
        hbm_v = np.where(m, (a_l[:, top_i] >> (ws.limb_bits - 1)) & 1, hbm_v)
    is_warith = np.isin(op, [OP_ADDW, OP_ADDIW, OP_SUBW, OP_MULW])
    is_wext = is_warith | np.isin(
        op, [OP_SLLW, OP_SRLW, OP_SRAW, OP_SLLIW, OP_SRLIW, OP_SRAIW,
             OP_DIVW, OP_DIVUW, OP_REMW, OP_REMUW]
    )
    hbm_v = np.where(
        is_wext, (a_l[:, nl // 2 - 1] >> (ws.limb_bits - 1)) & 1, hbm_v
    )
    if "hbm" in L.names:
        cpu[:n, L["hbm"]] = hbm_v

    is_ecall = op == OP_ECALL
    if "is_halt" in L.names:
        cpu[:n, L["is_halt"]] = (is_ecall & (ev["b"] == 0)).astype(np.uint32)
    if "is_read" in L.names:
        cpu[:n, L["is_read"]] = (is_ecall & (ev["b"] == 3)).astype(np.uint32)
    from .machine import PRECOMPILE_FLAGS

    for flag, sid, _win, _l16 in PRECOMPILE_FLAGS:
        if flag in L.names:
            cpu[:n, L[flag]] = (is_ecall & (ev["b"] == sid)).astype(np.uint32)

    rd_arr = rom["rd"][pc_idx]
    rd_nonzero = (rd_arr != 0).astype(np.uint32)
    if "rd_nonzero" in L.names:
        cpu[:n, L["rd_nonzero"]] = rd_nonzero
    rd_inv = np.zeros(n, np.uint64)
    nz = rd_arr != 0
    rr = rd_arr[nz].astype(np.uint64)
    inv = np.ones_like(rr)
    base_ = rr.copy()
    e = kb.P - 2
    while e:
        if e & 1:
            inv = inv * base_ % kb.P
        base_ = base_ * base_ % kb.P
        e >>= 1
    rd_inv[nz] = inv
    if "rd_inv" in L.names:
        cpu[:n, L["rd_inv"]] = rd_inv.astype(np.uint32)
    is_slt_fam = np.isin(op, [OP_SLT, OP_SLTU, OP_SLTI, OP_SLTIU])
    writes = (
        is_add.astype(np.uint32)
        + is_sub.astype(np.uint32)
        + (op == OP_JAL).astype(np.uint32)
        + (op == OP_LD).astype(np.uint32)
        + is_bw.astype(np.uint32)
        + is_mul.astype(np.uint32)
        + is_slt_fam.astype(np.uint32)
        + is_shift.astype(np.uint32)
        + is_divany.astype(np.uint32)
        + is_jalr.astype(np.uint32)
        + is_mulh_any.astype(np.uint32)
        + (op == OP_LUI).astype(np.uint32)
        + (op == OP_AUIPC).astype(np.uint32)
        + is_subw_load.astype(np.uint32)
        + is_warith.astype(np.uint32)
        + is_wshift.astype(np.uint32)
        + (is_ecall & (ev["b"] == 3)).astype(np.uint32)
    )
    rd_write_mult = writes * rd_nonzero
    if "rd_write_mult" in L.names:
        cpu[:n, L["rd_write_mult"]] = rd_write_mult

    # ts diffs
    uses_rs1 = (
        is_add | is_addi | is_sub | is_br | is_ecall | is_mem | is_bw | is_mul
        | is_cmp | is_anyshift | is_divany | is_jalr | is_subw | is_warith
        | is_mulh_any
    ).astype(np.uint32)
    uses_rs2 = (
        (op == OP_ADD)
        | is_sub
        | is_br
        | is_ecall
        | (op == OP_SD)
        | np.isin(op, [OP_AND, OP_OR, OP_XOR, OP_MUL])
        | np.isin(op, [OP_SLT, OP_SLTU, OP_BLT, OP_BGE, OP_BLTU, OP_BGEU])
        | np.isin(op, [OP_SLL, OP_SRL, OP_SRA, OP_DIVU, OP_REMU])
        | is_subw_store
        | np.isin(op, [OP_ADDW, OP_SUBW, OP_MULW, OP_SLLW, OP_SRLW, OP_SRAW])
        | is_sdiv
        | is_wdiv
        | is_mulh_any
    ).astype(np.uint32)
    is_mem_u = is_mem.astype(np.uint32)
    _ts_rows = [
        ("tsd_rs1", uses_rs1, 1, ev["rs1_prev_ts"]),
        ("tsd_rs2", uses_rs2, 2, ev["rs2_prev_ts"]),
        ("tsd_rd", rd_write_mult, 4, ev["rd_prev_ts"]),
    ]
    if "tsd_mem" in L.names:
        _ts_rows.append(("tsd_mem", is_anymem.astype(np.uint32), 3, ev["mem_prev_ts"]))
    for nm, uses, slot, prev in _ts_rows:
        newts = ev["clk"] * 8 + slot
        diff = np.where(uses > 0, newts - prev - 1, 0).astype(np.uint64)
        dl = np.zeros((n, ws.ts_limbs), np.uint32)
        v = diff.copy()
        for i in range(ws.ts_limbs):
            dl[:, i] = (v & np.uint64((1 << ws.limb_bits) - 1)).astype(np.uint32)
            v >>= np.uint64(ws.limb_bits)
        assert np.all(v == 0), "ts diff exceeds range limbs"
        cpu[:n, L[nm]] = dl

    # Padded rows must be all-zero (they are, by construction).
    lookups = []
    # a-limb range sends use the UNGATED writes selector sum (matching the
    # interaction multiplicity in CpuChip.sends) — a jal with rd=x0 still
    # sends its (zero) result limbs to the range table.
    for i in range(nl):
        lookups.append((a_l[:, i], writes))
    if "maddr0_div" in L.names:
        lookups.append((cpu[:n, L["maddr0_div"]], is_anymem.astype(np.uint32)))
    is_addr_u = is_addr.astype(np.uint32)
    for i in range(nl):
        if ws.limb_bits * i < 32:
            if "maddr" in L.names:
                lookups.append((cpu[:n, L["maddr"].start + i], is_addr_u))
    is_anymul = (is_mul | is_mulw | is_mulh_any).astype(np.int64)
    for i in range(NB):
        if "mc_lo" in L.names:
            bcheckables.append((cpu[:n, L["mc_lo"].start + i], is_anymul))
        if "mc_hi" in L.names:
            bcheckables.append((cpu[:n, L["mc_hi"].start + i], is_anymul))
    for i in range(nl):
        if "dcmp" in L.names:
            lookups.append((cpu[:n, L["dcmp"].start + i], is_cmp.astype(np.uint32)))
    # signed sign-bit rest checks: value = 2*(top - half*hb)
    if "hb_b" in L.names:
        rest_b = (
            2 * (b_l[:, top].astype(np.int64) - half_top * hb_b_eff.astype(np.int64))
        ) % kb.P
        lookups.append((rest_b.astype(np.uint32), (is_signed | is_sra_cls | is_sdiv | is_mulh_b).astype(np.uint32)))
    if "hb_c" in L.names:
        rest_c = (
            2 * (c_l[:, top].astype(np.int64) - half_top * cpu[:n, L["hb_c"]].astype(np.int64))
        ) % kb.P
        lookups.append((rest_c.astype(np.uint32), (is_signed | is_sdiv | is_mulh_bc).astype(np.uint32)))

    left_u = (is_sll | is_wl).astype(np.int64)
    right_u = (is_right | is_wr).astype(np.int64)
    for i in range(NB):
        if "sll_lo" in L.names:
            bcheckables.append((cpu[:n, L["sll_lo"].start + i], left_u))
        if "sll_hi" in L.names:
            bcheckables.append((cpu[:n, L["sll_hi"].start + i], left_u))
        if "srw_lo" in L.names:
            bcheckables.append((cpu[:n, L["srw_lo"].start + i], right_u))
        if "srw_hi" in L.names:
            bcheckables.append((cpu[:n, L["srw_hi"].start + i], right_u))
    is_divany_u = (is_divany | is_mulh_any).astype(np.uint32)
    for i in range(nl):
        if "dq" in L.names:
            lookups.append((cpu[:n, L["dq"].start + i], is_divany_u))
        if "dr" in L.names:
            lookups.append((cpu[:n, L["dr"].start + i], is_divany_u))
        if "ddr" in L.names:
            lookups.append((cpu[:n, L["ddr"].start + i], is_divany_u))
        if "mb" in L.names:
            lookups.append((cpu[:n, L["mb"].start + i], (is_sdiv | is_wsdiv | is_mulh_any).astype(np.uint32)))
        if "mc2" in L.names:
            lookups.append((cpu[:n, L["mc2"].start + i], (is_sdiv | is_wsdiv | is_mulh_any).astype(np.uint32)))
    for i in range(2 * NB):
        if "dvc_lo" in L.names:
            bcheckables.append((cpu[:n, L["dvc_lo"].start + i], is_divany_u.astype(np.int64)))
        if "dvc_hi" in L.names:
            bcheckables.append((cpu[:n, L["dvc_hi"].start + i], is_divany_u.astype(np.int64)))
    for i in range(nl):
        if "mem_prev_val" in L.names:
            lookups.append((cpu[:n, L["mem_prev_val"].start + i], is_subw.astype(np.uint32)))
    bpl_ = ws.limb_bits // 8
    for opc_, size in ((OP_LB, 1), (OP_LH, 2), (OP_LW, 4)):
        if size < bpl_:
            continue  # byte-table sign check instead (see below)
        top_i = (size - 1) // bpl_
        rest = (
            2 * (a_l[:, top_i].astype(np.int64) - half_top * hbm_v.astype(np.int64))
        ) % kb.P
        if "hbm" in L.names:
            lookups.append((rest.astype(np.uint32), (op == opc_).astype(np.uint32)))
    rest_w = (
        2 * (a_l[:, nl // 2 - 1].astype(np.int64) - half_top * hbm_v.astype(np.int64))
    ) % kb.P
    if "hbm" in L.names:
        lookups.append((rest_w.astype(np.uint32), is_wext.astype(np.uint32)))
    rest_whb = (
        2 * (b_l[:, nl // 2 - 1].astype(np.int64) - half_top * whb_v)
    ) % kb.P
    if "whb" in L.names:
        lookups.append((rest_whb.astype(np.uint32), (is_wsra | is_wdiv).astype(np.uint32)))
    if "whc" in L.names:
        rest_whc = (
            2 * (c_l[:, nl // 2 - 1].astype(np.int64)
                 - half_top * cpu[:n, L["whc"]].astype(np.int64))
        ) % kb.P
        lookups.append((rest_whc.astype(np.uint32), is_wsdiv.astype(np.uint32)))

    _tsd_rows = [
        ("tsd_rs1", uses_rs1),
        ("tsd_rs2", uses_rs2),
        ("tsd_rd", rd_write_mult),
    ]
    if "tsd_mem" in L.names:
        _tsd_rows.append(("tsd_mem", is_anymem.astype(np.uint32)))
    for nm, uses in _tsd_rows:
        sl = L[nm]
        for i in range(ws.ts_limbs):
            lookups.append((cpu[:n, sl.start + i], uses))
    # --- byte-table lookups (collected; tallied by the caller) -------------
    bw_pairs = []  # (x_halves, y_halves, table column, selected mask)
    byte_id = []   # AND-identity rows (v, mult)
    if "bh" in L.names:
        op_col = {0: [OP_AND, OP_ANDI], 1: [OP_OR, OP_ORI], 2: [OP_XOR, OP_XORI]}
        for col, opset in op_col.items():
            sel = np.isin(op, opset)
            if not np.any(sel):
                continue
            for k in range(2 * nl):
                bw_pairs.append(
                    (cpu[:n, L["bh"].start + k], cpu[:n, L["ch"].start + k], col, sel)
                )
    if ws.limb_bits == 16 and "mpb" in L.names:
        # AND-identity byte checks for the sub-word byte-split witnesses,
        # plus the lb sign-rest check (see CpuChip.sends).
        is_bytemem_ = np.isin(op, [OP_LB, OP_LBU, OP_SB]).astype(np.int64)
        for k in range(8):
            byte_id.append((cpu[:n, L["mpb"].start + k], is_bytemem_))
        is_sb_ = (op == OP_SB).astype(np.int64)
        byte_id.append((cpu[:n, L["cb0"]], is_sb_))
        byte_id.append((cpu[:n, L["cb1"]], is_sb_))
        lb_rest = (
            2 * a_l[:, 0].astype(np.int64)
            - (2 * (((1 << ws.limb_bits) - 1) - 0xFF) + 256)
            * hbm_v.astype(np.int64)
        ) % kb.P
        byte_id.append((lb_rest, (op == OP_LB).astype(np.int64)))
    # 8-bit checks: range-table rows at limb_bits=8 (where the range table
    # IS a byte table), AND-identity byte-table rows at limb_bits=16.
    if bpl == 1:
        lookups.extend(bcheckables)
    else:
        byte_id.extend(bcheckables)
    return cpu, lookups, bw_pairs, byte_id



def generate_traces(
    result,
    program_words,
    pc_base,
    ws: WordSpec,
    mlrc: int,
    events=None,
    init_states=None,
    final_states=None,
    genesis_addrs=None,
    final_global_states=None,
    include_bookends=True,
    px_events=None,
    defer_kinds=frozenset(),
    px_shard=False,
):
    """Build all chip traces from an ExecutionResult (or an event slice).

    Returns (traces, preprocessed) dicts: name -> (monty jnp array, height).
    For the single-shard case the genesis and final-global bookend tables
    are derived automatically; a multi-shard splicer passes explicit
    segment states and places the bookends in the first/last shard.
    """
    ev = result.events if events is None else events
    n = len(ev)
    if px_events is None:
        px_events = px_events_of_segment(getattr(result, "px_events", None), ev)
    rom = decode_program(program_words, pc_base, ws)
    L = cpu_layout(ws)
    nl = ws.num_limbs
    height = _pad_pow2(n, mlrc)

    pc_idx = ((ev["pc"] - pc_base) // 4).astype(np.int64)
    op_all = rom["op_id"][pc_idx]

    # --- instruction-class chip traces (see machine.CPU_CLASSES) ----------
    from .machine import CPU_CLASSES

    cpu_traces = {}
    lookups = []       # (values, mult) pairs for the Range table
    bw_pairs = []      # (x, y, col, mask) byte-op table lookups
    byte_id_lookups = []  # AND-identity byte rows
    for cls_name, (cls_sels, cls_fams) in CPU_CLASSES.items():
        ids = [SEL_NAMES.index(s) for s in cls_sels]
        mask = np.isin(op_all, ids)
        n_cls = int(mask.sum())
        if n_cls == 0:
            continue
        Lc = cpu_layout(ws, cls_sels, cls_fams)
        tr, rl, bp, bi = _fill_cpu_class(
            ev[mask], pc_idx[mask], op_all[mask], rom, ws, Lc,
            _pad_pow2(n_cls, mlrc),
        )
        cpu_traces[cls_name] = (tr, n_cls)
        lookups.extend(rl)
        bw_pairs.extend(bp)
        byte_id_lookups.extend(bi)

    # --- Program ROM (preprocessed) + multiplicity main trace -------------
    rom_h = _pad_pow2(len(program_words), mlrc)
    prep_prog = np.zeros((rom_h, 7 + nl), np.uint32)
    np_rows = len(program_words)
    prep_prog[:np_rows, 0] = rom["pc"].astype(np.uint32)
    prep_prog[:np_rows, 1] = rom["op_id"]
    prep_prog[:np_rows, 2] = rom["rd"]
    prep_prog[:np_rows, 3] = rom["rs1"]
    prep_prog[:np_rows, 4] = rom["rs2"]
    prep_prog[:np_rows, 5] = rom["imm_f"]
    prep_prog[:np_rows, 6 : 6 + nl] = rom["imm"]
    prep_prog[:np_rows, 6 + nl] = 1  # is_real
    prog_mult = np.zeros((rom_h, 1), np.uint32)
    counts = np.bincount(pc_idx, minlength=np_rows)
    prog_mult[:np_rows, 0] = counts[:np_rows]

    # --- Precompile chips ---------------------------------------------------
    from .sha import generate_sha_compress_trace, generate_sha_extend_trace

    def _kind_px(kind):
        if px_events is None or len(px_events) == 0:
            return None
        if kind in defer_kinds and not px_shard:
            return None  # rows live in a deferred precompile shard
        sel = px_events[px_events["kind"] == kind]
        return sel if len(sel) else None

    sha_px = _kind_px(8)
    sha_trace, sha_rows, sha_range_lookups = None, 0, []
    if sha_px is not None:
        if len(sha_px) > (1 << mlrc):
            raise ValueError(
                f"ShaExtend rows {len(sha_px)} exceed shard height 2^{mlrc}; "
                "lower the event split threshold"
            )
        sha_trace, sha_rows, sha_range_lookups = generate_sha_extend_trace(
            sha_px, ws, _pad_pow2(len(sha_px), mlrc)
        )
    from .keccak import generate_keccak_trace

    keccak_px = _kind_px(10)
    keccak_trace, keccak_rows, keccak_range_lookups = None, 0, []
    if keccak_px is not None:
        n_kr = (len(keccak_px) // 74) * 24
        if n_kr > (1 << mlrc):
            raise ValueError(
                f"KeccakPerm rows {n_kr} exceed shard height 2^{mlrc}; "
                "lower the event split threshold"
            )
        keccak_trace, keccak_rows, keccak_range_lookups = generate_keccak_trace(
            keccak_px, ws, _pad_pow2(max(n_kr, 1), mlrc)
        )

    shac_px = _kind_px(9)
    shac_trace, shac_rows, shac_range_lookups = None, 0, []
    sha_k_mult = np.zeros(64, np.uint32)
    if shac_px is not None:
        if len(shac_px) > (1 << mlrc):
            raise ValueError(
                f"ShaCompress rows {len(shac_px)} exceed shard height "
                f"2^{mlrc}; lower the event split threshold"
            )
        shac_trace, shac_rows, shac_range_lookups, sha_k_mult = (
            generate_sha_compress_trace(shac_px, ws, _pad_pow2(len(shac_px), mlrc))
        )

    # --- Curve / uint256 precompile chips (shape-gated, limb16 only) ------
    curve_traces = {}
    curve_range_lookups = []
    if ws.limb_bits == 16:
        from .curvechip import (
            Bn254AddChip,
            Bn254DoubleChip,
            EdAddChip,
            EdDecompressChip,
            Secp256k1AddChip,
            Secp256k1DecompressChip,
            Secp256k1DoubleChip,
            Secp256r1AddChip,
            Secp256r1DecompressChip,
            Secp256r1DoubleChip,
            Uint256MulChip,
            Bls12381AddChip,
            Bls12381DecompressChip,
            Bls12381DoubleChip,
        )
        from .curvechip import TOWER_CHIPS, U256x2048MulChip
        from .poseidon2chip import Poseidon2PermChip

        for cls in (EdAddChip, Secp256k1AddChip, Secp256k1DoubleChip,
                    Uint256MulChip, Bn254AddChip, EdDecompressChip,
                    Secp256k1DecompressChip, Secp256r1AddChip,
                    Secp256r1DoubleChip, Secp256r1DecompressChip,
                    Bn254DoubleChip, Bls12381AddChip, Bls12381DoubleChip,
                    Bls12381DecompressChip, U256x2048MulChip,
                    Poseidon2PermChip, *TOWER_CHIPS.values()):
            cpx = _kind_px(cls.SYSCALL_ID)
            if cpx is None:
                continue
            chip = cls(ws)
            n_rows = len(cpx) // chip.window
            if n_rows > (1 << mlrc):
                raise ValueError(
                    f"{cls.name} rows {n_rows} exceed shard height 2^{mlrc}; "
                    "lower the event split threshold"
                )
            ctr, crows, clook = chip.generate_trace(
                cpx, _pad_pow2(max(n_rows, 1), mlrc)
            )
            curve_traces[cls.name] = (ctr, crows)
            curve_range_lookups.extend(clook)

    # --- SyscallDefer bridge rows (deferred precompile dispatch) ----------
    # One row per deferred call: the CPU shard's `is_out` row moves the
    # local KIND_SYSCALL message onto the septic global argument; the
    # precompile shard's `is_in` row brings it back down (reference role:
    # controller/precompiles.rs deferred shards; machine.SyscallDeferChip).
    sysdefer = None
    defer_range_lookups = []
    if defer_kinds and px_events is not None and len(px_events):
        sel = np.isin(px_events["kind"], np.asarray(sorted(defer_kinds)))
        sub = px_events[sel]
        calls, seen = [], set()
        if len(sub):
            parents = sub["clk"] - 1 - sub["step"]
            for j in np.argsort(sub["clk"], kind="stable"):
                p = int(parents[j])
                if p in seen:
                    continue
                seen.add(p)
                calls.append((int(sub[j]["kind"]), p, int(sub[j]["ptr"])))
        if calls:
            dh = _pad_pow2(len(calls), mlrc)
            sd = np.zeros((dh, 4 + nl), np.uint32)
            for j, (sid, pclk, ptr) in enumerate(calls):
                sd[j, 0] = 0 if px_shard else 1  # is_out
                sd[j, 1] = 1 if px_shard else 0  # is_in
                sd[j, 2] = sid
                sd[j, 3] = pclk
                sd[j, 4 : 4 + nl] = limbs_of(np.array([ptr], np.uint64), ws)[0]
            sysdefer = (sd, len(calls))
            dvals = sd[: len(calls), 4 : 4 + nl].reshape(-1)
            defer_range_lookups.append(
                (dvals, np.ones(len(dvals), np.uint32))
            )

    # --- Range table (preprocessed) + multiplicity ------------------------
    rng_h = _pad_pow2(1 << ws.limb_bits, mlrc)
    prep_rng = np.zeros((rng_h, 1), np.uint32)
    prep_rng[: 1 << ws.limb_bits, 0] = np.arange(1 << ws.limb_bits)
    rng_mult = np.zeros((rng_h, 1), np.uint32)
    for vals, mult in (lookups + sha_range_lookups + shac_range_lookups
                       + keccak_range_lookups + curve_range_lookups
                       + defer_range_lookups):
        rng_mult[:, 0] += np.bincount(
            vals.astype(np.int64), weights=mult.astype(np.int64), minlength=rng_h
        )[:rng_h].astype(np.uint32)

    # --- Byte table (preprocessed pairs of half-limbs) --------------------
    byte_h = _pad_pow2(1 << ws.limb_bits, mlrc)
    hb = ws.limb_bits // 2
    xs = np.arange(1 << ws.limb_bits, dtype=np.uint32)
    bx, by = xs >> hb, xs & ((1 << hb) - 1)
    prep_byte = np.zeros((byte_h, 5), np.uint32)
    prep_byte[: 1 << ws.limb_bits, 0] = bx
    prep_byte[: 1 << ws.limb_bits, 1] = by
    prep_byte[: 1 << ws.limb_bits, 2] = bx & by
    prep_byte[: 1 << ws.limb_bits, 3] = bx | by
    prep_byte[: 1 << ws.limb_bits, 4] = bx ^ by
    from .sha import make_sha_k_preprocessed

    shak_h = _pad_pow2(64, mlrc)
    prep_shak, _ = make_sha_k_preprocessed(ws, shak_h)
    shak_main = np.zeros((shak_h, 1), np.uint32)
    shak_main[:64, 0] = sha_k_mult

    byte_mult = np.zeros((byte_h, 3), np.uint32)
    for x, y, col, sel in bw_pairs:
        pair_idx = (x.astype(np.int64) << hb) | y
        byte_mult[:, col] += np.bincount(
            pair_idx, weights=sel.astype(np.int64), minlength=byte_h
        )[:byte_h].astype(np.uint32)
    for v, mult in byte_id_lookups:
        pair_idx = (v.astype(np.int64) << hb) | v.astype(np.int64)
        byte_mult[:, 0] += np.bincount(
            pair_idx, weights=mult, minlength=byte_h
        )[:byte_h].astype(np.uint32)

    # --- Memory init/final (segment boundary states) ----------------------
    if init_states is None or final_states is None:
        seg_init, seg_final = compute_segment_states(
            ev, rom, pc_base, ws, px_events=px_events, defer_kinds=defer_kinds
        )
        init_states = seg_init if init_states is None else init_states
        final_states = seg_final if final_states is None else final_states
    # init/final are CHAIN lists [(cell, ts, value)] — one row per
    # contiguous access chain (multiple rows per cell when a deferred
    # precompile shard's accesses interleave; compute_segment_states).
    m = len(final_states)
    assert len(init_states) == m
    mem_h = _pad_pow2(max(m, 1), mlrc)
    init = np.zeros((mem_h, 3 + nl), np.uint32)
    fin = np.zeros((mem_h, 3 + nl), np.uint32)
    for j, (addr, its, ival) in enumerate(init_states):
        init[j, 0] = addr
        init[j, 1] = 1
        init[j, 2] = its
        init[j, 3 : 3 + nl] = limbs_of(np.array([ival], np.uint64), ws)[0]
    for j, (addr, fts, fval) in enumerate(final_states):
        fin[j, 0] = addr
        fin[j, 1] = 1
        fin[j, 2] = fts
        fin[j, 3 : 3 + nl] = limbs_of(np.array([fval], np.uint64), ws)[0]

    # Global bookend tables: genesis (first shard) and final-global (last).
    gen = None
    fg = None
    if include_bookends and genesis_addrs is None and final_global_states is None:
        # single-shard: bookends from this segment's states
        final_global_states = final_state_dict(final_states)
        genesis_addrs = sorted(final_global_states.keys())
    if genesis_addrs is not None:
        g = sorted(genesis_addrs)
        gh = _pad_pow2(max(len(g), 1), mlrc)
        gen = np.zeros((gh, 2), np.uint32)
        for j, addr in enumerate(g):
            gen[j, 0] = addr
            gen[j, 1] = 1
    if final_global_states is not None:
        fg_cells = sorted(final_global_states.keys())
        fh = _pad_pow2(max(len(fg_cells), 1), mlrc)
        fg = np.zeros((fh, 3 + nl), np.uint32)
        for j, addr in enumerate(fg_cells):
            fts, fval = final_global_states[addr]
            fg[j, 0] = addr
            fg[j, 1] = 1
            fg[j, 2] = fts
            fg[j, 3 : 3 + nl] = limbs_of(np.array([fval], np.uint64), ws)[0]

    # --- Global chip: septic digest of the cross-shard interactions -------
    from .global_chip import GlobalChip, generate_global_trace
    from .machine import build_machine as _bm

    gchip = _bm(ws).chip("Global")

    def _msg_of(row):
        """Mirror machine._global_msg's packing of a state row."""
        vals = row[3 : 3 + nl].astype(np.int64)
        if ws.limb_bits == 16:
            packed = list(vals)
        else:
            packed = [int(vals[i] + (vals[i + 1] << 8)) for i in range(0, nl, 2)]
        msg = [int(row[0]), int(row[2])] + [int(v) for v in packed]
        return msg + [0] * (8 - len(msg))

    global_events = []
    from ..air.builder import KIND_GLOBAL_MEMORY

    for j in range(m):
        global_events.append((_msg_of(init[j]), True, KIND_GLOBAL_MEMORY))
    for j in range(m):
        global_events.append((_msg_of(fin[j]), False, KIND_GLOBAL_MEMORY))
    if gen is not None:
        for j in range(int(gen[:, 1].sum())):
            global_events.append(
                ([int(gen[j, 0])] + [0] * 7, False, KIND_GLOBAL_MEMORY)
            )
    if fg is not None:
        for j in range(int(fg[:, 1].sum())):
            global_events.append((_msg_of(fg[j]), True, KIND_GLOBAL_MEMORY))
    if sysdefer is not None:
        from ..air.builder import KIND_GLOBAL_SYSCALL

        sd, n_sd = sysdefer
        for j in range(n_sd):
            limbs = sd[j, 4 : 4 + nl].astype(np.int64)
            if ws.limb_bits == 16:
                packed = [int(v) for v in limbs]
            else:
                packed = [
                    int(limbs[i] + (limbs[i + 1] << 8)) for i in range(0, nl, 2)
                ]
            msg = [int(sd[j, 2]), int(sd[j, 3])] + packed
            msg += [0] * (8 - len(msg))
            # CPU side (is_out) sends; the precompile shard receives.
            # generate_global_trace's flag is IS_RECEIVE (True for the
            # init-side rows above), so pass is_in.
            global_events.append((msg, bool(sd[j, 1]), KIND_GLOBAL_SYSCALL))
    gtrace, gcount, gdigest, grange = generate_global_trace(
        gchip, global_events, mlrc
    )
    for v, cnt in grange.items():
        rng_mult[v, 0] += cnt

    traces = {
        **{
            cls_name: (jnp.asarray(to_monty(tr)), n_cls)
            for cls_name, (tr, n_cls) in cpu_traces.items()
        },
        "Program": (jnp.asarray(to_monty(prog_mult)), np_rows),
        **(
            {"ShaExtend": (jnp.asarray(to_monty(sha_trace)), sha_rows)}
            if sha_rows
            else {}
        ),
        **(
            {"ShaCompress": (jnp.asarray(to_monty(shac_trace)), shac_rows)}
            if shac_rows
            else {}
        ),
        **(
            {"KeccakPerm": (jnp.asarray(to_monty(keccak_trace)), keccak_rows)}
            if keccak_rows
            else {}
        ),
        **{
            name: (jnp.asarray(to_monty(tr)), rows)
            for name, (tr, rows) in curve_traces.items()
        },
        "Range": (jnp.asarray(to_monty(rng_mult)), 1 << ws.limb_bits),
        "Byte": (jnp.asarray(to_monty(byte_mult)), 1 << ws.limb_bits),
        "ShaK": (jnp.asarray(to_monty(shak_main)), 64),
        "MemoryInit": (jnp.asarray(to_monty(init)), m),
        "MemoryFinal": (jnp.asarray(to_monty(fin)), m),
        "Global": (jnp.asarray(to_monty(gtrace)), gcount),
    }
    if sysdefer is not None:
        traces["SyscallDefer"] = (
            jnp.asarray(to_monty(sysdefer[0])),
            sysdefer[1],
        )
    if gen is not None:
        traces["MemoryGenesis"] = (jnp.asarray(to_monty(gen)), int(gen[:, 1].sum()))
    if fg is not None:
        traces["MemoryFinalGlobal"] = (
            jnp.asarray(to_monty(fg)),
            int(fg[:, 1].sum()),
        )
    preprocessed = {
        "Program": (jnp.asarray(to_monty(prep_prog)), np_rows),
        "Range": (jnp.asarray(to_monty(prep_rng)), 1 << ws.limb_bits),
        "Byte": (jnp.asarray(to_monty(prep_byte)), 1 << ws.limb_bits),
        "ShaK": (jnp.asarray(to_monty(prep_shak)), 64),
    }
    return traces, preprocessed

"""Gnark constraint-JSON lowering of recursion programs.

The wrap stage hands the shrink-root verifier to an outer-field SNARK
(gnark Groth16/PLONK in the reference). This module lowers a
RecursionProgram to the reference's constraint-JSON format — a list of
{opcode, args} records with string-encoded operands — plus the matching
witness JSON, so a gnark-side builder can consume them unchanged
(reference: crates/recursion/compiler/src/constraints/mod.rs:14-432,
opcode vocabulary in constraints/opcodes.rs; Go consumer
crates/recursion/gnark-ffi/go/sp1/build.go).

Variable encoding mirrors the reference's ConstraintCompiler: every
value is a SINGLE id — felt cells are "f{addr}", ext4 cells are
"e{addr}" (one id for the whole extension element, with its four
KoalaBear coefficients appearing only in ImmE/WitnessE payloads), and
compiler-allocated temporaries are "backend{n}" (mod.rs:29 alloc_id).

The recursion VM is untyped (every cell is a 4-lane block; base ops
read/write lane 0), while the gnark circuit is typed (Felt vs Ext
wires). The lowering therefore runs a typing pass: each cell's WRITE
site fixes its wire type (Select/Const/Witness writes resolve by a
fixpoint over ext evidence), and a cell consumed in the other context
gets an explicit boundary coercion — `Ext2Felt` extracts the
coefficients of an ext wire, `CircuitFelts2Ext` packs a felt wire with
zero high lanes — matching how the reference's typed DSL crosses the
same boundary (compiler/src/ir/instructions.rs CircuitExt2Felt /
CircuitFelts2Ext).

A semantic consumer of this format lives in gnark_eval.py: it checks
every exported constraint against the exported witness the way
go/sp1/sp1.go `Define` would (VERDICT r4 item 2).
"""

from __future__ import annotations

import json

from . import program as prog

EXT = "e"
FELT = "f"


def _analyze(p: prog.RecursionProgram):
    """(write_type, felt_use, ext_use): per-cell wire typing.

    write_type[addr] in {FELT, EXT} is fixed by the writing op where
    unambiguous; Const/Witness/Select writes resolve to EXT iff the cell
    participates in ext evidence (ExtAlu operand, Convert block, wide
    constant, or an ext-typed Select group — propagated to fixpoint).
    """
    ext_ev = set()

    def mark(addr):
        ext_ev.add(int(addr))

    for row in range(p.ext_alu.shape[0]):
        _, dst, a, b = (int(x) for x in p.ext_alu[row, :4])
        mark(dst), mark(a), mark(b)
    for row in range(p.convert.shape[0]):
        mark(int(p.convert[row, 1]))
    for row in range(p.const.shape[0]):
        if any(int(v) for v in p.const[row, 2:5]):
            mark(int(p.const[row, 0]))

    changed = True
    while changed:
        changed = False
        for row in range(p.select.shape[0]):
            _, i1, i2, o1, o2 = (int(x) for x in p.select[row, :5])
            group = [i1, i2, o1, o2]
            if any(a in ext_ev for a in group):
                for a in group:
                    if a not in ext_ev:
                        ext_ev.add(a)
                        changed = True

    write_type = {}
    for row in range(p.base_alu.shape[0]):
        write_type[int(p.base_alu[row, 1])] = FELT
    for row in range(p.ext_alu.shape[0]):
        write_type[int(p.ext_alu[row, 1])] = EXT
    for row in range(p.poseidon2.shape[0]):
        for i in range(16, 32):
            write_type[int(p.poseidon2[row, i])] = FELT
    for row in range(p.bits.shape[0]):
        for j in range(prog.NUM_BITS):
            write_type[int(p.bits[row, 1 + j])] = FELT
    for row in range(p.convert.shape[0]):
        if int(p.convert[row, 0]):  # pack: writes the ext block
            write_type[int(p.convert[row, 1])] = EXT
        else:  # unpack: writes the felts
            for i in range(4):
                write_type[int(p.convert[row, 2 + i])] = FELT
    for row in range(p.const.shape[0]):
        if not int(p.const[row, 6]):  # send (write)
            addr = int(p.const[row, 0])
            write_type[addr] = EXT if addr in ext_ev else FELT
    for row in range(p.witness.shape[0]):
        addr = int(p.witness[row][0])
        write_type[addr] = EXT if addr in ext_ev else FELT
    for row in range(p.select.shape[0]):
        for a in (int(p.select[row, 3]), int(p.select[row, 4])):
            write_type[a] = EXT if a in ext_ev else FELT

    felt_use, ext_use = set(), set()
    for row in range(p.base_alu.shape[0]):
        felt_use.add(int(p.base_alu[row, 2]))
        felt_use.add(int(p.base_alu[row, 3]))
    for row in range(p.ext_alu.shape[0]):
        ext_use.add(int(p.ext_alu[row, 2]))
        ext_use.add(int(p.ext_alu[row, 3]))
    for row in range(p.poseidon2.shape[0]):
        for i in range(16):
            felt_use.add(int(p.poseidon2[row, i]))
    for row in range(p.bits.shape[0]):
        felt_use.add(int(p.bits[row, 0]))
    for row in range(p.convert.shape[0]):
        if int(p.convert[row, 0]):  # pack: reads the felts
            for i in range(4):
                felt_use.add(int(p.convert[row, 2 + i]))
        else:  # unpack: reads the ext block
            ext_use.add(int(p.convert[row, 1]))
    for row in range(p.commit_pv.shape[0]):
        felt_use.add(int(p.commit_pv[row, 0]))
    for row in range(p.select.shape[0]):
        bit, i1, i2, o1, _ = (int(x) for x in p.select[row, :5])
        felt_use.add(bit)
        (ext_use if o1 in ext_ev else felt_use).update((i1, i2))
    return write_type, felt_use, ext_use


def export_constraints(p: prog.RecursionProgram) -> dict:
    """Lower the program to the gnark constraint list (program order)."""
    out = []
    write_type, felt_use, ext_use = _analyze(p)
    tmp_counter = [0]
    zero_wire = [None]

    def emit(opcode: str, *args):
        out.append({"opcode": opcode, "args": [list(a) for a in args]})

    def wt(addr) -> str:
        return write_type.get(int(addr), FELT)

    def fid(addr) -> str:
        return f"{FELT}{int(addr)}"

    def eid(addr) -> str:
        return f"{EXT}{int(addr)}"

    def backend() -> str:
        tmp = f"backend{tmp_counter[0]}"
        tmp_counter[0] += 1
        return tmp

    def post_write(addr):
        """Boundary coercions after a cell's write site."""
        addr = int(addr)
        if wt(addr) == FELT and addr in ext_use:
            if zero_wire[0] is None:
                zero_wire[0] = backend()
                emit("ImmF", [zero_wire[0]], ["0"])
            z = zero_wire[0]
            emit("CircuitFelts2Ext", [eid(addr)], [fid(addr), z, z, z])
        elif wt(addr) == EXT and addr in felt_use:
            emit("Ext2Felt", [fid(addr), backend(), backend(), backend()],
                 [eid(addr)])

    def rf(addr) -> str:  # read in felt context
        return fid(addr)

    def re(addr) -> str:  # read in ext context
        return eid(addr)

    op_name = {prog.ADD: "AddF", prog.SUB: "SubF", prog.MUL: "MulF",
               prog.DIV: "DivF"}
    for tag, row in p.exec_order:
        if tag == prog.T_BASE:
            op, dst, a, b, _ = p.base_alu[row]
            emit(op_name[int(op)], [fid(dst)], [rf(a)], [rf(b)])
            post_write(dst)
        elif tag == prog.T_EXT:
            op, dst, a, b, _ = p.ext_alu[row]
            emit(op_name[int(op)].replace("F", "E"),
                 [eid(dst)], [re(a)], [re(b)])
            post_write(dst)
        elif tag == prog.T_CONST:
            r = p.const[row]
            addr, vals = int(r[0]), [int(v) for v in r[1:5]]
            if not int(r[6]):  # send: an immediate the program introduces
                if wt(addr) == EXT:
                    emit("ImmE", [eid(addr)], [str(v) for v in vals])
                else:
                    emit("ImmF", [fid(addr)], [str(vals[0])])
                post_write(addr)
            else:  # receive: assert the (already written) cell's value
                tmp = backend()
                if wt(addr) == EXT:
                    emit("ImmE", [tmp], [str(v) for v in vals])
                    emit("AssertEqE", [eid(addr)], [tmp])
                else:
                    emit("ImmF", [tmp], [str(vals[0])])
                    emit("AssertEqF", [fid(addr)], [tmp])
        elif tag == prog.T_WITNESS:
            addr = int(p.witness[row][0])
            if wt(addr) == EXT:
                emit("WitnessE", [eid(addr)])
            else:
                emit("WitnessF", [fid(addr)])
            post_write(addr)
        elif tag == prog.T_POSEIDON2:
            r = p.poseidon2[row]
            emit("PermuteKoalaBear",
                 [rf(r[i]) for i in range(16)],
                 [fid(r[16 + i]) for i in range(16)])
            for i in range(16, 32):
                post_write(r[i])
        elif tag == prog.T_SELECT:
            r = p.select[row]
            bit, in1, in2, out1, out2 = (int(v) for v in r[:5])
            is_ext = wt(out1) == EXT
            sel = "SelectE" if is_ext else "SelectF"
            rd = re if is_ext else rf
            mk = eid if is_ext else fid
            # out1 = bit ? in2 : in1; out2 = bit ? in1 : in2 (executor.py)
            emit(sel, [mk(out1)], [rf(bit)], [rd(in2)], [rd(in1)])
            emit(sel, [mk(out2)], [rf(bit)], [rd(in1)], [rd(in2)])
            post_write(out1)
            post_write(out2)
        elif tag == prog.T_BITS:
            r = p.bits[row]
            emit("Num2BitsF", [rf(r[0])],
                 [fid(r[1 + i]) for i in range(prog.NUM_BITS)])
            for i in range(prog.NUM_BITS):
                post_write(r[1 + i])
        elif tag == prog.T_CONVERT:
            r = p.convert[row]
            is_pack, block = int(r[0]), int(r[1])
            if is_pack:
                emit("CircuitFelts2Ext", [eid(block)],
                     [rf(r[2 + i]) for i in range(4)])
                post_write(block)
            else:
                emit("Ext2Felt", [fid(r[2 + i]) for i in range(4)],
                     [re(block)])
                for i in range(4):
                    post_write(r[2 + i])
        elif tag == prog.T_COMMIT_PV:
            addr, pv_index = p.commit_pv[row]
            emit("CommitCommitedValuesDigest", [rf(addr)],
                 [str(int(pv_index))])
    return {"num_cells": int(p.num_cells), "num_pvs": int(p.num_pvs),
            "constraints": out}


def export_witness(p: prog.RecursionProgram, witness_stream: list) -> dict:
    """The witness JSON: the program's witness cells in stream order."""
    vals = []
    for block in witness_stream:
        vals.append([str(int(v)) for v in block])
    return {"felts": vals}


def write_gnark_artifacts(p, witness_stream, constraints_path, witness_path):
    with open(constraints_path, "w") as f:
        json.dump(export_constraints(p), f)
    with open(witness_path, "w") as f:
        json.dump(export_witness(p, witness_stream), f)

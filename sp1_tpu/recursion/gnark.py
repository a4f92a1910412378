"""Gnark constraint-JSON lowering of recursion programs.

The wrap stage hands the shrink-root verifier to an outer-field SNARK
(gnark Groth16/PLONK in the reference). This module lowers a
RecursionProgram to the reference's constraint-JSON format — a list of
{opcode, args} records with string-encoded operands — plus the matching
witness JSON, so a gnark-side builder can consume them unchanged
(reference: crates/recursion/compiler/src/constraints/mod.rs:14-432,
opcode vocabulary in constraints/opcodes.rs; Go consumer
crates/recursion/gnark-ffi/go/sp1/build.go).

Cells are emitted as felt variables f{addr}; the KoalaBear Poseidon2
rows lower to PermuteKoalaBear (the in-circuit KoalaBear permutation the
reference wrap circuit also uses), bit decompositions to Num2BitsF, and
the program's committed public values to CommitCommitedValuesDigest
slots. No Go toolchain ships in this environment, so the JSON artifact
is the integration boundary: its shape matches what
gnark-ffi/go/sp1/build.go deserializes.
"""

from __future__ import annotations

import json

import numpy as np

from . import program as prog


def _f(addr: int) -> str:
    return f"f{int(addr)}"


def export_constraints(p: prog.RecursionProgram) -> dict:
    """Lower the program to the gnark constraint list (program order)."""
    out = []

    def emit(opcode: str, *args):
        out.append({"opcode": opcode, "args": [list(a) for a in args]})

    op_name = {prog.ADD: "AddF", prog.SUB: "SubF", prog.MUL: "MulF",
               prog.DIV: "DivF"}
    for tag, row in p.exec_order:
        if tag == prog.T_BASE:
            op, dst, a, b, _ = p.base_alu[row]
            emit(op_name[int(op)], [_f(dst)], [_f(a)], [_f(b)])
        elif tag == prog.T_EXT:
            op, dst, a, b, _ = p.ext_alu[row]
            # ext4 values live in 4 consecutive felt cells
            emit(
                op_name[int(op)].replace("F", "E"),
                [_f(dst + i) for i in range(4)],
                [_f(a + i) for i in range(4)],
                [_f(b + i) for i in range(4)],
            )
        elif tag == prog.T_CONST:
            r = p.const[row]
            addr, vals = int(r[0]), [int(v) for v in r[1:5]]
            if int(r[5]):  # send: an immediate the program introduces
                if vals[1] == vals[2] == vals[3] == 0:
                    emit("ImmF", [_f(addr)], [str(vals[0])])
                else:
                    emit("ImmE", [_f(addr + i) for i in range(4)],
                         [str(v) for v in vals])
            else:  # receive: assert the cell equals the constant
                emit("AssertEqF", [_f(addr)], [str(vals[0])])
        elif tag == prog.T_WITNESS:
            addr, _ = p.witness[row]
            emit("WitnessF", [_f(addr)])
        elif tag == prog.T_POSEIDON2:
            r = p.poseidon2[row]
            emit(
                "PermuteKoalaBear",
                [_f(r[i]) for i in range(16)],
                [_f(r[16 + i]) for i in range(16)],
            )
        elif tag == prog.T_SELECT:
            r = p.select[row]
            bit, in1, in2, out1, out2 = (int(v) for v in r[:5])
            emit("SelectF", [_f(out1)], [_f(bit)], [_f(in2)], [_f(in1)])
            emit("SelectF", [_f(out2)], [_f(bit)], [_f(in1)], [_f(in2)])
        elif tag == prog.T_BITS:
            r = p.bits[row]
            emit("Num2BitsF", [_f(r[0])],
                 [_f(r[1 + i]) for i in range(prog.NUM_BITS)])
        elif tag == prog.T_CONVERT:
            r = p.convert[row]
            is_pack, block = int(r[0]), int(r[1])
            felts = [_f(r[2 + i]) for i in range(4)]
            if is_pack:
                emit("CircuitFelts2Ext", [_f(block + i) for i in range(4)], felts)
            else:
                emit("Ext2Felt", felts, [_f(block + i) for i in range(4)])
        elif tag == prog.T_COMMIT_PV:
            addr, pv_index = p.commit_pv[row]
            emit("CommitCommitedValuesDigest", [_f(addr)], [str(int(pv_index))])
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

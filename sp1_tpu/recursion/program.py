"""Recursion VM program representation.

A RecursionProgram is a straight-line SSA program over a write-once
block memory (each cell holds 4 KoalaBear felts; base-field values use
coordinate 0 with zero high limbs). Instruction operands and write
multiplicities are static — fixed at compile time by the builder — so
they live in the *preprocessed* traces of the recursion chips and are
bound by the machine verifying key, exactly like the reference's
RecursionProgram (reference: crates/recursion/executor/src/lib.rs,
instruction set crates/recursion/executor/src/instruction.rs:12-29).

Instruction classes (each is one chip / one row per instruction):
  BaseAlu   op in {ADD, SUB, MUL, DIV} on felts
  ExtAlu    op in {ADD, SUB, MUL, DIV} on ext4 elements
  Const     bind a static value: send (produce a constant cell) or
            receive (assert a computed cell equals the constant — used
            for all assert-eq/assert-zero lowering)
  Witness   produce a cell from the runtime witness stream (proof data)
  Poseidon2 width-16 permutation over felt cells
  Select    bit ? (in2, in1) : (in1, in2) dual block select
  Bits      31-bit LSB-first decomposition of a felt with booleanity,
            recomposition, and < p uniqueness enforced in-AIR
  Convert   pack 4 felts into an ext block / unpack a block to 4 felts
  CommitPV  bind a felt cell to public_values[index]
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

# ALU opcodes
ADD, SUB, MUL, DIV = 0, 1, 2, 3

# Instruction tags (merged execution stream)
T_BASE, T_EXT, T_CONST, T_WITNESS, T_POSEIDON2, T_SELECT, T_BITS, \
    T_CONVERT, T_COMMIT_PV = range(9)

NUM_BITS = 31  # full bit decomposition width (KoalaBear p < 2^31)


@dataclass
class RecursionProgram:
    """Columnar instruction arrays (one row per instruction per chip).

    All addresses/mults are int64 numpy arrays; `exec_order` is the
    merged (tag, chip_row) sequence in program order.
    """

    num_cells: int = 0
    num_witness: int = 0
    num_pvs: int = 0

    # BaseAlu: op, out, in1, in2, mult
    base_alu: np.ndarray = None
    # ExtAlu: op, out, in1, in2, mult
    ext_alu: np.ndarray = None
    # Const: addr, v0..v3, send_mult, recv_mult
    const: np.ndarray = None
    # Witness: addr, mult  (witness stream position = row order)
    witness: np.ndarray = None
    # Poseidon2: in[16], out[16], mult[16]
    poseidon2: np.ndarray = None
    # Select: bit, in1, in2, out1, out2, mult1, mult2
    select: np.ndarray = None
    # Bits: src, out[31], mult[31]
    bits: np.ndarray = None
    # Convert: is_pack, block, f0..f3, block_mult, fmult0..fmult3
    convert: np.ndarray = None
    # CommitPV: addr, pv_index
    commit_pv: np.ndarray = None

    exec_order: list = field(default_factory=list)
    const_msgs: dict = field(default_factory=dict)  # const row -> assert msg

    def counts(self) -> dict:
        return {
            "cells": self.num_cells,
            "witness": self.num_witness,
            "base_alu": len(self.base_alu),
            "ext_alu": len(self.ext_alu),
            "const": len(self.const),
            "poseidon2": len(self.poseidon2),
            "select": len(self.select),
            "bits": len(self.bits),
            "convert": len(self.convert),
            "commit_pv": len(self.commit_pv),
        }

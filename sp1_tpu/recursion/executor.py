"""Recursion VM: execute a RecursionProgram against a witness stream.

The VM fills the write-once block memory in program order and checks the
Const-receive assertions (the runtime mirror of the AIR's memory-lookup
cancellation — a mismatch means the verified proof is invalid).
Reference: crates/recursion/executor/src/lib.rs `Runtime::run`.

The record it returns (cell memory + public values) is everything
tracegen needs: every chip's main-trace values are re-derived from
program operands + memory.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..verifier.backend import P, poseidon2_permute_ints
from . import program as prog
from .program import ADD, DIV, MUL, SUB, NUM_BITS


class RecursionExecutionError(Exception):
    """A Const-receive assertion failed (the witnessed proof is invalid)."""


@dataclass
class RecursionRecord:
    memory: np.ndarray  # (num_cells, 4) canonical int64
    public_values: np.ndarray  # (num_pvs,) canonical int64
    counts: dict


def _ext_mul(a, b):
    a0, a1, a2, a3 = (int(x) for x in a)
    b0, b1, b2, b3 = (int(x) for x in b)
    return (
        (a0 * b0 + 3 * (a1 * b3 + a2 * b2 + a3 * b1)) % P,
        (a0 * b1 + a1 * b0 + 3 * (a2 * b3 + a3 * b2)) % P,
        (a0 * b2 + a1 * b1 + a2 * b0 + 3 * (a3 * b3)) % P,
        (a0 * b3 + a1 * b2 + a2 * b1 + a3 * b0) % P,
    )


def _ext_inv(a):
    """Inverse via Frobenius norm (see verifier.backend._ext_inv_ints)."""
    z = pow(3, (P - 1) // 4, P)
    frob = lambda v, k: tuple((int(c) * pow(z, (k * i) % 4, P)) % P for i, c in enumerate(v))
    conj = _ext_mul(frob(a, 1), _ext_mul(frob(a, 2), frob(a, 3)))
    norm = _ext_mul(a, conj)
    if norm[0] == 0:
        raise RecursionExecutionError("ext division by zero")
    ninv = pow(norm[0], P - 2, P)
    return tuple((c * ninv) % P for c in conj)


def execute(program: prog.RecursionProgram, witness_stream,
            check: bool = True) -> RecursionRecord:
    """witness_stream: list of 4-tuples (canonical ints), in stream order.

    check=False runs SHAPE-ONLY: assertion failures, non-boolean select
    bits and divisions by zero are tolerated (zero results) so a zero
    witness stream still yields a structurally-correct record — used to
    build dummy proofs for shape-keying upper recursion levels
    (reference role: crates/recursion/circuit/src/dummy/)."""
    if len(witness_stream) != program.num_witness:
        raise RecursionExecutionError(
            f"witness stream length {len(witness_stream)} != "
            f"{program.num_witness}"
        )
    mem = np.zeros((max(program.num_cells, 1), 4), np.int64)
    pv = np.zeros(program.num_pvs, np.int64)
    wpos = 0

    base = program.base_alu
    extt = program.ext_alu
    const = program.const
    witness = program.witness
    p2 = program.poseidon2
    select = program.select
    bits = program.bits
    convert = program.convert
    commit_pv = program.commit_pv

    for tag, row in program.exec_order:
        if tag == prog.T_BASE:
            op, out, i1, i2 = (int(x) for x in base[row, :4])
            a = int(mem[i1, 0])
            b = int(mem[i2, 0])
            if op == ADD:
                v = (a + b) % P
            elif op == SUB:
                v = (a - b) % P
            elif op == MUL:
                v = (a * b) % P
            else:  # DIV
                if b == 0:
                    if check:
                        raise RecursionExecutionError("felt division by zero")
                    v = 0
                else:
                    v = (a * pow(b, P - 2, P)) % P
            mem[out, 0] = v
        elif tag == prog.T_EXT:
            op, out, i1, i2 = (int(x) for x in extt[row, :4])
            a = mem[i1]
            b = mem[i2]
            if op == ADD:
                mem[out] = (a + b) % P
            elif op == SUB:
                mem[out] = (a - b) % P
            elif op == MUL:
                mem[out] = _ext_mul(a, b)
            else:  # DIV
                try:
                    mem[out] = _ext_mul(a, _ext_inv(b))
                except RecursionExecutionError:
                    if check:
                        raise
                    mem[out] = (0, 0, 0, 0)
        elif tag == prog.T_CONST:
            addr = int(const[row, 0])
            vals = const[row, 1:5]
            recv = int(const[row, 6])
            if recv:
                if check and not np.array_equal(mem[addr], vals):
                    msg = program.const_msgs.get(row, "")
                    raise RecursionExecutionError(
                        f"assertion failed ({msg}): cell {addr} = "
                        f"{mem[addr].tolist()} != {vals.tolist()}"
                    )
            else:
                mem[addr] = vals
        elif tag == prog.T_WITNESS:
            addr = int(witness[row, 0])
            mem[addr] = witness_stream[wpos]
            wpos += 1
        elif tag == prog.T_POSEIDON2:
            ins = [int(mem[int(a), 0]) for a in p2[row, :16]]
            outs = poseidon2_permute_ints(ins)
            for a, v in zip(p2[row, 16:32], outs):
                mem[int(a), 0] = v
        elif tag == prog.T_SELECT:
            b_a, i1, i2, o1, o2 = (int(x) for x in select[row, :5])
            bit = int(mem[b_a, 0])
            if bit not in (0, 1):
                if check:
                    raise RecursionExecutionError("select bit not boolean")
                bit = 0
            mem[o1] = mem[i2] if bit else mem[i1]
            mem[o2] = mem[i1] if bit else mem[i2]
        elif tag == prog.T_BITS:
            src = int(bits[row, 0])
            v = int(mem[src, 0])
            for j in range(NUM_BITS):
                mem[int(bits[row, 1 + j]), 0] = (v >> j) & 1
        elif tag == prog.T_CONVERT:
            is_pack = int(convert[row, 0])
            blk = int(convert[row, 1])
            felts = [int(x) for x in convert[row, 2:6]]
            if is_pack:
                mem[blk] = [int(mem[f, 0]) for f in felts]
            else:
                for i, f in enumerate(felts):
                    mem[f, 0] = mem[blk, i]
        elif tag == prog.T_COMMIT_PV:
            addr, idx = (int(x) for x in commit_pv[row, :2])
            if check and np.any(mem[addr, 1:]):
                raise RecursionExecutionError("public value not a felt")
            pv[idx] = mem[addr, 0]
        else:
            raise RecursionExecutionError(f"unknown tag {tag}")

    return RecursionRecord(memory=mem, public_values=pv, counts=program.counts())

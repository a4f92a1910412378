"""Trace generation for the RecursionAir from a program + execution record.

Preprocessed traces are pure functions of the RecursionProgram (committed
at setup → the recursion vk); main traces are gathered from the executed
record's cell memory (reference: per-chip generate_preprocessed_trace /
generate_trace in crates/recursion/machine/src/chips/)."""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..field import koalabear as kb
from ..verifier.backend import (
    EXTERNAL_RC,
    INTERNAL_DIAG,
    INTERNAL_RC,
    ROUNDS_F,
    ROUNDS_P,
    WIDTH,
)
from .program import ADD, DIV, MUL, NUM_BITS, SUB

P = kb.P


def _monty(arr):
    return ((np.asarray(arr, np.uint64) << 32) % P).astype(np.uint32)


def _pad(rows: np.ndarray, mlrc: int):
    """(n, W) canonical -> ((2^mlrc, W) monty jnp, max(n, 1)).

    Height is at least 1: an all-zero row satisfies every chip's
    constraints (all selectors/multiplicities zero) — Poseidon2 rows are
    special-cased by the callers to hold a real permutation of zeros."""
    n, w = rows.shape
    size = 1 << mlrc
    assert n <= size, f"{n} rows exceed 2^{mlrc}"
    out = np.zeros((size, w), np.uint64)
    out[:n] = rows
    return jnp.asarray(_monty(out)), max(n, 1)


def _p2_forward_states(inputs: np.ndarray) -> np.ndarray:
    """(n, 16) canonical -> (n, 28, 16) state after each loop round."""
    n = inputs.shape[0]
    s = inputs.astype(np.uint64) % P
    out = np.zeros((n, ROUNDS_F + ROUNDS_P, WIDTH), np.uint64)

    def ext_layer(s):
        s = s.copy()
        for g in range(0, WIDTH, 4):
            x0, x1, x2, x3 = (s[:, g + i].copy() for i in range(4))
            s[:, g] = (2 * x0 + 3 * x1 + x2 + x3) % P
            s[:, g + 1] = (x0 + 2 * x1 + 3 * x2 + x3) % P
            s[:, g + 2] = (x0 + x1 + 2 * x2 + 3 * x3) % P
            s[:, g + 3] = (3 * x0 + x1 + x2 + 2 * x3) % P
        for l in range(4):
            tot = s[:, l::4].sum(axis=1) % P
            s[:, l::4] = (s[:, l::4] + tot[:, None]) % P
        return s

    def cube(x):
        return ((x * x) % P) * x % P

    s = ext_layer(s)
    idx = 0
    half = ROUNDS_F // 2
    for r in range(half):
        rc = np.asarray(EXTERNAL_RC[r], np.uint64)
        s = ext_layer(cube((s + rc) % P))
        out[:, idx] = s
        idx += 1
    diag = np.asarray(INTERNAL_DIAG, np.uint64)
    for r in range(ROUNDS_P):
        s = s.copy()
        s[:, 0] = cube((s[:, 0] + INTERNAL_RC[r]) % P)
        tot = s.sum(axis=1) % P
        s = ((s * diag) % P + tot[:, None]) % P
        out[:, idx] = s
        idx += 1
    for r in range(half, ROUNDS_F):
        rc = np.asarray(EXTERNAL_RC[r], np.uint64)
        s = ext_layer(cube((s + rc) % P))
        out[:, idx] = s
        idx += 1
    return out


def _alu_prep(instrs: np.ndarray) -> np.ndarray:
    """[op,out,in1,in2,mult] -> [flags4,out,in1,in2,mult,is_real]."""
    n = len(instrs)
    rows = np.zeros((n, 9), np.uint64)
    op = instrs[:, 0]
    for i, code in enumerate((ADD, SUB, MUL, DIV)):
        rows[:, i] = op == code
    rows[:, 4:8] = instrs[:, 1:5]
    rows[:, 8] = 1
    return rows


def preprocessed_traces(program, mlrc: int) -> dict:
    """name -> ((2^mlrc, Wp) monty jnp, height)."""
    out = {}
    out["RecBaseAlu"] = _pad(_alu_prep(program.base_alu.astype(np.uint64)), mlrc)
    out["RecExtAlu"] = _pad(_alu_prep(program.ext_alu.astype(np.uint64)), mlrc)
    out["RecConst"] = _pad(program.const.astype(np.uint64), mlrc)
    out["RecWitness"] = _pad(program.witness.astype(np.uint64), mlrc)

    p2 = program.poseidon2.astype(np.uint64)
    n = len(p2)
    rows = np.zeros((max(n, 1), 49), np.uint64)
    if n:
        rows[:n, :48] = p2
        rows[:n, 48] = 1
    out["RecPoseidon2"] = _pad(rows, mlrc)

    sel = program.select.astype(np.uint64)
    rows = np.zeros((len(sel), 8), np.uint64)
    rows[:, :7] = sel
    rows[:, 7] = 1
    out["RecSelect"] = _pad(rows, mlrc)

    bits = program.bits.astype(np.uint64)
    rows = np.zeros((len(bits), 2 * NUM_BITS + 2), np.uint64)
    rows[:, : 2 * NUM_BITS + 1] = bits
    rows[:, 2 * NUM_BITS + 1] = 1
    out["RecBits"] = _pad(rows, mlrc)

    conv = program.convert.astype(np.uint64)
    rows = np.zeros((len(conv), 12), np.uint64)
    rows[:, :11] = conv
    rows[:, 11] = 1
    out["RecConvert"] = _pad(rows, mlrc)

    pv = program.commit_pv.astype(np.uint64)
    rows = np.zeros((len(pv), 3), np.uint64)
    rows[:, :2] = pv
    rows[:, 2] = 1
    out["RecPublicValues"] = _pad(rows, mlrc)
    return out


def main_traces(program, record, mlrc: int) -> dict:
    """name -> ((2^mlrc, W) monty jnp, height)."""
    mem = record.memory.astype(np.uint64)  # (cells, 4) canonical
    out = {}

    ba = program.base_alu
    rows = np.zeros((len(ba), 3), np.uint64)
    if len(ba):
        rows[:, 0] = mem[ba[:, 2], 0]
        rows[:, 1] = mem[ba[:, 3], 0]
        rows[:, 2] = mem[ba[:, 1], 0]
    out["RecBaseAlu"] = _pad(rows, mlrc)

    ea = program.ext_alu
    rows = np.zeros((len(ea), 12), np.uint64)
    if len(ea):
        rows[:, 0:4] = mem[ea[:, 2]]
        rows[:, 4:8] = mem[ea[:, 3]]
        rows[:, 8:12] = mem[ea[:, 1]]
    out["RecExtAlu"] = _pad(rows, mlrc)

    out["RecConst"] = _pad(np.zeros((len(program.const), 1), np.uint64), mlrc)

    wit = program.witness
    rows = np.zeros((len(wit), 4), np.uint64)
    if len(wit):
        rows[:] = mem[wit[:, 0]]
    out["RecWitness"] = _pad(rows, mlrc)

    p2 = program.poseidon2
    n = len(p2)
    rows = np.zeros((max(n, 1), 16 + 16 * (ROUNDS_F + ROUNDS_P)), np.uint64)
    inputs = (
        mem[p2[:, :16], 0] if n else np.zeros((1, 16), np.uint64)
    )
    states = _p2_forward_states(inputs)
    rows[:, :16] = inputs
    rows[:, 16:] = states.reshape(len(states), -1)
    out["RecPoseidon2"] = _pad(rows, mlrc)

    sel = program.select
    rows = np.zeros((len(sel), 17), np.uint64)
    if len(sel):
        rows[:, 0] = mem[sel[:, 0], 0]
        rows[:, 1:5] = mem[sel[:, 1]]
        rows[:, 5:9] = mem[sel[:, 2]]
        rows[:, 9:13] = mem[sel[:, 3]]
        rows[:, 13:17] = mem[sel[:, 4]]
    out["RecSelect"] = _pad(rows, mlrc)

    bits = program.bits
    rows = np.zeros((len(bits), NUM_BITS + 6), np.uint64)
    if len(bits):
        b = mem[bits[:, 1 : 1 + NUM_BITS], 0]  # (n, 31)
        rows[:, :NUM_BITS] = b
        h = (b[:, 24] * b[:, 25]) % P
        rows[:, NUM_BITS] = h
        for k in range(1, 6):
            h = (h * b[:, 25 + k]) % P
            rows[:, NUM_BITS + k] = h
    out["RecBits"] = _pad(rows, mlrc)

    conv = program.convert
    rows = np.zeros((len(conv), 4), np.uint64)
    if len(conv):
        rows[:] = mem[conv[:, 1]]
    out["RecConvert"] = _pad(rows, mlrc)

    pv = program.commit_pv
    rows = np.zeros((len(pv), 1), np.uint64)
    if len(pv):
        rows[:, 0] = mem[pv[:, 0], 0]
    out["RecPublicValues"] = _pad(rows, mlrc)
    return out


def min_mlrc(program) -> int:
    """Smallest max_log_row_count that fits every chip's height."""
    heights = [
        len(program.base_alu), len(program.ext_alu), len(program.const),
        len(program.witness), max(len(program.poseidon2), 1),
        len(program.select), len(program.bits), len(program.convert),
        len(program.commit_pv),
    ]
    m = max(heights + [1])
    return max((m - 1).bit_length(), 1)

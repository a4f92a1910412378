"""Symbolic backend: records verifier-protocol operations as a
RecursionProgram.

This is the recursion "circuit compiler": the independent verifier
(sp1_tpu.verifier) is written against an abstract backend protocol; run
over this backend, every felt/ext handle becomes a write-once memory
cell and every operation appends a recursion-VM instruction. The result
plays the role of the reference's Builder DSL + AsmCompiler pipeline
(reference: crates/recursion/compiler/src/circuit/compiler.rs,
crates/recursion/circuit/) collapsed into one pass: the verifier code
itself is the circuit description.

Handles are integer cell addresses. Read multiplicities are counted
during recording and written into the program's preprocessed columns at
finalize() (the reference compiler tracks the same counts during
register allocation).

Witness values (proof data) enter through `witness_felt`/`witness_ext`:
the SAME lift traversal (sp1_tpu.verifier.lift) that builds the
symbolic proof structure also defines the runtime witness stream order
(see WitnessWriter).
"""

from __future__ import annotations

import numpy as np

from ..verifier.backend import (
    P,
    VerificationError,
    WIDTH,
    _ext_inv_ints,
    _ext_mul_ints,
    poseidon2_permute_ints,
)
from . import program as prog
from .program import ADD, DIV, MUL, SUB, NUM_BITS


class SymbolicBackend:
    """Records a RecursionProgram; implements the verifier backend API."""

    def __init__(self, num_pvs: int = 32):
        self.num_pvs = num_pvs
        self._n = 0  # next cell address
        self._reads = {}  # addr -> read count
        self._base = []  # [op, out, in1, in2]
        self._ext = []
        self._const = []  # [addr, v0..v3, is_send, is_recv_placeholder]
        self._const_recv = []  # [addr, v0..v3]
        self._witness = []  # [addr]
        self._poseidon2 = []  # [in0..in15, out0..out15]
        self._select = []  # [bit, in1, in2, out1, out2]
        self._bits = []  # [src, out0..out30]
        self._convert = []  # [is_pack, block, f0..f3]
        self._commit_pv = []  # [addr, pv_index]
        self._exec = []  # (tag, chip_row)
        self._const_cache = {}  # value-tuple -> addr
        self._const_val = {}  # const addr -> value-tuple (for folding)
        self._const_msgs = {}  # const row -> assert message (recv rows)
        self._committed = 0

    # -- internals ----------------------------------------------------------
    def _cell(self) -> int:
        a = self._n
        self._n += 1
        return a

    def _read(self, addr: int) -> int:
        self._reads[addr] = self._reads.get(addr, 0) + 1
        return addr

    def _emit(self, tag: int, rows: list, row: list) -> int:
        rows.append(row)
        self._exec.append((tag, len(rows) - 1))
        return len(rows) - 1

    def _const_block(self, vals4) -> int:
        key = tuple(int(v) % P for v in vals4)
        addr = self._const_cache.get(key)
        if addr is None:
            addr = self._cell()
            self._emit(prog.T_CONST, self._const, [addr, *key, 1, 0])
            self._const_cache[key] = addr
            self._const_val[addr] = key
        return addr

    def _base_alu(self, op, a, b) -> int:
        ca, cb = self._const_val.get(a), self._const_val.get(b)
        if ca is not None and cb is not None:
            # constant folding: compute at compile time, emit nothing
            x, y = ca[0], cb[0]
            if op == ADD:
                v = (x + y) % P
            elif op == SUB:
                v = (x - y) % P
            elif op == MUL:
                v = (x * y) % P
            else:
                if y == 0:
                    raise VerificationError("constant division by zero")
                v = (x * pow(y, P - 2, P)) % P
            return self._const_block((v, 0, 0, 0))
        out = self._cell()
        self._emit(
            prog.T_BASE, self._base, [op, out, self._read(a), self._read(b)]
        )
        return out

    def _ext_alu(self, op, a, b) -> int:
        ca, cb = self._const_val.get(a), self._const_val.get(b)
        if ca is not None and cb is not None:
            if op == ADD:
                v = tuple((x + y) % P for x, y in zip(ca, cb))
            elif op == SUB:
                v = tuple((x - y) % P for x, y in zip(ca, cb))
            elif op == MUL:
                v = _ext_mul_ints(ca, cb)
            else:
                v = _ext_mul_ints(ca, _ext_inv_ints(cb))
            return self._const_block(v)
        out = self._cell()
        self._emit(
            prog.T_EXT, self._ext, [op, out, self._read(a), self._read(b)]
        )
        return out

    # -- constructors -------------------------------------------------------
    def felt(self, v: int):
        return self._const_block((int(v) % P, 0, 0, 0))

    def ext(self, coeffs):
        c = [int(x) % P for x in coeffs]
        assert len(c) == 4
        return self._const_block(c)

    def witness_felt(self, _v=None):
        """A runtime-witnessed felt cell (value from the witness stream)."""
        addr = self._cell()
        self._emit(prog.T_WITNESS, self._witness, [addr])
        return addr

    def witness_ext(self, _v=None):
        addr = self._cell()
        self._emit(prog.T_WITNESS, self._witness, [addr])
        return addr

    def ext_from_felt(self, f):
        # felt cells are blocks with zero high limbs: free recast
        return f

    def ext_from_felts(self, fs):
        assert len(fs) == 4
        cs = [self._const_val.get(f) for f in fs]
        if all(c is not None for c in cs):
            return self._const_block(tuple(c[0] for c in cs))
        out = self._cell()
        self._emit(
            prog.T_CONVERT,
            self._convert,
            [1, out] + [self._read(f) for f in fs],
        )
        return out

    def ext_coeffs(self, e):
        c = self._const_val.get(e)
        if c is not None:
            return [self._const_block((v, 0, 0, 0)) for v in c]
        outs = [self._cell() for _ in range(4)]
        self._emit(
            prog.T_CONVERT, self._convert, [0, self._read(e)] + outs
        )
        return outs

    def zero_ext(self):
        return self._const_block((0, 0, 0, 0))

    def one_ext(self):
        return self._const_block((1, 0, 0, 0))

    # -- felt arithmetic ----------------------------------------------------
    def fadd(self, a, b):
        return self._base_alu(ADD, a, b)

    def fsub(self, a, b):
        return self._base_alu(SUB, a, b)

    def fmul(self, a, b):
        return self._base_alu(MUL, a, b)

    def fneg(self, a):
        return self._base_alu(SUB, self.felt(0), a)

    def finv(self, a):
        return self._base_alu(DIV, self.felt(1), a)

    # -- ext arithmetic -----------------------------------------------------
    def eadd(self, a, b):
        return self._ext_alu(ADD, a, b)

    def esub(self, a, b):
        return self._ext_alu(SUB, a, b)

    def emul(self, a, b):
        return self._ext_alu(MUL, a, b)

    def eneg(self, a):
        return self._ext_alu(SUB, self.zero_ext(), a)

    def einv(self, a):
        return self._ext_alu(DIV, self.one_ext(), a)

    def emul_f(self, e, f):
        # felt cells embed into ext as (f,0,0,0): plain ext mul
        return self._ext_alu(MUL, e, f)

    def emul_const(self, e, w: int):
        return self._ext_alu(MUL, e, self.ext((w, 0, 0, 0)))

    # -- assertions ---------------------------------------------------------
    def _assert_const(self, addr, vals4, msg: str = ""):
        """Bind cell `addr` to the static block vals4 (Const receive)."""
        c = self._const_val.get(addr)
        if c is not None:
            # compile-time check: the assertion involves no witness data
            if c != tuple(int(v) % P for v in vals4):
                raise VerificationError(
                    f"static assertion failed ({msg}): {c} != {tuple(vals4)}"
                )
            return
        self._read(addr)
        row = self._emit(
            prog.T_CONST,
            self._const,
            [addr, *[int(v) % P for v in vals4], 0, 1],
        )
        if not msg:
            import traceback

            fr = traceback.extract_stack(limit=4)[0]
            msg = f"{fr.filename.rsplit('/', 1)[-1]}:{fr.lineno}"
        self._const_msgs[row] = msg

    def assert_f_eq(self, a, b, msg: str = ""):
        t = self.fsub(a, b)
        self._assert_const(t, (0, 0, 0, 0), msg)

    def assert_e_eq(self, a, b, msg: str = ""):
        t = self.esub(a, b)
        self._assert_const(t, (0, 0, 0, 0), msg)

    def assert_f_zero(self, a, msg: str = ""):
        self._assert_const(a, (0, 0, 0, 0), msg)

    def assert_e_zero(self, a, msg: str = ""):
        self._assert_const(a, (0, 0, 0, 0), msg)

    def assert_bool(self, f, msg: str = ""):
        t = self.fmul(f, f)
        # t - f == 0
        self.assert_f_eq(t, f, msg)

    # -- bit operations -----------------------------------------------------
    def num2bits(self, f, nbits: int):
        c = self._const_val.get(f)
        if c is not None:
            return [
                self._const_block(((c[0] >> i) & 1, 0, 0, 0))
                for i in range(nbits)
            ]
        outs = [self._cell() for _ in range(NUM_BITS)]
        self._emit(prog.T_BITS, self._bits, [self._read(f)] + outs)
        return outs[:nbits]

    def bits2num(self, bits):
        acc = self.felt(0)
        for i, b in enumerate(bits):
            acc = self.fadd(acc, self.fmul(b, self.felt(1 << i)))
        return acc

    def assert_low_bits_zero(self, f, k: int, msg: str = ""):
        bits = self.num2bits(f, NUM_BITS)
        for b in bits[:k]:
            self.assert_f_zero(b)

    # -- selection ----------------------------------------------------------
    def select_f(self, bit, t, f):
        """bit ? t : f."""
        cb = self._const_val.get(bit)
        if cb is not None:
            if cb[0] not in (0, 1):
                raise VerificationError("constant select bit not boolean")
            return t if cb[0] else f
        out1 = self._cell()
        out2 = self._cell()
        self._emit(
            prog.T_SELECT,
            self._select,
            [self._read(bit), self._read(f), self._read(t), out1, out2],
        )
        return out1  # out1 = bit ? in2(=t) : in1(=f)

    def select_e(self, bit, t, f):
        return self.select_f(bit, t, f)

    # -- hashing ------------------------------------------------------------
    def poseidon2(self, state):
        assert len(state) == WIDTH
        cs = [self._const_val.get(s) for s in state]
        if all(c is not None for c in cs):
            out_vals = poseidon2_permute_ints([c[0] for c in cs])
            return [self._const_block((v, 0, 0, 0)) for v in out_vals]
        outs = [self._cell() for _ in range(WIDTH)]
        self._emit(
            prog.T_POSEIDON2,
            self._poseidon2,
            [self._read(s) for s in state] + outs,
        )
        return outs

    # -- public values ------------------------------------------------------
    def commit_public_value(self, f):
        idx = self._committed
        assert idx < self.num_pvs
        self._committed += 1
        self._read(f)
        self._emit(prog.T_COMMIT_PV, self._commit_pv, [f, idx])
        return idx

    def commit_public_values(self, fs):
        for f in fs:
            self.commit_public_value(f)

    # -- concrete escape hatch ---------------------------------------------
    def felt_value(self, f) -> int:
        raise VerificationError(
            "felt_value is not available on the symbolic backend"
        )

    # -- finalize -----------------------------------------------------------
    def finalize(self) -> prog.RecursionProgram:
        """Resolve read multiplicities into the columnar program."""
        rd = self._reads

        def mult(addr):
            return rd.get(addr, 0)

        base = np.array(
            [[op, o, i1, i2, mult(o)] for op, o, i1, i2 in self._base],
            dtype=np.int64,
        ).reshape(-1, 5)
        ext = np.array(
            [[op, o, i1, i2, mult(o)] for op, o, i1, i2 in self._ext],
            dtype=np.int64,
        ).reshape(-1, 5)
        const = np.array(
            [
                [a, v0, v1, v2, v3, mult(a) if s else 0, r]
                for a, v0, v1, v2, v3, s, r in self._const
            ],
            dtype=np.int64,
        ).reshape(-1, 7)
        witness = np.array(
            [[a, mult(a)] for (a,) in self._witness], dtype=np.int64
        ).reshape(-1, 2)
        p2 = np.array(
            [row[:16] + row[16:] + [mult(a) for a in row[16:]]
             for row in self._poseidon2],
            dtype=np.int64,
        ).reshape(-1, 48)
        select = np.array(
            [
                [b, i1, i2, o1, o2, mult(o1), mult(o2)]
                for b, i1, i2, o1, o2 in self._select
            ],
            dtype=np.int64,
        ).reshape(-1, 7)
        bits = np.array(
            [row + [mult(a) for a in row[1:]] for row in self._bits],
            dtype=np.int64,
        ).reshape(-1, 1 + 2 * NUM_BITS)
        convert = np.array(
            [
                [isp, blk, f0, f1, f2, f3,
                 mult(blk) if isp else 0]
                + ([0, 0, 0, 0] if isp else [mult(f0), mult(f1), mult(f2), mult(f3)])
                for isp, blk, f0, f1, f2, f3 in self._convert
            ],
            dtype=np.int64,
        ).reshape(-1, 11)
        commit_pv = np.array(self._commit_pv, dtype=np.int64).reshape(-1, 2)

        out = prog.RecursionProgram(
            num_cells=self._n,
            num_witness=len(self._witness),
            num_pvs=self.num_pvs,
            base_alu=base,
            ext_alu=ext,
            const=const,
            witness=witness,
            poseidon2=p2,
            select=select,
            bits=bits,
            convert=convert,
            commit_pv=commit_pv,
            exec_order=self._exec,
        )
        out.const_msgs = self._const_msgs
        return out


class WitnessWriter:
    """Concrete backend shim that records the witness stream.

    Run the same lift traversal used at build time with this writer to
    produce the runtime witness values in stream order.
    """

    def __init__(self):
        self.stream = []  # list of 4-int blocks

    def witness_felt(self, v):
        self.stream.append((int(v) % P, 0, 0, 0))
        return None

    def witness_ext(self, v):
        c = [int(x) % P for x in v]
        assert len(c) == 4
        self.stream.append(tuple(c))
        return None

"""Constraint tape IR: chip constraints captured once, executed many times.

A chip's `eval(folder)` is traced ONCE with a symbolic ops namespace into
an SSA tape of base-field instructions (constraint expressions never touch
the extension field: alpha enters only through the final Horner fold,
which is replaced here by an equivalent alpha-powers weighted sum).
The tape is then optimized (constant folding, algebraic identities, CSE,
dead-code elimination), levelized by dependency depth, and register
allocated, producing a compact execution plan.

Executors:
  * `run_base`  — vectorized numpy over base-field row values (sumcheck
    round 1, where trace tables are still base field),
  * `run_ext`   — vectorized numpy over ext4 row values (later rounds,
    after fix_last folds with extension challenges).

Both execute one numpy fancy-indexed op per (level, opcode) group instead
of one python call per expression node — this is the host analogue of the
reference GPU's constraint-bytecode interpreter
(sp1-gpu/crates/air/src/ir/, crates/core/compiler/src/ir/), and the same
plan later drives the device interpreter.

The Horner accumulation acc = acc*alpha + c_i over constraints c_0..c_{C-1}
equals sum_i alpha^(C-1-i) * c_i, computed exactly with 16-bit-limb-split
float64 BLAS matmuls (`mod_matmul`).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..field import koalabear as kb

P = kb.P
_W4 = 3  # ext4 binomial: x^4 = 3

OP_ADD, OP_SUB, OP_MUL, OP_NEG, OP_SCALE = 0, 1, 2, 3, 4
_OP_NAMES = {OP_ADD: "add", OP_SUB: "sub", OP_MUL: "mul", OP_NEG: "neg",
             OP_SCALE: "scale"}


# ---------------------------------------------------------------------------
# Symbolic trace
# ---------------------------------------------------------------------------


class _Sym:
    """Value handle produced by the tape builder ops namespace."""

    __slots__ = ("tape", "node")

    def __init__(self, tape, node):
        self.tape = tape
        self.node = node


class TapeBuilder:
    """Ops namespace that records instead of computing.

    Nodes are tuples:
      ('main', i) / ('prep', i) / ('pv', i)  — inputs
      ('const', v)                           — base-field immediate
      (op, a, b) with op in OP_*             — a, b node indices; for
                                               OP_SCALE b is the immediate.
    """

    def __init__(self):
        self.nodes = []  # node tuples
        self._cse = {}

    # -- node creation ------------------------------------------------------
    def _node(self, key):
        idx = self._cse.get(key)
        if idx is None:
            idx = len(self.nodes)
            self.nodes.append(key)
            self._cse[key] = idx
        return idx

    def _wrap(self, idx):
        return _Sym(self, idx)

    def _idx(self, v):
        if isinstance(v, _Sym):
            return v.node
        raise TypeError(f"non-symbolic value in tape trace: {v!r}")

    def _const_of(self, idx):
        n = self.nodes[idx]
        return n[1] if n[0] == "const" else None

    # -- inputs --------------------------------------------------------------
    def input_main(self, i):
        return self._wrap(self._node(("main", i)))

    def input_prep(self, i):
        return self._wrap(self._node(("prep", i)))

    def input_pv(self, i):
        return self._wrap(self._node(("pv", i)))

    # -- ops interface (mirrors NpOps / JnpOps) -------------------------------
    def const(self, v: int):
        return self._wrap(self._node(("const", int(v) % P)))

    def zero(self):
        return self.const(0)

    def one(self):
        return self.const(1)

    def add(self, a, b):
        ia, ib = self._idx(a), self._idx(b)
        ca, cb = self._const_of(ia), self._const_of(ib)
        if ca is not None and cb is not None:
            return self.const(ca + cb)
        if ca == 0:
            return self._wrap(ib)
        if cb == 0:
            return self._wrap(ia)
        if ia > ib:  # commutative normal form for CSE
            ia, ib = ib, ia
        return self._wrap(self._node((OP_ADD, ia, ib)))

    def sub(self, a, b):
        ia, ib = self._idx(a), self._idx(b)
        ca, cb = self._const_of(ia), self._const_of(ib)
        if ca is not None and cb is not None:
            return self.const(ca - cb)
        if cb == 0:
            return self._wrap(ia)
        if ia == ib:
            return self.const(0)
        if ca == 0:
            return self._wrap(self._node((OP_NEG, ib, 0)))
        return self._wrap(self._node((OP_SUB, ia, ib)))

    def mul(self, a, b):
        ia, ib = self._idx(a), self._idx(b)
        ca, cb = self._const_of(ia), self._const_of(ib)
        if ca is not None and cb is not None:
            return self.const(ca * cb)
        if ca is not None:
            return self._scale_idx(ib, ca)
        if cb is not None:
            return self._scale_idx(ia, cb)
        if ia > ib:
            ia, ib = ib, ia
        return self._wrap(self._node((OP_MUL, ia, ib)))

    def neg(self, a):
        ia = self._idx(a)
        ca = self._const_of(ia)
        if ca is not None:
            return self.const(-ca)
        return self._wrap(self._node((OP_NEG, ia, 0)))

    def _scale_idx(self, ia, w):
        w = int(w) % P
        if w == 0:
            return self.const(0)
        if w == 1:
            return self._wrap(ia)
        ca = self._const_of(ia)
        if ca is not None:
            return self.const(ca * w)
        if w == P - 1:
            return self._wrap(self._node((OP_NEG, ia, 0)))
        return self._wrap(self._node((OP_SCALE, ia, w)))

    def scale_base(self, a, w: int):
        return self._scale_idx(self._idx(a), w)


class TapeFolder:
    """ConstraintFolder look-alike that records constraint roots."""

    def __init__(self, ops: TapeBuilder, preprocessed, main, public_values,
                 alpha=None):
        self.ops = ops
        self.preprocessed = preprocessed
        self.main = main
        self.public_values = public_values
        self.alpha = alpha
        self.roots = []
        self.num_constraints = 0

    def assert_zero(self, e):
        self.roots.append(self.ops._idx(e))
        self.num_constraints += 1

    def assert_eq(self, a, b):
        self.assert_zero(self.ops.sub(a, b))

    def assert_bool(self, a):
        self.assert_zero(self.ops.mul(a, self.ops.sub(a, self.ops.one())))


# ---------------------------------------------------------------------------
# Compilation: DCE -> levelize -> register allocation
# ---------------------------------------------------------------------------


@dataclass
class CompiledTape:
    n_regs: int
    # input loads: (source indices, destination registers)
    main_cols: np.ndarray
    main_regs: np.ndarray
    prep_cols: np.ndarray
    prep_regs: np.ndarray
    pv_idx: np.ndarray
    pv_regs: np.ndarray
    const_vals: np.ndarray
    const_regs: np.ndarray
    # levels: list of (op, dst (L,), a (L,), b (L,))  [b holds imm for SCALE]
    # with op == OP_OUT meaning out[dst] = regs[a] (constraint streaming).
    levels: list
    n_constraints: int
    n_ops: int


OP_OUT = 5  # pseudo-op: copy register -> constraint output row


def compile_tape(builder: TapeBuilder, roots: list[int]) -> CompiledTape:
    nodes = builder.nodes

    # ---- dead-code elimination (iterative DFS from roots) ----
    live = set()
    stack = list(dict.fromkeys(roots))
    while stack:
        i = stack.pop()
        if i in live:
            continue
        live.add(i)
        n = nodes[i]
        if isinstance(n[0], int):
            stack.append(n[1])
            if n[0] in (OP_ADD, OP_SUB, OP_MUL):
                stack.append(n[2])
    order = sorted(live)

    # ---- depth levelization ----
    depth = {}
    for i in order:
        n = nodes[i]
        if not isinstance(n[0], int):
            depth[i] = 0
        elif n[0] in (OP_NEG, OP_SCALE):
            depth[i] = depth[n[1]] + 1
        else:
            depth[i] = max(depth[n[1]], depth[n[2]]) + 1

    # Constraint roots are copied to the output buffer at their production
    # level (+1), so they do NOT pin registers to the end of the tape.
    root_positions: dict[int, list[int]] = {}
    for pos, r in enumerate(roots):
        root_positions.setdefault(r, []).append(pos)

    # ---- last-use for register reuse ----
    last_use = {i: depth[i] for i in order}
    for i in order:
        n = nodes[i]
        if isinstance(n[0], int):
            d = depth[i]
            last_use[n[1]] = max(last_use[n[1]], d)
            if n[0] in (OP_ADD, OP_SUB, OP_MUL):
                last_use[n[2]] = max(last_use[n[2]], d)

    # ---- register allocation, level by level ----
    reg_of = {}
    free: list[int] = []
    n_regs = 0
    max_depth = max(depth.values()) if depth else 0
    by_level: dict[int, list[int]] = {}
    for i in order:
        by_level.setdefault(depth[i], []).append(i)
    frees_at: dict[int, list[int]] = {}
    for i in order:
        frees_at.setdefault(last_use[i], []).append(i)

    loads = {"main": ([], []), "prep": ([], []), "pv": ([], []),
             "const": ([], [])}
    levels = []
    n_ops = 0
    for d in range(max_depth + 1):
        items = by_level.get(d, [])
        for i in items:
            reg = free.pop() if free else n_regs
            if reg == n_regs:
                n_regs += 1
            reg_of[i] = reg
            n = nodes[i]
            if not isinstance(n[0], int):
                src, reg_list = loads[n[0]]
                src.append(n[1])
                reg_list.append(reg)
        groups: dict[int, list] = {}
        for i in items:
            n = nodes[i]
            if isinstance(n[0], int):
                op = n[0]
                a = reg_of[n[1]]
                b = reg_of[n[2]] if op in (OP_ADD, OP_SUB, OP_MUL) else (
                    n[2] if op == OP_SCALE else 0
                )
                groups.setdefault(op, []).append((reg_of[i], a, b))
                n_ops += 1
        for op, triples in sorted(groups.items()):
            dst = np.array([t[0] for t in triples], np.intp)
            a = np.array([t[1] for t in triples], np.intp)
            b = np.array([t[2] for t in triples], np.uint64 if op == OP_SCALE
                         else np.intp)
            levels.append((op, dst, a, b))
        # stream constraint values produced at this level to the output
        out_pos, out_src = [], []
        for i in items:
            for pos in root_positions.get(i, ()):
                out_pos.append(pos)
                out_src.append(reg_of[i])
        if out_pos:
            levels.append(
                (OP_OUT, np.array(out_pos, np.intp), np.array(out_src, np.intp),
                 None)
            )
        # registers whose value dies at this level are reusable next level
        for i in frees_at.get(d, ()):
            if i in reg_of:
                free.append(reg_of[i])

    return CompiledTape(
        n_regs=n_regs,
        main_cols=np.array(loads["main"][0], np.intp),
        main_regs=np.array(loads["main"][1], np.intp),
        prep_cols=np.array(loads["prep"][0], np.intp),
        prep_regs=np.array(loads["prep"][1], np.intp),
        pv_idx=np.array(loads["pv"][0], np.intp),
        pv_regs=np.array(loads["pv"][1], np.intp),
        const_vals=np.array(loads["const"][0], np.uint64),
        const_regs=np.array(loads["const"][1], np.intp),
        levels=levels,
        n_constraints=len(roots),
        n_ops=n_ops,
    )


def trace_chip_tape(chip, n_pv: int = 200) -> CompiledTape:
    """Build (and cache on the chip) the compiled constraint tape."""
    cached = getattr(chip, "_compiled_tape", None)
    if cached is not None:
        return cached
    b = TapeBuilder()
    folder = TapeFolder(
        b,
        [b.input_prep(i) for i in range(chip.preprocessed_width)],
        [b.input_main(i) for i in range(chip.width)],
        [b.input_pv(i) for i in range(n_pv)],
        alpha=None,
    )
    chip.eval(folder)
    tape = compile_tape(b, folder.roots)
    try:
        chip._compiled_tape = tape
    except AttributeError:
        pass
    return tape


# ---------------------------------------------------------------------------
# Exact modular matmul (16-bit limb split over float64 BLAS)
# ---------------------------------------------------------------------------


def mod_matmul(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(a @ b) mod P for canonical uint arrays a (m,k), b (k,n).

    Exact: operands < P < 2^31 are split into 15/16-bit halves; each
    float64 partial product is < 2^31 and each dot sums k < 2^22 terms,
    staying under 2^53. The three partial sums are recombined mod P.
    """
    assert a.shape[1] == b.shape[0] and a.shape[1] < (1 << 22)
    af = a.astype(np.float64)
    bf = b.astype(np.float64)
    ah = np.floor(af / 65536.0)
    al = af - ah * 65536.0
    bh = np.floor(bf / 65536.0)
    bl = bf - bh * 65536.0
    hh = (ah @ bh).astype(np.uint64) % P
    mid = ((ah @ bl).astype(np.uint64) % P + (al @ bh).astype(np.uint64) % P) % P
    ll = (al @ bl).astype(np.uint64) % P
    r16 = np.uint64((1 << 16) % P)
    r32 = np.uint64((1 << 32) % P)
    return (hh * r32 % P + mid * r16 % P + ll) % P


def ext_weighted_sum_base(weights: np.ndarray, vals: np.ndarray) -> np.ndarray:
    """sum_i weights[i] * vals[i] with ext4 weights (C,4) over base rows
    vals (C,N); returns (N,4) canonical."""
    if weights.shape[0] == 0:
        return np.zeros((vals.shape[1] if vals.ndim > 1 else 0, 4), np.uint32)
    out = mod_matmul(weights.T.astype(np.uint64), vals)  # (4, N)
    return np.ascontiguousarray(out.T).astype(np.uint32)


def ext_weighted_sum_ext(weights: np.ndarray, vals: np.ndarray) -> np.ndarray:
    """sum_i weights[i] (*ext4*) vals[i] for weights (C,4), vals (C,N,4)."""
    C, N = vals.shape[0], vals.shape[1]
    if C == 0:
        return np.zeros((N, 4), np.uint32)
    tmp = mod_matmul(
        weights.T.astype(np.uint64), vals.reshape(C, N * 4)
    ).reshape(4, N, 4)
    # binomial reduction: out[k] = sum_{a+b=k} tmp[a,:,b] + W4*sum_{a+b=k+4}
    out = np.zeros((N, 4), np.uint64)
    for ai in range(4):
        for bi in range(4):
            k = ai + bi
            if k < 4:
                out[:, k] += tmp[ai, :, bi]
            else:
                out[:, k - 4] += np.uint64(_W4) * tmp[ai, :, bi]
    return (out % P).astype(np.uint32)


# ---------------------------------------------------------------------------
# Executors
# ---------------------------------------------------------------------------


def run_base(tape: CompiledTape, main, prep, pvs) -> np.ndarray:
    """Evaluate all constraints on base-field rows.

    main: (N, W) canonical; prep: (N, Wp) or None; pvs: (n_pv,) canonical.
    Returns (C, N) uint64 canonical constraint values.
    """
    N = main.shape[0]
    regs = np.zeros((max(tape.n_regs, 1), N), np.uint64)
    out = np.zeros((tape.n_constraints, N), np.uint64)
    if tape.main_regs.size:
        regs[tape.main_regs] = main[:, tape.main_cols].T
    if tape.prep_regs.size:
        regs[tape.prep_regs] = prep[:, tape.prep_cols].T
    if tape.pv_regs.size:
        regs[tape.pv_regs] = np.asarray(pvs, np.uint64)[tape.pv_idx, None]
    if tape.const_regs.size:
        regs[tape.const_regs] = tape.const_vals[:, None]
    for op, dst, a, b in tape.levels:
        if op == OP_ADD:
            regs[dst] = (regs[a] + regs[b]) % P
        elif op == OP_SUB:
            regs[dst] = (regs[a] + (P - regs[b])) % P
        elif op == OP_MUL:
            regs[dst] = (regs[a] * regs[b]) % P
        elif op == OP_NEG:
            regs[dst] = (P - regs[a]) % P
        elif op == OP_SCALE:
            regs[dst] = (regs[a] * b[:, None]) % P
        else:  # OP_OUT
            out[dst] = regs[a]
    return out


def _ext_mul_np(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Full ext4 product on (..., 4) uint64 canonical arrays.

    Direct 7-coefficient convolution: each conv sum has <= 4 products of
    < 2^62, fitting uint64; the binomial fold (x^4 = 3) reduces mod P
    before the small multiply.
    """
    a0, a1, a2, a3 = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    b0, b1, b2, b3 = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    w = np.uint64(_W4)
    c0 = a0 * b0 % P
    c1 = (a0 * b1 + a1 * b0) % P
    c2 = (a0 * b2 % P + a1 * b1 % P + a2 * b0 % P)
    c3 = (a0 * b3 % P + a1 * b2 % P) + (a2 * b1 % P + a3 * b0 % P)
    c4 = (a1 * b3 % P + a2 * b2 % P + a3 * b1 % P)
    c5 = (a2 * b3 + a3 * b2) % P
    c6 = a3 * b3 % P
    out = np.empty(a.shape, np.uint64)
    out[..., 0] = (c0 + w * (c4 % P)) % P
    out[..., 1] = (c1 + w * c5) % P
    out[..., 2] = (c2 + w * c6) % P
    out[..., 3] = c3 % P
    return out


def run_ext(tape: CompiledTape, main, prep, pvs_ext) -> np.ndarray:
    """Evaluate all constraints on ext4 rows.

    main: (N, W, 4) canonical; prep: (N, Wp, 4) or None;
    pvs_ext: (n_pv, 4). Returns (C, N, 4) uint64 canonical.
    """
    N = main.shape[0]
    regs = np.zeros((max(tape.n_regs, 1), N, 4), np.uint64)
    out = np.zeros((tape.n_constraints, N, 4), np.uint64)
    if tape.main_regs.size:
        regs[tape.main_regs] = main[:, tape.main_cols].transpose(1, 0, 2)
    if tape.prep_regs.size:
        regs[tape.prep_regs] = prep[:, tape.prep_cols].transpose(1, 0, 2)
    if tape.pv_regs.size:
        regs[tape.pv_regs] = np.asarray(pvs_ext, np.uint64)[tape.pv_idx][:, None, :]
    if tape.const_regs.size:
        regs[tape.const_regs, :, 0] = tape.const_vals[:, None]
    for op, dst, a, b in tape.levels:
        if op == OP_ADD:
            regs[dst] = (regs[a] + regs[b]) % P
        elif op == OP_SUB:
            regs[dst] = (regs[a] + (P - regs[b])) % P
        elif op == OP_MUL:
            regs[dst] = _ext_mul_np(regs[a], regs[b])
        elif op == OP_NEG:
            regs[dst] = (P - regs[a]) % P
        elif op == OP_SCALE:
            regs[dst] = (regs[a] * b[:, None, None]) % P
        else:  # OP_OUT
            out[dst] = regs[a]
    return out


def alpha_powers(alpha: np.ndarray, count: int) -> np.ndarray:
    """[alpha^(count-1), ..., alpha^1, alpha^0] as (count, 4) canonical —
    the weights matching Horner accumulation acc = acc*alpha + c_i."""
    from ..field.extension import npext4 as E4

    if count == 0:
        return np.zeros((0, 4), np.uint32)
    out = np.zeros((count, 4), np.uint32)
    p = np.zeros(4, np.uint32)
    p[0] = 1
    for i in range(count - 1, -1, -1):
        out[i] = p
        if i:
            p = E4.mul(p, alpha)
    return out

"""Jagged PCS over the stacked PCS, TPU-native.

The characteristic piece of the reference's v6 proof system (reference:
slop/crates/jagged/src/{prover,verifier,poly,sumcheck}.rs and
jagged_eval/): many tables of different heights are committed as ONE
sparse multilinear over a "jagged" index space.

  commit:   tables -> column-major dense vector -> stacked PCS commit;
            the (row_count, column_count) metadata of each table is
            hash-compressed into the commitment.
  open:     the claimed per-column evaluations at (z_row per-table rows)
            are tied to the dense vector by the JAGGED SUMCHECK
              sum_x dense(x) * J(x) = sum_col claim_col * eq(z_col, col)
            where J is the jagged indicator MLE. The final J(point)
            value is proven by a second sumcheck (the "jagged eval"
            protocol) whose verifier runs a 4-state BRANCHING PROGRAM
            over the bit-decomposed column prefix sums [HR18].

Device work: the J table is a gather of eq_col/eq_row products over the
dense index space; the jagged sumcheck is a degree-2 Hadamard-product
sumcheck with one fused fold+restricted-sum kernel per round. The
branching program (verifier + jagged-eval prover) is tiny and runs on
host, vectorized over columns with numpy ext4 ops.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

import jax
import jax.numpy as jnp

from ..field import extension as ext
from ..field import koalabear as kb
from ..iop import sumcheck as sc
from ..iop.challenger import DuplexChallenger
from ..ops import hostmle
from ..ops import mle as mle_ops
from ..ops.hostmle import HOST_THRESH
from ..ops import poseidon2 as p2
from ..utils import timing
from . import stacked
from .basefold import FriConfig
from .stacked import StackedProof, StackedProverData

E4 = ext.npext4


def _to_monty_np(x):
    return ((np.asarray(x, np.uint64) << 32) % kb.P).astype(np.uint32)


def _from_monty_np(x):
    return np.asarray(kb.from_monty(jnp.asarray(x)), np.uint32)


def log2_ceil(x: int) -> int:
    return max(x - 1, 0).bit_length() if x > 1 else 0


def point_from_usize(x: int, bits: int) -> np.ndarray:
    """Big-endian bit decomposition as a (bits,) canonical array."""
    return np.array([(x >> (bits - 1 - k)) & 1 for k in range(bits)], np.uint32)


def full_geq_host(threshold: np.ndarray, point: np.ndarray) -> np.ndarray:
    """MLE of [index >= threshold] evaluated at an ext4 point.

    threshold: (n,) base bits or (n,4); point: (n,4).
    Reference: slop/crates/multilinear/src/mle.rs:398.
    """
    one = E4.one()
    acc = one.copy()
    n = point.shape[0]
    thr = threshold if threshold.ndim == 2 else np.stack(
        [threshold] + [np.zeros_like(threshold)] * 3, axis=-1
    )
    for k in range(n - 1, -1, -1):
        x, y = thr[k], point[k]
        t1 = E4.mul(E4.sub(one, y), E4.sub(one, x))
        t2 = E4.mul(y, x)
        acc = E4.add(E4.mul(E4.add(t1, t2), acc), E4.mul(y, E4.sub(one, x)))
    return acc


# ---------------------------------------------------------------------------
# Branching program (vectorized over columns, host numpy ext4)
# ---------------------------------------------------------------------------

# Transition table: for each (memory_state 0..3, bit_state 0..15) the output
# state index or -1 for fail. memory index = carry + 2*comparison.
# bit index = row_bit + 2*index_bit + 4*curr_bit + 8*next_bit.
def _build_transition() -> np.ndarray:
    table = np.full((4, 16), -1, np.int64)
    for mem in range(4):
        carry, comp = mem & 1, (mem >> 1) & 1
        for bits in range(16):
            row_b = bits & 1
            idx_b = (bits >> 1) & 1
            cur_b = (bits >> 2) & 1
            nxt_b = (bits >> 3) & 1
            new_comp = comp if idx_b == nxt_b else nxt_b
            s = row_b + carry + cur_b
            if idx_b != (s & 1):
                continue
            new_carry = s >> 1
            table[mem, bits] = new_carry + 2 * new_comp
    return table


_TRANSITION = _build_transition()
_SUCCESS_STATE = 0 + 2 * 1  # carry=0, comparison=1
_INITIAL_STATE = 0

_GROUP_MATRIX = None


def _transition_group_matrix() -> np.ndarray:
    """(16, 16) 0/1 matrix G with G[i, mem*4 + out] = 1 when the bit
    pattern i (row*8 + idx*4 + cur*2 + nxt) transitions `mem` -> `out`."""
    global _GROUP_MATRIX
    if _GROUP_MATRIX is None:
        g = np.zeros((16, 16), np.uint64)
        for i in range(16):
            row_b = (i >> 3) & 1
            idx_b = (i >> 2) & 1
            cur_b = (i >> 1) & 1
            nxt_b = i & 1
            bit_idx = row_b + 2 * idx_b + 4 * cur_b + 8 * nxt_b
            for mem in range(4):
                out = _TRANSITION[mem, bit_idx]
                if out >= 0:
                    g[i, mem * 4 + out] = 1
        _GROUP_MATRIX = g
    return _GROUP_MATRIX


class BranchingProgram:
    """Vectorized BP evaluation (reference: slop/crates/jagged/src/poly.rs:389).

    z_row, z_index: (n,4) canonical ext4 points (big-endian).
    eval(prefix, next_prefix): batched over leading dim C; prefix points are
    (C, m, 4) ext4 arrays (usually 0/1 bits embedded).
    """

    def __init__(self, z_row: np.ndarray, z_index: np.ndarray):
        self.z_row = np.asarray(z_row, np.uint32)
        self.z_index = np.asarray(z_index, np.uint32)
        self.num_vars = max(self.z_row.shape[0], self.z_index.shape[0])

    @staticmethod
    def _lsb_val(point: np.ndarray, i: int, batch: int) -> np.ndarray:
        """i-th least significant coordinate, broadcast to (batch, 4)."""
        dim = point.shape[-2]
        if dim <= i:
            return np.zeros((batch, 4), np.uint32)
        coord = point[..., dim - i - 1, :]
        if coord.ndim == 1:
            coord = np.broadcast_to(coord, (batch, 4))
        return np.ascontiguousarray(coord)

    def eval(self, prefix: np.ndarray, next_prefix: np.ndarray) -> np.ndarray:
        """prefix/next_prefix: (C, m, 4). Returns (C, 4).

        Per layer: the 16-entry four-variable eq table is built by three
        outer-product ext muls; the transition step groups eq entries by
        (memory state, output state) with one 0/1 matmul, then does 16
        ext muls against the 4 running state values.
        """
        C = prefix.shape[0]
        one = np.broadcast_to(E4.one(), (C, 4)).copy()
        results = np.zeros((4, C, 4), np.uint32)
        results[_SUCCESS_STATE] = one
        group = _transition_group_matrix()  # (16, 16) uint64 0/1
        for layer in range(self.num_vars, -1, -1):
            pts = [
                self._lsb_val(self.z_row, layer, C),
                self._lsb_val(self.z_index, layer, C),
                self._lsb_val(prefix, layer, C),
                self._lsb_val(next_prefix, layer, C),
            ]
            # eq over (row, idx, cur, nxt) with row the slowest bit:
            # index i = row*8 + idx*4 + cur*2 + nxt.
            eq = None
            for x in pts:
                pair = np.stack([E4.sub(one, x), x], axis=1)  # (C, 2, 4)
                if eq is None:
                    eq = pair
                else:
                    k = eq.shape[1]
                    eq = E4.mul(
                        eq[:, :, None, :].repeat(2, axis=2).reshape(C, 2 * k, 4),
                        np.tile(pair, (1, k, 1)),
                    )
            # grouped sums: (C, 4coords, 16) @ (16, 16 groups) -> mod p
            eqt = eq.transpose(0, 2, 1).astype(np.uint64)  # (C, 4, 16)
            grouped = (eqt @ group) % kb.P  # (C, 4, 16): [mem*4 + out]
            new_results = np.zeros_like(results)
            for mem in range(4):
                acc = np.zeros((C, 4), np.uint32)
                for out in range(4):
                    g = grouped[:, :, mem * 4 + out].astype(np.uint32)  # (C,4)
                    acc = E4.add(acc, E4.mul(g, results[out]))
                new_results[mem] = acc
            results = new_results
        return results[_INITIAL_STATE]


# ---------------------------------------------------------------------------
# Jagged params
# ---------------------------------------------------------------------------


@dataclass
class JaggedParams:
    """Per-column row counts (one entry per committed column)."""

    col_heights: list  # row count per column, across all rounds in order
    max_log_row_count: int

    @property
    def prefix_sums(self) -> list:
        out = [0]
        for h in self.col_heights:
            out.append(out[-1] + h)
        return out

    @property
    def log_m(self) -> int:
        return log2_ceil(self.prefix_sums[-1])


def metadata_hash_commit(
    inner_commit, row_counts: list, column_counts: list
):
    """compress(inner_commit, hash(len || row_counts || column_counts)).

    Reference: slop/crates/jagged/src/prover.rs:141. Bn254 int inner
    commitments (wrap context) route through the outer hash/compressor.
    """
    items = [len(column_counts)] + list(row_counts) + list(column_counts)
    if isinstance(inner_commit, (int, np.integer)):
        from . import outer_merkle as om

        h = om.hash_row(np.asarray(items, np.uint32))
        return om.compress(int(inner_commit), h)
    data = _to_monty_np(np.asarray(items, np.uint32))
    h = np.asarray(p2.hash_rows(jnp.asarray(data)), np.uint32)
    left = jnp.asarray(_to_monty_np(np.asarray(inner_commit, np.uint32)))
    out = p2.compress(left, jnp.asarray(h))
    return _from_monty_np(np.asarray(out))


# ---------------------------------------------------------------------------
# J-table (partial jagged multilinear) device kernel
# ---------------------------------------------------------------------------


def partial_jagged_mle(params: JaggedParams, z_row: np.ndarray, z_col: np.ndarray):
    """Materialize J over the dense index space: (2^log_m, 4) monty jnp.

    Reference: slop/crates/jagged/src/poly.rs:257
    `partial_jagged_little_polynomial_evaluation`.
    """
    prefix = params.prefix_sums
    log_m = params.log_m
    total = 1 << log_m
    num_cols = len(params.col_heights)
    # host: index maps (static per shape)
    col_of = np.zeros(total, np.int32)
    row_of = np.zeros(total, np.int32)
    valid = np.zeros(total, bool)
    for c, h in enumerate(params.col_heights):
        s = prefix[c]
        col_of[s : s + h] = c
        row_of[s : s + h] = np.arange(h)
        valid[s : s + h] = True
    kc = log2_ceil(num_cols)
    z_col_k = z_col[len(z_col) - kc :] if kc else z_col[:0]
    z_row_k = z_row[len(z_row) - params.max_log_row_count :]
    return _jtable_kernel(
        jnp.asarray(_to_monty_np(z_col_k)),
        jnp.asarray(_to_monty_np(z_row_k)),
        jnp.asarray(col_of),
        jnp.asarray(row_of),
        jnp.asarray(valid),
    )


@jax.jit
def _jtable_kernel(z_col_m, z_row_m, col_of, row_of, valid):
    eq_col = mle_ops.partial_lagrange_ext(z_col_m)
    eq_row = mle_ops.partial_lagrange_ext(z_row_m)
    vals = ext.ext4_mul(eq_col[col_of], eq_row[row_of])
    return jnp.where(valid[:, None], vals, jnp.zeros_like(vals))


# ---------------------------------------------------------------------------
# Hadamard (dense * J) sumcheck poly — degree 2
# ---------------------------------------------------------------------------


@jax.jit
def _dense_eval_kernel(dense, point_c):
    """Dense MLE eval at a canonical device point -> (4,) canonical."""
    return kb.from_monty(
        mle_ops.eval_mle_at_point_ext(dense[:, None], kb.to_monty(point_c))[0]
    )


@jax.jit
def _hadamard_round_sums(a, b):
    """Degree-2 message sums for ext4 a,b: evals of sum at X=0,1,2."""
    av = a.reshape(-1, 2, 4)
    bv = b.reshape(-1, 2, 4)
    a0, a1 = av[:, 0], av[:, 1]
    b0, b1 = bv[:, 0], bv[:, 1]
    a2 = kb.sub(kb.add(a1, a1), a0)
    b2 = kb.sub(kb.add(b1, b1), b0)
    s0 = mle_ops._sum_ext_axis0(ext.ext4_mul(a0, b0))
    s1 = mle_ops._sum_ext_axis0(ext.ext4_mul(a1, b1))
    s2 = mle_ops._sum_ext_axis0(ext.ext4_mul(a2, b2))
    # one stacked result -> one device->host transfer per round
    return jnp.stack([s0, s1, s2])


@jax.jit
def _fix_last(guts, alpha):
    return mle_ops.fix_last_variable_ext(guts, alpha)


def _hadamard_local_sums(table, n_pairs_live, *_):
    """Restricted sums over the packed (n, 2, 4) [dense, J] table (the
    fused-driver body of _hadamard_round_sums; dead tail rows are zeroed
    by the fold so no explicit masking is needed)."""
    from ..prover.zerocheck import _tree_sum_mod

    pairs = table.reshape(-1, 2, 2, 4)
    a0, b0 = pairs[:, 0, 0], pairs[:, 0, 1]
    a1, b1 = pairs[:, 1, 0], pairs[:, 1, 1]
    a2 = kb.sub(kb.add(a1, a1), a0)
    b2 = kb.sub(kb.add(b1, b1), b0)
    s0 = _tree_sum_mod(ext.ext4_mul(a0, b0))
    s1 = _tree_sum_mod(ext.ext4_mul(a1, b1))
    s2 = _tree_sum_mod(ext.ext4_mul(a2, b2))
    return jnp.stack([s0, s1, s2])


class HadamardPoly:
    """Product of a (base-embedded) dense MLE and the ext4 J MLE."""

    degree = 2
    tail_fusable = True
    tail_fuse_all = True  # every round in ONE dispatch (cheap sums body)

    def __init__(self, a, b, host=False, force_device=False):
        self.a = a  # (2^n, 4) ext: monty jnp (device) or canonical np (host)
        self.b = b
        self.host = host
        if not host and not force_device and int(a.shape[0]) <= HOST_THRESH:
            self.a = hostmle.dev_to_host(a)
            self.b = hostmle.dev_to_host(b)
            self.host = True

    @property
    def num_variables(self) -> int:
        return int(self.a.shape[0]).bit_length() - 1

    def sum_values_device(self):
        """(3, 4) monty restricted sums as one device array (one fetch)."""
        return _hadamard_round_sums(self.a, self.b)

    def coeffs_from_sums(self, ys) -> np.ndarray:
        v0, v1, v2 = ys[0], ys[1], ys[2]
        inv2 = np.uint32(pow(2, kb.P - 2, kb.P))
        t = E4.sub(E4.add(v2, v0), E4.add(v1, v1))
        c2 = kb.npf.mul(t, inv2)
        c1 = E4.sub(E4.sub(v1, v0), c2)
        return np.stack([v0, c1, c2])

    def sum_as_poly_in_last_variable(self, claim=None) -> np.ndarray:
        if self.host:
            vs = [
                hostmle.sum0_fast(
                    E4.mul(hostmle.at_x(self.a, x), hostmle.at_x(self.b, x))
                )
                for x in range(3)
            ]
        else:
            sums = _from_monty_np(self.sum_values_device().reshape(-1))
            vs = list(sums.reshape(-1, 4))
        return self.coeffs_from_sums(vs)

    def fix_last_variable(self, alpha: np.ndarray) -> "HadamardPoly":
        if self.host:
            alpha = np.asarray(alpha, np.uint32)
            return HadamardPoly(
                hostmle.fix_last(self.a, alpha),
                hostmle.fix_last(self.b, alpha),
                host=True,
            )
        am = jnp.asarray(_to_monty_np(alpha))
        return HadamardPoly(_fix_last(self.a, am), _fix_last(self.b, am))

    def fix_last_variable_dev(self, am) -> "HadamardPoly":
        """Device-challenger fold (monty device alpha, no host handoff)."""
        poly = object.__new__(HadamardPoly)
        poly.a = _fix_last(self.a, am)
        poly.b = _fix_last(self.b, am)
        poly.host = False
        return poly

    def component_evals_device(self):
        """(2, 4) monty [a, b] evals at the final point."""
        return jnp.stack([self.a[0], self.b[0]])

    def fused_parts(self):
        """Fused-driver protocol (iop/dsumcheck.py); None on host."""
        if self.host:
            return None
        from ..prover.zerocheck import _fold_packed_body

        def clone(table):
            poly = object.__new__(HadamardPoly)
            poly.a = table[:, 0]
            poly.b = table[:, 1]
            poly.host = False
            return poly

        table = jnp.stack([self.a, self.b], axis=1)  # (n, 2, 4)
        return (_hadamard_local_sums, _fold_packed_body, table, (), clone)

    def get_component_poly_evals(self):
        if self.host:
            return [np.asarray(self.a[0], np.uint32), np.asarray(self.b[0], np.uint32)]
        return [_from_monty_np(self.a[0]), _from_monty_np(self.b[0])]


# ---------------------------------------------------------------------------
# Jagged eval sumcheck (prover + verifier, host)
# ---------------------------------------------------------------------------


def _condensed_prefix_points(params: JaggedParams, z_col_eq: np.ndarray):
    """Merged prefix-sum points condensed over duplicates.

    Returns (merged (C', 2*(log_m+1)) bit array, z_col_eq_vals (C',4)).
    Reference: jagged_eval/sumcheck_poly.rs new_from_jagged_params.
    """
    prefix = params.prefix_sums
    log_m = params.log_m
    bits = log_m + 1
    merged, eqs = [], []
    for c in range(len(params.col_heights)):
        m = np.concatenate(
            [point_from_usize(prefix[c], bits), point_from_usize(prefix[c + 1], bits)]
        )
        if merged and np.array_equal(merged[-1], m):
            eqs[-1] = E4.add(eqs[-1], z_col_eq[c])
        else:
            merged.append(m)
            eqs.append(z_col_eq[c].copy())
    return np.stack(merged), np.stack(eqs)


def _interp_0_half_1(y0, yh, y1):
    """Coefficient form of the quadratic through (0,y0),(1/2,yh),(1,y1)."""
    # c0 = y0; c1 + c2 = y1 - y0; c1/2 + c2/4 = yh - y0
    # => c2 = 2*(y0 + y1) - 4*yh ... solve: 2(yh - y0) = c1 + c2/2
    # c1 = 4yh - 3y0 - y1? check: c1 = -(3y0 + y1 - 4yh)
    four = np.uint32(4)
    c2 = E4.sub(E4.add(kb.npf.mul(y0, np.uint32(2)), kb.npf.mul(y1, np.uint32(2))),
                kb.npf.mul(yh, four))
    c1 = E4.sub(E4.sub(y1, y0), c2)
    return np.stack([y0, c1, c2])


_BP_KERNELS = {}


def _bp_tree_sum(x):
    """Field-sum axis 0 of a monty array (traceable)."""
    while x.shape[0] > 1:
        m = x.shape[0]
        if m % 2:
            x = jnp.concatenate([x, jnp.zeros_like(x[:1])], axis=0)
            m += 1
        x = kb.add(x[: m // 2], x[m // 2:])
    return x[0]


def _bp_dp_body(zr_stack, zi_stack, l_stack, r_stack, weights, nv1: int,
                B: int, C: int):
    """Traceable body of the jagged-eval branching-program round.

    Runs the 4-state DP over all `B = 2C` batched points (lambda = 0 and
    1/2 stacked) with a fori_loop over the nv1 layers, then
    weight-combines and segment-sums; shared by the per-round jit kernel
    and the whole-sumcheck fused kernel."""
    group = _transition_group_matrix()  # (16, 16) 0/1, static
    members = [[i for i in range(16) if group[i, g]] for g in range(16)]

    one = jnp.zeros((B, 4), jnp.uint32).at[:, 0].set(kb.to_monty_i(1))
    results = jnp.zeros((4, B, 4), jnp.uint32)
    results = results.at[_SUCCESS_STATE].set(one)

    def body(kk, results):
        layer = nv1 - 1 - kk
        pts = [
            jnp.broadcast_to(
                jax.lax.dynamic_slice(s, (layer, 0), (1, 4)), (B, 4)
            )
            for s in (zr_stack, zi_stack)
        ] + [
            jax.lax.dynamic_slice(s, (layer, 0, 0), (1, B, 4))[0]
            for s in (l_stack, r_stack)
        ]
        eq = None
        for x in pts:
            pair = jnp.stack([ext.ext4_sub(one, x), x], axis=1)  # (B,2,4)
            if eq is None:
                eq = pair
            else:
                kdim = eq.shape[1]
                eq = ext.ext4_mul(
                    jnp.repeat(eq, 2, axis=1),
                    jnp.tile(pair, (1, kdim, 1)),
                )
        # eq: (B, 16, 4), entry i = row*8 + idx*4 + cur*2 + nxt
        new_results = []
        for mem in range(4):
            acc = jnp.zeros((B, 4), jnp.uint32)
            for out in range(4):
                mem_list = members[mem * 4 + out]
                if not mem_list:
                    continue
                g = eq[:, mem_list[0]]
                for i in mem_list[1:]:
                    g = kb.add(g, eq[:, i])
                acc = kb.add(acc, ext.ext4_mul(g, results[out]))
            new_results.append(acc)
        return jnp.stack(new_results)

    results = jax.lax.fori_loop(0, nv1, body, results)
    y = ext.ext4_mul(results[_INITIAL_STATE], weights)  # (B, 4)
    return jnp.stack([_bp_tree_sum(y[:C]), _bp_tree_sum(y[C:])])


def _bp_round_kernel(nv1: int, B: int, C: int):
    """Jitted one-round wrapper of _bp_dp_body (host-challenger path)."""
    key = (nv1, B, C)
    k = _BP_KERNELS.get(key)
    if k is not None:
        return k

    @jax.jit
    def kernel(zr_stack, zi_stack, l_stack, r_stack, weights):
        return _bp_dp_body(zr_stack, zi_stack, l_stack, r_stack, weights,
                           nv1, B, C)

    _BP_KERNELS[key] = kernel
    return kernel


_JE_FUSED = {}


def _je_fused_kernel(num_vars: int, nvb: int, C: int, nbuf0: int):
    """ALL jagged-eval sumcheck rounds in ONE jit: per round the 4-state
    branching-program DP (both lambda branches), message interpolation,
    the sponge absorb (12 felts) + 4-felt sample, and the claim /
    intermediate-eq recurrences. The host loop below pays a blocking
    dispatch + sync per round (~2*(log_m+1) of them); this costs one.
    Transcript-identical to the host loop."""
    key = (num_vars, nvb, C, nbuf0)
    cached = _JE_FUSED.get(key)
    if cached is not None:
        return cached
    from ..iop.dchallenger import _permute_canonical
    from ..ops.poseidon2 import RATE

    half_m = np.uint32(kb.to_monty_i(pow(2, kb.P - 2, kb.P)))
    one_m = np.uint32(kb.to_monty_i(1))
    nv2 = num_vars // 2

    @jax.jit
    def kernel(state, buf, zr_stack, zi_stack, merged_m, eq_vals_m, claim0_m):
        # merged_m: (C, num_vars, 4) monty 0/1-embedded prefix bits;
        # eq_vals_m: (C, 4) monty; claim0_m: (4,) monty.
        zero_col = jnp.zeros((C, 4), jnp.uint32)
        one_col = zero_col.at[:, 0].set(one_m)
        half_col = zero_col.at[:, 0].set(half_m)
        inter_eq = one_col
        claim = claim0_m
        rhos_m: list = []
        rhos_c: list = []
        msgs: list = []
        nbuf = nbuf0
        for rnd in range(num_vars):
            split = num_vars - rnd - 1
            x_col = merged_m[:, split]

            def col(j, lam_val):
                if j < split:
                    return merged_m[:, j]
                if j == split:
                    return lam_val
                return jnp.broadcast_to(rhos_m[j - split - 1], (C, 4))

            def stacks(lam_val):
                lf, rt = [], []
                for layer in range(nvb):
                    lf.append(
                        col(nv2 - 1 - layer, lam_val)
                        if layer < nv2
                        else zero_col
                    )
                    rt.append(
                        col(num_vars - 1 - layer, lam_val)
                        if layer < nv2
                        else zero_col
                    )
                return jnp.stack(lf), jnp.stack(rt)

            lf0, rt0 = stacks(zero_col)
            lfh, rth = stacks(half_col)
            w0 = ext.ext4_mul(
                eq_vals_m,
                ext.ext4_mul(inter_eq, ext.ext4_sub(one_col, x_col)),
            )
            wh = ext.ext4_mul(eq_vals_m, ext.ext4_mul(inter_eq, half_col))
            sums = _bp_dp_body(
                zr_stack,
                zi_stack,
                jnp.concatenate([lf0, lfh], axis=1),
                jnp.concatenate([rt0, rth], axis=1),
                jnp.concatenate([w0, wh], axis=0),
                nvb,
                2 * C,
                C,
            )
            y0, yh = sums[0], sums[1]
            y1 = ext.ext4_sub(claim, y0)
            # quadratic through (0,y0), (1/2,yh), (1,y1): see _interp_0_half_1
            c2 = kb.sub(
                kb.add(kb.add(y0, y0), kb.add(y1, y1)),
                kb.add(kb.add(yh, yh), kb.add(yh, yh)),
            )
            c1 = kb.sub(kb.sub(y1, y0), c2)
            poly_m = jnp.stack([y0, c1, c2])
            msg_c = kb.from_monty(poly_m)
            msgs.append(msg_c)
            # absorb 12 felts + sample_ext (static sponge schedule)
            vec = msg_c.reshape(-1)
            vals = jnp.concatenate([buf, vec]) if nbuf else vec
            total = nbuf + 12
            for c in range(total // RATE):
                state = _permute_canonical(
                    jnp.concatenate([vals[c * RATE : (c + 1) * RATE], state[RATE:]])
                )
            left = total % RATE
            if left:
                state = _permute_canonical(
                    jnp.concatenate([vals[total - left :], state[left:]])
                )
            alpha_c = jnp.stack([state[RATE - 1 - k] for k in range(4)])
            alpha_m = kb.to_monty(alpha_c)
            rhos_m.insert(0, alpha_m)
            rhos_c.insert(0, alpha_c)
            nbuf = 0
            buf = jnp.zeros(0, jnp.uint32)
            # claim' = y0 + alpha*c1 + alpha^2*c2
            claim = ext.ext4_add(
                y0,
                ext.ext4_mul(alpha_m, ext.ext4_add(c1, ext.ext4_mul(alpha_m, c2))),
            )
            am_col = jnp.broadcast_to(alpha_m, (C, 4))
            upd = ext.ext4_add(
                ext.ext4_mul(am_col, x_col),
                ext.ext4_mul(
                    ext.ext4_sub(one_col, am_col), ext.ext4_sub(one_col, x_col)
                ),
            )
            inter_eq = ext.ext4_mul(inter_eq, upd)
        return state, tuple(msgs), tuple(rhos_c), kb.from_monty(claim)

    _JE_FUSED[key] = kernel
    return kernel


def _prove_jagged_eval_dfs(
    params: JaggedParams,
    z_row: np.ndarray,
    z_col: np.ndarray,
    z_trace: np.ndarray,
    challenger: DuplexChallenger,
    expected_sum: np.ndarray,
) -> sc.PartialSumcheckProof:
    """Device-Fiat-Shamir jagged-eval prover: one dispatch, one fetch."""
    from ..iop.dchallenger import TraceChallenger
    from ..ops.poseidon2 import RATE
    from ..utils.fetch import batch_fetch

    log_m = params.log_m
    bits = log_m + 1
    num_vars = 2 * bits
    z_col_eq = mle_ops.host.partial_lagrange_ext(z_col)
    merged, eq_vals = _condensed_prefix_points(params, z_col_eq)
    C = merged.shape[0]
    bp = BranchingProgram(z_row, z_trace)
    nvb = bp.num_vars + 1
    to_m = lambda x: jnp.asarray(_to_monty_np(np.asarray(x, np.uint32)))

    def _z_stack(z):
        out = np.zeros((nvb, 4), np.uint32)
        d = z.shape[0]
        for layer in range(min(d, nvb)):
            out[layer] = z[d - layer - 1]
        return to_m(out)

    merged_e = np.stack([merged] + [np.zeros_like(merged)] * 3, axis=-1)
    tch = TraceChallenger.from_host(challenger)
    kernel = _je_fused_kernel(num_vars, nvb, C, tch._nbuf)
    state, msgs, rhos_c, claim_c = kernel(
        tch.state,
        tch._buf_array(),
        _z_stack(bp.z_row),
        _z_stack(bp.z_index),
        to_m(merged_e),
        to_m(eq_vals),
        to_m(expected_sum),
    )
    tch.state = state
    tch._segs = []
    tch._nbuf = 0
    tch._out_left = RATE - 4
    fetched = batch_fetch(list(msgs) + list(rhos_c) + [claim_c])
    tch.to_host(challenger)
    messages = fetched[:num_vars]
    rhos = fetched[num_vars : 2 * num_vars]
    final_claim = fetched[2 * num_vars]
    return sc.PartialSumcheckProof(
        univariate_polys=np.stack(messages),
        claimed_sum=np.asarray(expected_sum, np.uint32),
        point=np.stack(rhos),
        eval=final_claim,
    )


def prove_jagged_eval(
    params: JaggedParams,
    z_row: np.ndarray,
    z_col: np.ndarray,
    z_trace: np.ndarray,
    challenger: DuplexChallenger,
) -> sc.PartialSumcheckProof:
    """Reference: jagged_eval/{sumcheck_eval,sumcheck_sum_as_poly}.rs."""
    log_m = params.log_m
    bits = log_m + 1
    num_vars = 2 * bits
    z_col_eq = mle_ops.host.partial_lagrange_ext(z_col)
    merged, eq_vals = _condensed_prefix_points(params, z_col_eq)
    C = merged.shape[0]
    bp = BranchingProgram(z_row, z_trace)

    expected_sum = _full_jagged_eval(params, z_row, z_col, z_trace)
    challenger.observe_slice(expected_sum)

    from ..utils import dfs

    if dfs.enabled() and getattr(challenger, "device_traceable", False):
        return _prove_jagged_eval_dfs(
            params, z_row, z_col, z_trace, challenger, expected_sum
        )

    half = np.zeros(4, np.uint32)
    half[0] = pow(2, kb.P - 2, kb.P)
    one = E4.one()

    inter_eq = np.broadcast_to(one, (C, 4)).copy()
    rhos: list[np.ndarray] = []
    messages = []
    claim = expected_sum
    merged_e = np.stack([merged] + [np.zeros_like(merged)] * 3, axis=-1)  # (C,nv,4)

    # Device round kernel: the 4-state DP over both lambda branches in one
    # dispatch (see _bp_round_kernel). Layer stacks for z_row / z_trace are
    # round-independent.
    nv2 = num_vars // 2
    nvb = bp.num_vars + 1
    to_m = lambda x: jnp.asarray(((np.asarray(x, np.uint64) << 32) % kb.P).astype(np.uint32))

    def _z_stack(z):
        out = np.zeros((nvb, 4), np.uint32)
        d = z.shape[0]
        for layer in range(min(d, nvb)):
            out[layer] = z[d - layer - 1]
        return to_m(out)

    zr_stack = _z_stack(bp.z_row)
    zi_stack = _z_stack(bp.z_index)
    kernel = _bp_round_kernel(nvb, 2 * C, C)

    def _h_stacks(h_pts):
        """(C, num_vars, 4) -> per-layer (nvb, C, 4) left/right stacks."""
        left = h_pts[:, :nv2]
        right = h_pts[:, nv2:]
        lf = np.zeros((nvb, C, 4), np.uint32)
        rt = np.zeros((nvb, C, 4), np.uint32)
        dl, dr = left.shape[1], right.shape[1]
        for layer in range(nvb):
            if layer < dl:
                lf[layer] = left[:, dl - layer - 1]
            if layer < dr:
                rt[layer] = right[:, dr - layer - 1]
        return lf, rt

    for rnd in range(num_vars):
        # eval at lambda in {0, 1/2}: see reference `eval` in
        # sumcheck_sum_as_poly.rs — eq-part contribution and BP eval on the
        # point (prefix_bits..., lambda, rhos).
        split = num_vars - rnd - 1
        x_bit = merged[:, split]  # (C,)
        h_pts = np.zeros((C, num_vars, 4), np.uint32)
        h_pts[:, :split] = merged_e[:, :split]
        for j, r in enumerate(rhos):
            h_pts[:, split + 1 + j] = r
        # lambda = 0 branch
        h_pts[:, split] = 0
        lf0, rt0 = _h_stacks(h_pts)
        w0 = E4.mul(
            eq_vals,
            E4.mul(
                inter_eq,
                np.where(
                    x_bit[:, None] == 0, one[None, :], np.zeros((1, 4), np.uint32)
                ).astype(np.uint32),
            ),
        )
        # lambda = 1/2 branch
        h_pts[:, split] = half
        lfh, rth = _h_stacks(h_pts)
        wh = E4.mul(eq_vals, E4.mul(inter_eq, np.broadcast_to(half, (C, 4))))
        sums = kernel(
            zr_stack,
            zi_stack,
            to_m(np.concatenate([lf0, lfh], axis=1)),
            to_m(np.concatenate([rt0, rth], axis=1)),
            to_m(np.concatenate([w0, wh], axis=0)),
        )
        sums_c = np.asarray(kb.from_monty(sums.reshape(-1)), np.uint32).reshape(2, 4)
        y0, yh = sums_c[0], sums_c[1]
        y1 = E4.sub(claim, y0)
        poly = _interp_0_half_1(y0, yh, y1)
        messages.append(poly)
        challenger.observe_slice(poly.reshape(-1))
        alpha = challenger.sample_ext()
        rhos.insert(0, alpha)
        claim = sc.uni_eval(poly, alpha)
        # update intermediate eq evals
        x_bit = merged[:, split]
        x_e = np.stack([x_bit] + [np.zeros_like(x_bit)] * 3, axis=-1)
        upd = E4.add(
            E4.mul(np.broadcast_to(alpha, (C, 4)), x_e),
            E4.mul(
                E4.sub(one[None, :], alpha[None, :]), E4.sub(one[None, :], x_e)
            ),
        )
        inter_eq = E4.mul(inter_eq, upd)

    point = np.stack(rhos)
    return sc.PartialSumcheckProof(
        univariate_polys=np.stack(messages),
        claimed_sum=expected_sum,
        point=point,
        eval=claim,
    )


def _full_jagged_eval(
    params: JaggedParams, z_row: np.ndarray, z_col: np.ndarray, z_trace: np.ndarray
) -> np.ndarray:
    """Direct evaluation of J(z_row, z_col, z_trace) via the BP.

    Reference: poly.rs full_jagged_little_polynomial_evaluation.
    """
    z_col_eq = mle_ops.host.partial_lagrange_ext(z_col)
    prefix = params.prefix_sums
    log_m = params.log_m
    bits = log_m + 1
    C = len(params.col_heights)
    bp = BranchingProgram(z_row, z_trace)
    pre = np.stack([point_from_usize(prefix[c], bits) for c in range(C)])
    nxt = np.stack([point_from_usize(prefix[c + 1], bits) for c in range(C)])
    pre_e = np.stack([pre] + [np.zeros_like(pre)] * 3, axis=-1)
    nxt_e = np.stack([nxt] + [np.zeros_like(nxt)] * 3, axis=-1)
    evals = bp.eval(pre_e, nxt_e)  # (C, 4)
    acc = np.zeros(4, np.uint32)
    for c in range(C):
        acc = E4.add(acc, E4.mul(z_col_eq[c], evals[c]))
    return acc


def verify_jagged_eval(
    params: JaggedParams,
    z_row: np.ndarray,
    z_col: np.ndarray,
    z_trace: np.ndarray,
    proof: sc.PartialSumcheckProof,
    challenger: DuplexChallenger,
):
    """Returns the verified jagged evaluation or None.

    Reference: jagged_eval/sumcheck_eval.rs jagged_evaluation.
    """
    jagged_eval = proof.claimed_sum
    challenger.observe_slice(jagged_eval)
    bits = params.log_m + 1
    if not sc.partially_verify_sumcheck_proof(proof, challenger, 2 * bits, 2):
        return None
    point = proof.point
    half_dim = point.shape[0] // 2
    first_half, second_half = point[:half_dim], point[half_dim:]
    z_col_eq = mle_ops.host.partial_lagrange_ext(z_col)
    prefix = params.prefix_sums
    C = len(params.col_heights)
    if C > z_col_eq.shape[0]:
        return None
    acc = np.zeros(4, np.uint32)
    prev_merged = None
    prev_eval = None
    for c in range(C):
        merged = np.concatenate(
            [point_from_usize(prefix[c], bits), point_from_usize(prefix[c + 1], bits)]
        )
        if prev_merged is not None and np.array_equal(prev_merged, merged):
            fle = prev_eval
        else:
            merged_e = np.stack([merged] + [np.zeros_like(merged)] * 3, axis=-1)
            fle = mle_ops.host.eq_points(merged_e, point)
            prev_eval = fle
        prev_merged = merged
        acc = E4.add(acc, E4.mul(z_col_eq[c], fle))
    bp = BranchingProgram(z_row, z_trace)
    h = bp.eval(first_half[None], second_half[None])[0]
    expected = E4.mul(acc, h)
    if not np.array_equal(expected, proof.eval):
        return None
    return jagged_eval


# ---------------------------------------------------------------------------
# Jagged PCS prover / verifier
# ---------------------------------------------------------------------------


@dataclass
class JaggedProverData:
    stacked_data: StackedProverData
    row_counts: list
    column_counts: list
    padding_column_count: int
    original_commitment: np.ndarray


@dataclass
class JaggedPcsProof:
    pcs_proof: StackedProof
    sumcheck_proof: sc.PartialSumcheckProof
    jagged_eval_proof: sc.PartialSumcheckProof
    row_counts_and_column_counts: list  # per round: list[(rows, cols)]
    merkle_tree_commitments: list  # per round original commitment
    expected_eval: np.ndarray
    max_log_row_count: int
    log_m: int


class JaggedConfig:
    """Groups the PCS parameters (reference: SP1BasefoldConfig + components.rs)."""

    def __init__(self, fri_config: FriConfig, log_stacking_height: int, max_log_row_count: int):
        self.fri = fri_config
        self.log_stacking_height = log_stacking_height
        self.max_log_row_count = max_log_row_count


def commit_multilinears(
    padded_mles: list, heights: list, config: JaggedConfig, tcs=None
) -> tuple:
    """Commit tables.

    padded_mles: [(2^max_log_row_count, W_i) monty jnp] — rows beyond
    heights[i] MUST be zero. heights: real row counts.
    Reference: slop/crates/jagged/src/prover.rs:105 commit_multilinears.
    """
    mlrc = config.max_log_row_count
    row_counts = list(heights)
    column_counts = [int(m.shape[1]) for m in padded_mles]
    # Dense data: only the real rows of each column, column-major.
    parts = []
    for m, h in zip(padded_mles, heights):
        assert int(m.shape[0]) == 1 << mlrc
        if h > 0:
            parts.append(jnp.asarray(m)[:h].T.reshape(-1))
    flat = jnp.concatenate(parts) if len(parts) > 1 else parts[0]
    commitment, stacked_data = _stacked_commit_flat(flat, config, tcs=tcs)
    num_added_vals = stacked_data.num_added_vals
    num_added_cols = max(-(-num_added_vals // (1 << mlrc)), 1)
    row_counts.append(1 << mlrc)
    row_counts.append(num_added_vals - (num_added_cols - 1) * (1 << mlrc))
    column_counts.append(num_added_cols - 1)
    column_counts.append(1)
    final_commitment = metadata_hash_commit(commitment, row_counts, column_counts)
    return final_commitment, JaggedProverData(
        stacked_data=stacked_data,
        row_counts=row_counts,
        column_counts=column_counts,
        padding_column_count=num_added_cols,
        original_commitment=commitment,
    )


def _stacked_commit_flat(flat, config: JaggedConfig, tcs=None):
    """Stacked commit of a pre-flattened column-major vector."""
    sh = 1 << config.log_stacking_height
    total = int(flat.shape[0])
    padded = max(-(-total // sh), 1) * sh
    if padded > total:
        flat = jnp.concatenate([flat, jnp.zeros(padded - total, jnp.uint32)])
    mat = flat.reshape(-1, sh).T
    from . import basefold as bf

    commit, bf_data = bf.commit_mles([mat], config.fri, tcs=tcs)
    return commit, StackedProverData(
        basefold_data=bf_data, stacked_matrix=mat, num_added_vals=padded - total
    )


def _expand_col_heights(prover_data: list) -> list:
    """Per-column heights across rounds (repeat per column count)."""
    heights = []
    for pd in prover_data:
        for r, c in zip(pd.row_counts, pd.column_counts):
            heights.extend([r] * c)
    return heights


def prove_trusted_evaluations(
    eval_point: np.ndarray,
    evaluation_claims: list,  # per round: list of (W_i, 4) canonical
    prover_data: list,
    config: JaggedConfig,
    challenger: DuplexChallenger,
    tcs=None,
) -> JaggedPcsProof:
    """Reference: slop/crates/jagged/src/prover.rs:162."""
    total_cols = sum(
        sum(pd.column_counts) for pd in prover_data
    )
    num_col_vars = log2_ceil(total_cols) if total_cols > 1 else 0
    z_col = challenger.sample_ext_vec(num_col_vars)
    z_row = np.asarray(eval_point, np.uint32)

    # Column claims with zeros inserted for padding columns.
    col_claims = []
    for rnd, pd in zip(evaluation_claims, prover_data):
        for claims in rnd:
            col_claims.extend(np.asarray(claims, np.uint32).reshape(-1, 4))
        col_claims.extend([np.zeros(4, np.uint32)] * pd.padding_column_count)
    col_claims = np.stack(col_claims)

    params = JaggedParams(
        col_heights=_expand_col_heights(prover_data),
        max_log_row_count=config.max_log_row_count,
    )

    from ..utils import dfs

    use_dfs = dfs.enabled() and not (tcs is not None and getattr(tcs, "host_only", False))

    # The jagged sumcheck: dense * J over log_m variables.
    with timing.span("jtable"):
        jag = partial_jagged_mle(params, z_row, z_col)
        dense = _dense_padded(prover_data, params.log_m)
        poly = HadamardPoly(mle_ops.ext4_embed(dense), jag, force_device=use_dfs)

    # claim = column-claims MLE evaluated at z_col
    padded = np.zeros((1 << num_col_vars, 4), np.uint32)
    padded[: col_claims.shape[0]] = col_claims
    claim = stacked._host_eval_ext_mle(padded, z_col)

    lam_one = E4.one()
    if use_dfs and not poly.host:
        # Device sumcheck + device dense_eval at the (device-resident)
        # final point, fetched together in ONE transfer — the host-side
        # dense_eval was the first hard sync after the async jtable /
        # sumcheck enqueues and absorbed all their queued device time.
        from ..iop import dsumcheck as dsc
        from ..iop.dchallenger import TraceChallenger, _unshard
        from ..utils.fetch import batch_fetch

        with timing.span("jagged_sumcheck"):
            tch = TraceChallenger.from_host(challenger)
            deferred = dsc.device_sumcheck([poly], tch, [claim], lam_one)
            point_c = jnp.stack(list(deferred.alphas))
            dense_handle = _dense_eval_kernel(_unshard(dense), point_c)
        with timing.span("dense_eval"):
            h = deferred.handles()
            fetched = batch_fetch(h + [dense_handle])
            tch.to_host(challenger)
            sumcheck_proof, _ = deferred.from_fetched(fetched[: len(h)])
            dense_eval = fetched[len(h)]
        final_point = sumcheck_proof.point
    else:
        with timing.span("jagged_sumcheck"):
            sumcheck_proof, _ = sc.reduce_sumcheck_to_evaluation(
                [poly], challenger, [claim], lam_one
            )
        final_point = sumcheck_proof.point

        with timing.span("dense_eval"):
            if int(dense.shape[0]) <= (HOST_THRESH << 8):
                dense_c = hostmle.dev_to_host(dense).astype(np.uint64)
                eq_c = mle_ops.host.partial_lagrange_ext(final_point).astype(np.uint64)
                prod = (dense_c[:, None] * eq_c) % kb.P  # mod BEFORE summing
                dense_eval = (prod.sum(axis=0) % kb.P).astype(np.uint32)
            else:
                dense_eval = _from_monty_np(
                    mle_ops.eval_mle_at_point_ext(
                        dense[:, None], jnp.asarray(_to_monty_np(final_point))
                    )[0]
                )

    with timing.span("jagged_eval"):
        jagged_eval_proof = prove_jagged_eval(
            params, z_row, z_col, final_point, challenger
        )

    with timing.span("stacked_pcs"):
        pcs_proof = stacked.prove_trusted_evaluation(
            final_point,
            [pd.stacked_data for pd in prover_data],
            config.fri,
            config.log_stacking_height,
            challenger,
            tcs=tcs,
        )

    return JaggedPcsProof(
        pcs_proof=pcs_proof,
        sumcheck_proof=sumcheck_proof,
        jagged_eval_proof=jagged_eval_proof,
        row_counts_and_column_counts=[
            list(zip(pd.row_counts, pd.column_counts)) for pd in prover_data
        ],
        merkle_tree_commitments=[pd.original_commitment for pd in prover_data],
        expected_eval=dense_eval,
        max_log_row_count=config.max_log_row_count,
        log_m=params.log_m,
    )


def _dense_padded(prover_data: list, log_m: int):
    """Concatenated dense vectors of all rounds, zero-padded to 2^log_m."""
    parts = []
    for pd in prover_data:
        mat = pd.stacked_data.stacked_matrix
        parts.append(mat.T.reshape(-1))
    flat = jnp.concatenate(parts) if len(parts) > 1 else parts[0]
    total = int(flat.shape[0])
    if (1 << log_m) > total:
        flat = jnp.concatenate([flat, jnp.zeros((1 << log_m) - total, jnp.uint32)])
    assert int(flat.shape[0]) == 1 << log_m
    return flat


def verify_trusted_evaluations(
    commitments: list,
    point: np.ndarray,
    evaluation_claims: list,
    proof: JaggedPcsProof,
    config: JaggedConfig,
    challenger: DuplexChallenger,
    tcs=None,
) -> bool:
    """Reference: slop/crates/jagged/src/verifier.rs:110."""
    rc_cc = proof.row_counts_and_column_counts
    if any(len(r) == 0 for r in rc_cc):
        return False
    row_counts = [[r for r, _ in rnd] for rnd in rc_cc]
    column_counts = [[c for _, c in rnd] for rnd in rc_cc]
    col_heights = [
        r for rnd in rc_cc for (r, c) in rnd for _ in range(c)
    ]
    prefix_sums = [0]
    for h in col_heights:
        prefix_sums.append(prefix_sums[-1] + h)
    log_m = log2_ceil(prefix_sums[-1])
    if proof.max_log_row_count != config.max_log_row_count or proof.log_m != log_m:
        return False

    num_col_vars = log2_ceil(len(prefix_sums) - 1) if len(prefix_sums) > 2 else 0
    z_col = challenger.sample_ext_vec(num_col_vars)
    z_row = np.asarray(point, np.uint32)
    if z_row.shape[0] != config.max_log_row_count:
        return False

    col_claims = [
        np.asarray(c, np.uint32).reshape(-1, 4)
        for rnd in evaluation_claims
        for c in rnd
    ]
    col_claims = list(np.concatenate(col_claims)) if col_claims else []

    if (
        len(commitments) != len(evaluation_claims)
        or len(row_counts) != len(commitments)
        or len(proof.merkle_tree_commitments) != len(commitments)
    ):
        return False
    if any(len(rc) < 2 for rc in row_counts):
        return False
    for rnd_cc, rnd_claims in zip(column_counts, evaluation_claims):
        expected_len = sum(rnd_cc[:-2])
        got = sum(np.asarray(c, np.uint32).reshape(-1, 4).shape[0] for c in rnd_claims)
        if got != expected_len:
            return False

    # Verify metadata commitment binding.
    for rnd_cc, rnd_rc, modified, original in zip(
        column_counts, row_counts, commitments, proof.merkle_tree_commitments
    ):
        expected = metadata_hash_commit(original, rnd_rc, rnd_cc)
        if isinstance(expected, (int, np.integer)):
            if int(expected) != int(modified):
                return False
        elif not np.array_equal(expected, np.asarray(modified, np.uint32)):
            return False

    # Round areas and padding-table shape checks.
    round_areas = [
        sum(r * c for (r, c) in rnd[: len(rnd) - 2]) for rnd in rc_cc
    ]
    if any(a == 0 or a >= (1 << 30) for a in round_areas):
        return False
    sh = 1 << config.log_stacking_height
    expected_added = []
    for area in round_areas:
        nm = max(-(-area // sh), 1) * sh
        added_vals = nm - area
        expected_added.append(
            (added_vals, max(-(-added_vals // (1 << config.max_log_row_count)), 1))
        )
    proof_added_cols = [cc[-2] + 1 for cc in column_counts]
    if proof_added_cols != [cols for _, cols in expected_added]:
        return False
    if any(cc[-1] != 1 for cc in column_counts):
        return False
    if any(rc[-2] != 1 << config.max_log_row_count for rc in row_counts):
        return False
    for rc, (added_vals, cols) in zip(row_counts, expected_added):
        if rc[-1] != added_vals - (cols - 1) * (1 << config.max_log_row_count):
            return False
    if any(r > 1 << config.max_log_row_count for rc in row_counts for r in rc):
        return False
    if log_m >= 30:
        return False

    # Insert zero claims for padding columns.
    insertion_points = []
    state = 0
    for cc in column_counts:
        state += sum(cc[: len(cc) - 2])
        insertion_points.append(state)
    for ins, (_, cols) in zip(reversed(insertion_points), reversed(expected_added)):
        for _ in range(cols):
            col_claims.insert(ins, np.zeros(4, np.uint32))
    if len(prefix_sums) != len(col_claims) + 1:
        return False
    target = 1 << num_col_vars
    while len(col_claims) < target:
        col_claims.append(np.zeros(4, np.uint32))
    if len(col_claims) != target:
        return False
    claims_arr = np.stack(col_claims)
    sumcheck_claim = stacked._host_eval_ext_mle(claims_arr, z_col)
    if not np.array_equal(sumcheck_claim, proof.sumcheck_proof.claimed_sum):
        return False
    if not sc.partially_verify_sumcheck_proof(
        proof.sumcheck_proof, challenger, log_m, 2
    ):
        return False

    # Monotonicity of prefix sums.
    bits = log_m + 1
    for a, b in zip(prefix_sums, prefix_sums[1:]):
        pa = point_from_usize(a, bits)
        pb = point_from_usize(b, bits)
        pb_e = np.stack([pb] + [np.zeros_like(pb)] * 3, axis=-1)
        if not np.array_equal(full_geq_host(pa, pb_e), E4.one()):
            return False

    params = JaggedParams(col_heights=col_heights, max_log_row_count=config.max_log_row_count)
    jagged_eval = verify_jagged_eval(
        params, z_row, z_col, proof.sumcheck_proof.point, proof.jagged_eval_proof, challenger
    )
    if jagged_eval is None:
        return False
    if not np.array_equal(
        E4.mul(np.asarray(proof.expected_eval, np.uint32), jagged_eval),
        proof.sumcheck_proof.eval,
    ):
        return False

    total_areas = [a + added for a, (added, _) in zip(round_areas, expected_added)]
    return stacked.verify_trusted_evaluation(
        proof.merkle_tree_commitments,
        total_areas,
        proof.sumcheck_proof.point,
        proof.pcs_proof,
        proof.expected_eval,
        config.fri,
        config.log_stacking_height,
        challenger,
        tcs=tcs,
    )

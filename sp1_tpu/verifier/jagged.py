"""Scalar jagged-PCS verification over a verifier backend.

Reference: slop/crates/jagged/src/verifier.rs:110, jagged_eval/
(branching-program evaluation of the jagged indicator [HR18]),
slop/crates/jagged/src/poly.rs:389.
"""

from __future__ import annotations

from dataclasses import dataclass

from .backend import VerificationError
from .basefold import VBasefoldProof, compress, hash_row, \
    stacked_verify_trusted_evaluation
from .mle import eq_points, eval_ext_mle, log2_ceil, partial_lagrange, \
    point_from_usize
from .sumcheck import VSumcheckProof, partially_verify


@dataclass
class VJaggedPcsProof:
    batch_evaluations: list  # per round: list of ext (stacked proof part)
    basefold_proof: VBasefoldProof
    sumcheck_proof: VSumcheckProof
    jagged_eval_proof: VSumcheckProof
    row_counts_and_column_counts: list  # static ints, per round [(rows, cols)]
    merkle_tree_commitments: list  # per round: 8 felts
    expected_eval: object  # ext
    max_log_row_count: int  # static
    log_m: int  # static


# ---------------------------------------------------------------------------
# Branching program (reference: slop/crates/jagged/src/poly.rs:389)
# ---------------------------------------------------------------------------


def _build_transition():
    """table[mem][row + 2*idx + 4*cur + 8*nxt] = next mem state or -1.

    mem = carry + 2*comparison; the program checks next_prefix =
    prefix + row with index <-> next_prefix comparison accumulation.
    """
    table = [[-1] * 16 for _ in range(4)]
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
            table[mem][bits] = (s >> 1) + 2 * new_comp
    return table


_TRANSITION = _build_transition()
_SUCCESS_STATE = 2  # carry=0, comparison=1
_INITIAL_STATE = 0


class VBranchingProgram:
    """Scalar BP evaluation; z_row/z_index are lists of ext handles."""

    def __init__(self, bk, z_row, z_index):
        self.bk = bk
        self.z_row = list(z_row)
        self.z_index = list(z_index)
        self.num_vars = max(len(self.z_row), len(self.z_index))

    def _lsb(self, point, i):
        """i-th least significant coordinate or zero."""
        if len(point) <= i:
            return self.bk.zero_ext()
        return point[len(point) - i - 1]

    def eval(self, prefix, next_prefix):
        """prefix/next_prefix: lists of ext handles (bit points)."""
        bk = self.bk
        one = bk.one_ext()
        zero = bk.zero_ext()
        results = [zero, zero, one if _SUCCESS_STATE == 2 else zero, zero]
        results[_SUCCESS_STATE] = one
        for layer in range(self.num_vars, -1, -1):
            pts = [
                self._lsb(self.z_row, layer),
                self._lsb(self.z_index, layer),
                self._lsb(prefix, layer),
                self._lsb(next_prefix, layer),
            ]
            pairs = [(bk.esub(one, x), x) for x in pts]
            new_results = [zero, zero, zero, zero]
            for combo in range(16):
                # combo bits: row slowest (combo>>3), then idx, cur, nxt.
                row_b = (combo >> 3) & 1
                idx_b = (combo >> 2) & 1
                cur_b = (combo >> 1) & 1
                nxt_b = combo & 1
                eq_val = bk.emul(
                    bk.emul(pairs[0][row_b], pairs[1][idx_b]),
                    bk.emul(pairs[2][cur_b], pairs[3][nxt_b]),
                )
                bit_idx = row_b + 2 * idx_b + 4 * cur_b + 8 * nxt_b
                for mem in range(4):
                    out = _TRANSITION[mem][bit_idx]
                    if out >= 0:
                        new_results[mem] = bk.eadd(
                            new_results[mem], bk.emul(eq_val, results[out])
                        )
            results = new_results
        return results[_INITIAL_STATE]


# ---------------------------------------------------------------------------
# Jagged-eval sub-protocol
# ---------------------------------------------------------------------------


def _static_bits_to_ext(bk, bits):
    one = bk.one_ext()
    zero = bk.zero_ext()
    return [one if b else zero for b in bits]


class _StaticEq:
    """eq(bits, point) for STATIC bit vectors against one fixed point.

    Each factor is y_k (bit 1) or 1-y_k (bit 0) — no generic eq ops —
    and prefix products are cached, so evaluating eq for a sorted run of
    bit vectors (jagged prefix sums) costs ~1 mul per new suffix bit
    instead of 4 ops per coordinate per vector. This is what makes the
    recursion-compiled jagged verifier small."""

    def __init__(self, bk, point):
        self.bk = bk
        one = bk.one_ext()
        self.factors = [(bk.esub(one, y), y) for y in point]
        self.cache = {(): one}

    def eval(self, bits) -> object:
        bits = tuple(bits)
        assert len(bits) <= len(self.factors)
        got = self.cache.get(bits)
        if got is not None:
            return got
        prev = self.eval(bits[:-1])
        v = self.bk.emul(prev, self.factors[len(bits) - 1][bits[-1]])
        self.cache[bits] = v
        return v


def verify_jagged_eval(bk, col_heights, max_log_row_count, log_m, z_row, z_col,
                       z_trace, proof: VSumcheckProof, challenger):
    """Returns the verified jagged evaluation (ext handle).

    Reference: jagged_eval/sumcheck_eval.rs jagged_evaluation.
    """
    jagged_eval = proof.claimed_sum
    challenger.observe_ext(jagged_eval)
    bits = log_m + 1
    point = partially_verify(bk, proof, challenger, 2 * bits, 2)
    half_dim = len(point) // 2
    first_half, second_half = point[:half_dim], point[half_dim:]
    z_col_eq = partial_lagrange(bk, z_col)
    prefix_sums = [0]
    for h in col_heights:
        prefix_sums.append(prefix_sums[-1] + h)
    C = len(col_heights)
    if C > len(z_col_eq):
        raise VerificationError("more columns than z_col space")
    eq_first = _StaticEq(bk, first_half)
    eq_second = _StaticEq(bk, second_half)
    acc = bk.zero_ext()
    for c in range(C):
        fle = bk.emul(
            eq_first.eval(point_from_usize(prefix_sums[c], bits)),
            eq_second.eval(point_from_usize(prefix_sums[c + 1], bits)),
        )
        acc = bk.eadd(acc, bk.emul(z_col_eq[c], fle))
    bp = VBranchingProgram(bk, z_row, z_trace)
    h = bp.eval(first_half, second_half)
    expected = bk.emul(acc, h)
    bk.assert_e_eq(expected, proof.eval, "jagged-eval final evaluation")
    return jagged_eval


# ---------------------------------------------------------------------------
# Metadata commitment binding
# ---------------------------------------------------------------------------


def metadata_hash_commit(bk, inner_commit, row_counts, column_counts):
    """compress(inner_commit, hash(len || row_counts || column_counts)).

    Reference: slop/crates/jagged/src/prover.rs:141. The layout items are
    static; only the inner commitment is a handle.
    """
    items = [len(column_counts)] + list(row_counts) + list(column_counts)
    h = hash_row(bk, [bk.felt(v) for v in items])
    return compress(bk, inner_commit, h)


# ---------------------------------------------------------------------------
# Full jagged verification
# ---------------------------------------------------------------------------


def verify_trusted_evaluations(bk, commitments, point, evaluation_claims,
                               proof: VJaggedPcsProof, config, challenger):
    """commitments: per round, 8-felt digests. evaluation_claims: per
    round, list of per-table lists of ext handles (column claims).

    Reference: slop/crates/jagged/src/verifier.rs:110.
    """
    rc_cc = proof.row_counts_and_column_counts
    if any(len(r) == 0 for r in rc_cc):
        raise VerificationError("empty round layout")
    row_counts = [[r for r, _ in rnd] for rnd in rc_cc]
    column_counts = [[c for _, c in rnd] for rnd in rc_cc]
    col_heights = [r for rnd in rc_cc for (r, c) in rnd for _ in range(c)]
    prefix_sums = [0]
    for h in col_heights:
        prefix_sums.append(prefix_sums[-1] + h)
    log_m = log2_ceil(prefix_sums[-1])
    if proof.max_log_row_count != config.max_log_row_count or proof.log_m != log_m:
        raise VerificationError("jagged size metadata mismatch")

    num_col_vars = log2_ceil(len(prefix_sums) - 1) if len(prefix_sums) > 2 else 0
    z_col = challenger.sample_ext_vec(num_col_vars)
    z_row = list(point)
    if len(z_row) != config.max_log_row_count:
        raise VerificationError("evaluation point dimension mismatch")

    col_claims = [c for rnd in evaluation_claims for table in rnd for c in table]

    if (
        len(commitments) != len(evaluation_claims)
        or len(row_counts) != len(commitments)
        or len(proof.merkle_tree_commitments) != len(commitments)
    ):
        raise VerificationError("round count mismatch")
    if any(len(rc) < 2 for rc in row_counts):
        raise VerificationError("round missing padding tables")
    for rnd_cc, rnd_claims in zip(column_counts, evaluation_claims):
        expected_len = sum(rnd_cc[:-2])
        got = sum(len(table) for table in rnd_claims)
        if got != expected_len:
            raise VerificationError("claim count mismatch")

    # Metadata commitment binding.
    for rnd_cc, rnd_rc, modified, original in zip(
        column_counts, row_counts, commitments, proof.merkle_tree_commitments
    ):
        expected = metadata_hash_commit(bk, original, rnd_rc, rnd_cc)
        for e, m in zip(expected, modified):
            bk.assert_f_eq(e, m, "jagged metadata commitment")

    # Round areas and padding-table shape checks (static).
    round_areas = [sum(r * c for (r, c) in rnd[: len(rnd) - 2]) for rnd in rc_cc]
    if any(a == 0 or a >= (1 << 30) for a in round_areas):
        raise VerificationError("round area out of range")
    sh = 1 << config.log_stacking_height
    mlr = 1 << config.max_log_row_count
    expected_added = []
    for area in round_areas:
        nm = max(-(-area // sh), 1) * sh
        added_vals = nm - area
        expected_added.append((added_vals, max(-(-added_vals // mlr), 1)))
    proof_added_cols = [cc[-2] + 1 for cc in column_counts]
    if proof_added_cols != [cols for _, cols in expected_added]:
        raise VerificationError("padding column count mismatch")
    if any(cc[-1] != 1 for cc in column_counts):
        raise VerificationError("final padding table must be one column")
    if any(rc[-2] != mlr for rc in row_counts):
        raise VerificationError("padding table height mismatch")
    for rc, (added_vals, cols) in zip(row_counts, expected_added):
        if rc[-1] != added_vals - (cols - 1) * mlr:
            raise VerificationError("final padding height mismatch")
    if any(r > mlr for rc in row_counts for r in rc):
        raise VerificationError("table height exceeds max rows")
    if log_m >= 30:
        raise VerificationError("log_m out of range")

    # Insert zero claims for padding columns.
    insertion_points = []
    state = 0
    for cc in column_counts:
        state += sum(cc[: len(cc) - 2])
        insertion_points.append(state)
    for ins, (_, cols) in zip(reversed(insertion_points), reversed(expected_added)):
        for _ in range(cols):
            col_claims.insert(ins, bk.zero_ext())
    if len(prefix_sums) != len(col_claims) + 1:
        raise VerificationError("column bookkeeping mismatch")
    target = 1 << num_col_vars
    while len(col_claims) < target:
        col_claims.append(bk.zero_ext())
    if len(col_claims) != target:
        raise VerificationError("too many columns")
    sumcheck_claim = eval_ext_mle(bk, col_claims, z_col)
    bk.assert_e_eq(
        sumcheck_claim, proof.sumcheck_proof.claimed_sum, "jagged sumcheck claim"
    )
    sc_point = partially_verify(bk, proof.sumcheck_proof, challenger, log_m, 2)

    # Monotonicity of prefix sums (static layout data).
    for a, b in zip(prefix_sums, prefix_sums[1:]):
        if a > b:
            raise VerificationError("prefix sums not monotone")

    jagged_eval = verify_jagged_eval(
        bk, col_heights, config.max_log_row_count, log_m, z_row, z_col,
        sc_point, proof.jagged_eval_proof, challenger,
    )
    bk.assert_e_eq(
        bk.emul(proof.expected_eval, jagged_eval),
        proof.sumcheck_proof.eval,
        "jagged sumcheck factorization",
    )

    total_areas = [a + added for a, (added, _) in zip(round_areas, expected_added)]
    stacked_verify_trusted_evaluation(
        bk,
        proof.merkle_tree_commitments,
        total_areas,
        sc_point,
        proof.batch_evaluations,
        proof.basefold_proof,
        proof.expected_eval,
        config.fri,
        config.log_stacking_height,
        challenger,
    )

"""Scalar BaseFold + Merkle + stacked-PCS verification over a backend.

Reference: slop/crates/basefold/src/verifier.rs (`verify_mle_evaluations`,
`verify_queries`), slop/crates/merkle-tree/src/tcs.rs,
slop/crates/stacked/src/verifier.rs:39.

Value-dependent index arithmetic (query-path selection, FRI point
computation) is expressed over index BITS with backend selects, so the
same code lowers to the recursion circuit.
"""

from __future__ import annotations

from dataclasses import dataclass

from .backend import DIGEST, P, RATE, TWO_ADIC_GENERATOR, TWO_ADICITY, WIDTH, \
    VerificationError
from .mle import eval_ext_mle, partial_lagrange, uni_eval

BATCH_GRINDING_BITS = 5


@dataclass
class VMerkleProof:
    paths: list  # per query: list of per-level digests (8 felts each)


@dataclass
class VOpening:
    values: list  # per query: list of felt handles (row values)
    proof: VMerkleProof


@dataclass
class VBasefoldProof:
    univariate_messages: list  # rounds x [ext, ext]
    fri_commitments: list  # per round: 8 felts
    component_openings: list  # per commit round: VOpening
    query_openings: list  # per fri round: VOpening
    final_poly: object  # ext
    pow_witness: object  # felt
    batch_grinding_witness: object  # felt


def two_adic_generator(log_n: int) -> int:
    assert 0 <= log_n <= TWO_ADICITY
    return pow(TWO_ADIC_GENERATOR, 1 << (TWO_ADICITY - log_n), P)


# ---------------------------------------------------------------------------
# Merkle (Poseidon2 sponge + compression) over the backend
# ---------------------------------------------------------------------------


def hash_row(bk, values):
    """PaddingFreeSponge rate 8: absorb values in chunks, return 8-digest."""
    state = [bk.felt(0)] * WIDTH
    for start in range(0, len(values), RATE):
        chunk = list(values[start : start + RATE])
        while len(chunk) < RATE:
            chunk.append(bk.felt(0))
        state = chunk + state[RATE:]
        state = bk.poseidon2(state)
    return state[:DIGEST]


def compress(bk, left, right):
    state = list(left) + list(right)
    return bk.poseidon2(state)[:DIGEST]


def verify_merkle_opening(bk, root, index_bits, values, path):
    """One query: hash the row, walk up with bit-selected siblings.

    index_bits: LSB-first felt bits of the leaf index (len = tree depth).
    path: per-level sibling digests, bottom-up.
    """
    if len(path) != len(index_bits):
        raise VerificationError(
            f"merkle path depth {len(path)} != {len(index_bits)}"
        )
    digest = hash_row(bk, values)
    for bit, sib in zip(index_bits, path):
        left = [bk.select_f(bit, s, d) for s, d in zip(sib, digest)]
        right = [bk.select_f(bit, d, s) for s, d in zip(sib, digest)]
        digest = compress(bk, left, right)
    for d, r in zip(digest, root):
        bk.assert_f_eq(d, r, "merkle root mismatch")


def verify_openings(bk, root, indices_bits, opening: VOpening, expected_width: int,
                    expected_log_height: int):
    if len(opening.values) != len(indices_bits):
        raise VerificationError("opening count mismatch")
    for vals, bits, path in zip(opening.values, indices_bits, opening.proof.paths):
        if len(vals) != expected_width:
            raise VerificationError("opening width mismatch")
        if len(bits) != expected_log_height:
            raise VerificationError("opening index width mismatch")
        verify_merkle_opening(bk, root, bits, vals, path)


# ---------------------------------------------------------------------------
# BaseFold
# ---------------------------------------------------------------------------


def _x_from_index_bits(bk, bits, log_max_height: int):
    """g^bitrev(index) from LSB-first index bits: bit j contributes
    g^(2^(log_max_height-1-j))."""
    acc = bk.felt(1)
    for j, bit in enumerate(bits):
        g_pow = pow(two_adic_generator(log_max_height), 1 << (log_max_height - 1 - j), P)
        acc = bk.fmul(acc, bk.select_f(bit, bk.felt(g_pow), bk.felt(1)))
    return acc


def verify_untrusted_evaluations(bk, commitments, eval_point, evaluation_claims,
                                 proof: VBasefoldProof, config, challenger):
    """evaluation_claims: per round, list of per-mle lists of ext handles."""
    for round_claims in evaluation_claims:
        for mle_eval in round_claims:
            challenger.observe_ext_slice(mle_eval)
    verify_mle_evaluations(
        bk, commitments, eval_point, evaluation_claims, proof, config, challenger
    )


def verify_mle_evaluations(bk, commitments, eval_point, evaluation_claims,
                           proof: VBasefoldProof, config, challenger):
    """Reference: slop/crates/basefold/src/verifier.rs:122."""
    point = list(eval_point)

    challenger.check_witness(BATCH_GRINDING_BITS, proof.batch_grinding_witness)

    flat_claims = [c for rc in evaluation_claims for mle in rc for c in mle]
    total_len = len(flat_claims)
    num_batching_vars = max(total_len - 1, 0).bit_length() if total_len > 1 else 0
    batching_point = challenger.sample_ext_vec(num_batching_vars)
    coeffs = partial_lagrange(bk, batching_point)[:total_len]

    eval_claim = bk.zero_ext()
    for claim, coeff in zip(flat_claims, coeffs):
        eval_claim = bk.eadd(eval_claim, bk.emul(claim, coeff))

    if len(evaluation_claims) != len(commitments) or len(commitments) != len(
        proof.component_openings
    ):
        raise VerificationError("basefold round count mismatch")
    num_rounds = len(proof.univariate_messages)
    if len(proof.fri_commitments) != num_rounds or num_rounds != len(point):
        raise VerificationError("basefold fri round count mismatch")
    if num_rounds == 0:
        raise VerificationError("empty basefold proof")

    # Prover fixes the last coordinate first -> reverse for verification.
    point = point[::-1]

    challenger.observe_const(num_rounds)
    betas = []
    for r in range(num_rounds):
        for m in proof.univariate_messages[r]:
            challenger.observe_ext(m)
        challenger.observe_digest(proof.fri_commitments[r])
        betas.append(challenger.sample_ext())

    one = bk.one_ext()
    first = proof.univariate_messages[0]
    lhs = bk.eadd(
        bk.emul(bk.esub(one, point[0]), first[0]), bk.emul(point[0], first[1])
    )
    bk.assert_e_eq(eval_claim, lhs, "basefold first message")
    expected_eval = bk.eadd(first[0], bk.emul(betas[0], first[1]))
    for i in range(1, num_rounds):
        poly = proof.univariate_messages[i]
        lhs = bk.eadd(
            bk.emul(bk.esub(one, point[i]), poly[0]), bk.emul(point[i], poly[1])
        )
        bk.assert_e_eq(expected_eval, lhs, f"basefold message {i}")
        expected_eval = bk.eadd(poly[0], bk.emul(betas[i], poly[1]))

    challenger.observe_ext(proof.final_poly)
    challenger.check_witness(config.proof_of_work_bits, proof.pow_witness)

    log_len = num_rounds
    if log_len + config.log_blowup > TWO_ADICITY:
        raise VerificationError("domain exceeds two-adicity")

    query_bits = [
        challenger.sample_bits(log_len + config.log_blowup)
        for _ in range(config.num_queries)
    ]

    # Batched evaluations at the query points from component openings.
    batch_evals = [bk.zero_ext() for _ in query_bits]
    batch_idx = 0
    for round_idx, opening in enumerate(proof.component_openings):
        total_columns = sum(
            len(mle) for mle in evaluation_claims[round_idx]
        )
        if len(opening.values) != len(query_bits):
            raise VerificationError("component opening query count mismatch")
        round_coeffs = coeffs[batch_idx : batch_idx + total_columns]
        for q in range(len(query_bits)):
            if len(opening.values[q]) != total_columns:
                raise VerificationError("component opening width mismatch")
            for c in range(total_columns):
                term = bk.emul_f(round_coeffs[c], opening.values[q][c])
                batch_evals[q] = bk.eadd(batch_evals[q], term)
        batch_idx += total_columns

    for commit, opening in zip(commitments, proof.component_openings):
        width = len(opening.values[0])
        verify_openings(
            bk, commit, query_bits, opening, width, log_len + config.log_blowup
        )

    _verify_queries(
        bk,
        proof.fri_commitments,
        query_bits,
        proof.final_poly,
        batch_evals,
        proof.query_openings,
        betas,
        config,
    )

    last_msg = proof.univariate_messages[-1]
    expect_final = bk.eadd(last_msg[0], bk.emul(betas[-1], last_msg[1]))
    bk.assert_e_eq(proof.final_poly, expect_final, "basefold final poly")


def _verify_queries(bk, commitments, query_bits, final_poly, reduced_openings,
                    query_openings, betas, config):
    """Reference: slop/crates/basefold/src/verifier.rs:308 verify_queries."""
    log_max_height = len(commitments) + config.log_blowup
    folded = list(reduced_openings)
    bits = [list(qb) for qb in query_bits]
    xs = [_x_from_index_bits(bk, qb, log_max_height) for qb in query_bits]
    if len(commitments) != len(query_openings) or len(commitments) != len(betas):
        raise VerificationError("fri round count mismatch")

    round_heights = list(range(config.log_blowup, log_max_height))[::-1]
    for round_idx, commitment, opening, beta in zip(
        round_heights, commitments, query_openings, betas
    ):
        if len(opening.values) != len(bits):
            raise VerificationError("query opening count mismatch")
        for q in range(len(bits)):
            vals = opening.values[q]
            if len(vals) != 8:
                raise VerificationError("query opening width must be 8")
            e0 = bk.ext_from_felts(vals[0:4])
            e1 = bk.ext_from_felts(vals[4:8])
            b0 = bits[q][0]
            # the opened pair must contain the running folded value at
            # this query's parity slot
            mine = bk.select_e(b0, e1, e0)
            bk.assert_e_eq(mine, folded[q], "fri fold consistency")
            # x0 = +-x with the sign of the even slot
            x = xs[q]
            x0 = bk.select_f(b0, bk.fneg(x), x)
            # folded = e0 + (beta - x0) * (e1 - e0) / (x1 - x0), x1 = -x0
            denom = bk.fsub(bk.fneg(x0), x0)
            denom_inv = bk.finv(denom)
            diff = bk.esub(e1, e0)
            bmx = bk.esub(beta, bk.ext_from_felt(x0))
            slope = bk.emul_f(diff, denom_inv)
            folded[q] = bk.eadd(e0, bk.emul(bmx, slope))
            bits[q] = bits[q][1:]
            xs[q] = bk.fmul(x, x)
        verify_openings(bk, commitment, bits, opening, 8, round_idx)

    for v in folded:
        bk.assert_e_eq(v, final_poly, "fri final value")


# ---------------------------------------------------------------------------
# Stacked PCS
# ---------------------------------------------------------------------------


def stacked_verify_trusted_evaluation(bk, commitments, round_areas, point,
                                      batch_evaluations, basefold_proof, evaluation_claim,
                                      config, log_stacking_height, challenger):
    """Reference: slop/crates/stacked/src/verifier.rs:39.

    batch_evaluations: per round, list of ext handles (the stacked-column
    evaluations at the stack point).
    """
    n = len(point)
    if n < log_stacking_height:
        raise VerificationError("point shorter than stacking height")
    batch_point = point[: n - log_stacking_height]
    stack_point = point[n - log_stacking_height :]
    if len(batch_evaluations) != len(round_areas) or len(commitments) != len(round_areas):
        raise VerificationError("stacked round count mismatch")
    for area, evals in zip(round_areas, batch_evaluations):
        if area % (1 << log_stacking_height) != 0:
            raise VerificationError("round area not stacked-aligned")
        if area >> log_stacking_height != len(evals):
            raise VerificationError("batch evaluation count mismatch")
    all_evals = [e for evals in batch_evaluations for e in evals]
    padded_len = 1 << len(batch_point)
    if len(all_evals) > padded_len:
        raise VerificationError("too many batch evaluations")
    expected = eval_ext_mle(bk, all_evals, batch_point)
    bk.assert_e_eq(expected, evaluation_claim, "stacked batch evaluation claim")
    verify_untrusted_evaluations(
        bk,
        commitments,
        stack_point,
        [[be] for be in batch_evaluations],
        basefold_proof,
        config,
        challenger,
    )

"""Scalar LogUp-GKR verification over a verifier backend.

Reference: crates/hypercube/src/logup_gkr/verifier.rs:103, grinding bits
crates/hypercube/src/verifier/shard.rs:41. Interaction definitions are
taken from the machine's chips (shared AIR definitions); all protocol
logic is independent of the prover stack.
"""

from __future__ import annotations

from dataclasses import dataclass

from .backend import VerificationError
from .mle import eq_points, eval_ext_mle, full_geq, log2_ceil, partial_lagrange
from .ops import VOps
from .sumcheck import VSumcheckProof, partially_verify

GKR_GRINDING_BITS = 12


def scoped_interactions(chip, scope: str) -> list:
    """[(interaction, is_send)] for one chip, filtered by scope."""
    return [(i, True) for i in chip.sends() if i.scope == scope] + [
        (i, False) for i in chip.receives() if i.scope == scope
    ]


def gkr_beta_seed_dim(machine, chips, scope="local") -> int:
    max_arity = max(
        (len(i.values) + 1 for c in chips for i, _ in scoped_interactions(c, scope)),
        default=1,
    )
    pv_arity = machine.max_pv_interaction_arity() if scope == "local" else 1
    return log2_ceil(max(max_arity, pv_arity))


@dataclass
class VGkrRound:
    numerator_0: object  # ext
    numerator_1: object
    denominator_0: object
    denominator_1: object
    sumcheck_proof: VSumcheckProof


@dataclass
class VGkrProof:
    numerator_output: list  # list of ext
    denominator_output: list
    round_proofs: list  # VGkrRound
    chip_openings: dict  # name -> (main: list[ext], prep: list[ext] | None)
    witness: object  # felt
    cumulative_sum: object = None  # ext (global scope)


def eval_pv_digest(bk, machine, public_values, alpha, betas):
    """Backend evaluation of the machine's public-values digest."""
    bool_idx, terms = machine.pv_digest_spec()
    for i in bool_idx:
        v = public_values[i]
        bk.assert_f_zero(
            bk.fmul(v, bk.fsub(v, bk.felt(1))), "public value must be boolean"
        )
    digest = bk.zero_ext()
    for kind, idxs, sign in terms:
        fp = bk.eadd(alpha, bk.emul_const(betas[0], kind))
        for k, item in enumerate(idxs):
            if isinstance(item, tuple):  # ("c", v): a static constant value
                fp = bk.eadd(fp, bk.emul_const(betas[k + 1], item[1]))
            else:  # a public-values index
                fp = bk.eadd(fp, bk.emul_f(betas[k + 1], public_values[item]))
        inv = bk.einv(fp)
        digest = bk.eadd(digest, inv) if sign > 0 else bk.esub(digest, inv)
    return digest


def verify_logup_gkr(bk, machine, chips, degrees, max_log_row_count: int,
                     proof: VGkrProof, public_values, challenger,
                     scope: str = "local", global_challenges=None):
    """Returns the trace-opening point (list of ext, len = mlrc).

    degrees: dict name -> static big-endian bit list (len mlrc+1).
    """
    ops = VOps(bk)
    if scope == "local":
        beta_seed_dim = gkr_beta_seed_dim(machine, chips, scope)
        challenger.check_witness(GKR_GRINDING_BITS, proof.witness)
        alpha = challenger.sample_ext()
        beta_seed = challenger.sample_ext_vec(beta_seed_dim)
        _pv_challenge = challenger.sample_ext()
        betas = partial_lagrange(bk, beta_seed)
        pv_digest = eval_pv_digest(bk, machine, public_values, alpha, betas)
        cumulative_sum = bk.esub(bk.zero_ext(), pv_digest)
    else:
        alpha, betas = global_challenges
        if proof.cumulative_sum is None:
            raise VerificationError("global scope requires a cumulative sum")
        cumulative_sum = proof.cumulative_sum

    num_interactions = sum(len(scoped_interactions(c, scope)) for c in chips)
    iv = log2_ceil(num_interactions)
    expected_size = 1 << (iv + 1)
    numerator, denominator = proof.numerator_output, proof.denominator_output
    if len(numerator) != expected_size or len(denominator) != expected_size:
        raise VerificationError("gkr output layer size mismatch")
    challenger.observe_variable_length_ext_slice(numerator)
    challenger.observe_variable_length_ext_slice(denominator)
    out_sum = bk.zero_ext()
    for n, d in zip(numerator, denominator):
        out_sum = bk.eadd(out_sum, bk.emul(n, bk.einv(d)))
    bk.assert_e_eq(out_sum, cumulative_sum, "gkr cumulative sum")

    first_eval_point = challenger.sample_ext_vec(iv + 1)
    numerator_eval = eval_ext_mle(bk, numerator, first_eval_point)
    denominator_eval = eval_ext_mle(bk, denominator, first_eval_point)
    eval_point = first_eval_point

    if len(proof.round_proofs) + 1 != max_log_row_count:
        raise VerificationError("gkr round count mismatch")

    for i, rp in enumerate(proof.round_proofs):
        lam = challenger.sample_ext()
        expected_claim = bk.eadd(bk.emul(numerator_eval, lam), denominator_eval)
        bk.assert_e_eq(
            rp.sumcheck_proof.claimed_sum, expected_claim, "gkr round claim"
        )
        point = partially_verify(bk, rp.sumcheck_proof, challenger, i + iv + 1, 3)
        eq_eval = eq_points(bk, point, eval_point)
        num_sc = bk.eadd(
            bk.emul(rp.numerator_0, rp.denominator_1),
            bk.emul(rp.numerator_1, rp.denominator_0),
        )
        den_sc = bk.emul(rp.denominator_0, rp.denominator_1)
        expected_final = bk.emul(eq_eval, bk.eadd(bk.emul(num_sc, lam), den_sc))
        bk.assert_e_eq(rp.sumcheck_proof.eval, expected_final, "gkr round final")
        challenger.observe_ext(rp.numerator_0)
        challenger.observe_ext(rp.numerator_1)
        challenger.observe_ext(rp.denominator_0)
        challenger.observe_ext(rp.denominator_1)
        last_coord = challenger.sample_ext()
        numerator_eval = bk.eadd(
            rp.numerator_0,
            bk.emul(bk.esub(rp.numerator_1, rp.numerator_0), last_coord),
        )
        denominator_eval = bk.eadd(
            rp.denominator_0,
            bk.emul(bk.esub(rp.denominator_1, rp.denominator_0), last_coord),
        )
        eval_point = point + [last_coord]

    interaction_point = eval_point[:iv]
    trace_point = eval_point[iv:]
    if len(trace_point) != max_log_row_count:
        raise VerificationError("gkr trace point dimension mismatch")

    # Reconstruct last-layer leaf evaluations from the trace openings.
    numerator_values, denominator_values = [], []
    # add_dimension prepends at the FRONT (MSB).
    point_extended = [bk.zero_ext()] + trace_point
    challenger.observe_const(len(chips))
    for chip in chips:
        opening = proof.chip_openings.get(chip.name)
        if opening is None:
            raise VerificationError(f"missing gkr opening for {chip.name}")
        main_evals, prep_evals = opening
        if prep_evals is not None:
            challenger.observe_variable_length_ext_slice(prep_evals)
            if len(prep_evals) != chip.preprocessed_width:
                raise VerificationError("gkr preprocessed opening width")
        elif chip.preprocessed_width != 0:
            raise VerificationError("missing preprocessed opening")
        challenger.observe_variable_length_ext_slice(main_evals)
        if len(main_evals) != chip.width:
            raise VerificationError("gkr main opening width")
        threshold = degrees[chip.name]
        if len(threshold) != len(point_extended):
            raise VerificationError("degree bits dimension mismatch")
        geq_eval = full_geq(bk, threshold, point_extended)
        prep_list = prep_evals if prep_evals is not None else []
        zero_main = [bk.zero_ext()] * chip.width
        zero_prep = [bk.zero_ext()] * chip.preprocessed_width
        for inter, is_send in scoped_interactions(chip, scope):
            real_n, real_d = inter.eval(prep_list, main_evals, alpha, betas, ops)
            pad_n, pad_d = inter.eval(zero_prep, zero_main, alpha, betas, ops)
            n_eval = bk.esub(real_n, bk.emul(pad_n, geq_eval))
            d_eval = bk.eadd(
                real_d, bk.emul(bk.esub(bk.one_ext(), pad_d), geq_eval)
            )
            if not is_send:
                n_eval = bk.esub(bk.zero_ext(), n_eval)
            numerator_values.append(n_eval)
            denominator_values.append(d_eval)
    target = 1 << iv
    while len(numerator_values) < target:
        numerator_values.append(bk.zero_ext())
        denominator_values.append(bk.one_ext())
    expected_num = eval_ext_mle(bk, numerator_values, interaction_point)
    expected_den = eval_ext_mle(bk, denominator_values, interaction_point)
    bk.assert_e_eq(numerator_eval, expected_num, "gkr leaf numerator")
    bk.assert_e_eq(denominator_eval, expected_den, "gkr leaf denominator")
    return trace_point

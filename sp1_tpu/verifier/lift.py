"""Lift concrete proof objects into backend-handle structures.

The lift is the witness boundary: every field element in the proof
becomes a backend handle (concrete ints for the standalone oracle; for
the symbolic backend the same traversal order defines the recursion
program's witness stream).
"""

from __future__ import annotations

from dataclasses import dataclass

from .basefold import VBasefoldProof, VMerkleProof, VOpening
from .gkr import VGkrProof, VGkrRound
from .jagged import VJaggedPcsProof
from .sumcheck import VSumcheckProof


@dataclass
class VVerifyingKey:
    pc_start: list  # 3 felts
    initial_global_cumulative_sum: list  # 14 felts
    preprocessed_commit: list  # 8 felts
    enable_untrusted_programs: object  # felt


@dataclass
class VOpenedValues:
    preprocessed: list  # list of ext
    main: list  # list of ext
    degree: list  # static big-endian bits (ints)


@dataclass
class VShardProof:
    public_values: list  # felts
    main_commitment: list  # 8 felts
    logup_gkr_proof: VGkrProof
    zerocheck_proof: VSumcheckProof
    opened_values: dict  # name -> VOpenedValues (chip order)
    evaluation_proof: VJaggedPcsProof
    global_gkr_proof: object = None  # VGkrProof | None


def _felts(bk, arr):
    return [bk.felt(int(v)) for v in arr]


def _ext(bk, coeffs):
    return bk.ext([int(c) for c in coeffs])


def _exts(bk, mat):
    """(N, 4) array -> list of N ext handles."""
    return [_ext(bk, row) for row in mat]


def lift_vk(bk, vk) -> VVerifyingKey:
    return VVerifyingKey(
        pc_start=_felts(bk, vk.pc_start),
        initial_global_cumulative_sum=_felts(bk, vk.initial_global_cumulative_sum),
        preprocessed_commit=_felts(bk, vk.preprocessed_commit),
        enable_untrusted_programs=bk.felt(int(vk.enable_untrusted_programs)),
    )


def lift_sumcheck(bk, proof) -> VSumcheckProof:
    return VSumcheckProof(
        univariate_polys=[
            [_ext(bk, c) for c in rnd] for rnd in proof.univariate_polys
        ],
        claimed_sum=_ext(bk, proof.claimed_sum),
        eval=_ext(bk, proof.eval),
    )


def lift_gkr(bk, proof) -> VGkrProof:
    chip_openings = {}
    for name, op in proof.logup_evaluations.chip_openings.items():
        main = _exts(bk, op.main_trace_evaluations)
        prep = (
            _exts(bk, op.preprocessed_trace_evaluations)
            if op.preprocessed_trace_evaluations is not None
            else None
        )
        chip_openings[name] = (main, prep)
    return VGkrProof(
        numerator_output=_exts(bk, proof.numerator_output),
        denominator_output=_exts(bk, proof.denominator_output),
        round_proofs=[
            VGkrRound(
                numerator_0=_ext(bk, rp.numerator_0),
                numerator_1=_ext(bk, rp.numerator_1),
                denominator_0=_ext(bk, rp.denominator_0),
                denominator_1=_ext(bk, rp.denominator_1),
                sumcheck_proof=lift_sumcheck(bk, rp.sumcheck_proof),
            )
            for rp in proof.round_proofs
        ],
        chip_openings=chip_openings,
        witness=bk.felt(int(proof.witness)),
        cumulative_sum=(
            _ext(bk, proof.cumulative_sum)
            if proof.cumulative_sum is not None
            else None
        ),
    )


def lift_opening(bk, opening) -> VOpening:
    values = [_felts(bk, row) for row in opening.values]
    paths = [
        [_felts(bk, level) for level in path] for path in opening.proof.paths
    ]
    return VOpening(values=values, proof=VMerkleProof(paths=paths))


def lift_basefold(bk, proof) -> VBasefoldProof:
    return VBasefoldProof(
        univariate_messages=[
            [_ext(bk, m) for m in rnd] for rnd in proof.univariate_messages
        ],
        fri_commitments=[_felts(bk, c) for c in proof.fri_commitments],
        component_openings=[lift_opening(bk, o) for o in proof.component_openings],
        query_openings=[lift_opening(bk, o) for o in proof.query_openings],
        final_poly=_ext(bk, proof.final_poly),
        pow_witness=bk.felt(int(proof.pow_witness)),
        batch_grinding_witness=bk.felt(int(proof.batch_grinding_witness)),
    )


def lift_jagged(bk, proof) -> VJaggedPcsProof:
    return VJaggedPcsProof(
        batch_evaluations=[
            _exts(bk, be) for be in proof.pcs_proof.batch_evaluations
        ],
        basefold_proof=lift_basefold(bk, proof.pcs_proof.basefold_proof),
        sumcheck_proof=lift_sumcheck(bk, proof.sumcheck_proof),
        jagged_eval_proof=lift_sumcheck(bk, proof.jagged_eval_proof),
        row_counts_and_column_counts=[
            [(int(r), int(c)) for r, c in rnd]
            for rnd in proof.row_counts_and_column_counts
        ],
        merkle_tree_commitments=[
            _felts(bk, c) for c in proof.merkle_tree_commitments
        ],
        expected_eval=_ext(bk, proof.expected_eval),
        max_log_row_count=int(proof.max_log_row_count),
        log_m=int(proof.log_m),
    )


def lift_shard_proof(bk, proof) -> VShardProof:
    opened = {}
    for name, ov in proof.opened_values.items():
        opened[name] = VOpenedValues(
            preprocessed=_exts(bk, ov.preprocessed),
            main=_exts(bk, ov.main),
            degree=[int(b) for b in ov.degree],
        )
    return VShardProof(
        public_values=[bk.felt(int(v)) for v in proof.public_values],
        main_commitment=_felts(bk, proof.main_commitment),
        logup_gkr_proof=lift_gkr(bk, proof.logup_gkr_proof),
        zerocheck_proof=lift_sumcheck(bk, proof.zerocheck_proof),
        opened_values=opened,
        evaluation_proof=lift_jagged(bk, proof.evaluation_proof),
        global_gkr_proof=(
            lift_gkr(bk, proof.global_gkr_proof)
            if proof.global_gkr_proof is not None
            else None
        ),
    )

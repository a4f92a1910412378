"""Partial sumcheck verification over a verifier backend.

Reference: slop/crates/sumcheck/src/verifier.rs:22
`partially_verify_sumcheck_proof`. Returns the sampled evaluation point
(big-endian: point[0] = last round's challenge), derived entirely from
the transcript, so callers never need to trust a prover-supplied point.
"""

from __future__ import annotations

from dataclasses import dataclass

from .backend import VerificationError
from .mle import uni_eval, uni_eval_zero_plus_one


@dataclass
class VSumcheckProof:
    """Lifted partial sumcheck proof: all values are backend handles."""

    univariate_polys: list  # rounds x (degree+1) ext coeffs
    claimed_sum: object  # ext
    eval: object  # ext


def partially_verify(bk, proof: VSumcheckProof, challenger, expected_num_variables: int,
                     expected_degree: int):
    """Verify the message chain; returns the (big-endian) point."""
    num_vars = len(proof.univariate_polys)
    if num_vars != expected_num_variables or expected_num_variables == 0:
        raise VerificationError(
            f"sumcheck round count {num_vars} != {expected_num_variables}"
        )
    first = proof.univariate_polys[0]
    if len(first) != expected_degree + 1:
        raise VerificationError("sumcheck first message degree mismatch")
    bk.assert_e_eq(
        uni_eval_zero_plus_one(bk, first), proof.claimed_sum,
        "sumcheck claimed sum",
    )
    for c in first:
        challenger.observe_ext(c)
    prev = first
    point = []
    for poly in proof.univariate_polys[1:]:
        if len(poly) != expected_degree + 1:
            raise VerificationError("sumcheck message degree mismatch")
        alpha = challenger.sample_ext()
        point.insert(0, alpha)
        bk.assert_e_eq(
            uni_eval(bk, prev, alpha), uni_eval_zero_plus_one(bk, poly),
            "sumcheck round claim chain",
        )
        for c in poly:
            challenger.observe_ext(c)
        prev = poly
    alpha = challenger.sample_ext()
    point.insert(0, alpha)
    bk.assert_e_eq(uni_eval(bk, prev, point[0]), proof.eval, "sumcheck final eval")
    return point

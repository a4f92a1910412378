"""Generic batched sumcheck over KoalaBear ext4, TPU-native.

Mirrors the reference protocol exactly (reference:
slop/crates/sumcheck/src/{prover,verifier,proof}.rs):

  * Rounds fix the LAST variable (LSB of the hypercube index) first; the
    final evaluation point is built up front-to-back so `point[0]` is the
    challenge of the LAST round (big-endian convention preserved).
  * Each round message is a univariate polynomial in COEFFICIENT form of
    an agreed degree; messages from multiple component polynomials are
    random-linear-combined with powers of `lambda`.
  * The verifier checks p(0)+p(1) == claim, then chains claims by
    evaluating the previous message at the sampled alpha.

The prover operates on "sumcheck poly" objects supplying:
  - num_variables
  - sum_as_poly_in_last_variable(claim) -> (degree+1, 4) np coefficients
  - fix_last_variable(alpha)   (returns a new poly object)
  - eventually the component evaluations at the final point.

Device work (the per-round restricted sums over the hypercube) lives in
the poly objects, which call jit-compiled kernels; this module is the
host-side protocol orchestration.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..field import extension as ext
from ..field import koalabear as kb
from .challenger import DuplexChallenger

E4 = ext.npext4


def uni_eval(coeffs: np.ndarray, x: np.ndarray) -> np.ndarray:
    """Evaluate coefficient-form univariate poly (d+1, 4) at ext4 x (Horner)."""
    acc = coeffs[-1]
    for i in range(coeffs.shape[0] - 2, -1, -1):
        acc = E4.add(E4.mul(acc, x), coeffs[i])
    return acc


def uni_eval_zero_plus_one(coeffs: np.ndarray) -> np.ndarray:
    """p(0) + p(1) = 2*c0 + c1 + ... + cd."""
    acc = coeffs[0]
    for i in range(coeffs.shape[0]):
        acc = E4.add(acc, coeffs[i])
    return acc


def rlc_polys(polys: list, lam: np.ndarray) -> np.ndarray:
    """Horner-style RLC: ((p0*lam + p1)*lam + p2)... — the FIRST poly gets
    the highest power of lambda (reference:
    slop/crates/algebra/src/univariate.rs:99 rlc_univariate_polynomials)."""
    acc = polys[0].copy()
    for p in polys[1:]:
        acc = E4.add(E4.mul(acc, np.broadcast_to(lam, acc.shape)), p)
    return acc


@dataclass
class PartialSumcheckProof:
    univariate_polys: np.ndarray  # (rounds, degree+1, 4) canonical
    claimed_sum: np.ndarray  # (4,)
    point: np.ndarray  # (rounds, 4) — big-endian: point[0] = last round's alpha
    eval: np.ndarray  # (4,) claimed evaluation at `point`


def _round_uni_polys(polys, claims) -> list:
    """One round's coefficient messages for every component poly.

    Device polys exposing `sum_values_device()` (returning their restricted
    sums as a monty DeviceArray) are batched into a SINGLE device->host
    transfer per round — the readback latency on a remote TPU dwarfs the
    per-poly compute, so one fetch per (round x poly) would dominate the
    whole sumcheck.
    """
    out = [None] * len(polys)
    dev = [
        i
        for i, p in enumerate(polys)
        if not getattr(p, "host", True) and hasattr(p, "sum_values_device")
    ]
    if len(dev) > 1:
        import jax.numpy as jnp

        handles = [polys[i].sum_values_device() for i in dev]
        if len({h.shape for h in handles}) == 1:
            stacked = kb.from_monty(jnp.stack(handles).reshape(-1))
            vals = np.asarray(stacked, np.uint32).reshape(
                len(dev), -1, 4
            )
            for i, v in zip(dev, vals):
                out[i] = polys[i].coeffs_from_sums(list(v))
    for i, p in enumerate(polys):
        if out[i] is None:
            out[i] = p.sum_as_poly_in_last_variable(np.asarray(claims[i], np.uint32))
    return out


def reduce_sumcheck_to_evaluation(
    polys: list,
    challenger: DuplexChallenger,
    claims: list,
    lam: np.ndarray,
) -> tuple[PartialSumcheckProof, list]:
    """Prove sum_{hypercube} poly_i = claims_i, batched by lambda.

    Reference: slop/crates/sumcheck/src/prover.rs:13 (t=1 case).
    Returns (proof, component_evals) where component_evals[i] is the
    evaluation of poly_i at the final point.
    """
    assert polys
    num_vars = polys[0].num_variables
    assert all(p.num_variables == num_vars for p in polys)
    point: list[np.ndarray] = []
    messages = []

    uni_polys = _round_uni_polys(polys, claims)
    rlc = rlc_polys(uni_polys, lam)
    challenger.observe_slice(rlc.reshape(-1))
    messages.append(rlc)
    alpha = challenger.sample_ext()
    point.insert(0, alpha)
    cursor = [p.fix_last_variable(alpha) for p in polys]

    for _ in range(1, num_vars):
        round_claims = [uni_eval(up, point[0]) for up in uni_polys]
        uni_polys = _round_uni_polys(cursor, round_claims)
        rlc = rlc_polys(uni_polys, lam)
        challenger.observe_slice(rlc.reshape(-1))
        messages.append(rlc)
        alpha = challenger.sample_ext()
        point.insert(0, alpha)
        cursor = [p.fix_last_variable(alpha) for p in cursor]

    message_evals = [uni_eval(up, point[0]) for up in uni_polys]
    final_eval = rlc_polys(message_evals, lam) if len(message_evals) > 1 else message_evals[0]
    batched_claim = rlc_polys([np.asarray(c, np.uint32) for c in claims], lam) if len(claims) > 1 else np.asarray(claims[0], np.uint32)
    proof = PartialSumcheckProof(
        univariate_polys=np.stack(messages),
        claimed_sum=batched_claim,
        point=np.stack(point),
        eval=final_eval,
    )
    # Per-poly evaluations of the component multilinears at the final point
    # (reference: SumcheckPoly::get_component_poly_evals).
    component_evals = [
        p.get_component_poly_evals() if hasattr(p, "get_component_poly_evals") else None
        for p in cursor
    ]
    return proof, component_evals


def partially_verify_sumcheck_proof(
    proof: PartialSumcheckProof,
    challenger: DuplexChallenger,
    expected_num_variables: int,
    expected_degree: int,
) -> bool:
    """Reference: slop/crates/sumcheck/src/verifier.rs:22."""
    num_vars = proof.univariate_polys.shape[0]
    if num_vars != proof.point.shape[0] or num_vars != expected_num_variables:
        return False
    if expected_num_variables == 0:
        return False
    first = proof.univariate_polys[0]
    if first.shape[0] != expected_degree + 1:
        return False
    if not np.array_equal(uni_eval_zero_plus_one(first), proof.claimed_sum):
        return False
    challenger.observe_slice(first.reshape(-1))
    prev = first
    alphas = []
    for poly in proof.univariate_polys[1:]:
        if poly.shape[0] != expected_degree + 1:
            return False
        alpha = challenger.sample_ext()
        alphas.insert(0, alpha)
        expected = uni_eval(prev, alpha)
        if not np.array_equal(expected, uni_eval_zero_plus_one(poly)):
            return False
        challenger.observe_slice(poly.reshape(-1))
        prev = poly
    alpha = challenger.sample_ext()
    alphas.insert(0, alpha)
    if not np.array_equal(np.stack(alphas), proof.point):
        return False
    if not np.array_equal(uni_eval(prev, alphas[0]), proof.eval):
        return False
    return True

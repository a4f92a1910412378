"""Stacked (Ligero-interleaved) PCS layer over BaseFold, TPU-native.

Mirrors the reference (reference: slop/crates/stacked/src/{prover,verifier,
fixed_rate}.rs): the data of a batch of matrices is flattened COLUMN-major
per matrix, concatenated into one virtual vector, zero-padded to a multiple
of 2^log_stacking_height, and chopped into columns of height
2^log_stacking_height which are committed through BaseFold as one matrix.

An evaluation claim for the big virtual multilinear at `point` splits into
(batch_point | stack_point); the prover reveals each stacked column's
evaluation at stack_point (the "batch evaluations"), the verifier evaluates
their MLE at batch_point to reproduce the claim, and BaseFold proves the
batch evaluations.

Device work: the interleave is a single reshape/pad of the concatenated
column-major buffer; batch evaluations are one matrix-vector product
against the partial-Lagrange table of stack_point.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

import jax
import jax.numpy as jnp

from ..field import extension as ext
from ..field import koalabear as kb
from ..iop.challenger import DuplexChallenger
from ..ops import mle as mle_ops
from . import basefold
from .basefold import BasefoldProof, BasefoldProverData, FriConfig

E4 = ext.npext4


@dataclass
class StackedProverData:
    basefold_data: BasefoldProverData
    stacked_matrix: object  # jnp (2^lsh, C) monty
    num_added_vals: int


@dataclass
class StackedProof:
    basefold_proof: BasefoldProof
    batch_evaluations: list  # per round: (C_round, 4) canonical


def interleave(mles: list, log_stacking_height: int):
    """Concatenate column-major data of [(H_i, W_i) monty jnp] and chop.

    Returns ((2^lsh, C) jnp matrix, num_added_vals).
    """
    parts = [jnp.asarray(m).T.reshape(-1) for m in mles]
    flat = jnp.concatenate(parts) if len(parts) > 1 else parts[0]
    total = int(flat.shape[0])
    sh = 1 << log_stacking_height
    padded = max(-(-total // sh), 1) * sh
    if padded > total:
        flat = jnp.concatenate([flat, jnp.zeros(padded - total, jnp.uint32)])
    mat = flat.reshape(-1, sh).T  # (2^lsh, C)
    return mat, padded - total


def commit_multilinears(
    mles: list, config: FriConfig, log_stacking_height: int, tcs=None
) -> tuple[np.ndarray, StackedProverData]:
    mat, num_added = interleave(mles, log_stacking_height)
    from ..parallel import mesh as pm

    outer = tcs is not None and getattr(tcs, "host_only", False)
    mesh = pm.active_mesh() if not outer else None
    if mesh is not None and int(mat.shape[1]) % pm.mesh_size(mesh) == 0:
        # Column-shard the stacked matrix over the mesh: the RS encode's
        # NTT butterflies run along rows and vectorize over columns, so
        # GSPMD partitions the whole encode without communication; the
        # Merkle build reshards as needed.
        from jax.sharding import NamedSharding, PartitionSpec as P

        mat = jax.device_put(mat, NamedSharding(mesh, P(None, "d")))
    commit, bf_data = basefold.commit_mles([mat], config, tcs=tcs)
    return commit, StackedProverData(
        basefold_data=bf_data, stacked_matrix=mat, num_added_vals=num_added
    )


@jax.jit
def _batch_evals_kernel(mat, stack_point_m):
    """Evaluate each column of (2^lsh, C) at stack_point: -> (C, 4) monty."""
    eq = mle_ops.partial_lagrange_ext(stack_point_m)  # (2^lsh, 4)
    prod = kb.mul(mat[:, :, None], eq[:, None, :])  # (H, C, 4)
    return mle_ops._sum_ext_axis0(prod)


def prove_trusted_evaluation(
    eval_point: np.ndarray,
    prover_data: list,
    config: FriConfig,
    log_stacking_height: int,
    challenger: DuplexChallenger,
    tcs=None,
) -> StackedProof:
    """eval_point: (n, 4) canonical with n >= lsh; rounds of StackedProverData."""
    from ..ops import hostmle
    from ..ops.hostmle import HOST_THRESH

    stack_point = eval_point[eval_point.shape[0] - log_stacking_height:]
    sp_m = jnp.asarray(((stack_point.astype(np.uint64) << 32) % kb.P).astype(np.uint32))
    host_small = (1 << log_stacking_height) <= HOST_THRESH
    if host_small:
        eq_c = mle_ops.host.partial_lagrange_ext(stack_point).astype(np.uint64)
    batch_evaluations = []
    for pd in prover_data:
        if host_small:
            mat_c = hostmle.dev_to_host(pd.stacked_matrix).astype(np.uint64)
            prod = (mat_c[:, :, None] * eq_c[:, None, :]) % kb.P
            batch_evaluations.append((prod.sum(axis=0) % kb.P).astype(np.uint32))
        else:
            evals = _batch_evals_kernel(pd.stacked_matrix, sp_m)
            batch_evaluations.append(
                np.asarray(kb.from_monty(evals.reshape(-1)), np.uint32).reshape(-1, 4)
            )
    bf_proof = basefold.prove_untrusted_evaluations(
        stack_point,
        [[be] for be in batch_evaluations],
        [pd.basefold_data for pd in prover_data],
        config,
        challenger,
        tcs=tcs,
    )
    return StackedProof(basefold_proof=bf_proof, batch_evaluations=batch_evaluations)


def verify_trusted_evaluation(
    commitments: list,
    round_areas: list,
    point: np.ndarray,
    proof: StackedProof,
    evaluation_claim: np.ndarray,
    config: FriConfig,
    log_stacking_height: int,
    challenger: DuplexChallenger,
    tcs=None,
) -> bool:
    """Reference: slop/crates/stacked/src/verifier.rs:39."""
    n = point.shape[0]
    if n < log_stacking_height:
        return False
    batch_point = point[: n - log_stacking_height]
    stack_point = point[n - log_stacking_height:]
    if len(proof.batch_evaluations) != len(round_areas) or len(commitments) != len(
        round_areas
    ):
        return False
    for area, evals in zip(round_areas, proof.batch_evaluations):
        if area % (1 << log_stacking_height) != 0:
            return False
        if area >> log_stacking_height != evals.shape[0]:
            return False
    # Interpolate batch evaluations as an MLE and evaluate at batch_point.
    all_evals = np.concatenate(proof.batch_evaluations, axis=0)
    padded_len = 1 << (batch_point.shape[0])
    if all_evals.shape[0] > padded_len:
        return False
    padded = np.zeros((padded_len, 4), np.uint32)
    padded[: all_evals.shape[0]] = all_evals
    expected = _host_eval_ext_mle(padded, batch_point)
    if not np.array_equal(expected, np.asarray(evaluation_claim, np.uint32)):
        return False
    return basefold.verify_untrusted_evaluations(
        commitments,
        stack_point,
        [[be] for be in proof.batch_evaluations],
        proof.basefold_proof,
        config,
        challenger,
        tcs=tcs,
    )


def _host_eval_ext_mle(guts: np.ndarray, point: np.ndarray) -> np.ndarray:
    eq = mle_ops.host.partial_lagrange_ext(point)
    acc = np.zeros(4, np.uint32)
    for i in range(guts.shape[0]):
        acc = E4.add(acc, E4.mul(guts[i], eq[i]))
    return acc

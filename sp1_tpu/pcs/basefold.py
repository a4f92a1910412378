"""BaseFold multilinear PCS over KoalaBear, TPU-native.

Faithful implementation of the reference protocol (reference:
slop/crates/basefold-prover/src/prover.rs `prove_trusted_mle_evaluations`,
slop/crates/basefold/src/verifier.rs `BasefoldVerifier`):

  commit:  RS-encode each MLE's columns (zero-pad blowup, bit-reversed
           codeword) and Merkle-commit all codewords of a round together.
  open:    batch all committed columns with partial-Lagrange coefficients
           (after a 5-bit batching grind), then run the BaseFold loop: per
           variable, send [g(.,0), g(.,1)]-style univariate messages tied
           to the evaluation claim, Merkle-commit the paired codeword, and
           fold both the MLE and the codeword with the sampled beta; end
           with a proof-of-work grind and FRI-style queries.

Device work per round: one codeword pair-fold (elementwise ext4 ops over
the full codeword), one MLE fold, one Merkle layer-stack build, and a
`fixed_at_zero` evaluation — all jit-compiled; the host only runs the
challenger between rounds.

All protocol parameters (log_blowup 2 core / 3 wrap, 16/22-bit PoW,
5-bit batch grind, unique-decoding query counts) match the reference
(crates/primitives/src/fri_params.rs).
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass
from functools import lru_cache, partial

import numpy as np

import jax
import jax.numpy as jnp

from ..field import extension as ext
from ..field import koalabear as kb
from ..field.domain import bit_reverse_indices, pow_vector, two_adic_generator
from ..iop.challenger import DuplexChallenger
from ..ops import hostmle
from ..ops import mle as mle_ops
from ..ops import ntt
from ..ops.hostmle import HOST_THRESH
from . import merkle

E4 = ext.npext4

BATCH_GRINDING_BITS = 5
SP1_TARGET_BITS_OF_SECURITY = 100
SP1_PROOF_OF_WORK_BITS = 16


def unique_decoding_queries(log_blowup: int, grinding_bits: int = SP1_PROOF_OF_WORK_BITS) -> int:
    """Reference: crates/primitives/src/fri_params.rs:50."""
    rate = 1.0 / (1 << log_blowup)
    half_rate_plus_half = 0.5 + rate / 2.0
    return math.ceil(
        -(SP1_TARGET_BITS_OF_SECURITY - grinding_bits) / math.log2(half_rate_plus_half)
    )


@dataclass(frozen=True)
class FriConfig:
    log_blowup: int
    num_queries: int
    proof_of_work_bits: int

    @staticmethod
    def core() -> "FriConfig":
        return FriConfig(2, unique_decoding_queries(2), SP1_PROOF_OF_WORK_BITS)

    @staticmethod
    def shrink() -> "FriConfig":
        return FriConfig(3, unique_decoding_queries(3, 22), 22)

    @staticmethod
    def wrap() -> "FriConfig":
        """Outer-context (BN254) stage parameters — same schedule as
        shrink (crates/primitives/src/fri_params.rs:36-42 WRAP_LOG_BLOWUP
        = 3, SP1_SHRINK_WRAP_POW_BITS = 22)."""
        return FriConfig(3, unique_decoding_queries(3, 22), 22)


# ---------------------------------------------------------------------------
# Commit
# ---------------------------------------------------------------------------


@dataclass
class BasefoldProverData:
    codewords: list  # jnp (2^(n+b), W_i) monty, bit-reversed rows
    tree: merkle.MerkleTree
    mles: list  # jnp (2^n, W_i) monty (original data)


def commit_mles(mles: list, config: FriConfig, tcs=None) -> tuple:
    """Commit a round of base-field MLEs [(2^n, W_i) monty jnp].

    With an outer `tcs` (pcs/outer_merkle.OuterTcs) the codewords are
    fetched to the host and committed through the BN254 Poseidon2 tree
    (wrap context); prover data then holds canonical numpy codewords."""
    h = int(mles[0].shape[0])
    log_h = h.bit_length() - 1
    assert h == 1 << log_h
    codewords = [ntt.rs_encode(m, log_h, config.log_blowup) for m in mles]
    if tcs is not None and getattr(tcs, "host_only", False):
        cw = [hostmle.dev_to_host(c) for c in codewords]
        tree = tcs.commit_tensors_host(cw)
        return tree.root, BasefoldProverData(codewords=cw, tree=tree, mles=mles)
    tree = merkle.commit_tensors(codewords)
    return tree.root, BasefoldProverData(codewords=codewords, tree=tree, mles=mles)


def offload_prover_data(pd: BasefoldProverData) -> None:
    """Free the codeword + Merkle-tree device buffers, keeping only the
    committed MLEs (the codewords are `log_blowup`x the data and dominate
    the commit's HBM footprint; reference analog: sp1-gpu keeps commit
    buffers resident because a single H100 has the headroom — on a 16 GB
    TPU chip the GKR layer tree and the commit data don't fit together
    at production shard shapes, so we drop and re-derive).

    `rematerialize_prover_data` rebuilds them bit-identically (the
    encode + Merkle build are deterministic) right before the opening
    phase consumes them."""
    if pd.codewords is None:
        return
    for c in pd.codewords:
        if hasattr(c, "delete"):
            c.delete()
    if pd.tree is not None:
        for layer in getattr(pd.tree, "layers", ()):
            if hasattr(layer, "delete"):
                layer.delete()
    pd.codewords = None
    pd.tree = None


def rematerialize_prover_data(pd: BasefoldProverData, config: FriConfig) -> None:
    """Recompute codewords + Merkle tree dropped by `offload_prover_data`.

    Reuses the commit-phase kernels (same shapes), so on a warm process
    this costs one encode + one tree build and zero new compiles."""
    if pd.codewords is not None:
        return
    h = int(pd.mles[0].shape[0])
    log_h = h.bit_length() - 1
    pd.codewords = [ntt.rs_encode(m, log_h, config.log_blowup) for m in pd.mles]
    pd.tree = merkle.commit_tensors(pd.codewords)


# ---------------------------------------------------------------------------
# Device kernels for the opening loop
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnums=(2,))
def _batch_columns(stacked_cols, coeffs, h: int):
    """RLC of base columns with ext4 coefficients.

    stacked_cols: (2^n, C) base monty. coeffs: (C, 4). -> (2^n, 4).
    """
    prod = kb.mul(stacked_cols[..., None], coeffs[None, :, :])  # (H, C, 4)
    acc = prod[:, 0]
    for c in range(1, prod.shape[1]):
        acc = kb.add(acc, prod[:, c])
    return acc


@lru_cache(maxsize=None)
def _fold_tables(log_n: int) -> tuple[np.ndarray, np.ndarray]:
    """(x, inv(x1-x0)) monty tables for folding a 2^log_n codeword.

    Pair i of the bit-reversed codeword sits at points +-x_i with
    x_i = g^{rev_{log_n - 1}(i)}, g the order-2^log_n generator.
    inv table = (x1 - x0)^-1 = (-2 x_i)^-1.
    """
    m = log_n - 1
    g = two_adic_generator(log_n)
    powers = pow_vector(g, 1 << m)  # g^j canonical
    rev = bit_reverse_indices(m)
    x = powers[rev].astype(np.uint64)
    neg2x = (kb.P - (2 * x) % kb.P) % kb.P
    # vectorized inverse via pow (canonical)
    inv = np.ones_like(neg2x)
    base = neg2x.copy()
    e = kb.P - 2
    while e:
        if e & 1:
            inv = inv * base % kb.P
        base = base * base % kb.P
        e >>= 1
    to_m = lambda a: ((a << 32) % kb.P).astype(np.uint32)
    return to_m(x), to_m(inv)


def _fold_codeword_body(code, beta, log_n: int):
    """FRI arity-2 fold of a bit-reversed ext4 codeword (2^log_n, 4).

    folded[i] = e0 + (beta - x_i) * (e1 - e0) * inv(x1 - x0)
    (reference: slop/crates/basefold/src/verifier.rs:380 fold identity;
    prover slop_fri::fold_even_odd). Traceable body shared by the
    standalone jit below and the fused round kernel.
    """
    x_t, inv_t = _fold_tables(log_n)
    v = code.reshape(-1, 2, 4)
    e0, e1 = v[:, 0], v[:, 1]
    x = jnp.asarray(x_t)[:, None]
    inv = jnp.asarray(inv_t)[:, None]
    beta_b = jnp.broadcast_to(beta, e0.shape)
    bmx = kb.sub(beta_b, jnp.concatenate([x, jnp.zeros_like(e0[:, 1:])], axis=1))
    diff = kb.sub(e1, e0)
    slope = kb.mul(diff, inv)
    return kb.add(e0, ext.ext4_mul(bmx, slope))


_fold_codeword = jax.jit(_fold_codeword_body, static_argnums=(2,))


def _fold_codeword_host(code: np.ndarray, beta: np.ndarray, log_n: int) -> np.ndarray:
    """Host mirror of _fold_codeword on canonical arrays."""
    x_t, inv_t = _fold_tables(log_n)
    x_c = hostmle.from_monty_host(x_t)
    inv_c = hostmle.from_monty_host(inv_t)
    v = code.reshape(-1, 2, 4)
    e0, e1 = v[:, 0], v[:, 1]
    x_e = np.zeros((x_c.shape[0], 4), np.uint32)
    x_e[:, 0] = x_c
    bmx = E4.sub(np.broadcast_to(beta, e0.shape), x_e)
    diff = E4.sub(e1, e0)
    slope = kb.npf.mul(diff, inv_c[:, None])
    return E4.add(e0, E4.mul(bmx, slope))


@jax.jit
def _pair_leaves(code):
    """(2m, 4) ext codeword -> (m, 8) base leaves for the round commit."""
    return code.reshape(-1, 8)


def _from_monty_np(x) -> np.ndarray:
    return np.asarray(kb.from_monty(jnp.asarray(x)), np.uint32)


def _to_monty_np(x) -> np.ndarray:
    return ((np.asarray(x, np.uint64) << 32) % kb.P).astype(np.uint32)


# ---------------------------------------------------------------------------
# Proof container
# ---------------------------------------------------------------------------


@dataclass
class MerkleOpeningAndProof:
    values: np.ndarray  # (Q, width) canonical
    proof: merkle.MerkleProof


@dataclass
class BasefoldProof:
    univariate_messages: np.ndarray  # (rounds, 2, 4) canonical ext
    fri_commitments: list  # canonical digests (8,)
    component_openings: list  # per commit round: MerkleOpeningAndProof
    query_openings: list  # per fri round: MerkleOpeningAndProof
    final_poly: np.ndarray  # (4,)
    pow_witness: int
    batch_grinding_witness: int


# ---------------------------------------------------------------------------
# Prover
# ---------------------------------------------------------------------------


def prove_untrusted_evaluations(
    eval_point: np.ndarray,
    evaluation_claims: list,
    prover_data: list,
    config: FriConfig,
    challenger: DuplexChallenger,
    tcs=None,
) -> BasefoldProof:
    """Prove MLE evaluation claims at `eval_point` for committed rounds.

    eval_point: (n, 4) canonical. evaluation_claims: per round, list of
    per-mle (W_i, 4) canonical claim arrays. prover_data: per round
    BasefoldProverData.
    """
    for round_claims in evaluation_claims:
        for mle_eval in round_claims:
            challenger.observe_slice(np.asarray(mle_eval, np.uint32).reshape(-1))
    return prove_trusted_evaluations(
        eval_point, evaluation_claims, prover_data, config, challenger, tcs=tcs
    )


_pl_ext_jit = jax.jit(mle_ops.partial_lagrange_ext)
_from_monty_jit = jax.jit(kb.from_monty)
_to_monty_jit = jax.jit(kb.to_monty)


@jax.jit
def _bf_msg_kernel(claim_m, zero_m, inv_m):
    """one_val = (claim - zero) * inv(last_coord) + zero; message canonical."""
    one_m = ext.ext4_add(ext.ext4_mul(ext.ext4_sub(claim_m, zero_m), inv_m), zero_m)
    return kb.from_monty(jnp.stack([zero_m, one_m])), one_m


@jax.jit
def _bf_claim_kernel(zero_m, one_m, beta_c):
    beta_m = kb.to_monty(beta_c)
    return ext.ext4_add(zero_m, ext.ext4_mul(beta_m, one_m)), beta_m


@partial(jax.jit, static_argnums=(1,))
def _rlc_claims_kernel(flat_claims_m, total_len: int, coeffs_m):
    acc = jnp.zeros(4, jnp.uint32)
    for j in range(total_len):
        acc = kb.add(acc, ext.ext4_mul(flat_claims_m[j], coeffs_m[j]))
    return acc


def _bf_round_body(sponge, current_mle, current_code, claim_m, inv_m, point_m):
    """Traceable BaseFold round: message + Merkle commit + transcript
    absorb + beta sample + codeword/MLE fold (mirrors the host loop's
    observe_slice x2 + sample_ext bit for bit)."""
    num_point = int(point_m.shape[0])
    log_code = int(current_code.shape[0]).bit_length() - 1

    if num_point:
        zero_m = mle_ops.fixed_at_zero_ext_mle(current_mle, point_m)
    else:
        zero_m = current_mle[0]
    one_m = ext.ext4_add(ext.ext4_mul(ext.ext4_sub(claim_m, zero_m), inv_m), zero_m)
    msg_c = kb.from_monty(jnp.stack([zero_m, one_m]))

    leaves = current_code.reshape(-1, 8)
    layers = merkle._tree_layers(merkle._hash_rows(leaves))
    root_c = kb.from_monty(layers[-1][0])

    sponge.observe_vec(msg_c.reshape(-1))
    sponge.observe_vec(root_c)
    beta_c = sponge.sample_vec(4)
    beta_m = kb.to_monty(beta_c)

    claim2_m = ext.ext4_add(zero_m, ext.ext4_mul(beta_m, one_m))
    code2 = _fold_codeword_body(current_code, beta_m, log_code)
    mle2 = mle_ops.fold_ext(current_mle, beta_m)
    return msg_c, root_c, tuple(layers), leaves, claim2_m, code2, mle2


_BF_CHUNKS = {}


def _bf_chunk_kernel(shape_key, nbuf0: int, out_left0: int, rounds: int):
    """`rounds` consecutive BaseFold rounds in ONE dispatch. Each of the
    ~10 separate kernels a round otherwise costs is a ~25-100ms blocking
    launch on the remote-tunnel TPU path; grouping bounds both the
    dispatch count and the per-jit program size (SP1_TPU_BF_GROUP)."""
    key = (shape_key, nbuf0, out_left0, rounds)
    cached = _BF_CHUNKS.get(key)
    if cached is not None:
        return cached
    from ..iop.dchallenger import InlineSponge

    @jax.jit
    def chunk(state, buf, current_mle, current_code, claim_m, invs, point_m):
        sponge = InlineSponge(state, buf, nbuf0, out_left0)
        pm = point_m
        out = []
        for r in range(rounds):
            pm = pm[: pm.shape[0] - 1]
            msg_c, root_c, layers, leaves, claim_m, current_code, current_mle = (
                _bf_round_body(
                    sponge, current_mle, current_code, claim_m, invs[r], pm
                )
            )
            out.append((msg_c, root_c, layers, leaves))
        return (
            sponge.state,
            tuple(out),
            claim_m,
            current_code,
            current_mle,
        )

    _BF_CHUNKS[key] = chunk
    return chunk


@jax.jit
def _bf_open_all_kernel(comp_trees, fri_trees, idx):
    """Every query opening (components + all fri rounds) in ONE dispatch.

    comp_trees: tuple of (layers_tuple, tensors_tuple); fri_trees: tuple
    of (layers_tuple, leaves) in round order — round r uses idx >> (r+1).
    Returns ((vals, paths) per component, (vals, paths) per fri round),
    all canonical."""

    def open_one(layers, tensors, ix):
        h = tensors[0].shape[0]
        cat = (
            jnp.concatenate([t.reshape(h, -1) for t in tensors], axis=1)
            if len(tensors) > 1
            else tensors[0].reshape(h, -1)
        )
        vals = kb.from_monty(cat[ix])
        if layers:
            sibs = [layers[l][(ix >> l) ^ 1] for l in range(len(layers))]
            paths = kb.from_monty(jnp.stack(sibs, axis=1))
        else:
            paths = jnp.zeros((ix.shape[0], 0, 8), jnp.uint32)
        return vals, paths

    comp = tuple(
        open_one(layers, tensors, idx) for layers, tensors in comp_trees
    )
    fri = tuple(
        open_one(layers, (leaves,), idx >> (r + 1))
        for r, (layers, leaves) in enumerate(fri_trees)
    )
    return comp, fri


def _prove_trusted_evaluations_dfs(
    eval_point: np.ndarray,
    evaluation_claims: list,
    prover_data: list,
    config: FriConfig,
    challenger: DuplexChallenger,
) -> BasefoldProof:
    """Device-Fiat-Shamir BaseFold opening: every round (message, Merkle
    commit, fold) enqueues asynchronously against the TraceChallenger;
    the host syncs once to draw query indices and once to fetch the whole
    proof. Transcript-identical to the host-orchestrated path below."""
    from ..iop.dchallenger import TraceChallenger
    from ..utils import timing
    from ..utils.fetch import batch_fetch

    eval_point = np.asarray(eval_point, np.uint32)
    num_vars = eval_point.shape[0]
    tch = TraceChallenger.from_host(challenger)

    with timing.span("bf_grind1"):
        batch_w = tch.grind(BATCH_GRINDING_BITS)

    all_mles = [m for pd in prover_data for m in pd.mles]
    total_len = sum(int(m.shape[1]) for m in all_mles)
    num_batching_vars = max(total_len - 1, 0).bit_length() if total_len > 1 else 0
    batching_point = tch.sample_ext_vec(num_batching_vars)
    coeffs_m = _pl_ext_jit(_to_monty_jit(batching_point))[:total_len]

    stacked = jnp.concatenate([jnp.asarray(m) for m in all_mles], axis=1)
    current_mle = _batch_columns(stacked, coeffs_m, int(stacked.shape[0]))

    flat_claims = np.concatenate(
        [np.asarray(c, np.uint32).reshape(-1, 4) for rc in evaluation_claims for c in rc]
    )
    claim_m = _rlc_claims_kernel(
        jnp.asarray(_to_monty_np(flat_claims)), total_len, coeffs_m
    )

    log_n = num_vars
    current_code = ntt.rs_encode(current_mle, log_n, config.log_blowup)

    # last-coordinate inverses are known on the host up front
    inv_last_m = [
        jnp.asarray(_to_monty_np(E4.inv(eval_point[num_vars - 1 - r])))
        for r in range(num_vars)
    ]

    from ..iop.dchallenger import _unshard
    from ..ops.poseidon2 import RATE
    from ..parallel import mesh as pm

    mesh = pm.active_mesh()
    nd = pm.mesh_size(mesh) if mesh is not None else 1
    if mesh is not None and int(current_code.shape[0]) % nd == 0:
        # SURVEY §2.8.7: shard the opening's row dimension over the mesh
        # and let GSPMD partition the fused round kernels — folds pair
        # adjacent rows (device-local under MSB row sharding), the NTT
        # stages and Merkle top levels lower to ICI collectives, and the
        # sponge state rides fully replicated. Bit-identical transcripts
        # (placement only; test_mesh asserts proof equality).
        current_mle = jax.device_put(
            current_mle, pm.row_sharding(mesh, current_mle.ndim)
        )
        current_code = jax.device_put(
            current_code, pm.row_sharding(mesh, current_code.ndim)
        )
        claim_m = pm.replicate(jnp.asarray(claim_m), mesh)
        tch.state = pm.replicate(tch.state, mesh)
        tch._segs = [
            (pm.replicate(jnp.asarray(a).reshape(-1), mesh), n)
            for a, n in tch._segs
        ]
    else:
        current_mle = _unshard(current_mle)
        current_code = _unshard(current_code)
    point_m = jnp.asarray(_to_monty_np(eval_point))
    messages_h, root_handles, fri_trees = [], [], []
    tch.observe(num_vars)
    group = int(os.environ.get("SP1_TPU_BF_GROUP", "4"))
    _bf_rounds_span = timing.span("bf_rounds")
    _bf_rounds_span.__enter__()
    r = 0
    while r < num_vars:
        rounds = min(group, num_vars - r)
        invs = jnp.stack([inv_last_m[r + i] for i in range(rounds)])
        shape_key = (
            int(current_mle.shape[0]),
            int(current_code.shape[0]),
            int(point_m.shape[0]),
        )
        chunk = _bf_chunk_kernel(shape_key, tch._nbuf, tch._out_left, rounds)
        import sys as _sys

        print(f"[bf] chunk {shape_key} x{rounds}", file=_sys.stderr, flush=True)
        state, out, claim_m, current_code, current_mle = chunk(
            tch.state,
            tch._buf_array(),
            current_mle,
            current_code,
            claim_m,
            invs,
            point_m,
        )
        point_m = point_m[: int(point_m.shape[0]) - rounds]
        # every round ends on a 4-felt sample: nbuf 0, out buffer 4 left
        tch.state = state
        tch._segs = []
        tch._nbuf = 0
        tch._out_left = RATE - 4
        for msg_c, root_c, layers, leaves in out:
            messages_h.append(msg_c)
            root_handles.append(root_c)
            fri_trees.append(
                (
                    merkle.MerkleTree(
                        layers=list(layers), height=int(leaves.shape[0])
                    ),
                    leaves,
                )
            )
        r += rounds
    _bf_rounds_span.__exit__(None, None, None)
    if mesh is not None:
        # leave the sharded region: the sponge state must not stay
        # mesh-replicated (later absorbs mix it with device-0 values)
        tch.state = _unshard(tch.state)

    final_poly_h = _from_monty_jit(current_code[0])
    tch.observe_slice(final_poly_h)

    with timing.span("bf_grind2"):
        pow_w = tch.grind(config.proof_of_work_bits)

    # one sync: challenger state home for query sampling
    tch.to_host(challenger)
    log_len = num_vars
    query_indices = [
        challenger.sample_bits(log_len + config.log_blowup)
        for _ in range(config.num_queries)
    ]

    with timing.span("bf_queries"):
        # EVERY query opening (components + all fri rounds) in one
        # dispatch; fetch the whole proof in one transfer
        idx = jnp.asarray(np.asarray(query_indices, np.int32))
        comp_struct = tuple(
            (tuple(pd.tree.layers[:-1]), tuple(pd.codewords))
            for pd in prover_data
        )
        fri_struct = tuple(
            (tuple(tree.layers[:-1]), leaves) for tree, leaves in fri_trees
        )
        comp_handles, fri_handles = _bf_open_all_kernel(
            comp_struct, fri_struct, idx
        )

        flat_handles = (
            messages_h
            + root_handles
            + [final_poly_h, batch_w.reshape(1), pow_w.reshape(1)]
            + [h for pair in comp_handles for h in pair]
            + [h for pair in fri_handles for h in pair]
        )
        fetched = batch_fetch(flat_handles)

    n = num_vars
    msgs = fetched[:n]
    roots = fetched[n : 2 * n]
    final_poly = fetched[2 * n]
    batch_grinding_witness = int(fetched[2 * n + 1][0])
    pow_witness = int(fetched[2 * n + 2][0])
    rest = fetched[2 * n + 3 :]
    component_openings = []
    for i, pd in enumerate(prover_data):
        values, paths = rest[2 * i], rest[2 * i + 1]
        component_openings.append(
            MerkleOpeningAndProof(
                values=values,
                proof=merkle.MerkleProof(
                    paths=paths, log_height=paths.shape[1], width=values.shape[1]
                ),
            )
        )
    rest = rest[2 * len(prover_data) :]
    query_openings = []
    for i in range(len(fri_trees)):
        values, paths = rest[2 * i], rest[2 * i + 1]
        query_openings.append(
            MerkleOpeningAndProof(
                values=values,
                proof=merkle.MerkleProof(
                    paths=paths, log_height=paths.shape[1], width=8
                ),
            )
        )

    return BasefoldProof(
        univariate_messages=np.stack(msgs),
        fri_commitments=list(roots),
        component_openings=component_openings,
        query_openings=query_openings,
        final_poly=final_poly,
        pow_witness=pow_witness,
        batch_grinding_witness=batch_grinding_witness,
    )


def prove_trusted_evaluations(
    eval_point: np.ndarray,
    evaluation_claims: list,
    prover_data: list,
    config: FriConfig,
    challenger: DuplexChallenger,
    tcs=None,
) -> BasefoldProof:
    from ..utils import dfs, timing

    eval_point = np.asarray(eval_point, np.uint32)
    num_vars = eval_point.shape[0]
    outer = tcs is not None and getattr(tcs, "host_only", False)

    if not outer and dfs.enabled() and not isinstance(
        prover_data[0].mles[0], np.ndarray
    ):
        return _prove_trusted_evaluations_dfs(
            eval_point, evaluation_claims, prover_data, config, challenger
        )

    with timing.span("bf_grind1"):
        batch_grinding_witness = challenger.grind(BATCH_GRINDING_BITS)

    all_mles = [m for pd in prover_data for m in pd.mles]
    total_len = sum(int(m.shape[1]) for m in all_mles)
    num_batching_vars = max(total_len - 1, 0).bit_length() if total_len > 1 else 0
    batching_point = challenger.sample_ext_vec(num_batching_vars)
    coeffs = _partial_lagrange_host(batching_point)[:total_len]  # (C, 4) canonical

    h_rows = int(all_mles[0].shape[0])
    if h_rows <= HOST_THRESH:
        stacked_c = np.concatenate(
            [hostmle.dev_to_host(m) for m in all_mles], axis=1
        ).astype(np.uint64)
        prod = (stacked_c[:, :, None] * coeffs[None, :, :].astype(np.uint64)) % kb.P
        cur_c = (prod.sum(axis=1) % kb.P).astype(np.uint32)
        current_mle = jnp.asarray(hostmle.to_monty_host(cur_c))
    else:
        stacked = jnp.concatenate([jnp.asarray(m) for m in all_mles], axis=1)
        coeffs_m = jnp.asarray(_to_monty_np(coeffs))
        current_mle = _batch_columns(stacked, coeffs_m, int(stacked.shape[0]))  # (2^n,4)

    flat_claims = np.concatenate(
        [np.asarray(c, np.uint32).reshape(-1, 4) for rc in evaluation_claims for c in rc]
    )
    claim = np.zeros(4, np.uint32)
    for j in range(total_len):
        claim = E4.add(claim, E4.mul(flat_claims[j], coeffs[j]))

    # batched codeword: encode the batched MLE (as 4 base columns)
    log_n = num_vars
    current_code = ntt.rs_encode(current_mle, log_n, config.log_blowup)  # (N,4) bitrev

    point = eval_point.copy()
    univariate_messages = []
    fri_commitments = []
    fri_trees = []
    betas = []

    challenger.observe(num_vars)
    host_mode = False
    _bf_rounds_span = timing.span("bf_rounds")
    _bf_rounds_span.__enter__()
    for _bf_round in range(num_vars):
        if not host_mode and (outer or int(current_code.shape[0]) <= HOST_THRESH):
            current_code = hostmle.dev_to_host(current_code)
            current_mle = hostmle.dev_to_host(current_mle)
            host_mode = True
        last_coord = point[-1]
        point = point[:-1]
        if host_mode:
            zero_val = (
                hostmle.eval_at_point(current_mle[0::2], point)
                if point.shape[0]
                else np.asarray(current_mle[0], np.uint32)
            )
        else:
            zero_val = _fixed_at_zero_host(current_mle, point)
        one_val = E4.add(
            E4.mul(E4.sub(claim, zero_val), E4.inv(last_coord)), zero_val
        )
        univariate_messages.append(np.stack([zero_val, one_val]))
        challenger.observe_slice(zero_val)
        challenger.observe_slice(one_val)

        if host_mode:
            leaves = current_code.reshape(-1, 8)
            tree = (tcs.commit_tensors_host if outer else merkle.commit_tensors_host)(leaves)
        else:
            leaves = _pair_leaves(current_code)
            tree = merkle.commit_tensors([leaves])
        fri_commitments.append(tree.root)
        fri_trees.append((tree, leaves))
        challenger.observe_digest(tree.root)
        beta = challenger.sample_ext()
        betas.append(beta)

        cur_log = int(current_code.shape[0]).bit_length() - 1
        if host_mode:
            current_code = _fold_codeword_host(current_code, beta, cur_log)
            current_mle = hostmle.fold(current_mle, beta)
        else:
            beta_m = jnp.asarray(_to_monty_np(beta))
            current_code = _fold_codeword(current_code, beta_m, cur_log)
            current_mle = mle_ops.fold_ext(current_mle, beta_m)
        claim = E4.add(zero_val, E4.mul(beta, one_val))

    _bf_rounds_span.__exit__(None, None, None)
    final_poly = (
        np.asarray(current_code[0], np.uint32)
        if host_mode
        else _from_monty_np(current_code[0])
    )
    challenger.observe_slice(final_poly)

    with timing.span("bf_grind2"):
        pow_witness = challenger.grind(config.proof_of_work_bits)
    log_len = num_vars
    query_indices = [
        challenger.sample_bits(log_len + config.log_blowup)
        for _ in range(config.num_queries)
    ]

    with timing.span("bf_queries"):
        component_openings = []
        _open = tcs.open_at_indices if outer else merkle.open_at_indices
        _gather = tcs.compute_openings if outer else merkle.compute_openings
        for pd in prover_data:
            values = _gather(pd.codewords, query_indices)
            width = values.shape[1]
            proof = _open(pd.tree, query_indices, width)
            component_openings.append(
                MerkleOpeningAndProof(values=values, proof=proof)
            )

        query_openings = []
        indices = list(query_indices)
        for tree, leaves in fri_trees:
            indices = [i >> 1 for i in indices]
            if isinstance(leaves, np.ndarray):
                values = leaves[np.asarray(indices, np.int64)]
            else:
                values = merkle.compute_openings([leaves], indices)
            proof = _open(tree, indices, 8)
            query_openings.append(MerkleOpeningAndProof(values=values, proof=proof))

    return BasefoldProof(
        univariate_messages=np.stack(univariate_messages),
        fri_commitments=fri_commitments,
        component_openings=component_openings,
        query_openings=query_openings,
        final_poly=final_poly,
        pow_witness=pow_witness,
        batch_grinding_witness=batch_grinding_witness,
    )


def _partial_lagrange_host(point: np.ndarray) -> np.ndarray:
    """(k, 4) canonical point -> (2^k, 4) eq coefficients, big-endian."""
    evals = E4.one()[None]
    for k in range(point.shape[0]):
        x = point[k]
        prod = E4.mul(evals, np.broadcast_to(x, evals.shape))
        lo = E4.sub(evals, prod)
        evals = np.stack([lo, prod], axis=1).reshape(-1, 4)
    return evals


@jax.jit
def _fixed_at_zero_dev(guts, point_m):
    return mle_ops.fixed_at_zero_ext_mle(guts, point_m)


def _fixed_at_zero_host(current_mle, point: np.ndarray) -> np.ndarray:
    if point.shape[0] == 0:
        return _from_monty_np(current_mle[0])
    val = _fixed_at_zero_dev(current_mle, jnp.asarray(_to_monty_np(point)))
    return _from_monty_np(val)


# ---------------------------------------------------------------------------
# Verifier (host, canonical)
# ---------------------------------------------------------------------------


def verify_untrusted_evaluations(
    commitments: list,
    eval_point: np.ndarray,
    evaluation_claims: list,
    proof: BasefoldProof,
    config: FriConfig,
    challenger: DuplexChallenger,
    tcs=None,
) -> bool:
    for round_claims in evaluation_claims:
        for mle_eval in round_claims:
            challenger.observe_slice(np.asarray(mle_eval, np.uint32).reshape(-1))
    return verify_mle_evaluations(
        commitments, eval_point, evaluation_claims, proof, config, challenger,
        tcs=tcs,
    )


def verify_mle_evaluations(
    commitments: list,
    eval_point: np.ndarray,
    evaluation_claims: list,
    proof: BasefoldProof,
    config: FriConfig,
    challenger: DuplexChallenger,
    tcs=None,
) -> bool:
    """Reference: slop/crates/basefold/src/verifier.rs:122."""
    point = np.asarray(eval_point, np.uint32)

    if not challenger.check_witness(BATCH_GRINDING_BITS, proof.batch_grinding_witness):
        return False

    flat_claims = np.concatenate(
        [np.asarray(c, np.uint32).reshape(-1, 4) for rc in evaluation_claims for c in rc]
    )
    total_len = flat_claims.shape[0]
    num_batching_vars = max(total_len - 1, 0).bit_length() if total_len > 1 else 0
    batching_point = challenger.sample_ext_vec(num_batching_vars)
    coeffs = _partial_lagrange_host(batching_point)[:total_len]

    eval_claim = np.zeros(4, np.uint32)
    for j in range(total_len):
        eval_claim = E4.add(eval_claim, E4.mul(flat_claims[j], coeffs[j]))

    if len(evaluation_claims) != len(commitments) or len(commitments) != len(
        proof.component_openings
    ):
        return False
    num_rounds = proof.univariate_messages.shape[0]
    if len(proof.fri_commitments) != num_rounds or num_rounds != point.shape[0]:
        return False
    if num_rounds == 0:
        return False

    # Prover fixes the last coordinate first -> reverse for verification.
    point = point[::-1].copy()

    challenger.observe(num_rounds)
    betas = []
    for r in range(num_rounds):
        challenger.observe_slice(proof.univariate_messages[r].reshape(-1))
        challenger.observe_digest(proof.fri_commitments[r])
        betas.append(challenger.sample_ext())

    one = E4.one()
    first = proof.univariate_messages[0]
    lhs = E4.add(
        E4.mul(E4.sub(one, point[0]), first[0]), E4.mul(point[0], first[1])
    )
    if not np.array_equal(eval_claim, lhs):
        return False
    expected_eval = E4.add(first[0], E4.mul(betas[0], first[1]))
    for i in range(1, num_rounds):
        poly = proof.univariate_messages[i]
        lhs = E4.add(
            E4.mul(E4.sub(one, point[i]), poly[0]), E4.mul(point[i], poly[1])
        )
        if not np.array_equal(expected_eval, lhs):
            return False
        expected_eval = E4.add(poly[0], E4.mul(betas[i], poly[1]))

    challenger.observe_slice(proof.final_poly)
    if not challenger.check_witness(config.proof_of_work_bits, proof.pow_witness):
        return False

    log_len = num_rounds
    if log_len + config.log_blowup > kb.TWO_ADICITY:
        return False

    query_indices = [
        challenger.sample_bits(log_len + config.log_blowup)
        for _ in range(config.num_queries)
    ]

    # Batched evaluations at the query points from component openings.
    batch_evals = [np.zeros(4, np.uint32) for _ in query_indices]
    batch_idx = 0
    for round_idx, opening in enumerate(proof.component_openings):
        total_columns = sum(
            np.asarray(c, np.uint32).reshape(-1, 4).shape[0]
            for c in evaluation_claims[round_idx]
        )
        values = opening.values
        if values.ndim != 2 or values.shape[0] != len(query_indices):
            return False
        if values.shape[1] != total_columns:
            return False
        round_coeffs = coeffs[batch_idx : batch_idx + total_columns]
        for q in range(len(query_indices)):
            for c in range(total_columns):
                term = E4.mul(round_coeffs[c], E4.from_base(values[q, c]))
                batch_evals[q] = E4.add(batch_evals[q], term)
        batch_idx += total_columns

    _vo = tcs.verify_openings if (tcs is not None and getattr(tcs, "host_only", False)) else merkle.verify_openings
    for commit, opening in zip(commitments, proof.component_openings):
        width = opening.values.shape[1]
        if not _vo(
            commit,
            query_indices,
            opening.values,
            width,
            log_len + config.log_blowup,
            opening.proof,
        ):
            return False

    if not _verify_queries(
        proof.fri_commitments,
        query_indices,
        proof.final_poly,
        batch_evals,
        proof.query_openings,
        betas,
        config,
        tcs=tcs,
    ):
        return False

    last_msg = proof.univariate_messages[-1]
    expect_final = E4.add(last_msg[0], E4.mul(betas[-1], last_msg[1]))
    if not np.array_equal(proof.final_poly, expect_final):
        return False
    return True


def _verify_queries(
    commitments: list,
    indices: list,
    final_poly: np.ndarray,
    reduced_openings: list,
    query_openings: list,
    betas: list,
    config: FriConfig,
    tcs=None,
) -> bool:
    """Reference: slop/crates/basefold/src/verifier.rs:308 verify_queries."""
    from ..field.domain import reverse_bits

    log_max_height = len(commitments) + config.log_blowup
    folded = [v.copy() for v in reduced_openings]
    idxs = list(indices)
    g = two_adic_generator(log_max_height)
    xs_scalar = [
        np.uint32(pow(g, reverse_bits(i, log_max_height), kb.P)) for i in idxs
    ]
    if len(commitments) != len(query_openings) or len(commitments) != len(betas):
        return False

    round_heights = list(range(config.log_blowup, log_max_height))[::-1]
    for round_idx, commitment, opening, beta in zip(
        round_heights, commitments, query_openings, betas
    ):
        values = opening.values
        if values.ndim != 2 or values.shape[0] != len(idxs):
            return False
        if values.shape[1] != 8:
            return False
        for q in range(len(idxs)):
            index = idxs[q]
            evals = values[q].reshape(2, 4)
            if not np.array_equal(evals[index % 2], folded[q]):
                return False
            x = np.uint64(xs_scalar[q])
            xs = [x, x]
            neg1 = np.uint64(kb.P - 1)
            xs[(index ^ 1) % 2] = xs[(index ^ 1) % 2] * neg1 % kb.P
            # folded = e0 + (beta - x0)*(e1 - e0)/(x1 - x0)
            denom = (xs[1] + kb.P - xs[0]) % kb.P
            denom_inv = np.uint32(pow(int(denom), kb.P - 2, kb.P))
            diff = E4.sub(evals[1], evals[0])
            bmx = E4.sub(beta, E4.from_base(np.uint32(xs[0])))
            slope = kb.npf.mul(diff, denom_inv)
            folded[q] = E4.add(evals[0], E4.mul(bmx, slope))
            idxs[q] = index >> 1
            xs_scalar[q] = np.uint32(x * x % kb.P)
        _vo = tcs.verify_openings if (tcs is not None and getattr(tcs, "host_only", False)) else merkle.verify_openings
        if not _vo(
            commitment, idxs, values, 8, round_idx, opening.proof
        ):
            return False

    for v in folded:
        if not np.array_equal(v, final_poly):
            return False
    return True

"""Poseidon2 Merkle-tree tensor commitment scheme (TCS) for TPU.

Mirrors the reference `MerkleTreeTcs` (reference:
slop/crates/merkle-tree/src/tcs.rs): a batch of 2D tensors with a common
height H is committed by hashing, for each row index, the concatenation
of that row across all tensors (PaddingFreeSponge, rate 8, digest 8),
then building a binary tree with the width-16 truncated-permutation
compressor. Openings return the row values plus the sibling-digest path.

Device path: leaf hashing and every tree layer are vectorized Poseidon2
calls over monty uint32 arrays — one `permute` over (N, 16) per sponge
chunk / tree level, which XLA maps onto the VPU. Proof assembly and
verification are host-side numpy (canonical form).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

import jax
import jax.numpy as jnp

import os

from ..field import koalabear as kb
from ..ops import poseidon2 as p2

# SP1_TPU_PALLAS=1 routes leaf hashing and tree compression through the
# Mosaic kernels in ops.poseidon2_pallas (state resident in VMEM for all
# rounds) instead of the lax.scan permutation. Off by default until the
# kernels are profiled faster than the fused scan on the target chip.
_USE_PALLAS = os.environ.get("SP1_TPU_PALLAS", "0") == "1"


def _hash_rows(rows):
    if _USE_PALLAS:
        from ..ops import poseidon2_pallas as pp

        return pp.hash_rows(rows)
    return p2.hash_rows(rows)


def _compress_pairs(pairs16):
    """(N, 16) sibling-pair rows -> (N, 8) parent digests."""
    if _USE_PALLAS:
        from ..ops import poseidon2_pallas as pp

        return pp.compress(pairs16[:, : p2.DIGEST], pairs16[:, p2.DIGEST :])
    return p2.permute(pairs16)[:, : p2.DIGEST]


@dataclass
class MerkleTree:
    """Prover data: all digest layers, monty form, layer[0] = leaves.

    Layers stay DEVICE-resident (jnp) on the device path: the full tree
    is hundreds of MB and the remote-TPU device->host link is ~15 MB/s,
    so only the root (and, at opening time, the queried sibling digests)
    ever cross to the host. Host-built trees store numpy layers.
    """

    layers: list  # list of (N_l, 8) monty arrays (jnp device or np host)
    height: int  # number of leaf rows (power of 2)

    @property
    def root(self) -> np.ndarray:
        """Root digest, canonical uint32 (8,)."""
        return np.asarray(kb.from_monty(jnp.asarray(self.layers[-1][0])), np.uint32)


@dataclass
class MerkleProof:
    """Opening proof for a set of row indices."""

    paths: np.ndarray  # (Q, depth, 8) canonical digests (siblings, bottom-up)
    log_height: int
    width: int


@jax.jit
def _leaf_hash(rows):
    return _hash_rows(rows)


@jax.jit
def _compress_layer(layer):
    """(2N, 8) digests -> (N, 8) parent digests."""
    pairs = layer.reshape(-1, 16)
    return _compress_pairs(pairs)


def _tree_layers(leaves):
    """All digest layers above `leaves`, unrolled per level (traceable).

    Peak memory is the geometric layer series (~2x the leaf digests);
    the previous fixed-shape lax.scan materialized (levels, N, 8) — a
    log(N) factor more HBM that OOMed production shard shapes (mlrc>=18
    at stacking height 2^21 on a 16 GB chip)."""
    layers = [leaves]
    while layers[-1].shape[0] > 1:
        layers.append(_compress_pairs(layers[-1].reshape(-1, 16)))
    return layers


@jax.jit
def _commit_kernel(rows):
    """Leaf hash + full tree in one dispatch (one jit per (H, W) shape)."""
    return tuple(_tree_layers(_hash_rows(rows)))


def commit_tensors(tensors: list) -> MerkleTree:
    """Commit to tensors [(H, W_i) monty uint32 jnp arrays], same H.

    Rows are concatenated across tensors before hashing
    (reference: slop/crates/merkle-tree/src/tcs.rs:146 hash_iter_slices).
    One jit per (H, total_W) shape covers the whole tree build.
    """
    tensors = [jnp.asarray(t, jnp.uint32) for t in tensors]
    h = tensors[0].shape[0]
    assert h & (h - 1) == 0, "height must be a power of two"
    assert all(t.shape[0] == h for t in tensors)
    rows = jnp.concatenate([t.reshape(h, -1) for t in tensors], axis=1)
    return MerkleTree(layers=list(_commit_kernel(rows)), height=h)


def commit_tensors_host(leaves_canon: np.ndarray) -> MerkleTree:
    """Host Merkle commit over CANONICAL (H, W) numpy leaf rows.

    Used for the small FRI tail rounds where device dispatch would be
    compile-bound. Layers are stored in monty form to match the device
    tree layout used by open_at_indices.
    """
    from ..ops.hostmle import to_monty_host

    h = leaves_canon.shape[0]
    assert h & (h - 1) == 0
    layer = p2.hostp2.hash_rows(leaves_canon)
    layers = [to_monty_host(layer)]
    while layer.shape[0] > 1:
        pairs = layer.reshape(-1, 16)
        layer = p2.hostp2.permute(pairs)[:, : p2.DIGEST]
        layers.append(to_monty_host(layer))
    return MerkleTree(layers=layers, height=h)


def open_at_indices(tree: MerkleTree, indices: list, width: int) -> MerkleProof:
    """Sibling paths (bottom-up) for leaf indices, canonical digests."""
    depth = len(tree.layers) - 1
    if depth and not isinstance(tree.layers[0], np.ndarray):
        # device tree: gather the queried siblings on device, one small
        # transfer for all (Q, depth, 8) digests.
        idx = np.asarray(indices, np.int64)
        sib_rows = []
        for lvl in range(depth):
            sib = jnp.asarray((idx >> lvl) ^ 1, jnp.int32)
            sib_rows.append(tree.layers[lvl][sib])  # (Q, 8)
        dev = jnp.stack(sib_rows, axis=1)  # (Q, depth, 8)
        paths = np.asarray(kb.from_monty(dev.reshape(-1)), np.uint32).reshape(
            len(indices), depth, p2.DIGEST
        )
        return MerkleProof(paths=paths, log_height=depth, width=width)
    paths = np.zeros((len(indices), depth, p2.DIGEST), np.uint32)
    for q, idx in enumerate(indices):
        i = int(idx)
        for lvl in range(depth):
            sib = i ^ 1
            paths[q, lvl] = tree.layers[lvl][sib]
            i >>= 1
    # convert digests to canonical form in one vectorized call
    if depth:
        paths = np.asarray(
            kb.from_monty(jnp.asarray(paths.reshape(-1))), np.uint32
        ).reshape(paths.shape)
    return MerkleProof(paths=paths, log_height=depth, width=width)


def compute_openings(tensors: list, indices: list) -> np.ndarray:
    """Row values at indices, canonical, shape (Q, total_width)."""
    rows = []
    h = int(tensors[0].shape[0])
    cat = jnp.concatenate([jnp.asarray(t).reshape(h, -1) for t in tensors], axis=1)
    idx = jnp.asarray(np.asarray(indices, np.int32))
    vals = kb.from_monty(cat[idx])
    return np.asarray(vals, np.uint32)


def root_dev(tree: MerkleTree):
    """Root digest as a CANONICAL (8,) device array (no readback)."""
    return kb.from_monty(jnp.asarray(tree.layers[-1][0]))


def gather_openings_dev(tensors: list, indices: list):
    """Device handle for the canonical (Q, total_width) opened rows."""
    h = int(tensors[0].shape[0])
    cat = jnp.concatenate([jnp.asarray(t).reshape(h, -1) for t in tensors], axis=1)
    idx = jnp.asarray(np.asarray(indices, np.int32))
    return kb.from_monty(cat[idx])


def open_paths_dev(tree: MerkleTree, indices: list):
    """Device handle for the canonical (Q, depth, 8) sibling paths."""
    depth = len(tree.layers) - 1
    idx = np.asarray(indices, np.int64)
    if depth == 0:
        return jnp.zeros((len(indices), 0, p2.DIGEST), jnp.uint32)
    sib_rows = []
    for lvl in range(depth):
        sib = jnp.asarray((idx >> lvl) ^ 1, jnp.int32)
        layer = tree.layers[lvl]
        if isinstance(layer, np.ndarray):
            layer = jnp.asarray(layer)
        sib_rows.append(layer[sib])
    return kb.from_monty(jnp.stack(sib_rows, axis=1))


@jax.jit
def _open_kernel(layers, tensors, idx):
    """Fused query opening: values + sibling paths in ONE dispatch.

    layers: tuple of digest layers below the root; tensors: tuple of the
    committed (H, W_i) row tensors; idx: (Q,) int32 leaf indices.
    Returns ((Q, total_W) canonical values, (Q, depth, 8) canonical paths).
    """
    h = tensors[0].shape[0]
    cat = (
        jnp.concatenate([t.reshape(h, -1) for t in tensors], axis=1)
        if len(tensors) > 1
        else tensors[0].reshape(h, -1)
    )
    vals = kb.from_monty(cat[idx])
    if layers:
        sibs = [layers[lvl][(idx >> lvl) ^ 1] for lvl in range(len(layers))]
        paths = kb.from_monty(jnp.stack(sibs, axis=1))
    else:
        paths = jnp.zeros((idx.shape[0], 0, p2.DIGEST), jnp.uint32)
    return vals, paths


def open_tree_dev(tree: MerkleTree, tensors: list, indices: list):
    """Device handles (values, paths) for a query opening, one dispatch.

    Replaces the per-level gathers of gather_openings_dev/open_paths_dev
    (each a blocking dispatch on the remote-tunnel TPU path)."""
    idx = jnp.asarray(np.asarray(indices, np.int32))
    layers = tuple(
        jnp.asarray(l) if isinstance(l, np.ndarray) else l
        for l in tree.layers[:-1]
    )
    tensors = tuple(
        jnp.asarray(t) if isinstance(t, np.ndarray) else t for t in tensors
    )
    return _open_kernel(layers, tensors, idx)


def verify_openings(
    root: np.ndarray,
    indices: list,
    values: np.ndarray,
    expected_width: int,
    expected_log_height: int,
    proof: MerkleProof,
) -> bool:
    """Host verification, canonical form (reference: tcs.rs:103-150)."""
    if proof.width != expected_width or proof.log_height != expected_log_height:
        return False
    if values.shape[0] != len(indices) or values.shape[1] != proof.width:
        return False
    if proof.paths.shape != (len(indices), proof.log_height, p2.DIGEST):
        return False
    # Vectorized over all queries: one batched Poseidon2 per tree level.
    digests = p2.hostp2.hash_rows(np.asarray(values, np.uint32))  # (Q, 8)
    idx = np.asarray(indices, np.int64)
    for lvl in range(proof.log_height):
        sibs = proof.paths[:, lvl]
        odd = (idx & 1).astype(bool)[:, None]
        left = np.where(odd, sibs, digests)
        right = np.where(odd, digests, sibs)
        digests = p2.hostp2.compress(left, right)
        idx >>= 1
    return bool(np.all(digests == np.asarray(root, np.uint32)[None, :]))

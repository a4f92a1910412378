"""BN254 Poseidon2 Merkle TCS for the wrap stage (outer context).

Reference role: slop/crates/bn254/src/lib.rs Bn254 config — Hasher =
MultiField32PaddingFreeSponge over the width-3 BN254 Poseidon2,
Compressor = TruncatedPermutation (compress = permute([l, r, 0])[0]),
Digest = ONE Bn254Fr element. slop/crates/basefold/src/config.rs:48-60
instantiates BaseFold over this TCS for WrapSC.

Convention note: plonky3's padding-free sponge is not vendored in the
reference tree, so the exact leaf packing is OUR convention (documented
here, consumed by our outer verifier and the gnark export): rows of
KoalaBear values pack 8-per-Bn254-element with the same base-2^31
little-endian reduction the MultiField32 challenger uses
(iop/multifield.py:_reduce_31), absorb 2 packed elements per permutation
into state slots 0..1 (slot 2 is capacity), and the digest is state[0].

Everything here is host-side (Python ints / numpy): the wrap machine is
small (RecursionAir at 2^mlrc ~ 2^12) and runs once per proof, so the
few thousand BN254 permutations stay off the TPU hot path.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..field import bn254
from ..field import koalabear as kb
from ..iop.multifield import _reduce_31

FELTS_PER_ELEM = 254 // 31  # 8


def hash_row(vals: np.ndarray) -> int:
    """Hash one row of canonical KoalaBear uint32 values to a Bn254 int."""
    vals = np.asarray(vals, np.uint32).reshape(-1)
    packed = [
        _reduce_31([int(v) for v in vals[i : i + FELTS_PER_ELEM]])
        for i in range(0, len(vals), FELTS_PER_ELEM)
    ]
    state = [0, 0, 0]
    for i in range(0, len(packed), 2):
        state[0] = packed[i]
        if i + 1 < len(packed):
            state[1] = packed[i + 1]
        state = bn254.permute(state)
    return state[0]


def compress(left: int, right: int) -> int:
    return bn254.compress([left], [right])


@dataclass
class OuterMerkleTree:
    layers: list  # list of (N, 4) uint64 limb arrays; layers[0] = leaves

    @property
    def root(self) -> int:
        from ..ops import outer_hash as oh

        return oh.digest_int(self.layers[-1][0])


@dataclass
class OuterMerkleProof:
    paths: list  # per query: list of sibling ints, bottom-up
    log_height: int
    width: int


def commit_rows(leaves_canon: np.ndarray) -> OuterMerkleTree:
    """Commit a (H, W) canonical KoalaBear matrix (H a power of two).

    Batch path through the native BN254 hasher (native/outer_hash.cpp);
    layers are stored as (N, 4) uint64 limb arrays, queried as ints."""
    from ..ops import outer_hash as oh

    h = leaves_canon.shape[0]
    assert h & (h - 1) == 0
    layer = oh.hash_rows(np.asarray(leaves_canon, np.uint32))
    layers = [layer]
    while layer.shape[0] > 1:
        layer = oh.compress_layer(layer)
        layers.append(layer)
    return OuterMerkleTree(layers=layers)


def open_at_indices(tree: OuterMerkleTree, indices: list, width: int) -> OuterMerkleProof:
    from ..ops import outer_hash as oh

    depth = len(tree.layers) - 1
    paths = []
    for idx in indices:
        sibs = []
        for lvl in range(depth):
            sibs.append(oh.digest_int(tree.layers[lvl][(int(idx) >> lvl) ^ 1]))
        paths.append(sibs)
    return OuterMerkleProof(paths=paths, log_height=depth, width=width)


def verify_openings(
    root: int, indices: list, values: np.ndarray, proof: OuterMerkleProof
) -> bool:
    from ..ops import outer_hash as oh

    for q, idx in enumerate(indices):
        digest = oh.digest_int(oh.hash_rows(values[q : q + 1])[0])
        for lvl, sib in enumerate(proof.paths[q]):
            bit = (int(idx) >> lvl) & 1
            digest = compress(sib, digest) if bit else compress(digest, sib)
        if digest != root:
            return False
    return True


class OuterTcs:
    """Tensor-commitment seam for the wrap PCS (host-only).

    Call-compatible with the inner merkle module's functions as used by
    basefold (commit_tensors_host / open_at_indices / compute_openings /
    verify_openings); digests are Bn254 ints, observed into the
    transcript via MultiField32Challenger.observe_commitment."""

    host_only = True

    def commit_tensors_host(self, leaves_canon) -> OuterMerkleTree:
        """Commit a (H, W) canonical matrix OR a list of (H, W_i) ones
        (row-concatenated, mirroring merkle.commit_tensors)."""
        if isinstance(leaves_canon, (list, tuple)):
            leaves_canon = np.concatenate(
                [np.asarray(t, np.uint32).reshape(t.shape[0], -1)
                 for t in leaves_canon],
                axis=1,
            )
        return commit_rows(np.asarray(leaves_canon, np.uint32))

    def open_at_indices(self, tree, indices, width):
        return open_at_indices(tree, indices, width)

    def compute_openings(self, tensors: list, indices: list) -> np.ndarray:
        idx = np.asarray(indices, np.int64)
        cat = np.concatenate(
            [np.asarray(t, np.uint32).reshape(t.shape[0], -1) for t in tensors],
            axis=1,
        )
        return cat[idx]

    def verify_openings(self, root, indices, values, width, log_height,
                        proof) -> bool:
        values = np.asarray(values, np.uint32)
        if values.shape[1] != width or proof.log_height != log_height:
            return False
        return verify_openings(int(root), indices, values, proof)

    def observe_digest(self, challenger, root: int):
        challenger.observe_commitment(int(root))

    def digest_eq(self, a, b) -> bool:
        return int(a) == int(b)

"""Recursion vk map: a Poseidon2 Merkle tree over the ALLOWED recursion
vk digests, verified in-circuit by compose/shrink programs.

Reference: crates/prover/src/shapes.rs:471,702 (the shape system's
vk_map merkle tree) and crates/recursion/circuit/src/machine/compress.rs
(SP1CompressWithVKeyVerifier: each child vk's digest must prove
membership under a committed vk root). Without this, any prover could
compose proofs under a self-chosen vk — the root pins the closed set of
programs the aggregation tree may recurse over.

Digest convention (host + in-circuit identical):
    s = permute([commit(8) || 0^8]);  s[0:3] = pc_start;  s = permute(s)
    digest = s[0:8]
Tree: leaves padded to 2^depth with zero digests; parent =
permute([left || right])[0:8] (the standard truncated compressor).
"""

from __future__ import annotations

import numpy as np

from ..verifier.backend import poseidon2_permute_ints


def vk_digest(vk) -> np.ndarray:
    """(8,) canonical digest of a MachineVerifyingKey."""
    commit = [int(v) for v in np.asarray(vk.preprocessed_commit).reshape(-1)]
    pc = [int(v) for v in np.asarray(vk.pc_start).reshape(-1)]
    s = poseidon2_permute_ints(commit[:8] + [0] * 8)
    s = list(s)
    s[0:3] = pc[:3]
    s = poseidon2_permute_ints(s)
    return np.asarray(s[:8], np.uint32)


def _compress_ints(left: list, right: list) -> list:
    return list(poseidon2_permute_ints(list(left) + list(right))[:8])


class VkMap:
    """Merkle tree over a fixed, sorted list of allowed vk digests."""

    def __init__(self, digests: list):
        leaves = [list(int(x) for x in d) for d in digests]
        depth = max(len(leaves) - 1, 0).bit_length()
        while len(leaves) < (1 << depth):
            leaves.append([0] * 8)
        self.depth = depth
        self.layers = [leaves]
        layer = leaves
        while len(layer) > 1:
            layer = [
                _compress_ints(layer[2 * i], layer[2 * i + 1])
                for i in range(len(layer) // 2)
            ]
            self.layers.append(layer)

    @property
    def root(self) -> np.ndarray:
        return np.asarray(self.layers[-1][0], np.uint32)

    def prove(self, index: int) -> list:
        """Sibling digests bottom-up for leaf `index`."""
        path = []
        for lvl in range(self.depth):
            path.append(list(self.layers[lvl][(index >> lvl) ^ 1]))
        return path

    @staticmethod
    def verify(root, digest, index: int, path: list) -> bool:
        cur = [int(x) for x in np.asarray(digest).reshape(-1)]
        for lvl, sib in enumerate(path):
            if (index >> lvl) & 1:
                cur = _compress_ints(sib, cur)
            else:
                cur = _compress_ints(cur, sib)
        return cur == [int(x) for x in np.asarray(root).reshape(-1)]


# ---------------------------------------------------------------------------
# In-circuit membership (recursion program DSL)
# ---------------------------------------------------------------------------


def circuit_vk_digest(sym, vvk) -> list:
    """The vk digest computed inside a recursion program (8 felts)."""
    zero = sym.felt(0)
    state = list(vvk.preprocessed_commit[:8]) + [zero] * 8
    state = sym.poseidon2(state)
    state = list(vvk.pc_start[:3]) + list(state[3:])
    state = sym.poseidon2(state)
    return list(state[:8])


def circuit_verify_membership(sym, digest, depth: int, root_consts):
    """Witness (index bits, sibling path) and constrain digest ->
    root_consts under the vk tree. Returns nothing; asserts equality."""
    cur = list(digest)
    for _lvl in range(depth):
        bit = sym.witness_felt()
        sym.assert_f_eq(
            sym.fmul(bit, sym.fsub(bit, sym.felt(1))), sym.felt(0),
            "vkmap path bit boolean",
        )
        sib = [sym.witness_felt() for _ in range(8)]
        left = [sym.select_f(bit, s, c) for s, c in zip(sib, cur)]
        right = [sym.select_f(bit, c, s) for c, s in zip(cur, sib)]
        cur = list(sym.poseidon2(left + right)[:8])
    for c, r in zip(cur, root_consts):
        sym.assert_f_eq(c, sym.felt(int(r)), "vkmap root")


def membership_witness(w, vk_map: VkMap, index: int):
    """Append the (bits, path) witness blocks in circuit order (the
    StreamWriter.felt protocol of recursion/witness.py)."""
    path = vk_map.prove(index)
    for lvl in range(vk_map.depth):
        w.felt((index >> lvl) & 1)
        for s in path[lvl]:
            w.felt(int(s))

"""Recursion vk map: merkle tree over allowed vk digests, checked
in-circuit by compose programs (reference behavior:
crates/prover/src/shapes.rs vk_map + SP1CompressWithVKeyVerifier)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

from sp1_tpu.pcs.basefold import FriConfig
from sp1_tpu.recursion import compose as rcompose
from sp1_tpu.recursion import vkmap
from sp1_tpu.recursion.prove import RecursionProver

from test_recursion_air import FRI, build_program, make_stream  # noqa: E402


class TestVkMapHost:
    def test_tree_roundtrip(self):
        rng = np.random.default_rng(3)
        digests = [rng.integers(0, 2**31 - 2**24, size=8) for _ in range(5)]
        m = vkmap.VkMap(digests)
        assert m.depth == 3
        for i, d in enumerate(digests):
            assert vkmap.VkMap.verify(m.root, d, i, m.prove(i))
        bad = list(digests[0])
        bad[0] ^= 1
        assert not vkmap.VkMap.verify(m.root, bad, 0, m.prove(0))
        assert not vkmap.VkMap.verify(m.root, digests[0], 1, m.prove(0))

    def test_vk_digest_deterministic(self):
        class FakeVk:
            preprocessed_commit = np.arange(8, dtype=np.uint32)
            pc_start = np.array([7, 0, 0], np.uint32)

        d1, d2 = vkmap.vk_digest(FakeVk()), vkmap.vk_digest(FakeVk())
        assert np.array_equal(d1, d2)
        FakeVk.pc_start = np.array([8, 0, 0], np.uint32)
        assert not np.array_equal(vkmap.vk_digest(FakeVk()), d1)


@pytest.mark.medium
class TestVkMapCompose:
    @pytest.fixture(scope="class")
    def child(self):
        program = build_program()
        rp = RecursionProver(program, fri=FRI)
        proof = rp.prove(make_stream())
        assert rp.verify(proof)
        return rp, proof

    def test_compose_with_vk_membership(self, child):
        rp, proof = child
        digest = vkmap.vk_digest(rp.vk)
        other = np.arange(8, dtype=np.uint32) + 5
        vmap = vkmap.VkMap([digest, other])
        cprog = rcompose.build_compose_program(
            rp.machine, rp.config, proof, num_children=1,
            vk_map_root=vmap.root, vk_map_depth=vmap.depth,
        )
        cprover = RecursionProver(cprog, fri=FRI)
        stream = rcompose.compose_witness_stream(
            rp.vk, [proof], vk_map=vmap, vk_indices=[0]
        )
        cproof = cprover.prove(stream)
        assert cprover.verify(cproof)
        # the program commits the vk ROOT: first 8 public values
        pv = [int(v) for v in cproof.public_values[:8]]
        assert pv == [int(r) for r in vmap.root]

    def test_foreign_vk_rejected(self, child):
        """A vk OUTSIDE the map cannot satisfy the membership check."""
        rp, proof = child
        foreign = vkmap.VkMap([np.arange(8, dtype=np.uint32)])
        cprog = rcompose.build_compose_program(
            rp.machine, rp.config, proof, num_children=1,
            vk_map_root=foreign.root, vk_map_depth=foreign.depth,
        )
        cprover = RecursionProver(cprog, fri=FRI)
        stream = rcompose.compose_witness_stream(
            rp.vk, [proof], vk_map=foreign, vk_indices=[0]
        )
        with pytest.raises(Exception):
            cprover.prove(stream)

"""Wrap stage: prove a recursion program over the BN254 outer context and
verify it (reference behavior: crates/prover/src/components.rs WrapSC +
crates/recursion/circuit/src/machine/wrap.rs).

The outer TCS (BN254 Poseidon2 Merkle, native batch hasher) and the
MultiField32 transcript replace the KoalaBear commitment scheme; the
IOPs are unchanged. Native/pure-python hash parity is pinned here too.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

from sp1_tpu.field import bn254
from sp1_tpu.iop.multifield import MultiField32Challenger
from sp1_tpu.ops import outer_hash as oh
from sp1_tpu.pcs import outer_merkle as om
from sp1_tpu.pcs.basefold import FriConfig
from sp1_tpu.recursion.wrap import WrapProver

from test_recursion_air import build_program, make_stream  # noqa: E402

# small outer FRI for the default tier (production schedule = FriConfig.wrap())
FRI_SMALL = FriConfig(log_blowup=1, num_queries=6, proof_of_work_bits=2)


class TestOuterHashParity:
    def test_permute_matches_python(self):
        st = [12345, 2**200 + 7, bn254.P - 3]
        assert oh.permute(st) == bn254.permute(st)

    def test_hash_and_compress_match_python(self):
        rows = np.arange(24, dtype=np.uint32).reshape(2, 12) * 12345
        native = [oh.digest_int(d) for d in oh.hash_rows(rows)]
        assert native == [om.hash_row(rows[0]), om.hash_row(rows[1])]
        limbs = np.stack([oh.digest_limbs(native[0]), oh.digest_limbs(native[1])])
        assert oh.digest_int(oh.compress_layer(limbs)[0]) == om.compress(*native)

    def test_native_grind_matches_python_scan(self):
        ch = MultiField32Challenger()
        ch.observe_slice(np.array([7, 8, 9], np.uint32))
        import copy

        py = copy.deepcopy(ch)
        w = 0
        from sp1_tpu.iop.multifield import _copy

        while not _copy(py).check_witness(6, w):
            w += 1
        assert ch.grind(6) == w


class TestOuterMerkle:
    def test_commit_open_verify(self):
        rng = np.random.default_rng(0)
        leaves = rng.integers(0, 2**31 - 2**24 + 1, size=(16, 10)).astype(np.uint32)
        tcs = om.OuterTcs()
        tree = tcs.commit_tensors_host(leaves)
        idx = [3, 7, 12]
        proof = tcs.open_at_indices(tree, idx, 10)
        vals = leaves[idx]
        assert tcs.verify_openings(tree.root, idx, vals, 10, 4, proof)
        bad = vals.copy()
        bad[0, 0] ^= 1
        assert not tcs.verify_openings(tree.root, idx, bad, 10, 4, proof)


class TestWrapProve:
    @pytest.fixture(scope="class")
    def wrapped(self):
        program = build_program()
        wp = WrapProver(program, fri=FRI_SMALL)
        proof = wp.prove(make_stream())
        return wp, proof

    def test_prove_verify(self, wrapped):
        wp, proof = wrapped
        assert isinstance(proof.main_commitment, (int, np.integer)) or isinstance(
            wp.vk.preprocessed_commit, (int, np.integer)
        ), "wrap commitments must be Bn254 ints"
        assert wp.verify(proof)

    def test_tampered_commitment_rejected(self, wrapped):
        import copy

        wp, proof = wrapped
        bad = copy.deepcopy(proof)
        bad.main_commitment = int(bad.main_commitment) ^ 1
        assert not wp.verify(bad)

    def test_tampered_opening_rejected(self, wrapped):
        import copy

        wp, proof = wrapped
        bad = copy.deepcopy(proof)
        ops = bad.evaluation_proof.pcs_proof.basefold_proof.component_openings
        ops[0].values[0, 0] ^= 1
        assert not wp.verify(bad)

    def test_transcript_is_outer(self, wrapped):
        """Every Merkle commitment in the wrap proof is one Bn254 element."""
        wp, proof = wrapped
        bf = proof.evaluation_proof.pcs_proof.basefold_proof
        for c in bf.fri_commitments:
            assert isinstance(c, (int, np.integer))
            assert 0 <= int(c) < bn254.P


@pytest.mark.slow
class TestWrapProductionFri:
    def test_wrap_fri_schedule(self):
        f = FriConfig.wrap()
        assert f.log_blowup == 3 and f.proof_of_work_bits == 22

    def test_wrap_at_production_fri(self):
        """Full wrap prove at the production schedule (22-bit native grind)."""
        program = build_program()
        wp = WrapProver(program)  # FriConfig.wrap()
        proof = wp.prove(make_stream())
        assert wp.verify(proof)

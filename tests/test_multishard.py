"""Multi-shard proving: splice a fibonacci run into several shards, prove
each with the shared-challenge global memory argument, verify the chain."""

import numpy as np
import pytest

from sp1_tpu.executor import asm, native
from sp1_tpu.pcs.basefold import FriConfig
from sp1_tpu.pcs.jagged import JaggedConfig
from sp1_tpu.prover import machine as mm
from sp1_tpu.prover import multi
from sp1_tpu.riscv import tracegen
from sp1_tpu.riscv.machine import WordSpec, build_machine

pytestmark = pytest.mark.medium

WS = WordSpec(limb_bits=8)
MLRC = 8
CONFIG = JaggedConfig(
    FriConfig(log_blowup=1, num_queries=6, proof_of_work_bits=2),
    log_stacking_height=11,
    max_log_row_count=MLRC,
)


@pytest.fixture(scope="module")
def setup():
    prog = asm.assemble(asm.FIBONACCI)
    res = native.execute(prog, inputs=[60])  # ~370 cycles -> 2+ shards at 200
    assert res.cycles > 300
    machine = build_machine(WS)
    prover = mm.ShardProver(machine, CONFIG)
    prep = tracegen.make_preprocessed(prog, 0, WS, MLRC)
    pk = prover.setup(preprocessed_traces=prep)
    return prog, res, machine, prover, pk


class TestMultiShard:
    def test_two_shard_prove_verify(self, setup):
        prog, res, machine, prover, pk = setup
        proofs = multi.prove_program(
            prover, pk, res, prog, 0, WS, MLRC, max_rows=200
        )
        assert len(proofs) >= 2
        verifier = mm.ShardVerifier(machine, CONFIG)
        assert multi.verify_program(verifier, pk.vk, proofs)

    def test_shard_chain_tamper_rejected(self, setup):
        prog, res, machine, prover, pk = setup
        proofs = multi.prove_program(
            prover, pk, res, prog, 0, WS, MLRC, max_rows=200
        )
        verifier = mm.ShardVerifier(machine, CONFIG)
        # Drop the last shard: the global sums no longer cancel.
        assert not multi.verify_program(verifier, pk.vk, proofs[:-1])
        # Reorder shards: pc/clk chaining breaks.
        if len(proofs) >= 2:
            assert not multi.verify_program(
                verifier, pk.vk, [proofs[1], proofs[0]] + proofs[2:]
            )


class TestLocalNode:
    def test_parallel_shard_proving(self, setup):
        from sp1_tpu.parallel.node import LocalNode

        prog, res, machine, prover, pk = setup
        verifier = mm.ShardVerifier(machine, CONFIG)
        node = LocalNode(prover, verifier, num_workers=2)
        try:
            proofs = node.prove(pk, res, prog, 0, WS, MLRC, max_rows=200)
            assert len(proofs) >= 2
            assert node.verify(pk.vk, proofs)
        finally:
            node.shutdown()

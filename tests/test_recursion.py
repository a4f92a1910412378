"""Recursion compiler + VM: the shard verifier compiled to a
RecursionProgram executes against a real proof's witness stream.

Reference behaviors covered: program generation from the circuit DSL
(crates/recursion/compiler/src/circuit/compiler.rs), recursion runtime
execution (crates/recursion/executor/src/lib.rs Runtime::run), and
witness streaming (crates/recursion/circuit/src/witness.rs).
"""

import numpy as np
import pytest

from sp1_tpu.iop.challenger import DuplexChallenger
from sp1_tpu.prover import machine as mm
from sp1_tpu.recursion import compile as rcompile
from sp1_tpu.recursion import executor as rexec
from sp1_tpu.verifier import check_shard

import test_machine as tmach

pytestmark = pytest.mark.medium


@pytest.fixture(scope="module")
def core_proof():
    machine = tmach.build_machine()
    traces, prep = tmach.build_traces()
    prover = mm.ShardProver(machine, tmach.CONFIG)
    pk = prover.setup(preprocessed_traces=prep)
    pch = DuplexChallenger()
    pk.vk.observe_into(pch)
    proof = prover.prove_shard(pk, traces, [], pch)
    assert check_shard(machine, tmach.CONFIG, pk.vk, proof, verbose=True)
    return machine, pk, proof


@pytest.fixture(scope="module")
def compiled(core_proof):
    machine, pk, proof = core_proof
    program = rcompile.build_shard_verify_program(machine, tmach.CONFIG, proof)
    stream = rcompile.shard_witness_stream(pk.vk, proof)
    return program, stream


class TestRecursionProgram:
    def test_witness_stream_matches_program(self, compiled):
        program, stream = compiled
        assert len(stream) == program.num_witness

    def test_execute_accepts_valid_proof(self, core_proof, compiled):
        machine, pk, proof = core_proof
        program, stream = compiled
        record = rexec.execute(program, stream)
        # public values bind the vk commit + pc_start + core pvs
        assert record.public_values[:8].tolist() == [
            int(v) for v in pk.vk.preprocessed_commit
        ]
        assert record.public_values[8:11].tolist() == [
            int(v) for v in pk.vk.pc_start
        ]

    def test_tampered_witness_rejected(self, compiled):
        program, stream = compiled
        for pos in [0, len(stream) // 2, len(stream) - 1]:
            bad = list(stream)
            blk = list(bad[pos])
            blk[0] = (blk[0] + 1) % rexec.P
            bad[pos] = tuple(blk)
            with pytest.raises(rexec.RecursionExecutionError):
                rexec.execute(program, bad)

    def test_wrong_length_stream_rejected(self, compiled):
        program, stream = compiled
        with pytest.raises(rexec.RecursionExecutionError):
            rexec.execute(program, stream[:-1])

    def test_program_is_deterministic(self, core_proof, compiled):
        machine, pk, proof = core_proof
        program, _ = compiled
        again = rcompile.build_shard_verify_program(machine, tmach.CONFIG, proof)
        assert again.counts() == program.counts()
        assert np.array_equal(again.base_alu, program.base_alu)
        assert np.array_equal(again.poseidon2, program.poseidon2)
        assert again.exec_order == program.exec_order

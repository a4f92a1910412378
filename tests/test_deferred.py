"""Deferred precompile shards: keccak rows stripped from the CPU shard
into a standalone precompile shard, linked back through the septic
global argument (SyscallDefer bridge + per-chain memory boundaries).

Reference behavior: crates/prover/src/worker/controller/precompiles.rs
:35-111 (deferred precompile shards), deferred.rs. This is what keeps a
keccak-heavy workload (4017-wide trace) from blowing the CPU shard's
area budget.
"""

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
MLRC = 9
CONFIG = JaggedConfig(
    FriConfig(log_blowup=1, num_queries=6, proof_of_work_bits=2),
    log_stacking_height=11,
    max_log_row_count=MLRC,
)

# Write a 25-lane state, permute it, read it back and also touch the
# buffer from the CPU side AFTER the call (forces a memory-chain split:
# the CPU shard's chains for those cells must break around the deferred
# accesses).
KECCAK_GUEST = """
    li s0, 1024
    li t0, 25
    mv s1, s0
fill:
    li a7, 3
    ecall            # a0 = next initial lane
    sd a0, 0(s1)
    addi s1, s1, 8
    addi t0, t0, -1
    bne t0, zero, fill
    li a7, 10
    mv a0, s0
    ecall            # KECCAK_PERMUTE(state @ s0)
    li t0, 25
    mv s1, s0
    li t1, 0
acc:
    ld t2, 0(s1)
    add t1, t1, t2
    addi s1, s1, 8
    addi t0, t0, -1
    bne t0, zero, acc
    mv a0, t1
    li a7, 0
    ecall
"""

DEFER = frozenset({10})  # keccak syscall id


@pytest.fixture(scope="module")
def run():
    prog = asm.assemble(KECCAK_GUEST)
    res = native.execute(prog, inputs=list(range(1, 26)))
    machine = build_machine(WS)
    prover = mm.ShardProver(machine, CONFIG)
    prep = tracegen.make_preprocessed(prog, 0, WS, MLRC)
    pk = prover.setup(preprocessed_traces=prep)
    return prog, res, machine, prover, pk


class TestDeferredPrecompileShards:
    def test_px_shard_split(self, run):
        prog, res, machine, prover, pk = run
        inputs = multi.shard_inputs_of(
            res, prog, 0, WS, MLRC, defer_kinds=DEFER
        )
        assert len(inputs) == 2  # cpu shard + precompile shard
        cpu_traces, _ = inputs[0]
        px_traces, px_pv = inputs[1]
        assert "KeccakPerm" not in cpu_traces
        assert "SyscallDefer" in cpu_traces
        assert "KeccakPerm" in px_traces
        assert "SyscallDefer" in px_traces
        assert not any(n.startswith("Cpu") for n in px_traces)

    def test_deferred_prove_verify(self, run):
        prog, res, machine, prover, pk = run
        proofs = multi.prove_program(
            prover, pk, res, prog, 0, WS, MLRC, defer_kinds=DEFER
        )
        assert len(proofs) == 2
        verifier = mm.ShardVerifier(machine, CONFIG)
        assert multi.verify_program(verifier, pk.vk, proofs)
        # independent acceptance oracle
        from sp1_tpu.verifier import check_program

        assert check_program(machine, CONFIG, pk.vk, proofs)
        # Σ digests != 0 without the precompile shard
        assert not multi.verify_program(verifier, pk.vk, proofs[:1])
        assert not check_program(machine, CONFIG, pk.vk, proofs[:1])

    def test_matches_undeferred_result(self, run):
        prog, res, machine, prover, pk = run
        # the same execution still proves without deferral
        proofs = multi.prove_program(prover, pk, res, prog, 0, WS, MLRC)
        assert len(proofs) == 1
        verifier = mm.ShardVerifier(machine, CONFIG)
        assert multi.verify_program(verifier, pk.vk, proofs)

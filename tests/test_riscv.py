"""End-to-end RISC-V zkVM test: execute fibonacci natively, generate
traces, debug-check constraints, prove the shard, verify it."""

import numpy as np
import pytest

from sp1_tpu.executor import asm, native
from sp1_tpu.iop.challenger import DuplexChallenger
from sp1_tpu.pcs.basefold import FriConfig
from sp1_tpu.pcs.jagged import JaggedConfig
from sp1_tpu.prover import machine as mm
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
def fib_execution():
    prog = asm.assemble(asm.FIBONACCI)
    res = native.execute(prog, inputs=[10])
    assert res.exit_code == 55
    return prog, res


class TestRiscvTracegen:
    def test_traces_satisfy_constraints(self, fib_execution):
        prog, res = fib_execution
        traces, prep = tracegen.generate_traces(res, prog, 0, WS, MLRC)
        pv = tracegen.make_public_values(res, 0, WS, traces=traces) + [0] * 171
        machine = build_machine(WS)
        violations = mm.debug_constraints(
            machine,
            machine.chips,
            {n: t for n, (t, _) in prep.items()},
            {n: t for n, (t, _) in traces.items()},
            {n: h for n, (_, h) in traces.items()},
            pv,
        )
        assert violations == [], violations[:10]


class TestRiscvProve:
    def test_fibonacci_prove_verify(self, fib_execution):
        prog, res = fib_execution
        traces, prep = tracegen.generate_traces(res, prog, 0, WS, MLRC)
        machine = build_machine(WS)
        prover = mm.ShardProver(machine, CONFIG)
        pk = prover.setup(preprocessed_traces=prep)
        pv = tracegen.make_public_values(res, 0, WS, traces=traces)
        pch = DuplexChallenger()
        pk.vk.observe_into(pch)
        proof = prover.prove_shard(pk, traces, pv, pch)
        verifier = mm.ShardVerifier(machine, CONFIG)
        vch = DuplexChallenger()
        pk.vk.observe_into(vch)
        assert verifier.verify_shard(pk.vk, proof, vch)

    def test_wrong_exit_code_rejected(self, fib_execution):
        prog, res = fib_execution
        traces, prep = tracegen.generate_traces(res, prog, 0, WS, MLRC)
        pv = tracegen.make_public_values(res, 0, WS, traces=traces)
        from sp1_tpu.riscv.machine import PV_EXIT_CODE
        pv[PV_EXIT_CODE] ^= 1  # claim fib(10) = 54
        machine = build_machine(WS)
        prover = mm.ShardProver(machine, CONFIG)
        pk = prover.setup(preprocessed_traces=prep)
        pch = DuplexChallenger()
        pk.vk.observe_into(pch)
        proof = prover.prove_shard(pk, traces, pv, pch)
        verifier = mm.ShardVerifier(machine, CONFIG)
        vch = DuplexChallenger()
        pk.vk.observe_into(vch)
        assert not verifier.verify_shard(pk.vk, proof, vch)

    def test_tampered_execution_rejected(self, fib_execution):
        prog, res = fib_execution
        traces, prep = tracegen.generate_traces(res, prog, 0, WS, MLRC)
        # Tamper: claim a different result in the final register state.
        import jax.numpy as jnp

        fin = np.asarray(traces["MemoryFinal"][0]).copy()
        fin[0, 3] ^= 1
        traces["MemoryFinal"] = (jnp.asarray(fin), traces["MemoryFinal"][1])
        machine = build_machine(WS)
        pv = tracegen.make_public_values(res, 0, WS, traces=traces)
        prover = mm.ShardProver(machine, CONFIG)
        pk = prover.setup(preprocessed_traces=prep)
        pch = DuplexChallenger()
        pk.vk.observe_into(pch)
        proof = prover.prove_shard(pk, traces, pv, pch)
        verifier = mm.ShardVerifier(machine, CONFIG)
        vch = DuplexChallenger()
        pk.vk.observe_into(vch)
        assert not verifier.verify_shard(pk.vk, proof, vch)


class TestExtendedIsa:
    def test_mixed_ops_prove_verify(self):
        prog = asm.assemble(asm.MIXED_OPS)
        x = 0xABCDEF
        res = native.execute(prog, inputs=[x])
        assert res.exit_code == asm.mixed_ops_expected(x)
        traces, prep = tracegen.generate_traces(res, prog, 0, WS, MLRC)
        pv = tracegen.make_public_values(res, 0, WS, traces=traces)
        machine = build_machine(WS)
        # constraint + balance debuggers first
        violations = mm.debug_constraints(
            machine,
            machine.chips,
            {n: t for n, (t, _) in prep.items()},
            {n: t for n, (t, _) in traces.items()},
            {n: h for n, (_, h) in traces.items()},
            pv + [0] * 171,
        )
        assert violations == [], violations[:10]
        prover = mm.ShardProver(machine, CONFIG)
        pk = prover.setup(preprocessed_traces=prep)
        pch = DuplexChallenger()
        pk.vk.observe_into(pch)
        proof = prover.prove_shard(pk, traces, pv, pch)
        verifier = mm.ShardVerifier(machine, CONFIG)
        vch = DuplexChallenger()
        pk.vk.observe_into(vch)
        assert verifier.verify_shard(pk.vk, proof, vch)

    def test_cmp_ops_prove_verify(self):
        prog = asm.assemble(asm.CMP_OPS)
        x, y = 2**64 - 3, 7  # signed: -3 < 7; unsigned: huge > 7
        res = native.execute(prog, inputs=[x, y])
        assert res.exit_code == asm.cmp_ops_expected(x, y)
        traces, prep = tracegen.generate_traces(res, prog, 0, WS, MLRC)
        pv = tracegen.make_public_values(res, 0, WS, traces=traces)
        machine = build_machine(WS)
        violations = mm.debug_constraints(
            machine,
            machine.chips,
            {n: t for n, (t, _) in prep.items()},
            {n: t for n, (t, _) in traces.items()},
            {n: h for n, (_, h) in traces.items()},
            pv + [0] * (187 - len(pv)),
        )
        assert violations == [], violations[:10]
        prover = mm.ShardProver(machine, CONFIG)
        pk = prover.setup(preprocessed_traces=prep)
        pch = DuplexChallenger()
        pk.vk.observe_into(pch)
        proof = prover.prove_shard(pk, traces, pv, pch)
        verifier = mm.ShardVerifier(machine, CONFIG)
        vch = DuplexChallenger()
        pk.vk.observe_into(vch)
        assert verifier.verify_shard(pk.vk, proof, vch)


class TestAddressAndX0:
    """32-bit guest address space + rd=x0 result recording.

    Reference behavior: full memory model (crates/core/executor/src/
    memory.rs) and op_a_0 handling — legal encodings that write x0
    still prove; the register write itself is skipped."""

    GUEST = """
        li t0, 1
        slli t0, t0, 30    # t0 = 2^30 (1 GB)
        li t1, 77
        sd t1, 8(t0)       # store above the old 24-bit cap
        ld t2, 8(t0)
        add x0, t2, t1     # legal write to x0: result discarded
        jal x0, skip       # plain j: link value discarded
    skip:
        mv a0, t2
        li a7, 0
        ecall
    """

    def test_high_address_and_x0_prove(self):
        prog = asm.assemble(self.GUEST)
        res = native.execute(prog, inputs=[])
        assert res.exit_code == 77
        traces, prep = tracegen.generate_traces(res, prog, 0, WS, MLRC)
        pv = tracegen.make_public_values(res, 0, WS, traces=traces)
        machine = build_machine(WS)
        violations = mm.debug_constraints(
            machine,
            machine.chips,
            {n: t for n, (t, _) in prep.items()},
            {n: t for n, (t, _) in traces.items()},
            {n: h for n, (_, h) in traces.items()},
            pv + [0] * (187 - len(pv)),
        )
        assert violations == [], violations[:10]
        prover = mm.ShardProver(machine, CONFIG)
        pk = prover.setup(preprocessed_traces=prep)
        pch = DuplexChallenger()
        pk.vk.observe_into(pch)
        proof = prover.prove_shard(pk, traces, pv, pch)
        verifier = mm.ShardVerifier(machine, CONFIG)
        vch = DuplexChallenger()
        pk.vk.observe_into(vch)
        assert verifier.verify_shard(pk.vk, proof, vch)

    def test_out_of_space_address_traps(self):
        prog = asm.assemble(
            """
            li t0, 1
            slli t0, t0, 33
            ld t1, 0(t0)
            li a7, 0
            ecall
        """
        )
        # illegal address: the executor refuses to continue (rc != 0)
        import pytest

        with pytest.raises(RuntimeError, match="did not halt"):
            native.execute(prog, inputs=[])

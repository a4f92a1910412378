"""Shift family: executor differential, constraint debugging, full proofs."""

import numpy as np
import pytest

from sp1_tpu.executor import asm, native
from sp1_tpu.pcs.basefold import FriConfig
from sp1_tpu.pcs.jagged import JaggedConfig
from sp1_tpu.prover import machine as mm
from sp1_tpu.prover.lookup_debug import check_balance
from sp1_tpu.riscv import tracegen
from sp1_tpu.riscv.machine import WordSpec, build_machine

pytestmark = pytest.mark.medium

WS = WordSpec(limb_bits=8)
MLRC = 9
CONFIG = JaggedConfig(
    FriConfig(log_blowup=1, num_queries=12, proof_of_work_bits=4),
    log_stacking_height=10,
    max_log_row_count=MLRC,
)


class TestShiftExecutor:
    @pytest.mark.parametrize("n", [0, 1, 5, 8, 13, 63])
    def test_matches_python_model(self, n):
        prog = asm.assemble(asm.SHIFT_OPS)
        res = native.execute(prog, inputs=[n])
        assert res.exit_code == asm.shift_ops_expected(n) & ((1 << 64) - 1)


class TestShiftConstraints:
    def test_debug_constraints_and_lookups(self):
        prog = asm.assemble(asm.SHIFT_OPS)
        res = native.execute(prog, inputs=[5])
        machine = build_machine(WS)
        traces, prep = tracegen.generate_traces(res, prog, 0, WS, MLRC)
        pv = tracegen.make_public_values(res, 0, WS, traces=traces) + [0] * 171
        violations = mm.debug_constraints(
            machine,
            machine.chips,
            {n: t for n, (t, _) in prep.items()},
            {n: t for n, (t, _) in traces.items()},
            {n: h for n, (_, h) in traces.items()},
            pv,
        )
        assert violations == [], violations[:10]
        imbal = check_balance(
            machine.chips,
            {n: t for n, (t, _) in prep.items()},
            {n: t for n, (t, _) in traces.items()},
            {n: h for n, (_, h) in traces.items()},
        )
        # the state chain legitimately leaves the (pc_start, clk_start)
        # send and the final-state receive to the public-values digest
        from sp1_tpu.air.builder import KIND_GLOBAL_ACC, KIND_STATE

        real = {k: v for k, v in imbal.items() if k[0] not in (KIND_STATE, KIND_GLOBAL_ACC)}
        assert real == {}, dict(list(real.items())[:5])


class TestShiftProve:
    def test_prove_verify(self):
        prog = asm.assemble(asm.SHIFT_OPS)
        res = native.execute(prog, inputs=[9])
        machine = build_machine(WS)
        prover = mm.ShardProver(machine, CONFIG)
        prep = tracegen.make_preprocessed(prog, 0, WS, MLRC)
        pk = prover.setup(preprocessed_traces=prep)
        traces, _ = tracegen.generate_traces(res, prog, 0, WS, MLRC)
        pv = tracegen.make_public_values(res, 0, WS, traces=traces)
        pv = pv + [0] * (machine.max_num_pvs - len(pv))
        from sp1_tpu.iop.challenger import DuplexChallenger

        proof = prover.prove_shard(pk, traces, pv, DuplexChallenger())
        verifier = mm.ShardVerifier(machine, CONFIG)
        assert verifier.verify_shard(pk.vk, proof, DuplexChallenger())

    def test_tampered_shift_result_rejected(self):
        prog = asm.assemble(asm.SHIFT_OPS)
        res = native.execute(prog, inputs=[9])
        machine = build_machine(WS)
        prover = mm.ShardProver(machine, CONFIG)
        prep = tracegen.make_preprocessed(prog, 0, WS, MLRC)
        pk = prover.setup(preprocessed_traces=prep)
        traces, _ = tracegen.generate_traces(res, prog, 0, WS, MLRC)
        # forge the sll result: bump one result limb on the sll row
        from sp1_tpu.field import koalabear as kb
        from sp1_tpu.riscv.machine import CPU_CLASSES, cpu_layout

        L = cpu_layout(WS, *CPU_CLASSES["CpuShift"])
        cpu_t, h = traces["CpuShift"]
        cpu_t = np.asarray(cpu_t).copy()  # monty-form uint32
        one_m = kb.to_monty_i(1)
        rows = [i for i in range(h) if int(cpu_t[i, L["sel_sll"]]) == one_m]
        assert rows
        col = L["a"].start
        cpu_t[rows[0], col] = (int(cpu_t[rows[0], col]) + one_m) % kb.P
        import jax.numpy as jnp

        traces = dict(traces)
        traces["CpuShift"] = (jnp.asarray(cpu_t), h)
        pv = tracegen.make_public_values(res, 0, WS, traces=traces)
        pv = pv + [0] * (machine.max_num_pvs - len(pv))
        from sp1_tpu.iop.challenger import DuplexChallenger

        try:
            proof = prover.prove_shard(pk, traces, pv, DuplexChallenger())
        except Exception:
            return  # prover itself may reject inconsistent traces
        verifier = mm.ShardVerifier(machine, CONFIG)
        assert not verifier.verify_shard(pk.vk, proof, DuplexChallenger())


class TestDivExecutor:
    @pytest.mark.parametrize("n", [0, 3, 6, 13])
    def test_matches_python_model(self, n):
        prog = asm.assemble(asm.DIV_OPS)
        res = native.execute(prog, inputs=[n])
        assert res.exit_code == asm.div_ops_expected(n)


class TestDivConstraints:
    def test_debug_constraints_and_lookups(self):
        prog = asm.assemble(asm.DIV_OPS)
        res = native.execute(prog, inputs=[3])
        machine = build_machine(WS)
        traces, prep = tracegen.generate_traces(res, prog, 0, WS, MLRC)
        pv = tracegen.make_public_values(res, 0, WS, traces=traces) + [0] * 171
        violations = mm.debug_constraints(
            machine,
            machine.chips,
            {n: t for n, (t, _) in prep.items()},
            {n: t for n, (t, _) in traces.items()},
            {n: h for n, (_, h) in traces.items()},
            pv,
        )
        assert violations == [], violations[:10]
        imbal = check_balance(
            machine.chips,
            {n: t for n, (t, _) in prep.items()},
            {n: t for n, (t, _) in traces.items()},
            {n: h for n, (_, h) in traces.items()},
        )
        from sp1_tpu.air.builder import KIND_GLOBAL_ACC, KIND_STATE

        real = {k: v for k, v in imbal.items() if k[0] not in (KIND_STATE, KIND_GLOBAL_ACC)}
        assert real == {}, dict(list(real.items())[:5])


class TestDivProve:
    def test_prove_verify(self):
        prog = asm.assemble(asm.DIV_OPS)
        res = native.execute(prog, inputs=[6])
        machine = build_machine(WS)
        prover = mm.ShardProver(machine, CONFIG)
        prep = tracegen.make_preprocessed(prog, 0, WS, MLRC)
        pk = prover.setup(preprocessed_traces=prep)
        traces, _ = tracegen.generate_traces(res, prog, 0, WS, MLRC)
        pv = tracegen.make_public_values(res, 0, WS, traces=traces)
        pv = pv + [0] * (machine.max_num_pvs - len(pv))
        from sp1_tpu.iop.challenger import DuplexChallenger

        proof = prover.prove_shard(pk, traces, pv, DuplexChallenger())
        verifier = mm.ShardVerifier(machine, CONFIG)
        assert verifier.verify_shard(pk.vk, proof, DuplexChallenger())


class TestCallOps:
    @pytest.mark.parametrize("n", [0, 7, 100])
    def test_executor(self, n):
        prog = asm.assemble(asm.CALL_OPS)
        res = native.execute(prog, inputs=[n])
        assert res.exit_code == asm.call_ops_expected(n)

    def test_constraints_and_prove(self):
        prog = asm.assemble(asm.CALL_OPS)
        res = native.execute(prog, inputs=[7])
        machine = build_machine(WS)
        traces, prep = tracegen.generate_traces(res, prog, 0, WS, MLRC)
        pv = tracegen.make_public_values(res, 0, WS, traces=traces) + [0] * 171
        violations = mm.debug_constraints(
            machine,
            machine.chips,
            {n: t for n, (t, _) in prep.items()},
            {n: t for n, (t, _) in traces.items()},
            {n: h for n, (_, h) in traces.items()},
            pv,
        )
        assert violations == [], violations[:10]
        prover = mm.ShardProver(machine, CONFIG)
        pk = prover.setup(preprocessed_traces=prep)
        pv2 = tracegen.make_public_values(res, 0, WS, traces=traces)
        pv2 = pv2 + [0] * (machine.max_num_pvs - len(pv2))
        from sp1_tpu.iop.challenger import DuplexChallenger

        proof = prover.prove_shard(pk, traces, pv2, DuplexChallenger())
        verifier = mm.ShardVerifier(machine, CONFIG)
        assert verifier.verify_shard(pk.vk, proof, DuplexChallenger())


class TestSubwordMemory:
    @pytest.mark.parametrize("n", [0, 5, 0xDEAD, (1 << 56) + 99])
    def test_executor(self, n):
        prog = asm.assemble(asm.MEMBYTE_OPS)
        res = native.execute(prog, inputs=[n])
        assert res.exit_code == asm.membyte_ops_expected(n)

    def test_constraints_and_prove(self):
        prog = asm.assemble(asm.MEMBYTE_OPS)
        res = native.execute(prog, inputs=[0xABCD])
        machine = build_machine(WS)
        traces, prep = tracegen.generate_traces(res, prog, 0, WS, MLRC)
        pv = tracegen.make_public_values(res, 0, WS, traces=traces) + [0] * 171
        violations = mm.debug_constraints(
            machine,
            machine.chips,
            {n: t for n, (t, _) in prep.items()},
            {n: t for n, (t, _) in traces.items()},
            {n: h for n, (_, h) in traces.items()},
            pv,
        )
        assert violations == [], violations[:10]
        imbal = check_balance(
            machine.chips,
            {n: t for n, (t, _) in prep.items()},
            {n: t for n, (t, _) in traces.items()},
            {n: h for n, (_, h) in traces.items()},
        )
        from sp1_tpu.air.builder import KIND_GLOBAL_ACC, KIND_STATE

        real = {k: v for k, v in imbal.items() if k[0] not in (KIND_STATE, KIND_GLOBAL_ACC)}
        assert real == {}, dict(list(real.items())[:5])
        prover = mm.ShardProver(machine, CONFIG)
        pk = prover.setup(preprocessed_traces=prep)
        pv2 = tracegen.make_public_values(res, 0, WS, traces=traces)
        pv2 = pv2 + [0] * (machine.max_num_pvs - len(pv2))
        from sp1_tpu.iop.challenger import DuplexChallenger

        proof = prover.prove_shard(pk, traces, pv2, DuplexChallenger())
        verifier = mm.ShardVerifier(machine, CONFIG)
        assert verifier.verify_shard(pk.vk, proof, DuplexChallenger())


class TestWordArith:
    @pytest.mark.parametrize("n", [0, 1, 0xFFFF, (1 << 31) + 5])
    def test_executor(self, n):
        prog = asm.assemble(asm.WORD_OPS)
        res = native.execute(prog, inputs=[n])
        assert res.exit_code == asm.word_ops_expected(n)

    def test_constraints_and_prove(self):
        prog = asm.assemble(asm.WORD_OPS)
        res = native.execute(prog, inputs=[0xFFFF])
        machine = build_machine(WS)
        traces, prep = tracegen.generate_traces(res, prog, 0, WS, MLRC)
        pv = tracegen.make_public_values(res, 0, WS, traces=traces) + [0] * 171
        violations = mm.debug_constraints(
            machine,
            machine.chips,
            {n: t for n, (t, _) in prep.items()},
            {n: t for n, (t, _) in traces.items()},
            {n: h for n, (_, h) in traces.items()},
            pv,
        )
        assert violations == [], violations[:10]
        imbal = check_balance(
            machine.chips,
            {n: t for n, (t, _) in prep.items()},
            {n: t for n, (t, _) in traces.items()},
            {n: h for n, (_, h) in traces.items()},
        )
        from sp1_tpu.air.builder import KIND_GLOBAL_ACC, KIND_STATE

        real = {k: v for k, v in imbal.items() if k[0] not in (KIND_STATE, KIND_GLOBAL_ACC)}
        assert real == {}, dict(list(real.items())[:5])
        prover = mm.ShardProver(machine, CONFIG)
        pk = prover.setup(preprocessed_traces=prep)
        pv2 = tracegen.make_public_values(res, 0, WS, traces=traces)
        pv2 = pv2 + [0] * (machine.max_num_pvs - len(pv2))
        from sp1_tpu.iop.challenger import DuplexChallenger

        proof = prover.prove_shard(pk, traces, pv2, DuplexChallenger())
        verifier = mm.ShardVerifier(machine, CONFIG)
        assert verifier.verify_shard(pk.vk, proof, DuplexChallenger())


class TestWordShifts:
    @pytest.mark.parametrize("n", [0, 1, 7, 15, 31, 33])
    def test_executor(self, n):
        prog = asm.assemble(asm.WSHIFT_OPS)
        res = native.execute(prog, inputs=[n])
        assert res.exit_code == asm.wshift_ops_expected(n)

    def test_constraints_and_prove(self):
        prog = asm.assemble(asm.WSHIFT_OPS)
        res = native.execute(prog, inputs=[13])
        machine = build_machine(WS)
        traces, prep = tracegen.generate_traces(res, prog, 0, WS, MLRC)
        pv = tracegen.make_public_values(res, 0, WS, traces=traces) + [0] * 171
        violations = mm.debug_constraints(
            machine,
            machine.chips,
            {n: t for n, (t, _) in prep.items()},
            {n: t for n, (t, _) in traces.items()},
            {n: h for n, (_, h) in traces.items()},
            pv,
        )
        assert violations == [], violations[:10]
        imbal = check_balance(
            machine.chips,
            {n: t for n, (t, _) in prep.items()},
            {n: t for n, (t, _) in traces.items()},
            {n: h for n, (_, h) in traces.items()},
        )
        from sp1_tpu.air.builder import KIND_GLOBAL_ACC, KIND_STATE

        real = {k: v for k, v in imbal.items() if k[0] not in (KIND_STATE, KIND_GLOBAL_ACC)}
        assert real == {}, dict(list(real.items())[:5])
        prover = mm.ShardProver(machine, CONFIG)
        pk = prover.setup(preprocessed_traces=prep)
        pv2 = tracegen.make_public_values(res, 0, WS, traces=traces)
        pv2 = pv2 + [0] * (machine.max_num_pvs - len(pv2))
        from sp1_tpu.iop.challenger import DuplexChallenger

        proof = prover.prove_shard(pk, traces, pv2, DuplexChallenger())
        verifier = mm.ShardVerifier(machine, CONFIG)
        assert verifier.verify_shard(pk.vk, proof, DuplexChallenger())


class TestSignedDiv:
    @pytest.mark.parametrize("n", [1, 13, 999])
    def test_executor(self, n):
        prog = asm.assemble(asm.SDIV_OPS)
        res = native.execute(prog, inputs=[n])
        assert res.exit_code == asm.sdiv_ops_expected(n)

    def test_constraints_and_prove(self):
        prog = asm.assemble(asm.SDIV_OPS)
        res = native.execute(prog, inputs=[13])
        machine = build_machine(WS)
        traces, prep = tracegen.generate_traces(res, prog, 0, WS, MLRC)
        pv = tracegen.make_public_values(res, 0, WS, traces=traces) + [0] * 171
        violations = mm.debug_constraints(
            machine,
            machine.chips,
            {n: t for n, (t, _) in prep.items()},
            {n: t for n, (t, _) in traces.items()},
            {n: h for n, (_, h) in traces.items()},
            pv,
        )
        assert violations == [], violations[:10]
        imbal = check_balance(
            machine.chips,
            {n: t for n, (t, _) in prep.items()},
            {n: t for n, (t, _) in traces.items()},
            {n: h for n, (_, h) in traces.items()},
        )
        from sp1_tpu.air.builder import KIND_GLOBAL_ACC, KIND_STATE

        real = {k: v for k, v in imbal.items() if k[0] not in (KIND_STATE, KIND_GLOBAL_ACC)}
        assert real == {}, dict(list(real.items())[:5])
        prover = mm.ShardProver(machine, CONFIG)
        pk = prover.setup(preprocessed_traces=prep)
        pv2 = tracegen.make_public_values(res, 0, WS, traces=traces)
        pv2 = pv2 + [0] * (machine.max_num_pvs - len(pv2))
        from sp1_tpu.iop.challenger import DuplexChallenger

        proof = prover.prove_shard(pk, traces, pv2, DuplexChallenger())
        verifier = mm.ShardVerifier(machine, CONFIG)
        assert verifier.verify_shard(pk.vk, proof, DuplexChallenger())


class TestWordDiv:
    @pytest.mark.parametrize("n", [1, 13, 500])
    def test_executor(self, n):
        prog = asm.assemble(asm.WDIV_OPS)
        res = native.execute(prog, inputs=[n])
        assert res.exit_code == asm.wdiv_ops_expected(n)

    def test_constraints_and_prove(self):
        prog = asm.assemble(asm.WDIV_OPS)
        res = native.execute(prog, inputs=[13])
        machine = build_machine(WS)
        traces, prep = tracegen.generate_traces(res, prog, 0, WS, MLRC)
        pv = tracegen.make_public_values(res, 0, WS, traces=traces) + [0] * 171
        violations = mm.debug_constraints(
            machine,
            machine.chips,
            {n: t for n, (t, _) in prep.items()},
            {n: t for n, (t, _) in traces.items()},
            {n: h for n, (_, h) in traces.items()},
            pv,
        )
        assert violations == [], violations[:10]
        imbal = check_balance(
            machine.chips,
            {n: t for n, (t, _) in prep.items()},
            {n: t for n, (t, _) in traces.items()},
            {n: h for n, (_, h) in traces.items()},
        )
        from sp1_tpu.air.builder import KIND_GLOBAL_ACC, KIND_STATE

        real = {k: v for k, v in imbal.items() if k[0] not in (KIND_STATE, KIND_GLOBAL_ACC)}
        assert real == {}, dict(list(real.items())[:5])
        prover = mm.ShardProver(machine, CONFIG)
        pk = prover.setup(preprocessed_traces=prep)
        pv2 = tracegen.make_public_values(res, 0, WS, traces=traces)
        pv2 = pv2 + [0] * (machine.max_num_pvs - len(pv2))
        from sp1_tpu.iop.challenger import DuplexChallenger

        proof = prover.prove_shard(pk, traces, pv2, DuplexChallenger())
        verifier = mm.ShardVerifier(machine, CONFIG)
        assert verifier.verify_shard(pk.vk, proof, DuplexChallenger())


class TestMulHigh:
    @pytest.mark.parametrize("n", [0, 13, (1 << 40) + 7])
    def test_executor(self, n):
        prog = asm.assemble(asm.MULH_OPS)
        res = native.execute(prog, inputs=[n])
        assert res.exit_code == asm.mulh_ops_expected(n)

    def test_constraints_and_prove(self):
        prog = asm.assemble(asm.MULH_OPS)
        res = native.execute(prog, inputs=[13])
        machine = build_machine(WS)
        traces, prep = tracegen.generate_traces(res, prog, 0, WS, MLRC)
        pv = tracegen.make_public_values(res, 0, WS, traces=traces) + [0] * 171
        violations = mm.debug_constraints(
            machine,
            machine.chips,
            {n: t for n, (t, _) in prep.items()},
            {n: t for n, (t, _) in traces.items()},
            {n: h for n, (_, h) in traces.items()},
            pv,
        )
        assert violations == [], violations[:10]
        imbal = check_balance(
            machine.chips,
            {n: t for n, (t, _) in prep.items()},
            {n: t for n, (t, _) in traces.items()},
            {n: h for n, (_, h) in traces.items()},
        )
        from sp1_tpu.air.builder import KIND_GLOBAL_ACC, KIND_STATE

        real = {k: v for k, v in imbal.items() if k[0] not in (KIND_STATE, KIND_GLOBAL_ACC)}
        assert real == {}, dict(list(real.items())[:5])
        prover = mm.ShardProver(machine, CONFIG)
        pk = prover.setup(preprocessed_traces=prep)
        pv2 = tracegen.make_public_values(res, 0, WS, traces=traces)
        pv2 = pv2 + [0] * (machine.max_num_pvs - len(pv2))
        from sp1_tpu.iop.challenger import DuplexChallenger

        proof = prover.prove_shard(pk, traces, pv2, DuplexChallenger())
        verifier = mm.ShardVerifier(machine, CONFIG)
        assert verifier.verify_shard(pk.vk, proof, DuplexChallenger())

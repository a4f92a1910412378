"""Chunked event streaming + ExecutionReport (reference:
crates/core/jit/src/shm.rs trace ring, crates/core/executor/src/report.rs).
"""

import pytest

import numpy as np

from sp1_tpu.executor import asm, native

pytestmark = pytest.mark.medium


class TestStreamingVM:
    def test_chunks_match_full_execution(self):
        prog = asm.assemble(asm.FIBONACCI)
        res = native.execute(prog, inputs=[123])
        vm = native.StreamingVM(prog, inputs=[123])
        chunks = list(vm.run_chunks(100))
        assert all(len(c) <= 100 for c in chunks)
        streamed = np.concatenate(chunks)
        assert (streamed == res.events).all()
        assert vm.exit_code == res.exit_code
        assert vm.cycles == res.cycles
        assert vm.report == res.report
        a_stream, v_stream, t_stream = vm.touched_memory
        a_full, v_full, t_full = res.touched_memory
        order_s, order_f = np.argsort(a_stream), np.argsort(a_full)
        assert (a_stream[order_s] == a_full[order_f]).all()
        assert (v_stream[order_s] == v_full[order_f]).all()
        assert (t_stream[order_s] == t_full[order_f]).all()

    def test_report_opcode_counts(self):
        prog = asm.assemble(asm.FIBONACCI)
        res = native.execute(prog, inputs=[50])
        counts = res.report["opcode_counts"]
        # fib loop: one add + one branch + one jal per iteration
        assert counts["alu"] == 50
        assert counts["branch"] >= 50
        assert counts["ecall"] == 2  # read + halt
        assert res.report["syscall_counts"][0] == 1  # halt
        assert sum(counts.values()) == res.cycles


class TestSdkReport:
    def test_execute_report(self):
        from sp1_tpu.sdk.client import ProverClient

        client = ProverClient.builder().cpu().build()
        prog = asm.assemble(asm.FIBONACCI)
        report = client.execute(prog, stdin=[10])
        assert report.cycles > 0
        assert sum(report.opcode_counts.values()) == report.cycles
        assert report.syscall_counts.get(0) == 1

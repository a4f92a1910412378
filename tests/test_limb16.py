"""The production word model: 16-bit limbs (SP1's layout — reference
crates/core/machine word size; our WordSpec defaults to limb_bits=16).

Full proving at 16-bit limbs needs 2^16-row range/byte tables
(max_log_row_count >= 16), which is bench-scale; these tests instead run
the complete constraint debugger + lookup-balance oracle over real
executions for every instruction family, which exercises every AIR
constraint and interaction at the production word model in seconds. The
end-to-end prove+verify at this shape runs in bench.py (device child).
"""

import pytest

from sp1_tpu.executor import asm, native
from sp1_tpu.prover import machine as mm
from sp1_tpu.prover.lookup_debug import check_balance
from sp1_tpu.riscv import tracegen
from sp1_tpu.riscv.machine import WordSpec, build_machine
from sp1_tpu.air.builder import KIND_GLOBAL_ACC, KIND_STATE

pytestmark = pytest.mark.medium

WS = WordSpec(limb_bits=16)
MLRC = 16

PROGRAMS = [
    pytest.param(asm.FIBONACCI, [10], lambda n: 55, id="fib"),
    pytest.param(asm.CMP_OPS, [2**64 - 3, 7],
                 lambda n: asm.cmp_ops_expected(2**64 - 3, 7), id="cmp"),
    pytest.param(asm.MEMBYTE_OPS, [0xABCD],
                 lambda n: asm.membyte_ops_expected(0xABCD), id="membyte"),
    pytest.param(asm.CALL_OPS, [77], lambda n: asm.call_ops_expected(77), id="call"),
    pytest.param(asm.MIXED_OPS, [0xABCDEF],
                 lambda n: asm.mixed_ops_expected(0xABCDEF), id="mixed"),
    pytest.param(asm.WORD_OPS, [0xFFFF],
                 lambda n: asm.word_ops_expected(0xFFFF), id="word"),
    pytest.param(asm.SHIFT_OPS, [0x1234],
                 lambda n: asm.shift_ops_expected(0x1234), id="shift"),
    pytest.param(asm.DIV_OPS, [0xDEAD],
                 lambda n: asm.div_ops_expected(0xDEAD), id="div"),
]


@pytest.fixture(scope="module")
def machine16():
    return build_machine(WS)


class TestLimb16Constraints:
    @pytest.mark.parametrize("src,inputs,expected", PROGRAMS)
    def test_constraints_and_balance(self, machine16, src, inputs, expected):
        prog = asm.assemble(src)
        res = native.execute(prog, inputs=inputs)
        assert res.exit_code == expected(inputs[0])
        machine = machine16
        traces, prep = tracegen.generate_traces(res, prog, 0, WS, MLRC)
        pv = tracegen.make_public_values(res, 0, WS, traces=traces)
        pv = pv + [0] * (machine.max_num_pvs - len(pv))
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
        real = {k: v for k, v in imbal.items() if k[0] not in (KIND_STATE, KIND_GLOBAL_ACC)}
        assert real == {}, dict(list(real.items())[:5])

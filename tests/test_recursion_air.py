"""RecursionAir end-to-end: prove + verify a small recursion program.

Exercises every chip (BaseAlu, ExtAlu, Const, Witness, Poseidon2,
Select, Bits, Convert, CommitPV) with a hand-built program, then checks
tamper rejection. The full normalize program (shard verifier compiled
and proven) runs in scripts/rec_normalize.py — too slow for the default
suite. Reference: crates/recursion/machine/src/machine.rs test harness.
"""

import numpy as np
import pytest

from sp1_tpu.iop.challenger import DuplexChallenger
from sp1_tpu.pcs.basefold import FriConfig
from sp1_tpu.prover import machine as mm
from sp1_tpu.prover.lookup_debug import check_balance
from sp1_tpu.recursion import executor as rexec
from sp1_tpu.recursion import tracegen as rtrace
from sp1_tpu.recursion.builder import SymbolicBackend
from sp1_tpu.recursion.machine import KIND_REC_PV, build_recursion_machine
from sp1_tpu.recursion.prove import RecursionProver
from sp1_tpu.verifier import check_shard
from sp1_tpu.verifier.backend import P, poseidon2_permute_ints

pytestmark = pytest.mark.medium


def build_program():
    """A program touching every instruction class, with 4 public values."""
    sym = SymbolicBackend(num_pvs=4)
    a = sym.witness_felt()
    b = sym.witness_felt()
    inv_a = sym.witness_felt()  # claimed inverse: binds a to the stream
    e1 = sym.witness_ext()
    e2 = sym.witness_ext()
    sym.assert_f_eq(sym.fmul(a, inv_a), sym.felt(1))

    c = sym.fmul(sym.fadd(a, b), a)
    d = sym.finv(c)
    sym.assert_f_eq(sym.fmul(c, d), sym.felt(1))

    e3 = sym.emul(e1, e2)
    e4 = sym.einv(e3)
    sym.assert_e_eq(sym.emul(e3, e4), sym.one_ext())
    e5 = sym.esub(sym.eadd(e3, e1), e1)
    sym.assert_e_eq(e5, e3)

    state = [c] + [sym.felt(i) for i in range(1, 16)]
    out = sym.poseidon2(state)

    bits = sym.num2bits(c, 31)
    recomp = sym.bits2num(bits)
    sym.assert_f_eq(recomp, c)

    s = sym.select_f(bits[0], a, b)
    packed = sym.ext_from_felts([a, b, c, sym.felt(7)])
    coeffs = sym.ext_coeffs(packed)
    sym.assert_f_eq(coeffs[2], c)

    sym.commit_public_values([out[0], c, s, coeffs[3]])
    return sym.finalize()


def make_stream(a=3, b=5, e1=(1, 2, 3, 4), e2=(5, 6, 7, 8), inv_a=None):
    if inv_a is None:
        inv_a = pow(a, P - 2, P)
    return [(a, 0, 0, 0), (b, 0, 0, 0), (inv_a, 0, 0, 0), tuple(e1), tuple(e2)]


FRI = FriConfig(log_blowup=1, num_queries=5, proof_of_work_bits=2)


@pytest.fixture(scope="module")
def proved():
    program = build_program()
    rp = RecursionProver(program, fri=FRI)
    proof = rp.prove(make_stream())
    return program, rp, proof


class TestRecursionAir:
    def test_debug_clean(self):
        program = build_program()
        record = rexec.execute(program, make_stream())
        mlrc = rtrace.min_mlrc(program)
        machine = build_recursion_machine(program.num_pvs)
        prep = rtrace.preprocessed_traces(program, mlrc)
        main = rtrace.main_traces(program, record, mlrc)
        heights = {n: h for n, (_, h) in main.items()}
        viol = mm.debug_constraints(
            machine,
            machine.chips,
            {n: t for n, (t, _) in prep.items()},
            {n: t for n, (t, _) in main.items()},
            heights,
            [int(v) for v in record.public_values] + [0] * 180,
        )
        assert viol == []
        imbal = check_balance(
            machine.chips,
            {n: t for n, (t, _) in prep.items()},
            {n: t for n, (t, _) in main.items()},
            heights,
        )
        # only the REC_PV receives remain — absorbed by the pv digest
        for (kind, values), net in imbal.items():
            assert kind == KIND_REC_PV
            idx, val = values
            assert int(record.public_values[idx]) == val
            assert net == P - 1  # one receive

    def test_prove_verify(self, proved):
        program, rp, proof = proved
        assert rp.verify(proof)

    def test_independent_verifier_accepts(self, proved):
        program, rp, proof = proved
        assert check_shard(rp.machine, rp.config, rp.vk, proof, verbose=True)

    def test_public_values_bound(self, proved):
        program, rp, proof = proved
        a, b = 3, 5
        c = ((a + b) * a) % P
        state = [c] + list(range(1, 16))
        out0 = poseidon2_permute_ints(state)[0]
        pv = proof.public_values
        assert int(pv[0]) == out0
        assert int(pv[1]) == c
        # bits[0] of c selects a or b
        s = a if (c & 1) else b
        assert int(pv[2]) == s
        assert int(pv[3]) == 7

    def test_tampered_public_value_rejected(self, proved):
        import copy

        program, rp, proof = proved
        bad = copy.deepcopy(proof)
        bad.public_values[1] = (int(bad.public_values[1]) + 1) % P
        assert not rp.verify(bad)

    def test_tampered_witness_rejected(self):
        program = build_program()
        # a changed without updating the claimed inverse -> VM rejects
        with pytest.raises(rexec.RecursionExecutionError):
            rexec.execute(program, make_stream(a=4, inv_a=pow(3, P - 2, P)))


class TestRecursionVmSemantics:
    def test_div_by_zero_rejected(self):
        sym = SymbolicBackend(num_pvs=1)
        a = sym.witness_felt()
        inv = sym.finv(a)
        sym.commit_public_value(inv)
        program = sym.finalize()
        with pytest.raises(rexec.RecursionExecutionError):
            rexec.execute(program, [(0, 0, 0, 0)])

    def test_select_nonboolean_rejected(self):
        sym = SymbolicBackend(num_pvs=1)
        b = sym.witness_felt()
        a = sym.select_f(b, sym.felt(1), sym.felt(2))
        sym.commit_public_value(a)
        program = sym.finalize()
        with pytest.raises(rexec.RecursionExecutionError):
            rexec.execute(program, [(2, 0, 0, 0)])

"""Independent-verifier acceptance tests.

The `sp1_tpu.verifier` package is a standalone reimplementation of the
complete verification pipeline (its own challenger, GKR/zerocheck/
sumcheck/jagged/stacked/BaseFold/Merkle verifiers over a scalar
backend), sharing only the machine (AIR) definitions with the prover —
the role of the reference's independent `crates/verifier` crate. These
tests check (a) every proof produced by the prover is accepted by the
independent verifier, and (b) a corruption anywhere in the proof is
rejected.
"""

import copy

import numpy as np
import pytest

from sp1_tpu.executor import asm, native
from sp1_tpu.iop.challenger import DuplexChallenger
from sp1_tpu.pcs.basefold import FriConfig
from sp1_tpu.pcs.jagged import JaggedConfig
from sp1_tpu.prover import machine as mm
from sp1_tpu.prover import multi
from sp1_tpu.riscv import tracegen
from sp1_tpu.riscv.machine import WordSpec, build_machine
from sp1_tpu.verifier import check_program, check_shard

pytestmark = pytest.mark.medium

WS = WordSpec(limb_bits=8)
MLRC = 8
CONFIG = JaggedConfig(
    FriConfig(log_blowup=1, num_queries=6, proof_of_work_bits=2),
    log_stacking_height=11,
    max_log_row_count=MLRC,
)


@pytest.fixture(scope="module")
def fib_proof():
    prog = asm.assemble(asm.FIBONACCI)
    res = native.execute(prog, inputs=[10])
    machine = build_machine(WS)
    traces, prep = tracegen.generate_traces(res, prog, 0, WS, MLRC)
    prover = mm.ShardProver(machine, CONFIG)
    pk = prover.setup(preprocessed_traces=prep)
    pv = tracegen.make_public_values(res, 0, WS, traces=traces)
    pv = pv + [0] * (machine.max_num_pvs - len(pv))
    pch = DuplexChallenger()
    pk.vk.observe_into(pch)
    proof = prover.prove_shard(pk, traces, pv, pch)
    return machine, pk.vk, proof


class TestIndependentVerifier:
    def test_accepts_real_proof(self, fib_proof):
        machine, vk, proof = fib_proof
        assert check_shard(machine, CONFIG, vk, proof, verbose=True)

    def test_rejects_wrong_public_value(self, fib_proof):
        machine, vk, proof = fib_proof
        bad = copy.deepcopy(proof)
        bad.public_values[tracegen.PV_EXIT_CODE] = 54  # fib(10) != 54
        assert not check_shard(machine, CONFIG, vk, bad)

    def test_rejects_tampered_commitment(self, fib_proof):
        machine, vk, proof = fib_proof
        bad = copy.deepcopy(proof)
        c = np.array(bad.main_commitment, dtype=np.uint32).copy()
        c[0] ^= 1
        bad.main_commitment = c
        assert not check_shard(machine, CONFIG, vk, bad)

    def test_rejects_tampered_gkr(self, fib_proof):
        machine, vk, proof = fib_proof
        bad = copy.deepcopy(proof)
        r = bad.logup_gkr_proof.round_proofs[0]
        r.numerator_0 = (np.asarray(r.numerator_0) + 1) % 2013265921
        assert not check_shard(machine, CONFIG, vk, bad)

    def test_rejects_tampered_zerocheck(self, fib_proof):
        machine, vk, proof = fib_proof
        bad = copy.deepcopy(proof)
        polys = np.asarray(bad.zerocheck_proof.univariate_polys).copy()
        polys[0, 0, 0] = (polys[0, 0, 0] + 1) % 2013265921
        bad.zerocheck_proof.univariate_polys = polys
        assert not check_shard(machine, CONFIG, vk, bad)

    def test_rejects_tampered_opened_values(self, fib_proof):
        machine, vk, proof = fib_proof
        bad = copy.deepcopy(proof)
        name = next(iter(bad.opened_values))
        ov = bad.opened_values[name]
        m = np.asarray(ov.main).copy()
        m[0, 0] = (m[0, 0] + 1) % 2013265921
        ov.main = m
        assert not check_shard(machine, CONFIG, vk, bad)

    def test_rejects_tampered_pcs_opening(self, fib_proof):
        machine, vk, proof = fib_proof
        bad = copy.deepcopy(proof)
        ep = bad.evaluation_proof
        rc = [list(rnd) for rnd in ep.row_counts_and_column_counts]
        r0, c0 = rc[0][0]
        rc[0][0] = (max(1, r0 // 2), c0)
        ep.row_counts_and_column_counts = rc
        assert not check_shard(machine, CONFIG, vk, bad)


class TestIndependentProgramVerifier:
    def test_accepts_multishard(self):
        prog = asm.assemble(asm.FIBONACCI)
        res = native.execute(prog, inputs=[60])
        machine = build_machine(WS)
        prover = mm.ShardProver(machine, CONFIG)
        prep = tracegen.make_preprocessed(prog, 0, WS, MLRC)
        pk = prover.setup(preprocessed_traces=prep)
        proofs = multi.prove_program(
            prover, pk, res, prog, 0, WS, MLRC, max_rows=200
        )
        assert len(proofs) >= 2
        assert check_program(machine, CONFIG, pk.vk, proofs)
        # dropping a shard breaks the chain
        assert not check_program(machine, CONFIG, pk.vk, proofs[:-1])
        # reordering breaks the chain
        assert not check_program(machine, CONFIG, pk.vk, proofs[::-1])

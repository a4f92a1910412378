"""SHA-256 extend precompile: executor semantics, trace constraints,
prove+verify, and multi-shard splicing (reference behavior:
crates/core/machine/src/syscall/precompiles/sha256/extend/)."""

import numpy as np
import pytest

from sp1_tpu.executor import asm, native
from sp1_tpu.iop.challenger import DuplexChallenger
from sp1_tpu.pcs.basefold import FriConfig
from sp1_tpu.pcs.jagged import JaggedConfig
from sp1_tpu.prover import machine as mm
from sp1_tpu.riscv import tracegen
from sp1_tpu.riscv.machine import WordSpec, build_machine

WS = WordSpec(limb_bits=8)
MLRC = 9
CONFIG = JaggedConfig(
    FriConfig(log_blowup=1, num_queries=6, proof_of_work_bits=2),
    log_stacking_height=12,
    max_log_row_count=MLRC,
)

# Guest: read 16 u32 words into w[0..16] at base 1024, run the sha-extend
# precompile, halt with sum(w[16..64]) mod 2^64.
SHA_GUEST = """
    li s0, 1024
    li t0, 16
    mv s1, s0
fill:
    li a7, 3
    ecall            # a0 = next initial w word
    sd a0, 0(s1)
    addi s1, s1, 8
    addi t0, t0, -1
    bne t0, zero, fill
    li a7, 8
    mv a0, s0
    ecall            # SHA_EXTEND(w @ s0)
    li t0, 48
    addi s1, s0, 128
    li t1, 0
acc:
    ld t2, 0(s1)
    add t1, t1, t2
    addi s1, s1, 8
    addi t0, t0, -1
    bne t0, zero, acc
    mv a0, t1
    li a7, 0
    ecall            # halt with the checksum
"""


def ref_extend(w16: list) -> list:
    """Pure-python SHA-256 message schedule."""
    M = 0xFFFFFFFF

    def rotr(x, r):
        return ((x >> r) | (x << (32 - r))) & M

    w = list(w16)
    for i in range(16, 64):
        s0 = rotr(w[i - 15], 7) ^ rotr(w[i - 15], 18) ^ (w[i - 15] >> 3)
        s1 = rotr(w[i - 2], 17) ^ rotr(w[i - 2], 19) ^ (w[i - 2] >> 10)
        w.append((w[i - 16] + s0 + w[i - 7] + s1) & M)
    return w


@pytest.fixture(scope="module")
def sha_execution():
    rng = np.random.default_rng(11)
    w16 = [int(v) for v in rng.integers(0, 1 << 32, size=16, dtype=np.uint64)]
    prog = asm.assemble(SHA_GUEST)
    res = native.execute(prog, inputs=w16)
    expected = sum(ref_extend(w16)[16:]) % (1 << 64)
    assert res.exit_code == expected
    return prog, res


class TestShaExecutor:
    def test_px_events(self, sha_execution):
        _, res = sha_execution
        px = res.px_events
        assert len(px) == 48
        assert (px["kind"] == 8).all()
        assert (px["step"] == np.arange(48)).all()
        # rounds run in the ecall's clk window, one clk per round
        assert (np.diff(px["clk"]) == 1).all()
        sched = np.array([int(v) for v in px["w_val"]], np.uint64)
        assert (sched < (1 << 32)).all()

    def test_report_counts_syscall(self, sha_execution):
        _, res = sha_execution
        assert res.report["syscall_counts"][8] == 1


class TestShaConstraints:
    def test_traces_satisfy_constraints(self, sha_execution):
        prog, res = sha_execution
        traces, prep = tracegen.generate_traces(res, prog, 0, WS, MLRC)
        assert "ShaExtend" in traces
        assert traces["ShaExtend"][1] == 48
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

    def test_lookups_balance(self, sha_execution):
        from sp1_tpu.air.builder import KIND_GLOBAL_ACC, KIND_STATE
        from sp1_tpu.prover.lookup_debug import check_balance

        prog, res = sha_execution
        traces, prep = tracegen.generate_traces(res, prog, 0, WS, MLRC)
        machine = build_machine(WS)
        imbal = check_balance(
            machine.chips,
            {n: t for n, (t, _) in prep.items()},
            {n: t for n, (t, _) in traces.items()},
            {n: h for n, (_, h) in traces.items()},
        )
        # the state-chain boundary legitimately lands in the public values
        real = {
            k: v for k, v in imbal.items() if k[0] not in (KIND_STATE, KIND_GLOBAL_ACC)
        }
        assert real == {}, dict(list(real.items())[:5])


class TestShaProve:
    def test_prove_verify(self, sha_execution):
        prog, res = sha_execution
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

    def test_tampered_schedule_rejected(self, sha_execution):
        """Corrupt one extended w value in the ShaExtend trace: the
        constraint polynomial (or the memory multiset) must break."""
        prog, res = sha_execution
        tampered = res.px_events.copy()
        tampered["w_val"][20] ^= 4
        traces, prep = tracegen.generate_traces(
            res, prog, 0, WS, MLRC, px_events=tampered
        )
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
        from sp1_tpu.air.builder import KIND_GLOBAL_ACC, KIND_STATE
        from sp1_tpu.prover.lookup_debug import check_balance

        imbal = check_balance(
            machine.chips,
            {n: t for n, (t, _) in prep.items()},
            {n: t for n, (t, _) in traces.items()},
            {n: h for n, (_, h) in traces.items()},
        )
        real = {
            k: v for k, v in imbal.items() if k[0] not in (KIND_STATE, KIND_GLOBAL_ACC)
        }
        assert violations or real


class TestShaMultiShard:
    def test_split_prove_verify(self, sha_execution):
        from sp1_tpu.prover import multi

        prog, res = sha_execution
        machine = build_machine(WS)
        prover = mm.ShardProver(machine, CONFIG)
        _, prep = tracegen.generate_traces(res, prog, 0, WS, MLRC)
        pk = prover.setup(preprocessed_traces=prep)
        proofs = multi.prove_program(
            prover, pk, res, prog, 0, WS, MLRC, max_rows=40
        )
        assert len(proofs) >= 2
        verifier = mm.ShardVerifier(machine, CONFIG)
        assert multi.verify_program(verifier, pk.vk, proofs)

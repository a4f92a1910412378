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

pytestmark = pytest.mark.medium

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


# ---------------------------------------------------------------------------
# SHA-256 compress
# ---------------------------------------------------------------------------

# Guest: read 16 w words to cells 0..15 and 8 h words to cells 64..71 of a
# buffer at 1024, run extend then compress (full SHA-256 block), halt with
# sum of the updated h words.
SHA_COMPRESS_GUEST = """
    li s0, 1024
    li t0, 16
    mv s1, s0
fillw:
    li a7, 3
    ecall
    sd a0, 0(s1)
    addi s1, s1, 8
    addi t0, t0, -1
    bne t0, zero, fillw
    li t0, 8
    addi s1, s0, 512
fillh:
    li a7, 3
    ecall
    sd a0, 0(s1)
    addi s1, s1, 8
    addi t0, t0, -1
    bne t0, zero, fillh
    li a7, 8
    mv a0, s0
    ecall            # SHA_EXTEND
    li a7, 9
    mv a0, s0
    ecall            # SHA_COMPRESS
    li t0, 8
    addi s1, s0, 512
    li t1, 0
acch:
    ld t2, 0(s1)
    add t1, t1, t2
    addi s1, s1, 8
    addi t0, t0, -1
    bne t0, zero, acch
    mv a0, t1
    li a7, 0
    ecall
"""

SHA_K = (
    0x428A2F98, 0x71374491, 0xB5C0FBCF, 0xE9B5DBA5, 0x3956C25B, 0x59F111F1,
    0x923F82A4, 0xAB1C5ED5, 0xD807AA98, 0x12835B01, 0x243185BE, 0x550C7DC3,
    0x72BE5D74, 0x80DEB1FE, 0x9BDC06A7, 0xC19BF174, 0xE49B69C1, 0xEFBE4786,
    0x0FC19DC6, 0x240CA1CC, 0x2DE92C6F, 0x4A7484AA, 0x5CB0A9DC, 0x76F988DA,
    0x983E5152, 0xA831C66D, 0xB00327C8, 0xBF597FC7, 0xC6E00BF3, 0xD5A79147,
    0x06CA6351, 0x14292967, 0x27B70A85, 0x2E1B2138, 0x4D2C6DFC, 0x53380D13,
    0x650A7354, 0x766A0ABB, 0x81C2C92E, 0x92722C85, 0xA2BFE8A1, 0xA81A664B,
    0xC24B8B70, 0xC76C51A3, 0xD192E819, 0xD6990624, 0xF40E3585, 0x106AA070,
    0x19A4C116, 0x1E376C08, 0x2748774C, 0x34B0BCB5, 0x391C0CB3, 0x4ED8AA4A,
    0x5B9CCA4F, 0x682E6FF3, 0x748F82EE, 0x78A5636F, 0x84C87814, 0x8CC70208,
    0x90BEFFFA, 0xA4506CEB, 0xBEF9A3F7, 0xC67178F2,
)


def ref_compress(w64: list, h8: list) -> list:
    """Pure-python SHA-256 compression (one block)."""
    M = 0xFFFFFFFF

    def rotr(x, r):
        return ((x >> r) | (x << (32 - r))) & M

    a, b, c, d, e, f, g, h = h8
    for i in range(64):
        S1 = rotr(e, 6) ^ rotr(e, 11) ^ rotr(e, 25)
        ch = (e & f) ^ (~e & g) & M
        t1 = (h + S1 + ch + SHA_K[i] + w64[i]) & M
        S0 = rotr(a, 2) ^ rotr(a, 13) ^ rotr(a, 22)
        maj = (a & b) ^ (a & c) ^ (b & c)
        t2 = (S0 + maj) & M
        h, g, f, e, d, c, b, a = g, f, e, (d + t1) & M, c, b, a, (t1 + t2) & M
    return [(x + y) & M for x, y in zip(h8, [a, b, c, d, e, f, g, h])]


@pytest.fixture(scope="module")
def sha_compress_execution():
    rng = np.random.default_rng(23)
    w16 = [int(v) for v in rng.integers(0, 1 << 32, size=16, dtype=np.uint64)]
    h8 = [int(v) for v in rng.integers(0, 1 << 32, size=8, dtype=np.uint64)]
    prog = asm.assemble(SHA_COMPRESS_GUEST)
    res = native.execute(prog, inputs=w16 + h8)
    w64 = ref_extend(w16)
    expected = sum(ref_compress(w64, h8)) % (1 << 64)
    assert res.exit_code == expected, (hex(res.exit_code), hex(expected))
    return prog, res


class TestShaCompressExecutor:
    def test_px_events(self, sha_compress_execution):
        _, res = sha_compress_execution
        px = res.px_events
        cpx = px[px["kind"] == 9]
        assert len(cpx) == 80
        assert (cpx["step"] == np.arange(80)).all()
        assert (np.diff(cpx["clk"]) == 1).all()
        # finalize rows write h cells (64..72 of the buffer)
        fin = cpx[cpx["step"] >= 72]
        assert (fin["w_addr"] == 1024 + 8 * (64 + np.arange(8))).all()

    def test_report(self, sha_compress_execution):
        _, res = sha_compress_execution
        assert res.report["syscall_counts"][9] == 1


class TestShaCompressConstraints:
    def test_traces_satisfy_constraints(self, sha_compress_execution):
        prog, res = sha_compress_execution
        traces, prep = tracegen.generate_traces(res, prog, 0, WS, MLRC)
        assert traces["ShaCompress"][1] == 80
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

    def test_lookups_balance(self, sha_compress_execution):
        from sp1_tpu.air.builder import KIND_GLOBAL_ACC, KIND_STATE
        from sp1_tpu.prover.lookup_debug import check_balance

        prog, res = sha_compress_execution
        traces, prep = tracegen.generate_traces(res, prog, 0, WS, MLRC)
        machine = build_machine(WS)
        imbal = check_balance(
            machine.chips,
            {n: t for n, (t, _) in prep.items()},
            {n: t for n, (t, _) in traces.items()},
            {n: h for n, (_, h) in traces.items()},
        )
        real = {
            k: v for k, v in imbal.items() if k[0] not in (KIND_STATE, KIND_GLOBAL_ACC)
        }
        assert real == {}, dict(list(real.items())[:5])


class TestShaCompressProve:
    def test_prove_verify(self, sha_compress_execution):
        prog, res = sha_compress_execution
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

    def test_tampered_state_rejected(self, sha_compress_execution):
        """Corrupt the final h write: constraints or multisets must break."""
        prog, res = sha_compress_execution
        tampered = res.px_events.copy()
        fin_idx = np.nonzero((tampered["kind"] == 9) & (tampered["step"] == 75))[0][0]
        tampered["w_val"][fin_idx] ^= 1
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


class TestShaCompressMultiShard:
    def test_split_prove_verify(self, sha_compress_execution):
        from sp1_tpu.prover import multi

        prog, res = sha_compress_execution
        machine = build_machine(WS)
        prover = mm.ShardProver(machine, CONFIG)
        _, prep = tracegen.generate_traces(res, prog, 0, WS, MLRC)
        pk = prover.setup(preprocessed_traces=prep)
        proofs = multi.prove_program(
            prover, pk, res, prog, 0, WS, MLRC, max_rows=60
        )
        assert len(proofs) >= 2
        verifier = mm.ShardVerifier(machine, CONFIG)
        assert multi.verify_program(verifier, pk.vk, proofs)

"""Keccak-f[1600] permutation precompile: executor semantics, trace
constraints, and prove+verify (reference behavior:
crates/core/machine/src/syscall/precompiles/keccak256/)."""

import numpy as np
import pytest

from sp1_tpu.executor import asm, native
from sp1_tpu.iop.challenger import DuplexChallenger
from sp1_tpu.pcs.basefold import FriConfig
from sp1_tpu.pcs.jagged import JaggedConfig
from sp1_tpu.prover import machine as mm
from sp1_tpu.prover.lookup_debug import check_balance
from sp1_tpu.riscv import tracegen
from sp1_tpu.riscv.keccak import RC, RHO, PI_DST
from sp1_tpu.riscv.machine import WordSpec, build_machine
from sp1_tpu.air.builder import KIND_GLOBAL_ACC, KIND_STATE

pytestmark = pytest.mark.medium

WS = WordSpec(limb_bits=8)
MLRC = 9
CONFIG = JaggedConfig(
    FriConfig(log_blowup=1, num_queries=6, proof_of_work_bits=2),
    log_stacking_height=12,
    max_log_row_count=MLRC,
)

# Guest: read 25 u64 lanes into the state at 1024, run the keccak
# permutation precompile, halt with sum of output lanes mod 2^64.
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
    ecall            # halt with the checksum
"""

M64 = (1 << 64) - 1


def ref_keccak_f(lanes: list) -> list:
    """Pure-python keccak-f[1600] (lane l = x + 5y)."""
    st = list(lanes)
    for r in range(24):
        c = [st[x] ^ st[x + 5] ^ st[x + 10] ^ st[x + 15] ^ st[x + 20]
             for x in range(5)]
        d = [c[(x + 4) % 5] ^ (((c[(x + 1) % 5] << 1) | (c[(x + 1) % 5] >> 63)) & M64)
             for x in range(5)]
        ap = [(st[l] ^ d[l % 5]) & M64 for l in range(25)]
        b = [0] * 25
        for l in range(25):
            rot = RHO[l]
            v = ap[l]
            b[PI_DST[l]] = ((v << rot) | (v >> (64 - rot))) & M64 if rot else v
        st = [
            b[l] ^ ((~b[(l % 5 + 1) % 5 + 5 * (l // 5)]) & b[(l % 5 + 2) % 5 + 5 * (l // 5)]) & M64
            for l in range(25)
        ]
        st = [v & M64 for v in st]
        st[0] ^= RC[r]
    return st


LANES = [(0x0123456789ABCDEF * (i + 1) + 0xDEADBEEF * i) & M64 for i in range(25)]
EXPECTED = sum(ref_keccak_f(LANES)) & M64


@pytest.fixture(scope="module")
def run():
    prog = asm.assemble(KECCAK_GUEST)
    res = native.execute(prog, inputs=LANES)
    return prog, res


def test_executor_keccak(run):
    _, res = run
    assert int(res.exit_code) == EXPECTED
    # 74 precompile steps recorded
    px = res.px_events
    assert len(px[px["kind"] == 10]) == 74


def test_keccak_constraints_and_balance(run):
    prog, res = run
    machine = build_machine(WS)
    traces, prep = tracegen.generate_traces(res, prog, 0, WS, MLRC)
    assert traces["KeccakPerm"][1] == 24
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


def test_keccak_prove_verify(run):
    prog, res = run
    machine = build_machine(WS)
    traces, prep = tracegen.generate_traces(res, prog, 0, WS, MLRC)
    pv = tracegen.make_public_values(res, 0, WS, traces=traces)
    pv = pv + [0] * (machine.max_num_pvs - len(pv))
    prover = mm.ShardProver(machine, CONFIG)
    pk = prover.setup(pc_start=[0, 0, 0], preprocessed_traces=prep)
    ch = DuplexChallenger()
    pk.vk.observe_into(ch)
    proof = prover.prove_shard(pk, traces, pv, ch)
    verifier = mm.ShardVerifier(machine, CONFIG)
    vch = DuplexChallenger()
    pk.vk.observe_into(vch)
    assert verifier.verify_shard(pk.vk, proof, vch)

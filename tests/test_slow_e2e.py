"""Heavy end-to-end flows (the flagship paths), excluded from the default
suite via the `slow` marker — run with `pytest -m slow tests/test_slow_e2e.py`.

Covers the regressions that used to hide in scripts/: a full shrink
prove, a compose prove over toy normalize proofs, the real-RISC-V-machine
normalize prove at production FRI, and a 16-bit-limb production-shape
prove+verify."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(__file__))

from sp1_tpu.executor import asm, native
from sp1_tpu.iop.challenger import DuplexChallenger
from sp1_tpu.pcs.basefold import FriConfig
from sp1_tpu.pcs.jagged import JaggedConfig
from sp1_tpu.prover import machine as mm
from sp1_tpu.riscv import tracegen
from sp1_tpu.riscv.machine import WordSpec, build_machine
from sp1_tpu.verifier import check_shard

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def toy_core():
    import test_machine as tmach

    machine = tmach.build_machine()
    traces, prep = tmach.build_traces()
    prover = mm.ShardProver(machine, tmach.CONFIG)
    pk = prover.setup(preprocessed_traces=prep)
    ch = DuplexChallenger()
    pk.vk.observe_into(ch)
    proof = prover.prove_shard(pk, traces, [], ch)
    return tmach, machine, pk, proof


def test_compose_prove(toy_core):
    """Prove the compose program over two toy normalize proofs."""
    from sp1_tpu.recursion import compile as rcompile
    from sp1_tpu.recursion import compose as rcompose
    from sp1_tpu.recursion.prove import RecursionProver

    tmach, machine, pk, proof = toy_core
    fri = FriConfig(log_blowup=1, num_queries=6, proof_of_work_bits=2)
    nprogram = rcompile.build_shard_verify_program(machine, tmach.CONFIG, proof)
    rp = RecursionProver(nprogram, fri=fri)
    stream = rcompile.shard_witness_stream(pk.vk, proof)
    nproof = rp.prove(stream)
    assert rp.verify(nproof)

    cprogram = rcompose.build_compose_program(
        rp.machine, rp.config, nproof, num_children=2
    )
    cprover = RecursionProver(cprogram, fri=fri)
    cstream = rcompose.compose_witness_stream(rp.vk, [nproof, nproof])
    cproof = cprover.prove(cstream)
    assert cprover.verify(cproof)
    assert check_shard(cprover.machine, cprover.config, cprover.vk, cproof)


def test_shrink_prove(toy_core):
    """Full shrink prove at blowup 2^3 over a toy normalize root."""
    from sp1_tpu.recursion import compile as rcompile
    from sp1_tpu.recursion import shrink as rshrink
    from sp1_tpu.recursion.prove import RecursionProver

    tmach, machine, pk, proof = toy_core
    fri = FriConfig(log_blowup=1, num_queries=6, proof_of_work_bits=2)
    nprogram = rcompile.build_shard_verify_program(machine, tmach.CONFIG, proof)
    rp = RecursionProver(nprogram, fri=fri)
    nproof = rp.prove(rcompile.shard_witness_stream(pk.vk, proof))
    sprogram = rshrink.build_shrink_program(rp.machine, rp.config, nproof)
    sprover = rshrink.shrink_prover(sprogram)
    sproof = sprover.prove(rshrink.shrink_witness_stream(rp.vk, nproof))
    assert sprover.verify(sproof)
    assert check_shard(sprover.machine, sprover.config, sprover.vk, sproof)


def test_real_machine_normalize():
    """Normalize (RecursionAir at FriConfig.core()) over a REAL RISC-V
    fibonacci shard proof — the round-3 flagship flow."""
    from sp1_tpu.recursion import compile as rcompile
    from sp1_tpu.recursion.prove import RecursionProver

    ws = WordSpec(limb_bits=8)
    mlrc = 8
    config = JaggedConfig(
        FriConfig(log_blowup=1, num_queries=6, proof_of_work_bits=2),
        log_stacking_height=11,
        max_log_row_count=mlrc,
    )
    machine = build_machine(ws)
    prog = asm.assemble(asm.FIBONACCI)
    res = native.execute(prog, inputs=[10])
    traces, prep = tracegen.generate_traces(res, prog, 0, ws, mlrc)
    pv = tracegen.make_public_values(res, 0, ws, traces=traces)
    pv = pv + [0] * (machine.max_num_pvs - len(pv))
    prover = mm.ShardProver(machine, config)
    pk = prover.setup(pc_start=[0, 0, 0], preprocessed_traces=prep)
    ch = DuplexChallenger()
    pk.vk.observe_into(ch)
    proof = prover.prove_shard(pk, traces, pv, ch)

    nprogram = rcompile.build_shard_verify_program(machine, config, proof)
    rp = RecursionProver(nprogram, fri=FriConfig.core())
    nproof = rp.prove(rcompile.shard_witness_stream(pk.vk, proof))
    assert rp.verify(nproof)
    assert check_shard(rp.machine, rp.config, rp.vk, nproof)


def test_limb16_production_prove():
    """prove+verify at the production word model (16-bit limbs,
    2^16-row range table)."""
    ws = WordSpec(limb_bits=16)
    mlrc = 16
    config = JaggedConfig(
        FriConfig.core(),
        log_stacking_height=min(21, mlrc + 3),
        max_log_row_count=mlrc,
    )
    machine = build_machine(ws)
    prog = asm.assemble(asm.FIBONACCI)
    n_iters = ((1 << 12) - 9) // 6  # partial shard is fine
    res = native.execute(prog, inputs=[n_iters])
    traces, prep = tracegen.generate_traces(res, prog, 0, ws, mlrc)
    pv = tracegen.make_public_values(res, 0, ws, traces=traces)
    pv = pv + [0] * (machine.max_num_pvs - len(pv))
    prover = mm.ShardProver(machine, config)
    pk = prover.setup(pc_start=[0, 0, 0], preprocessed_traces=prep)
    ch = DuplexChallenger()
    pk.vk.observe_into(ch)
    proof = prover.prove_shard(pk, traces, pv, ch)
    verifier = mm.ShardVerifier(machine, config)
    vch = DuplexChallenger()
    pk.vk.observe_into(vch)
    assert verifier.verify_shard(pk.vk, proof, vch)


def test_curve_precompile_prove():
    """prove+verify a secp256k1-double guest via the SDK with a curve
    machine shape (reference behavior:
    crates/core/machine/src/syscall/precompiles/weierstrass/)."""
    from sp1_tpu.sdk.client import ProverClient
    from test_curves import SECP_G, PSECP, dwords, guest, ws_double

    client = ProverClient.builder().cpu(
        shape=frozenset({"secp256k1_double"})
    ).build()
    prog = asm.assemble(guest(13, 8, 8))
    pk, vk = client.setup(prog)
    g2 = ws_double(SECP_G, PSECP)
    stdin = dwords(SECP_G[0]) + dwords(SECP_G[1])
    proof = client.prove(pk, stdin=stdin)
    assert client.verify(proof, vk)
    # the halting shard's exit code is the checksum of 2G
    checksum = sum(dwords(g2[0]) + dwords(g2[1])) % (1 << 64)
    from sp1_tpu.riscv.machine import PV_EXIT_CODE

    nl = client.ws.num_limbs
    ec = 0
    for i in range(nl):
        ec |= int(proof.public_values[PV_EXIT_CODE + i]) << (
            client.ws.limb_bits * i
        )
    assert ec == checksum
    # a prover without the chip must refuse the execution
    bare = ProverClient.builder().cpu().build()
    pk2, _ = bare.setup(prog)
    with pytest.raises(ValueError):
        bare.prove(pk2, stdin=stdin)

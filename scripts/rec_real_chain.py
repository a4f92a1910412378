"""Full recursion chain over the REAL RISC-V machine:

    core (2 fibonacci shards) -> normalize x2 -> compose -> shrink

Every stage runs at production-grade FRI for its role (normalize and
compose at FriConfig.core(): blowup 2^2, unique-decoding queries, 16-bit
PoW; shrink at FriConfig.shrink(): blowup 2^3) and is checked by the
independent verifier. Reference flow: crates/prover/src/recursion.rs
(normalize/compose) + machine/wrap.rs staging.

Backend: JAX_PLATFORMS env (axon TPU by default in this container;
JAX_PLATFORMS=cpu for a host run). RECURSION proving at mlrc~16 is
bench-scale — expect minutes per stage cold.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

_cpu = os.environ.get("SP1_CHAIN_CPU") == "1"
if _cpu:
    jax.config.update("jax_platforms", "cpu")
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(
        os.path.dirname(__file__), "..", ".jax_cache_cpu" if _cpu else ".jax_cache"
    ),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from sp1_tpu.executor import asm, native
from sp1_tpu.iop.challenger import DuplexChallenger
from sp1_tpu.pcs.basefold import FriConfig
from sp1_tpu.pcs.jagged import JaggedConfig
from sp1_tpu.prover import machine as mm
from sp1_tpu.prover import multi
from sp1_tpu.recursion import compile as rcompile
from sp1_tpu.recursion import compose as rcompose
from sp1_tpu.recursion import shrink as rshrink
from sp1_tpu.recursion.prove import RecursionProver
from sp1_tpu.riscv import tracegen
from sp1_tpu.riscv.machine import WordSpec, build_machine
from sp1_tpu.verifier import check_shard


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    ws = WordSpec(limb_bits=8)
    mlrc = 8
    config = JaggedConfig(
        FriConfig(log_blowup=1, num_queries=6, proof_of_work_bits=2),
        log_stacking_height=11,
        max_log_row_count=mlrc,
    )
    machine = build_machine(ws)

    # ---- core: two fibonacci shards --------------------------------------
    prog = asm.assemble(asm.FIBONACCI)
    n_iters = ((2 << mlrc) - 20) // 6
    res = native.execute(prog, inputs=[n_iters])
    shard_inputs = multi.shard_inputs_of(res, prog, 0, ws, mlrc)
    assert len(shard_inputs) == 2, len(shard_inputs)
    prover = mm.ShardProver(machine, config)
    prep = tracegen.make_preprocessed(prog, 0, ws, mlrc)
    pk = prover.setup(pc_start=[0, 0, 0], preprocessed_traces=prep)
    core_proofs = []
    t0 = time.time()
    for traces, pv in shard_inputs:
        pv = pv + [0] * (machine.max_num_pvs - len(pv))
        ch = DuplexChallenger()
        pk.vk.observe_into(ch)
        core_proofs.append(prover.prove_shard(pk, traces, pv, ch))
    verifier = mm.ShardVerifier(machine, config)
    assert multi.verify_program(verifier, pk.vk, core_proofs)
    log(f"core: 2 shards proved+verified in {time.time()-t0:.1f}s")

    # ---- normalize: RecursionAir proof per core shard ---------------------
    # The first and last shard carry different bookend chips, so their
    # proofs have different SHAPES and each needs its own shape-specialized
    # normalize program (the reference's shape system pads these to a
    # canonical shape; we compose heterogeneously instead).
    nproofs, nprovers = [], []
    for i, cp in enumerate(core_proofs):
        t0 = time.time()
        nprogram = rcompile.build_shard_verify_program(machine, config, cp)
        rp = RecursionProver(nprogram, fri=FriConfig.core())
        log(f"normalize {i} prover ready (mlrc={rp.config.max_log_row_count})")
        stream = rcompile.shard_witness_stream(pk.vk, cp)
        np_i = rp.prove(stream)
        assert rp.verify(np_i), f"normalize {i} rejected"
        assert check_shard(rp.machine, rp.config, rp.vk, np_i), (
            f"independent verifier rejected normalize {i}"
        )
        log(f"normalize {i}: proved+verified in {time.time()-t0:.1f}s")
        nproofs.append(np_i)
        nprovers.append(rp)

    # ---- compose: one proof verifying both normalize proofs ---------------
    t0 = time.time()
    cprogram = rcompose.build_compose_program(
        None, None,
        children=[
            (rp.machine, rp.config, np_i)
            for rp, np_i in zip(nprovers, nproofs)
        ],
    )
    cprover = RecursionProver(cprogram, fri=FriConfig.core())
    cstream = rcompose.compose_witness_stream(
        None, nproofs, vks=[rp.vk for rp in nprovers]
    )
    cproof = cprover.prove(cstream)
    assert cprover.verify(cproof), "compose rejected"
    assert check_shard(cprover.machine, cprover.config, cprover.vk, cproof)
    log(f"compose: proved+verified in {time.time()-t0:.1f}s")

    # ---- shrink: blowup-2^3 re-prove of the compose root ------------------
    t0 = time.time()
    sprogram = rshrink.build_shrink_program(cprover.machine, cprover.config, cproof)
    sprover = rshrink.shrink_prover(sprogram)
    sstream = rshrink.shrink_witness_stream(cprover.vk, cproof)
    sproof = sprover.prove(sstream)
    assert sprover.verify(sproof), "shrink rejected"
    assert check_shard(sprover.machine, sprover.config, sprover.vk, sproof)
    log(f"shrink: proved+verified in {time.time()-t0:.1f}s")

    # ---- wrap: prove the shrink verifier over the BN254 outer context ----
    from sp1_tpu.recursion import gnark as rgnark
    from sp1_tpu.recursion import wrap as rwrap

    t0 = time.time()
    wprogram = rwrap.build_wrap_program(sprover.machine, sprover.config, sproof)
    wprover = rwrap.WrapProver(wprogram)  # FriConfig.wrap()
    wstream = rwrap.wrap_witness_stream(sprover.vk, sproof)
    wproof = wprover.prove(wstream)
    assert wprover.verify(wproof), "wrap rejected"
    log(f"wrap: proved+verified in {time.time()-t0:.1f}s "
        f"(outer commitment = Bn254 0x{int(wproof.main_commitment):x})")
    rgnark.write_gnark_artifacts(
        wprogram, wstream, "/tmp/wrap_constraints.json", "/tmp/wrap_witness.json"
    )
    log("gnark artifacts: /tmp/wrap_constraints.json /tmp/wrap_witness.json")
    log("REAL-MACHINE RECURSION CHAIN OK "
        "(core x2 -> normalize x2 -> compose -> shrink -> wrap)")


if __name__ == "__main__":
    main()

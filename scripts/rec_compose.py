"""Two-level recursion tree smoke: core -> normalize -> compose.

Compiles + executes the compose program over two normalize proofs, then
(optionally, PROVE=1) proves the compose program itself."""

import os
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/sp1_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from sp1_tpu.iop.challenger import DuplexChallenger
from sp1_tpu.pcs.basefold import FriConfig
from sp1_tpu.prover import machine as mm
from sp1_tpu.recursion import compile as rcompile
from sp1_tpu.recursion import compose as rcompose
from sp1_tpu.recursion import executor as rexec
from sp1_tpu.recursion.prove import RecursionProver
from sp1_tpu.verifier import check_shard

import test_machine as tmach


def main():
    machine = tmach.build_machine()
    traces, prep = tmach.build_traces()
    prover = mm.ShardProver(machine, tmach.CONFIG)
    pk = prover.setup(preprocessed_traces=prep)
    pch = DuplexChallenger()
    pk.vk.observe_into(pch)
    proof = prover.prove_shard(pk, traces, [], pch)
    print("core proof ok")

    t0 = time.time()
    nprogram = rcompile.build_shard_verify_program(machine, tmach.CONFIG, proof)
    print(f"normalize compile: {time.time()-t0:.2f}s {nprogram.counts()}")
    fri = FriConfig(log_blowup=1, num_queries=6, proof_of_work_bits=2)
    rp = RecursionProver(nprogram, fri=fri)
    t0 = time.time()
    nstream = rcompile.shard_witness_stream(pk.vk, proof)
    nproof = rp.prove(nstream)
    print(f"normalize prove: {time.time()-t0:.1f}s")
    assert rp.verify(nproof)

    t0 = time.time()
    cprogram = rcompose.build_compose_program(
        rp.machine, rp.config, nproof, num_children=2,
        rules=rcompose.PvMergeRules(equal=list(range(11))),
    )
    print(f"compose compile: {time.time()-t0:.2f}s {cprogram.counts()}")
    cstream = rcompose.compose_witness_stream(rp.vk, [nproof, nproof])
    t0 = time.time()
    record = rexec.execute(cprogram, cstream)
    print(f"compose execute: {time.time()-t0:.2f}s")
    assert record.public_values[:8].tolist() == [
        int(v) for v in rp.vk.preprocessed_commit
    ], "compose pvs must bind the child recursion vk"
    # merged child pvs: the child committed the CORE vk digest
    assert record.public_values[11:19].tolist() == [
        int(v) for v in pk.vk.preprocessed_commit
    ], "merged pvs must carry the core vk digest"
    print("compose execute ok; child vk + core vk bound in pvs")

    # tamper: corrupt one witness block
    bad = list(cstream)
    blk = list(bad[len(bad) // 3])
    blk[0] = (blk[0] + 1) % rexec.P
    bad[len(bad) // 3] = tuple(blk)
    try:
        rexec.execute(cprogram, bad)
        print("FAIL: tampered compose witness accepted")
        sys.exit(1)
    except rexec.RecursionExecutionError as e:
        print(f"tamper rejected: {e}")

    if os.environ.get("PROVE") == "1":
        t0 = time.time()
        cp = RecursionProver(cprogram, fri=fri)
        cproof = cp.prove(cstream)
        print(f"compose prove: {time.time()-t0:.1f}s")
        assert cp.verify(cproof)
        assert check_shard(cp.machine, cp.config, cp.vk, cproof, verbose=True)
        print("compose proof ok (machine + independent verifier)")
    print("OK")


if __name__ == "__main__":
    main()

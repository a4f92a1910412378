"""Smoke: compile the shard verifier symbolically, execute on a witness."""

import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/sp1_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np

from sp1_tpu.iop.challenger import DuplexChallenger
from sp1_tpu.prover import machine as mm
from sp1_tpu.recursion import compile as rcompile
from sp1_tpu.recursion import executor as rexec
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
    assert check_shard(machine, tmach.CONFIG, pk.vk, proof, verbose=True)
    print("core proof ok")

    t0 = time.time()
    program = rcompile.build_shard_verify_program(machine, tmach.CONFIG, proof)
    t1 = time.time()
    print(f"compile: {t1 - t0:.2f}s counts={program.counts()}")

    stream = rcompile.shard_witness_stream(pk.vk, proof)
    assert len(stream) == program.num_witness, (len(stream), program.num_witness)
    t0 = time.time()
    record = rexec.execute(program, stream)
    t1 = time.time()
    print(f"execute: {t1 - t0:.2f}s pv={record.public_values.tolist()}")
    assert record.public_values[:8].tolist() == [
        int(v) for v in pk.vk.preprocessed_commit
    ]

    # Tamper: flip one witness block coordinate -> must reject.
    bad = list(stream)
    blk = list(bad[len(bad) // 2])
    blk[0] = (blk[0] + 1) % rexec.P
    bad[len(bad) // 2] = tuple(blk)
    try:
        rexec.execute(program, bad)
        print("FAIL: tampered witness accepted")
        sys.exit(1)
    except rexec.RecursionExecutionError as e:
        print(f"tamper rejected: {e}")
    print("OK")


if __name__ == "__main__":
    main()

"""Shrink smoke: prove the single-child shrink program at blowup 2^3.

Proves the tiny every-chip recursion program, compiles + proves the
shrink (verifier-of-root) program under the shrink shard context, and
checks both the machine and independent verifiers accept. Too slow for
the default suite (see tests/test_shrink.py for the execute-level
checks). Reference: crates/prover/src/recursion.rs:285."""

import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/sp1_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from sp1_tpu.pcs.basefold import FriConfig
from sp1_tpu.recursion import shrink as rshrink
from sp1_tpu.recursion.prove import RecursionProver
from sp1_tpu.verifier import check_shard
from test_recursion_air import FRI, build_program, make_stream

SHRINK_FRI = FriConfig(log_blowup=3, num_queries=4, proof_of_work_bits=2)


def main():
    t0 = time.time()
    rp = RecursionProver(build_program(), fri=FRI)
    proof = rp.prove(make_stream())
    print(f"root (leaf) proof: {time.time()-t0:.1f}s")

    t0 = time.time()
    program = rshrink.build_shrink_program(rp.machine, rp.config, proof)
    print(f"shrink compile: {time.time()-t0:.1f}s {program.counts()}")
    stream = rshrink.shrink_witness_stream(rp.vk, proof)

    t0 = time.time()
    sp = rshrink.shrink_prover(program, fri=SHRINK_FRI)
    print(f"shrink setup: {time.time()-t0:.1f}s mlrc={sp.config.max_log_row_count}")
    t0 = time.time()
    sproof = sp.prove(stream)
    print(f"shrink prove: {time.time()-t0:.1f}s")
    assert sp.verify(sproof), "shrink proof rejected by machine verifier"
    assert check_shard(sp.machine, sp.config, sp.vk, sproof), \
        "independent verifier rejected shrink proof"
    print("SHRINK PROOF OK")


if __name__ == "__main__":
    main()

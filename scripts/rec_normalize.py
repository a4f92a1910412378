import sys, time
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
from sp1_tpu.recursion.prove import RecursionProver
from sp1_tpu.verifier import check_shard
import test_machine as tmach

machine = tmach.build_machine()
traces, prep = tmach.build_traces()
prover = mm.ShardProver(machine, tmach.CONFIG)
pk = prover.setup(preprocessed_traces=prep)
pch = DuplexChallenger()
pk.vk.observe_into(pch)
proof = prover.prove_shard(pk, traces, [], pch)

program = rcompile.build_shard_verify_program(machine, tmach.CONFIG, proof)
stream = rcompile.shard_witness_stream(pk.vk, proof)

t0 = time.time()
fri = FriConfig(log_blowup=1, num_queries=6, proof_of_work_bits=2)
rp = RecursionProver(program, fri=fri)
print(f"setup: {time.time()-t0:.1f}s  mlrc={rp.config.max_log_row_count}")
t0 = time.time()
rproof = rp.prove(stream)
print(f"prove: {time.time()-t0:.1f}s")
t0 = time.time()
assert rp.verify(rproof), "recursion proof verify failed"
print(f"verify: {time.time()-t0:.1f}s")
t0 = time.time()
assert check_shard(rp.machine, rp.config, rp.vk, rproof, verbose=True), \
    "independent verifier rejected recursion proof"
print(f"independent verify: {time.time()-t0:.1f}s")
print("RECURSION PROOF OK")

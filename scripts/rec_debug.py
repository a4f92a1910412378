"""Differential transcript debug: concrete verifier vs recursion VM.

Logs every poseidon2 permutation's input on both paths and reports the
first divergence (index + first differing lane).
"""

import sys

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/sp1_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from sp1_tpu.iop.challenger import DuplexChallenger
from sp1_tpu.prover import machine as mm
from sp1_tpu.recursion import compile as rcompile
from sp1_tpu.recursion import executor as rexec
from sp1_tpu.verifier import backend as vbackend
from sp1_tpu.verifier.backend import ConcreteBackend
from sp1_tpu.verifier.challenger import VChallenger
from sp1_tpu.verifier.lift import lift_shard_proof, lift_vk
from sp1_tpu.verifier.shard import observe_vk, verify_shard

import test_machine as tmach


class LoggingBackend(ConcreteBackend):
    def __init__(self):
        self.p2_log = []

    def poseidon2(self, state):
        self.p2_log.append([int(x) for x in state])
        return super().poseidon2(state)


def main():
    machine = tmach.build_machine()
    traces, prep = tmach.build_traces()
    prover = mm.ShardProver(machine, tmach.CONFIG)
    pk = prover.setup(preprocessed_traces=prep)
    pch = DuplexChallenger()
    pk.vk.observe_into(pch)
    proof = prover.prove_shard(pk, traces, [], pch)

    # Concrete path with logging.
    bk = LoggingBackend()
    vvk = lift_vk(bk, pk.vk)
    vproof = lift_shard_proof(bk, proof)
    ch = VChallenger(bk)
    observe_vk(vvk, ch)
    verify_shard(bk, machine, tmach.CONFIG, vvk, vproof, ch)
    print(f"concrete ok: {len(bk.p2_log)} permutations")

    # Symbolic path with logging.
    vm_log = []
    orig_p2 = rexec.poseidon2_permute_ints

    def logging_p2(state):
        vm_log.append([int(x) for x in state])
        return orig_p2(state)

    rexec.poseidon2_permute_ints = logging_p2
    program = rcompile.build_shard_verify_program(machine, tmach.CONFIG, proof)
    print(f"compiled: counts={program.counts()}")
    stream = rcompile.shard_witness_stream(pk.vk, proof)
    try:
        rexec.execute(program, stream)
        print("vm ok")
    except rexec.RecursionExecutionError as e:
        print(f"vm failed: {e}")
    print(f"vm: {len(vm_log)} permutations")

    n = min(len(bk.p2_log), len(vm_log))
    for i in range(n):
        if bk.p2_log[i] != vm_log[i]:
            print(f"FIRST DIVERGENCE at permutation {i}")
            for lane in range(16):
                a, b = bk.p2_log[i][lane], vm_log[i][lane]
                mark = "  <<<" if a != b else ""
                print(f"  lane {lane}: concrete={a} vm={b}{mark}")
            return
    print(f"no divergence in first {n} permutations "
          f"(lens: concrete={len(bk.p2_log)} vm={len(vm_log)})")


if __name__ == "__main__":
    main()

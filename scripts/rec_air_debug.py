"""Debug the RecursionAir before proving: constraints + lookup balance."""

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
from sp1_tpu.prover.lookup_debug import check_balance
from sp1_tpu.recursion import compile as rcompile
from sp1_tpu.recursion import executor as rexec
from sp1_tpu.recursion import tracegen as rtrace
from sp1_tpu.recursion.machine import KIND_REC_PV, build_recursion_machine

import test_machine as tmach


def main():
    machine = tmach.build_machine()
    traces, prep = tmach.build_traces()
    prover = mm.ShardProver(machine, tmach.CONFIG)
    pk = prover.setup(preprocessed_traces=prep)
    pch = DuplexChallenger()
    pk.vk.observe_into(pch)
    proof = prover.prove_shard(pk, traces, [], pch)

    program = rcompile.build_shard_verify_program(machine, tmach.CONFIG, proof)
    stream = rcompile.shard_witness_stream(pk.vk, proof)
    record = rexec.execute(program, stream)
    print("executed; pv:", record.public_values[:8].tolist())

    mlrc = rtrace.min_mlrc(program)
    print("mlrc:", mlrc)
    rmachine = build_recursion_machine(program.num_pvs)
    t0 = time.time()
    rprep = rtrace.preprocessed_traces(program, mlrc)
    rmain = rtrace.main_traces(program, record, mlrc)
    print(f"tracegen: {time.time()-t0:.2f}s")
    for name, (tr, h) in rmain.items():
        print(f"  {name}: h={h} w={tr.shape[1]}")

    heights = {n: h for n, (_, h) in rmain.items()}
    viol = mm.debug_constraints(
        rmachine,
        rmachine.chips,
        {n: t for n, (t, _) in rprep.items()},
        {n: t for n, (t, _) in rmain.items()},
        heights,
        [int(v) for v in record.public_values]
        + [0] * (187 - len(record.public_values)),
    )
    print("constraint violations:", viol[:10], f"({len(viol)} total)")

    imbal = check_balance(
        rmachine.chips,
        {n: t for n, (t, _) in rprep.items()},
        {n: t for n, (t, _) in rmain.items()},
        heights,
    )
    # The REC_PV receives are absorbed by the machine's pv digest.
    unexplained = {}
    pv_expect = {}
    for i, v in enumerate(record.public_values.tolist()):
        pv_expect[(KIND_REC_PV, (i, int(v)))] = (-1) % rexec.P
    for k, v in imbal.items():
        if pv_expect.get(k) == v:
            continue
        unexplained[k] = v
    print(f"imbalances: {len(imbal)} total, {len(unexplained)} unexplained")
    for k, v in list(unexplained.items())[:10]:
        print("  ", k, v)


if __name__ == "__main__":
    main()

"""Benchmark: end-to-end fibonacci shard proof on the real chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: prover throughput in kHz (cycles proven per second / 1e3) — the
reference's headline metric (reference: sp1-gpu/crates/perf/src/report.rs
`khz = cycles / prove_secs / 1e3`). vs_baseline compares against a
1000 kHz single-GPU-class target.
"""

import json
import time

import numpy as np


def main():
    import os

    # On the axon TPU path every kernel compile is a remote request
    # (minutes on first use; the persistent cache makes reruns fast).
    # Keep the device work concentrated in the commit path (NTT +
    # Poseidon2 Merkle — the FLOP-dominant kernels) and run the
    # sumcheck tails on host unless the user overrides.
    os.environ.setdefault("SP1_TPU_HOST_THRESH", str(1 << 22))

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/sp1_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from sp1_tpu.executor import asm, native
    from sp1_tpu.iop.challenger import DuplexChallenger
    from sp1_tpu.pcs.basefold import FriConfig
    from sp1_tpu.pcs.jagged import JaggedConfig
    from sp1_tpu.prover import machine as mm
    from sp1_tpu.riscv import tracegen
    from sp1_tpu.riscv.machine import WordSpec, build_machine

    import os

    ws = WordSpec(limb_bits=8)
    mlrc = int(os.environ.get("SP1_BENCH_MLRC", "12"))
    config = JaggedConfig(
        FriConfig(log_blowup=1, num_queries=84, proof_of_work_bits=16),
        log_stacking_height=min(13, mlrc + 3),
        max_log_row_count=mlrc,
    )

    prog = asm.assemble(asm.FIBONACCI)
    # fibonacci loop is 6 cycles/iteration + 9 fixed; fill the shard
    n_iters = ((1 << mlrc) - 9) // 6
    res = native.execute(prog, inputs=[n_iters])
    traces, prep = tracegen.generate_traces(res, prog, 0, ws, mlrc)
    machine = build_machine(ws)
    prover = mm.ShardProver(machine, config)
    pk = prover.setup(preprocessed_traces=prep)

    # Warm-up run (compilation), then timed run.
    pv = tracegen.make_public_values(res, 0, ws)
    for timed in (False, True):
        ch = DuplexChallenger()
        pk.vk.observe_into(ch)
        t0 = time.time()
        proof = prover.prove_shard(pk, traces, pv, ch)
        dt = time.time() - t0
        if timed:
            prove_secs = dt

    verifier = mm.ShardVerifier(machine, config)
    vch = DuplexChallenger()
    pk.vk.observe_into(vch)
    assert verifier.verify_shard(pk.vk, proof, vch), "proof failed to verify"

    khz = res.cycles / prove_secs / 1e3
    baseline_khz = 1000.0  # single-GPU-class reference target
    print(
        json.dumps(
            {
                "metric": "core_prover_throughput",
                "value": round(khz, 4),
                "unit": "kHz",
                "vs_baseline": round(khz / baseline_khz, 6),
            }
        )
    )


if __name__ == "__main__":
    main()

"""SDK compressed() smoke: multi-shard fibonacci -> one compressed proof.

Drives client.prove(pk, stdin).compressed() end to end at small test
parameters, verifies it, and checks the negative cases (tampered pv,
foreign vk-map root)."""

import os
import sys
import time

sys.path.insert(0, ".")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/sp1_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np

from sp1_tpu.executor import asm
from sp1_tpu.pcs.basefold import FriConfig
from sp1_tpu.pcs.jagged import JaggedConfig
from sp1_tpu.riscv.machine import WordSpec
from sp1_tpu.sdk.client import ProverClient


def main():
    cfg = JaggedConfig(
        FriConfig(log_blowup=1, num_queries=6, proof_of_work_bits=2),
        log_stacking_height=12,
        max_log_row_count=9,
    )
    rec_fri = FriConfig(log_blowup=1, num_queries=6, proof_of_work_bits=2)
    client = (
        ProverClient.builder()
        .cpu(
            word_spec=WordSpec(limb_bits=8),
            max_log_row_count=9,
            config=cfg,
            recursion_fri=rec_fri,
        )
        .build()
    )
    prog = asm.assemble(asm.FIBONACCI)
    pk, vk = client.setup(prog)
    # ~3 shards at 2^9 rows: 6 cycles/iter
    n_iters = (2 * (1 << 9) - 30) // 6
    t0 = time.time()
    req = client.prove(pk, stdin=[n_iters])
    core = req.core()
    print(f"[{time.time()-t0:7.1f}s] core: {len(core.shard_proofs)} shards")
    assert len(core.shard_proofs) >= 2, "want a multi-shard execution"
    assert client.verify(core, vk)
    print(f"[{time.time()-t0:7.1f}s] core verified")

    comp = req.compressed()
    print(f"[{time.time()-t0:7.1f}s] compressed proof done "
          f"(root pvs={len(comp.public_values)})")
    assert client.verify(comp, vk), "compressed proof rejected"
    print(f"[{time.time()-t0:7.1f}s] compressed verified")

    # tamper: public value flip
    import copy

    bad = copy.deepcopy(comp)
    bad.root_proof.public_values[8] = (int(bad.root_proof.public_values[8]) + 1) % ((1 << 31) - (1 << 24) + 1)
    assert not client.verify(bad, vk), "tampered pv accepted"
    print("tampered pv rejected")

    # pin a DIFFERENT root on the verifying side: the (legit) proof must
    # be rejected — its committed root no longer matches the pin
    saved = client.vk_map_root
    client.vk_map_root = np.asarray([1] * 8, np.uint32)
    assert not client.verify(comp, vk), "proof accepted under foreign pin"
    client.vk_map_root = saved
    print("foreign vk-map pin rejected")
    print("OK")


if __name__ == "__main__":
    main()

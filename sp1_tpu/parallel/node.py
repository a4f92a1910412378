"""Local proving node: multi-shard proving through the worker runtime.

Wires the controller/worker task queues (`parallel/worker.py`) to the
shard prover so shards prove concurrently on worker threads, mirroring
the reference's in-process node (reference:
crates/prover/src/worker/node/ SP1LocalNode; the fork-based transcript
design makes shard proofs independent after the shared prefix, exactly
like the reference's ProveShard task fan-out).
"""

from __future__ import annotations

import numpy as np

from ..iop.challenger import DuplexChallenger
from ..ops import mle as mle_ops
from ..prover import logup_gkr as gkr
from ..prover import multi
from ..prover.machine import global_chips_of
from ..riscv import tracegen
from .worker import (
    InMemoryArtifactClient,
    LocalWorkerClient,
    Task,
    TaskType,
    WorkerPool,
)


class LocalNode:
    """In-process node: execute -> splice -> parallel shard proving."""

    def __init__(self, prover, verifier, num_workers: int = 2):
        self.prover = prover
        self.verifier = verifier
        self.client = LocalWorkerClient()
        self.artifacts = InMemoryArtifactClient()
        self.pool = WorkerPool(
            self.client,
            self.artifacts,
            {TaskType.PROVE_SHARD: self._prove_shard_task},
            num_workers=num_workers,
        )

    def _prove_shard_task(self, payload, artifacts):
        job = artifacts.download(payload["input"])
        fork = job["challenger"].clone()
        fork.observe(job["index"])
        proof = self.prover.prove_shard(
            job["pk"], job["traces"], job["pv"], fork, global_ctx=job["global_ctx"]
        )
        return artifacts.upload(proof)

    def prove(self, pk, result, program_words, pc_base, ws, mlrc, max_rows=None):
        """Multi-shard prove with shard tasks fanned out over the pool."""
        from ..pcs import jagged

        machine = self.prover.machine
        max_rows = max_rows or (1 << mlrc)
        segments = multi.split_events(result.events, max_rows)
        rom = tracegen.decode_program(program_words, pc_base, ws)
        _, full_final = tracegen.compute_segment_states(
            result.events, rom, pc_base, ws
        )
        genesis_addrs = sorted(full_final.keys())

        shard_inputs = []
        for i, seg in enumerate(segments):
            init_s, final_s = tracegen.compute_segment_states(seg, rom, pc_base, ws)
            traces, _ = tracegen.generate_traces(
                result, program_words, pc_base, ws, mlrc,
                events=seg, init_states=init_s, final_states=final_s,
                genesis_addrs=genesis_addrs if i == 0 else None,
                final_global_states=full_final if i == len(segments) - 1 else None,
                include_bookends=False,
            )
            pv = multi.make_segment_pv(
                seg, ws, i == len(segments) - 1, int(result.exit_code)
            )
            pv = pv + [0] * (machine.max_num_pvs - len(pv))
            shard_inputs.append((traces, pv))

        ch = DuplexChallenger()
        pk.vk.observe_into(ch)
        for traces, pv in shard_inputs:
            chips = [c for c in machine.chips if c.name in traces]
            mles = [traces[c.name][0] for c in chips]
            heights = [traces[c.name][1] for c in chips]
            commit, _ = jagged.commit_multilinears(mles, heights, self.prover.config)
            ch.observe_slice(np.asarray(pv, np.uint32))
            ch.observe_digest(commit)

        g_chips = global_chips_of(machine, machine.chips)
        dim = gkr.gkr_beta_seed_dim(machine, g_chips, "global")
        alpha_g = ch.sample_ext()
        seed_g = ch.sample_ext_vec(dim)
        betas_g = mle_ops.host.partial_lagrange_ext(seed_g)

        task_ids = []
        for i, (traces, pv) in enumerate(shard_inputs):
            aid = self.artifacts.upload(
                {
                    "index": i,
                    "pk": pk,
                    "traces": traces,
                    "pv": pv,
                    "challenger": ch,
                    "global_ctx": (alpha_g, betas_g),
                }
            )
            task_ids.append(
                self.client.submit(Task(TaskType.PROVE_SHARD, {"input": aid}))
            )
        proofs = []
        for tid in task_ids:
            res = self.client.wait(tid)
            if not res.ok:
                raise RuntimeError(f"shard proving failed: {res.error}")
            proofs.append(self.artifacts.download(res.value))
        return proofs

    def verify(self, vk, proofs) -> bool:
        return multi.verify_program(self.verifier, vk, proofs)

    def shutdown(self):
        self.pool.shutdown()

"""Local proving node: multi-shard proving through the worker runtime.

Wires the controller/worker task queues (`parallel/worker.py`) to the
shard prover so shards prove concurrently on worker threads, mirroring
the reference's in-process node (reference:
crates/prover/src/worker/node/ SP1LocalNode). With the septic-digest
global argument, shard proofs are fully independent — each worker runs
its own transcript with zero cross-shard synchronization, exactly the
property the reference's digest design exists to provide.
"""

from __future__ import annotations

from ..iop.challenger import DuplexChallenger
from ..prover import multi
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
        ch = DuplexChallenger()
        job["pk"].vk.observe_into(ch)
        proof = self.prover.prove_shard(job["pk"], job["traces"], job["pv"], ch)
        return artifacts.upload(proof)

    def prove(self, pk, result, program_words, pc_base, ws, mlrc, max_rows=None):
        """Multi-shard prove with shard tasks fanned out over the pool."""
        machine = self.prover.machine
        shard_inputs = multi.shard_inputs_of(
            result, program_words, pc_base, ws, mlrc, max_rows
        )

        task_ids = []
        for i, (traces, pv) in enumerate(shard_inputs):
            pv = pv + [0] * (machine.max_num_pvs - len(pv))
            aid = self.artifacts.upload(
                {"index": i, "pk": pk, "traces": traces, "pv": pv}
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

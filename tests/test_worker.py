"""Distribution layer tests: task queue, retries, controller fan-out."""

import pytest

import threading

from sp1_tpu.parallel.worker import (
    InMemoryArtifactClient,
    LocalWorkerClient,
    ShardProvingController,
    Task,
    TaskResult,
    TaskType,
    WorkerPool,
)

pytestmark = pytest.mark.medium


class TestWorkerPool:
    def test_fan_out_and_collect(self):
        client = LocalWorkerClient()
        artifacts = InMemoryArtifactClient()

        def prove_shard(payload, arts):
            data = arts.download(payload["input"])
            return arts.upload({"proof_of": data["shard"]})

        pool = WorkerPool(
            client, artifacts, {TaskType.PROVE_SHARD: prove_shard}, num_workers=3
        )
        controller = ShardProvingController(client, artifacts)
        proofs = controller.prove([{"shard": i} for i in range(10)])
        assert [p["proof_of"] for p in proofs] == list(range(10))
        pool.shutdown()

    def test_retryable_failures_retry(self):
        client = LocalWorkerClient()
        artifacts = InMemoryArtifactClient()
        attempts = {"n": 0}
        lock = threading.Lock()

        def flaky(payload, arts):
            with lock:
                attempts["n"] += 1
                if attempts["n"] < 3:
                    raise RuntimeError("transient")
            return "ok"

        pool = WorkerPool(client, artifacts, {TaskType.EXECUTE: flaky}, num_workers=1)
        tid = client.submit(Task(TaskType.EXECUTE, {}))
        result = client.wait(tid, timeout=10)
        assert result.ok and result.value == "ok"
        assert attempts["n"] == 3
        pool.shutdown()

    def test_fatal_failures_do_not_retry(self):
        client = LocalWorkerClient()
        artifacts = InMemoryArtifactClient()
        attempts = {"n": 0}

        def fatal(payload, arts):
            attempts["n"] += 1
            assert False, "deterministic failure"

        pool = WorkerPool(client, artifacts, {TaskType.EXECUTE: fatal}, num_workers=1)
        tid = client.submit(Task(TaskType.EXECUTE, {}))
        result = client.wait(tid, timeout=10)
        assert not result.ok
        assert attempts["n"] == 1
        pool.shutdown()

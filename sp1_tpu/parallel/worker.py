"""Distributed proving runtime: task queue, artifact store, controller.

Mirrors the reference's controller/worker architecture (reference:
crates/prover/src/worker/ — `SP1Controller`, `LocalWorkerClient`,
`InMemoryArtifactClient`, task-type routing at
crates/prover-types/src/lib.rs:26-40): a Controller task executes the
guest, splits work into `ProveShard` tasks fanned out through a
`WorkerClient`, with blobs passed by id through an `ArtifactClient`.

This in-process implementation exercises the full distributed control
flow on one host (the reference tests the same way — no fake-network
mocks, the real queues run in-process: SURVEY §4.8). A multi-host
client speaking the same interface can replace `LocalWorkerClient`
without touching the controller.
"""

from __future__ import annotations

import queue
import threading
import uuid
from dataclasses import dataclass, field
from enum import Enum


class TaskType(Enum):
    CONTROLLER = "controller"
    EXECUTE = "execute"
    PROVE_SHARD = "prove_shard"
    RECURSION_REDUCE = "recursion_reduce"
    SHRINK_WRAP = "shrink_wrap"
    SETUP_VKEY = "setup_vkey"


MAX_LOCAL_TASK_RETRIES = 3  # reference: worker/client/local.rs:44


class ArtifactClient:
    """Content-addressed blob store (reference: prover-types/artifacts.rs)."""

    def upload(self, obj) -> str:
        raise NotImplementedError

    def download(self, artifact_id: str):
        raise NotImplementedError

    def delete(self, artifact_id: str):
        raise NotImplementedError


class InMemoryArtifactClient(ArtifactClient):
    def __init__(self):
        self._store = {}
        self._lock = threading.Lock()

    def upload(self, obj) -> str:
        aid = uuid.uuid4().hex
        with self._lock:
            self._store[aid] = obj
        return aid

    def download(self, artifact_id: str):
        with self._lock:
            return self._store[artifact_id]

    def delete(self, artifact_id: str):
        with self._lock:
            self._store.pop(artifact_id, None)


@dataclass
class Task:
    task_type: TaskType
    payload: dict
    task_id: str = field(default_factory=lambda: uuid.uuid4().hex)
    retries: int = 0


@dataclass
class TaskResult:
    task_id: str
    ok: bool
    value: object = None
    error: str = ""
    retryable: bool = False


class LocalWorkerClient:
    """In-memory task queues per TaskType with retry accounting."""

    def __init__(self):
        self.queues = {t: queue.Queue() for t in TaskType}
        self.results = {}
        self._done = {}
        self._lock = threading.Lock()

    def submit(self, task: Task) -> str:
        with self._lock:
            self._done[task.task_id] = threading.Event()
        self.queues[task.task_type].put(task)
        return task.task_id

    def complete(self, task: Task, result: TaskResult):
        if not result.ok and result.retryable and task.retries < MAX_LOCAL_TASK_RETRIES:
            task.retries += 1
            self.queues[task.task_type].put(task)
            return
        with self._lock:
            self.results[task.task_id] = result
            self._done[task.task_id].set()

    def wait(self, task_id: str, timeout=None) -> TaskResult:
        self._done[task_id].wait(timeout)
        return self.results[task_id]


class WorkerPool:
    """Spawns worker threads pulling from task queues.

    handlers: {TaskType: fn(payload, artifacts) -> value}. Deterministic
    failures are fatal; unexpected crashes are retried (reference task
    error classification: controller/core.rs:654 Retryable/Fatal).
    """

    def __init__(self, client: LocalWorkerClient, artifacts: ArtifactClient, handlers: dict, num_workers: int = 4):
        self.client = client
        self.artifacts = artifacts
        self.handlers = handlers
        self.threads = []
        self._stop = threading.Event()
        for _ in range(num_workers):
            t = threading.Thread(target=self._run, daemon=True)
            t.start()
            self.threads.append(t)

    def _run(self):
        while not self._stop.is_set():
            task = None
            for tt, handler in self.handlers.items():
                try:
                    task = self.client.queues[tt].get(timeout=0.05)
                    break
                except queue.Empty:
                    continue
            if task is None:
                continue
            handler = self.handlers[task.task_type]
            try:
                value = handler(task.payload, self.artifacts)
                self.client.complete(task, TaskResult(task.task_id, True, value))
            except AssertionError as e:  # deterministic -> fatal
                self.client.complete(
                    task, TaskResult(task.task_id, False, error=str(e))
                )
            except Exception as e:  # crash-like -> retryable
                self.client.complete(
                    task,
                    TaskResult(task.task_id, False, error=str(e), retryable=True),
                )

    def shutdown(self):
        self._stop.set()
        for t in self.threads:
            t.join(timeout=2)


class ShardProvingController:
    """Fans a multi-shard proving job out over the worker pool.

    v1 scope: single-shard executions are proven as one ProveShard task;
    the fan-out/collect structure (submit N tasks, gather N proofs in
    order) is in place for the multi-shard splicer to plug into.
    Reference: crates/prover/src/worker/controller/mod.rs:74.
    """

    def __init__(self, client: LocalWorkerClient, artifacts: ArtifactClient):
        self.client = client
        self.artifacts = artifacts

    def prove(self, shard_inputs: list) -> list:
        task_ids = []
        for payload in shard_inputs:
            aid = self.artifacts.upload(payload)
            task_ids.append(
                self.client.submit(
                    Task(TaskType.PROVE_SHARD, {"input": aid})
                )
            )
        proofs = []
        for tid in task_ids:
            result = self.client.wait(tid)
            if not result.ok:
                raise RuntimeError(f"shard task failed: {result.error}")
            proofs.append(self.artifacts.download(result.value))
        return proofs

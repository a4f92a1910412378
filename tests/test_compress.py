"""CompressTree: streaming arity-<=4 recursion-proof reduction.

Unit tests drive the tree with a list-concatenating mock reduce over
the real worker queues (out-of-order leaf arrival, tail singletons,
multi-level). The integration test runs a REAL compose: two recursion
proofs of the tiny every-chip program reduced by compiling + executing
the compose program inside a RECURSION_REDUCE worker task.
Reference: crates/prover/src/worker/controller/compress.rs:209-330.
"""

import random

import pytest

from sp1_tpu.parallel.compress import (
    CompressController,
    CompressTree,
    level_sizes,
)
from sp1_tpu.parallel.worker import (
    InMemoryArtifactClient,
    LocalWorkerClient,
    TaskType,
    WorkerPool,
)

pytestmark = pytest.mark.medium


class TestLevelSizes:
    def test_shapes(self):
        assert level_sizes(1, 4) == [1]
        assert level_sizes(4, 4) == [4, 1]
        assert level_sizes(5, 4) == [5, 2, 1]
        assert level_sizes(16, 4) == [16, 4, 1]
        assert level_sizes(17, 4) == [17, 5, 2, 1]
        assert level_sizes(7, 2) == [7, 4, 2, 1]


def run_mock_tree(total, arity, seed=0):
    """Reduce = list concat; root must be [0..total) in shard order."""
    client = LocalWorkerClient()
    artifacts = InMemoryArtifactClient()

    def reduce_task(payload, arts):
        merged = []
        for cid in payload["children"]:
            merged.extend(arts.download(cid))
        return arts.upload(merged)

    pool = WorkerPool(client, artifacts,
                      {TaskType.RECURSION_REDUCE: reduce_task}, num_workers=3)
    try:
        ctl = CompressController(client, artifacts, total, arity)
        order = list(range(total))
        random.Random(seed).shuffle(order)
        for i in order:
            ctl.add_leaf(i, artifacts.upload([i]))
        root = ctl.wait_root(timeout=30)
        return artifacts.download(root)
    finally:
        pool.shutdown()


class TestCompressTree:
    @pytest.mark.parametrize("total,arity", [
        (1, 4), (2, 4), (4, 4), (5, 4), (16, 4), (17, 4), (9, 2),
    ])
    def test_mock_reduction_preserves_order(self, total, arity):
        assert run_mock_tree(total, arity) == list(range(total))

    def test_duplicate_leaf_rejected(self):
        tree = CompressTree(4, 4)
        tree.add(0, 1, "x")
        with pytest.raises(AssertionError):
            tree.add(0, 1, "y")

    def test_singleton_total_is_root_immediately(self):
        tree = CompressTree(1, 4)
        assert tree.add(0, 0, "only") == []
        assert tree.wait_root(1) == "only"

    def test_reduce_error_propagates(self):
        client = LocalWorkerClient()
        artifacts = InMemoryArtifactClient()

        def bad_reduce(payload, arts):
            raise AssertionError("deterministic reduce failure")

        pool = WorkerPool(client, artifacts,
                          {TaskType.RECURSION_REDUCE: bad_reduce},
                          num_workers=1)
        try:
            ctl = CompressController(client, artifacts, 2, 4)
            ctl.add_leaf(0, artifacts.upload([0]))
            ctl.add_leaf(1, artifacts.upload([1]))
            with pytest.raises(RuntimeError, match="reduce level=0"):
                ctl.wait_root(timeout=30)
        finally:
            pool.shutdown()


class TestRealComposeReduce:
    """Depth-1 tree over two real recursion proofs; reduce = compose."""

    def test_compose_reduce_root_binds_child_vk(self):
        from test_recursion_air import FRI, build_program, make_stream

        from sp1_tpu.recursion import compose as rcompose
        from sp1_tpu.recursion import executor as rexec
        from sp1_tpu.recursion.prove import RecursionProver

        program = build_program()
        rp = RecursionProver(program, fri=FRI)
        p0 = rp.prove(make_stream(a=3, b=5))
        p1 = rp.prove(make_stream(a=7, b=11))

        cprogram = rcompose.build_compose_program(
            rp.machine, rp.config, p0, num_children=2)

        client = LocalWorkerClient()
        artifacts = InMemoryArtifactClient()

        def compose_reduce(payload, arts):
            children = [arts.download(c) for c in payload["children"]]
            stream = rcompose.compose_witness_stream(rp.vk, children)
            record = rexec.execute(cprogram, stream)
            return arts.upload(record.public_values)

        pool = WorkerPool(client, artifacts,
                          {TaskType.RECURSION_REDUCE: compose_reduce},
                          num_workers=2)
        try:
            ctl = CompressController(client, artifacts, 2, 4)
            ctl.add_leaf(1, artifacts.upload(p1))  # out of order
            ctl.add_leaf(0, artifacts.upload(p0))
            pvs = artifacts.download(ctl.wait_root(timeout=600))
            assert pvs[:8].tolist() == [int(v) for v in rp.vk.preprocessed_commit]
        finally:
            pool.shutdown()

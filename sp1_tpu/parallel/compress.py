"""Streaming compress tree: arity-<=4 reduction of recursion proofs.

The controller consumes normalize (leaf) proofs AS THEY COMPLETE — in
any order — and submits a RecursionReduce task the moment a contiguous
sibling group is fully present, recursively up the tree until a single
root proof remains. Grouping is deterministic from (total, arity)
alone, so any worker on any host derives the same tree; shard order is
preserved inside every group, which is what lets the compose program's
public-value chain rules (pc/timestamp continuity) apply.

Reference: crates/prover/src/worker/controller/compress.rs:209-330
(`CompressTree` streaming sibling merge), DEFAULT_ARITY=4 at
crates/prover/src/shapes.rs:71. Singleton tail groups promote without
a reduce task, mirroring the reference's arity-range [2, 4].
"""

from __future__ import annotations

import threading
from dataclasses import dataclass, field

from .worker import Task, TaskType


def level_sizes(total: int, arity: int) -> list[int]:
    """Number of nodes at each level, leaves first, root last."""
    assert total >= 1 and arity >= 2
    sizes = [total]
    while sizes[-1] > 1:
        sizes.append((sizes[-1] + arity - 1) // arity)
    return sizes


@dataclass
class ReadyGroup:
    """A contiguous sibling group whose children are all present."""

    level: int          # level of the CHILDREN
    group: int          # index of the parent node at level+1
    children: list      # child items, in shard order
    is_root: bool       # True iff the parent is the tree root


@dataclass
class _Level:
    size: int
    slots: dict = field(default_factory=dict)   # index -> item
    emitted: set = field(default_factory=set)   # group indices already fired


class CompressTree:
    """Deterministic streaming reduction. Thread-safe.

    add(level, index, item) -> list[ReadyGroup]: record one completed
    node and return every sibling group that just became complete.
    Singleton tail groups are promoted internally (no group emitted);
    the caller only ever sees groups of size >= 2. When the root item
    itself is added (or a promotion reaches it), `root` is set.
    """

    def __init__(self, total: int, arity: int = 4):
        self.arity = arity
        self.sizes = level_sizes(total, arity)
        self.levels = [_Level(n) for n in self.sizes]
        self.root = None
        self._root_event = threading.Event()
        self._lock = threading.Lock()

    @property
    def num_levels(self) -> int:
        return len(self.sizes)

    def add(self, level: int, index: int, item) -> list[ReadyGroup]:
        with self._lock:
            return self._add_locked(level, index, item)

    def _add_locked(self, level: int, index: int, item) -> list[ReadyGroup]:
        lv = self.levels[level]
        assert 0 <= index < lv.size, f"index {index} out of range at level {level}"
        assert index not in lv.slots, f"duplicate node ({level},{index})"
        lv.slots[index] = item

        if level == self.num_levels - 1:
            self.root = item
            self._root_event.set()
            return []

        group = index // self.arity
        start = group * self.arity
        end = min(start + self.arity, lv.size)
        if group in lv.emitted:
            return []
        if any(i not in lv.slots for i in range(start, end)):
            return []
        lv.emitted.add(group)
        if end - start == 1:
            # Tail singleton: promote without a reduce task. A promoted
            # leaf can reach a higher reduce alongside compose proofs of a
            # different shape; compose handles that via its heterogeneous
            # `children=` form (recursion/compose.py), unlike the
            # reference which range-merges with arity [2,4] instead.
            return self._add_locked(level + 1, group, lv.slots[start])
        is_root = self.sizes[level + 1] == 1
        return [ReadyGroup(level, group, [lv.slots[i] for i in range(start, end)],
                           is_root)]

    def complete(self, ready: ReadyGroup, item) -> list[ReadyGroup]:
        """Record the reduce result of a previously returned group."""
        return self.add(ready.level + 1, ready.group, item)

    def wait_root(self, timeout=None):
        self._root_event.wait(timeout)
        return self.root


class CompressController:
    """Drives a CompressTree through the worker task queues.

    reduce tasks carry {"level", "group", "children": [artifact ids]}
    and the RECURSION_REDUCE handler returns an artifact id of the
    reduced proof. Leaves may arrive in any order via add_leaf(); the
    root artifact id is returned by run()/wait_root().
    """

    def __init__(self, client, artifacts, total: int, arity: int = 4):
        self.client = client
        self.artifacts = artifacts
        self.tree = CompressTree(total, arity)
        self._errors = []
        self._err_lock = threading.Lock()
        self._inflight = []

    def add_leaf(self, index: int, proof_id: str):
        for rg in self.tree.add(0, index, proof_id):
            self._submit(rg)

    def _submit(self, rg: ReadyGroup):
        task = Task(TaskType.RECURSION_REDUCE, {
            "level": rg.level, "group": rg.group, "children": rg.children,
        })
        tid = self.client.submit(task)
        t = threading.Thread(target=self._collect, args=(tid, rg), daemon=True)
        t.start()
        self._inflight.append(t)

    def _collect(self, tid: str, rg: ReadyGroup):
        res = self.client.wait(tid)
        if not res.ok:
            with self._err_lock:
                self._errors.append(
                    f"reduce level={rg.level} group={rg.group}: {res.error}")
            self.tree._root_event.set()  # unblock waiters with an error
            return
        for nxt in self.tree.complete(rg, res.value):
            self._submit(nxt)

    def wait_root(self, timeout=None) -> str:
        root = self.tree.wait_root(timeout)
        with self._err_lock:
            if self._errors:
                raise RuntimeError("; ".join(self._errors))
        if root is None:
            raise TimeoutError("compress tree did not reach root")
        return root

"""Compressed-proof pipeline: core shards -> normalize -> compose tree.

Drives the full aggregation chain behind `client.prove(...).compressed()`
(reference: crates/sdk/src/cpu/prove.rs + the controller's
normalize/CompressTree flow, crates/prover/src/worker/controller/mod.rs):

  1. every core shard proof is verified by a NORMALIZE recursion program
     (one compiled program per shard shape, cached);
  2. the normalize proofs reduce through arity-<=4 RISCV COMPOSE nodes
     (recursion/riscvtree.py) that chain pc/clk, accumulate the septic
     global digests, and verify every child vk against the session's
     recursion vk map — down to ONE root proof;
  3. the vk map covers every recursion program the session compiled
     (normalize shapes + compose shapes); its fixed-depth root is a
     public value of every node and is pinned at verification.

Upper-level compose programs need their children's PROOF SHAPES before
any child is proven; those come from shape-only dummy proofs (execute
with check=False on a zero witness stream, then prove — reference role:
crates/recursion/circuit/src/dummy/).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np

from ..field import septic as sp
from ..iop.challenger import DuplexChallenger
from ..recursion import compile as rcompile
from ..recursion import riscvtree as rt
from ..recursion import vkmap
from ..recursion.executor import execute
from ..recursion.prove import RecursionProver
from ..recursion import tracegen as rtracegen
from ..riscv.machine import (
    NUM_PV_ELTS,
    PV_CLK_START,
    PV_EXIT_CODE,
    PV_GLOBAL_SUM,
    PV_IS_HALTED,
    PV_PC_START,
)


@dataclass
class SP1CompressedProof:
    """One recursion proof attesting a whole (multi-shard) execution."""

    root_proof: object
    root_vk: object
    vk_map_root: np.ndarray  # (8,) canonical, fixed VK_TREE_DEPTH root
    public_values: list  # the root node's committed pvs
    root_vk_index: int = 0  # leaf index of root_vk in the vk map
    root_vk_path: list = None  # fixed-depth sibling path for root_vk
    mode: str = "compressed"


def _shape_key(proof) -> tuple:
    return tuple(
        (name, tuple(int(b) for b in ov.degree))
        for name, ov in proof.opened_values.items()
    )


def _dummy_shape_proof(rp: RecursionProver):
    """Structurally-correct (invalid) proof of rp's program shape."""
    _log(f"dummy shape prove (witness {rp.program.num_witness})")
    stream = [(0, 0, 0, 0)] * rp.program.num_witness
    record = execute(rp.program, stream, check=False)
    traces = rtracegen.main_traces(
        rp.program, record, rp.config.max_log_row_count
    )
    ch = DuplexChallenger()
    rp.pk.vk.observe_into(ch)
    return rp.prover.prove_shard(
        rp.pk, traces, [int(v) for v in record.public_values], ch
    )


def _log(msg: str):
    if os.environ.get("SP1_TPU_COMPRESS_LOG", "0") == "1":
        import sys
        import time

        print(f"[compress {time.strftime('%H:%M:%S')}] {msg}",
              file=sys.stderr, flush=True)


class CompressedPipeline:
    """Session-scoped: caches compiled programs/provers by shape."""

    def __init__(self, machine, config, fri=None, arity: int = 4,
                 worker_pool=None):
        self.machine = machine  # the CORE machine
        self.config = config  # the CORE jagged config
        self.fri = fri  # recursion-stage FriConfig (None = core schedule)
        self.arity = arity
        self.worker_pool = worker_pool
        self._normalize = {}  # shape_key -> RecursionProver
        self._compose = {}  # tuple(child keys) -> (RecursionProver, dummy)
        self._norm_dummy = {}

    # -- program/prover caches --------------------------------------------
    def normalize_prover(self, proof) -> tuple:
        key = _shape_key(proof)
        rp = self._normalize.get(key)
        if rp is None:
            _log(f"compile normalize program (shape {hash(key) & 0xffff:04x})")
            program = rcompile.build_shard_verify_program(
                self.machine, self.config, proof
            )
            _log(f"normalize program: {program.counts()}")
            rp = RecursionProver(program, fri=self.fri)
            _log("normalize prover setup done")
            self._normalize[key] = rp
        return key, rp

    def compose_prover(self, child_keys: tuple, child_specs: list):
        entry = self._compose.get(child_keys)
        if entry is None:
            _log(f"compile compose program ({len(child_specs)} children)")
            program = rt.build_riscv_compose_program(child_specs)
            _log(f"compose program: {program.counts()}")
            rp = RecursionProver(program, fri=self.fri)
            _log("compose prover setup done")
            entry = (rp, None)
            self._compose[child_keys] = entry
        return entry[0]

    def compose_dummy(self, child_keys: tuple):
        rp, dummy = self._compose[child_keys]
        if dummy is None:
            _log("compose dummy shape proof")
            dummy = _dummy_shape_proof(rp)
            self._compose[child_keys] = (rp, dummy)
        return dummy

    # -- the pipeline -------------------------------------------------------
    def prove(self, core_vk, core_proofs: list) -> SP1CompressedProof:
        from ..parallel.compress import level_sizes

        assert core_proofs
        # 1. normalize every shard (shape-cached programs)
        leaves = []
        for proof in core_proofs:
            key, rp = self.normalize_prover(proof)
            leaves.append((key, rp, proof))
        _log(f"{len(leaves)} leaves, {len(self._normalize)} normalize shapes")

        # 2. plan the whole tree STRUCTURALLY first, collecting every
        # program's vk for the session vk map.
        sizes = level_sizes(len(leaves), self.arity)
        plan_levels = [[("n", key) for key, _, _ in leaves]]
        for lvl in range(1, len(sizes)):
            prev = plan_levels[-1]
            nodes = []
            for g in range(sizes[lvl]):
                group = prev[g * self.arity : (g + 1) * self.arity]
                if len(group) == 1:
                    nodes.append(group[0])  # singleton promotion
                    continue
                child_specs = [self._spec_of(tag) for tag in group]
                ckey = ("c", tuple(tag for tag in group))
                self.compose_prover(ckey, child_specs)
                nodes.append(ckey)
            plan_levels.append(nodes)
        if plan_levels[-1][0][0] == "n":
            # the root must be a compose node (uniform pv layout for the
            # final verifier): wrap a promoted/sole normalize leaf in a
            # 1-child compose (the wrap stage does the same, wrap.py).
            tag = plan_levels[-1][0]
            ckey = ("c", (tag,))
            self.compose_prover(ckey, [self._spec_of(tag)])
            plan_levels.append([ckey])

        # 3. session vk map over every program vk, sorted for determinism
        vks = [rp.vk for rp in self._normalize.values()] + [
            rp.vk for rp, _ in self._compose.values()
        ]
        digests = sorted(
            (vkmap.vk_digest(vk).tolist() for vk in vks)
        )
        vk_map = vkmap.VkMap(digests)
        index_of = {tuple(d): i for i, d in enumerate(digests)}

        def vk_index(vk):
            return index_of[tuple(vkmap.vk_digest(vk).tolist())]

        # 4. prove bottom-up
        items = []
        for i, (key, rp, proof) in enumerate(leaves):
            _log(f"normalize prove {i + 1}/{len(leaves)}")
            stream = rcompile.shard_witness_stream(core_vk, proof)
            nproof = rp.prove(stream)
            items.append((rt.NORMALIZE, ("n", key), rp, nproof))

        for lvl in range(1, len(sizes)):
            nxt = []
            for g in range(sizes[lvl]):
                group = items[g * self.arity : (g + 1) * self.arity]
                if len(group) == 1:
                    nxt.append(group[0])
                    continue
                nxt.append(self._reduce(group, vk_map, vk_index))
            items = nxt
        if items[0][0] == rt.NORMALIZE:
            items = [self._reduce(items, vk_map, vk_index)]
        assert len(items) == 1
        _, _, root_rp, root_proof = items[0]
        # downstream stages (SDK shrink/wrap) need the root prover's
        # machine/config/vk to compile their verifier programs
        self.last_root_rp = root_rp
        ridx = vk_index(root_rp.vk)
        return SP1CompressedProof(
            root_proof=root_proof,
            root_vk=root_rp.vk,
            vk_map_root=rt.padded_vk_root(vk_map),
            public_values=[int(v) for v in root_proof.public_values],
            root_vk_index=ridx,
            root_vk_path=_fixed_depth_path(vk_map, ridx),
        )

    def _reduce(self, group, vk_map, vk_index):
        """Prove one compose node over a sibling group."""
        ckey = ("c", tuple(tag for _, tag, _, _ in group))
        rp = self._compose[ckey][0]
        children_rt = [
            (kind, crp.vk, cproof, vk_index(crp.vk))
            for kind, _, crp, cproof in group
        ]
        _log(f"compose prove ({len(group)} children)")
        stream = rt.riscv_compose_witness_stream(children_rt, vk_map)
        cproof = self._prove_node(ckey, rp, stream)
        return (rt.COMPOSE, ckey, rp, cproof)

    def _prove_node(self, ckey, rp, stream):
        if self.worker_pool is not None:
            return self.worker_pool(ckey, rp, stream)
        return rp.prove(stream)

    def _spec_of(self, tag):
        if tag[0] == "n":
            rp = self._normalize[tag[1]]
            dummy = self._norm_dummy.get(tag[1])
            if dummy is None:
                dummy = _dummy_shape_proof(rp)
                self._norm_dummy[tag[1]] = dummy
            return rt.ChildSpec(rt.NORMALIZE, rp.machine, rp.config, dummy)
        rp = self._compose[tag][0]
        return rt.ChildSpec(
            rt.COMPOSE, rp.machine, rp.config, self.compose_dummy(tag)
        )


def _fixed_depth_path(vk_map: "vkmap.VkMap", index: int) -> list:
    """Sibling path for a leaf, padded to VK_TREE_DEPTH levels."""
    path = vk_map.prove(index)
    layers = rt._padded_layers(vk_map)
    for lvl in range(vk_map.depth, rt.VK_TREE_DEPTH):
        path.append(
            list(layers[lvl][1]) if len(layers[lvl]) > 1 else [0] * 8
        )
    return path


def verify_root_vk_membership(root, vk, index: int, path: list) -> bool:
    """Host check: vk's digest chains to `root` at the fixed depth."""
    from ..recursion.vkmap import _compress_ints

    cur = [int(x) for x in vkmap.vk_digest(vk)]
    for lvl, sib in enumerate(path):
        if (index >> lvl) & 1:
            cur = _compress_ints(sib, cur)
        else:
            cur = _compress_ints(cur, sib)
    return cur == [int(x) for x in np.asarray(root).reshape(-1)]


def verify_compressed(proof: SP1CompressedProof, core_vk, fri,
                      expected_root=None) -> bool:
    """Verify a compressed proof against the core vk (+ pinned vk root).

    `fri` is the TRUSTED recursion-stage FriConfig (the verifier's
    security parameters are never taken from the proof). Checks: the
    root recursion proof verifies under its vk; the root vk is itself a
    member of the pinned map; the committed public values bind the
    pinned root, the core vk, a genesis execution start (clk 1, pc =
    vk.pc_start), a halted end, and a balanced septic global digest
    (T == W). Reference: crates/prover/src/verify.rs compressed-mode
    checks.
    """
    from ..pcs.jagged import JaggedConfig
    from ..prover import machine as mm
    from ..recursion.machine import build_recursion_machine

    root = (
        np.asarray(expected_root, np.uint32)
        if expected_root is not None
        else proof.vk_map_root
    )
    if not verify_root_vk_membership(
        root, proof.root_vk, proof.root_vk_index, proof.root_vk_path or []
    ):
        return False
    ep = proof.root_proof.evaluation_proof
    config = JaggedConfig(
        fri,
        log_stacking_height=len(ep.pcs_proof.basefold_proof.fri_commitments),
        max_log_row_count=int(ep.max_log_row_count),
    )
    machine = build_recursion_machine(rt.NUM_NODE_PVS)
    verifier = mm.ShardVerifier(machine, config)
    ch = DuplexChallenger()
    proof.root_vk.observe_into(ch)
    if not verifier.verify_shard(proof.root_vk, proof.root_proof, ch):
        return False
    pv = [int(v) for v in proof.root_proof.public_values]
    if pv[:8] != [int(v) for v in root]:
        return False
    if pv[8:16] != [int(v) for v in core_vk.preprocessed_commit]:
        return False
    if pv[16:19] != [int(v) for v in core_vk.pc_start]:
        return False
    core = pv[19 : 19 + NUM_PV_ELTS]
    if core[PV_PC_START] != int(core_vk.pc_start[0]):
        return False
    if core[PV_CLK_START] != 1:
        return False
    if core[PV_IS_HALTED] != 1:
        return False
    W = sp.SepticCurvePoint.digest_sum_start()
    t_coords = core[PV_GLOBAL_SUM : PV_GLOBAL_SUM + 14]
    if t_coords != list(W.x.c) + list(W.y.c):
        return False
    return True


def exit_code_of(proof: SP1CompressedProof, ws) -> int:
    core = proof.public_values[19 : 19 + NUM_PV_ELTS]
    code = 0
    for i in range(ws.num_limbs):
        code |= int(core[PV_EXIT_CODE + i]) << (ws.limb_bits * i)
    return code

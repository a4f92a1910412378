"""Compose stage: one recursion program verifying N recursion proofs.

The compose program witnesses a recursion vk and N child proofs of the
same shape, runs the full shard verifier on each (fresh transcript per
child, mirroring RecursionProver.verify), enforces public-value merge
rules, and commits:

    [child_vk.preprocessed_commit (8), child_vk.pc_start (3), merged pvs]

The outer stage (or the final verifier) checks the committed child-vk
digest against the expected program vk, chaining trust down the tree.
Reference: crates/recursion/circuit/src/machine/compress.rs
(SP1CompressVerifier), crates/prover/src/recursion.rs:213-285 (the
normalize→compose tree).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ..verifier.challenger import VChallenger
from ..verifier.lift import lift_shard_proof, lift_vk
from ..verifier.shard import observe_vk, verify_shard
from .builder import SymbolicBackend
from .compile import NUM_VK_PVS, _ShapeVk
from .witness import LiftToWitness, StreamWriter


@dataclass
class PvMergeRules:
    """How children's public values combine into the parent's.

    equal: indices asserted identical across children (copied from child 0)
    last: indices taken from the LAST child (e.g. next_pc, clk_end, halted)
    chain: (start_idx, end_idx) pairs — child i+1 pv[start] == child i pv[end]
    Unlisted indices default to child 0's value.
    """

    equal: list = field(default_factory=list)
    last: list = field(default_factory=list)
    chain: list = field(default_factory=list)


def num_compose_pvs(rec_machine) -> int:
    return NUM_VK_PVS + rec_machine.num_pv_elts()


def build_compose_program(rec_machine, rec_config, child_proof=None,
                          num_children: int | None = None,
                          rules: PvMergeRules | None = None,
                          children: list | None = None,
                          vk_map_root=None, vk_map_depth: int | None = None):
    """Compile the verifier for N child recursion proofs.

    Homogeneous form: `child_proof` + `num_children` — one witnessed vk
    shared by every child (the reference's padded-shape normalize tree).
    Heterogeneous form: `children` = [(machine, config, shape_proof)] —
    each child gets its OWN witnessed vk and shape (needed until the
    shape system pads first/last shards to a canonical normalize shape;
    reference analog: crates/prover/src/shapes.rs + the vk merkle map).
    All child-vk digests are committed so the parent binds every child
    program. With `vk_map_root` (+ depth), each child vk must instead
    prove MEMBERSHIP in the committed vk merkle tree (recursion/vkmap.py;
    reference: crates/prover/src/shapes.rs vk_map) and the program
    commits the root — soundness against arbitrary self-chosen vks.
    """
    rules = rules or PvMergeRules()
    if children is None:
        children = [(rec_machine, rec_config, child_proof)] * num_children
    homogeneous = all(c[0] is children[0][0] for c in children)
    n_vk = 1 if homogeneous else len(children)
    npv = children[0][0].num_pv_elts()
    sym = SymbolicBackend(num_pvs=8 * n_vk + 3 + npv)
    wbk = LiftToWitness(sym)
    if homogeneous:
        vvks = [lift_vk(wbk, _ShapeVk)] * len(children)
    else:
        vvks = [lift_vk(wbk, _ShapeVk) for _ in children]
    vproofs = [lift_shard_proof(wbk, c[2]) for c in children]
    for (mach, cfg, _), vvk, vproof in zip(children, vvks, vproofs):
        ch = VChallenger(sym)
        observe_vk(vvk, ch)
        verify_shard(sym, mach, cfg, vvk, vproof, ch)

    if vk_map_root is not None:
        from . import vkmap

        assert vk_map_depth is not None
        for vvk in (vvks[:1] if homogeneous else vvks):
            digest = vkmap.circuit_vk_digest(sym, vvk)
            vkmap.circuit_verify_membership(
                sym, digest, vk_map_depth, list(vk_map_root)
            )

    last = set(rules.last)
    for i in rules.equal:
        for p in vproofs[1:]:
            sym.assert_f_eq(
                vproofs[0].public_values[i], p.public_values[i],
                "compose pv equality",
            )
    for s_idx, e_idx in rules.chain:
        for k in range(len(vproofs) - 1):
            sym.assert_f_eq(
                vproofs[k + 1].public_values[s_idx],
                vproofs[k].public_values[e_idx],
                "compose pv chain",
            )
    merged = [
        (vproofs[-1] if i in last else vproofs[0]).public_values[i]
        for i in range(npv)
    ]
    committed = []
    if vk_map_root is not None:
        committed += [sym.felt(int(r)) for r in vk_map_root]
    else:
        for vvk in (vvks[:1] if homogeneous else vvks):
            committed += list(vvk.preprocessed_commit)
    sym.commit_public_values(committed + list(vvks[0].pc_start) + merged)
    return sym.finalize()


def compose_witness_stream(vk, proofs, vks: list | None = None,
                           vk_map=None, vk_indices: list | None = None):
    """Runtime witness blocks for a compose program, in stream order.

    Pass `vks` (one per child) for heterogeneous compose programs.
    With `vk_map` (+ per-child leaf `vk_indices`), the membership
    (bits, path) blocks are appended in circuit order."""
    w = StreamWriter()
    if vks is None:
        lift_vk(w, vk)
        for p in proofs:
            lift_shard_proof(w, p)
        vk_list = [vk]
    else:
        for v in vks:
            lift_vk(w, v)
        for p in proofs:
            lift_shard_proof(w, p)
        vk_list = vks
    if vk_map is not None:
        from . import vkmap as _vkmap

        for idx in vk_indices if vk_indices is not None else [0] * len(vk_list):
            _vkmap.membership_witness(w, vk_map, idx)
    return w.stream

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


def build_compose_program(rec_machine, rec_config, child_proof,
                          num_children: int, rules: PvMergeRules | None = None):
    """Compile the verifier for `num_children` proofs of child_proof's shape."""
    rules = rules or PvMergeRules()
    sym = SymbolicBackend(num_pvs=num_compose_pvs(rec_machine))
    wbk = LiftToWitness(sym)
    vvk = lift_vk(wbk, _ShapeVk)
    vproofs = [
        lift_shard_proof(wbk, child_proof) for _ in range(num_children)
    ]
    for vproof in vproofs:
        ch = VChallenger(sym)
        observe_vk(vvk, ch)
        verify_shard(sym, rec_machine, rec_config, vvk, vproof, ch)

    npv = rec_machine.num_pv_elts()
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
    sym.commit_public_values(
        list(vvk.preprocessed_commit) + list(vvk.pc_start) + merged
    )
    return sym.finalize()


def compose_witness_stream(vk, proofs):
    """Runtime witness blocks for a compose program, in stream order."""
    w = StreamWriter()
    lift_vk(w, vk)
    for p in proofs:
        lift_shard_proof(w, p)
    return w.stream

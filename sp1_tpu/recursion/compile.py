"""Recursion program compilation: verifier protocol -> RecursionProgram.

`build_shard_verify_program` runs the independent shard verifier
(sp1_tpu.verifier) over the SymbolicBackend; the recorded instruction
stream IS the in-circuit verifier program (the reference's "normalize"
program: crates/prover/src/recursion.rs:190-211, built there from
crates/recursion/circuit/src/machine/core.rs). The program is
shape-specialized: static structure (chip set, heights, query counts,
round counts) is baked in, and all proof field elements are witness
cells whose stream order is defined by the same lift traversal
(`shard_witness_stream`).

Committed public values of the generated program:
    [vk.preprocessed_commit (8), vk.pc_start (3),
     core public_values[:num_pv_elts]]
binding the recursion proof to the exact core vk and claimed execution
trace boundary (reference: RecursionPublicValues in
crates/recursion/machine/src/lib.rs).
"""

from __future__ import annotations

from ..verifier.challenger import VChallenger
from ..verifier.lift import lift_shard_proof, lift_vk
from ..verifier.shard import observe_vk, verify_shard
from .builder import SymbolicBackend
from .witness import LiftToWitness, StreamWriter

NUM_VK_PVS = 11  # preprocessed_commit (8) + pc_start (3)


class _ShapeVk:
    """Static vk shape for witnessing (values are ignored at compile)."""

    pc_start = [0, 0, 0]
    initial_global_cumulative_sum = [0] * 14
    preprocessed_commit = [0] * 8
    enable_untrusted_programs = 0


def num_recursion_pvs(machine) -> int:
    return NUM_VK_PVS + machine.num_pv_elts()


def build_shard_verify_program(machine, config, proof):
    """Compile the shard verifier for proofs of `proof`'s shape.

    `proof` supplies only static structure; its field-element values are
    ignored (they become witness cells). The vk is witnessed too, so one
    program serves every (vk, proof) pair of the same shape.
    """
    sym = SymbolicBackend(num_pvs=num_recursion_pvs(machine))
    wbk = LiftToWitness(sym)
    vvk = lift_vk(wbk, _ShapeVk)
    vproof = lift_shard_proof(wbk, proof)
    ch = VChallenger(sym)
    observe_vk(vvk, ch)
    verify_shard(sym, machine, config, vvk, vproof, ch)
    sym.commit_public_values(
        list(vvk.preprocessed_commit)
        + list(vvk.pc_start)
        + list(vproof.public_values[: machine.num_pv_elts()])
    )
    return sym.finalize()


def shard_witness_stream(vk, proof):
    """The runtime witness blocks, in the program's stream order."""
    w = StreamWriter()
    lift_vk(w, vk)
    lift_shard_proof(w, proof)
    return w.stream

"""Shrink stage: re-prove the compress-tree root at wrap-grade params.

A shrink program is structurally a compose program over exactly one
child — the full shard verifier for the root recursion proof — but it
is PROVEN under the shrink shard context: RS blowup 2^3 and a 22-bit
PoW grind instead of the core 2^2/16-bit, trading prover time for the
smaller, higher-rate proof the (future) outer wrap circuit consumes.
Reference: crates/prover/src/recursion.rs:285 (shrink program),
crates/primitives/src/fri_params.rs:5-40 (shrink blowup 3, 22-bit PoW),
crates/prover/src/components.rs:33-39 (ShrinkSC sizing).
"""

from __future__ import annotations

from ..pcs.basefold import FriConfig
from .compose import build_compose_program, compose_witness_stream
from .prove import RecursionProver


def build_shrink_program(rec_machine, rec_config, root_proof):
    """Compile the single-child verifier program for a root proof shape."""
    return build_compose_program(
        rec_machine, rec_config, root_proof, num_children=1
    )


def shrink_witness_stream(rec_vk, root_proof):
    return compose_witness_stream(rec_vk, [root_proof])


def shrink_prover(program, fri: FriConfig | None = None) -> RecursionProver:
    """A RecursionProver at the shrink shard context."""
    return RecursionProver(program, fri=fri or FriConfig.shrink())

"""Independent shard/program verifier (standalone acceptance oracle).

A from-the-reference reimplementation of the complete verification
pipeline (Fiat-Shamir challenger, LogUp-GKR, zerocheck, jagged/stacked/
BaseFold PCS, Merkle/Poseidon2) over a scalar backend, sharing only the
machine (AIR) definitions with the prover. Reference:
crates/hypercube/src/verifier/, slop/crates/*/src/verifier.rs,
crates/verifier (the no_std verifier crate this package plays the role
of).

    from sp1_tpu.verifier import check_shard, check_program
    assert check_shard(machine, config, vk, shard_proof)

The same protocol code runs over a symbolic backend to generate
recursion programs (the in-circuit verifier of the recursion stack).
"""

from .backend import ConcreteBackend, VerificationError
from .shard import check_program, check_shard, verify_program, verify_shard

__all__ = [
    "ConcreteBackend",
    "VerificationError",
    "check_program",
    "check_shard",
    "verify_program",
    "verify_shard",
]

"""Recursion stack: verifier-as-circuit compiler, recursion VM, and the
RecursionAir machine proving recursion programs.

Pipeline (reference: crates/recursion/* and crates/prover/src/recursion.rs):

  build_shard_verify_program  — compile the independent shard verifier
      (sp1_tpu.verifier) into a straight-line RecursionProgram for one
      proof shape ("normalize").
  build_compose_program       — a program verifying N recursion proofs
      and merging their public values ("compose", tree reduction).
  execute                     — run a program against a witness stream.
  RecursionProver             — setup/prove/verify recursion programs
      with the shard prover over the RecursionAir chip set.
"""

from .builder import SymbolicBackend, WitnessWriter
from .compile import build_shard_verify_program, shard_witness_stream
from .compose import PvMergeRules, build_compose_program, compose_witness_stream
from .executor import RecursionExecutionError, RecursionRecord, execute
from .machine import build_recursion_machine
from .program import RecursionProgram
from .prove import RecursionProver, recursion_config

__all__ = [
    "SymbolicBackend",
    "WitnessWriter",
    "build_shard_verify_program",
    "shard_witness_stream",
    "PvMergeRules",
    "build_compose_program",
    "compose_witness_stream",
    "RecursionExecutionError",
    "RecursionRecord",
    "execute",
    "build_recursion_machine",
    "RecursionProgram",
    "RecursionProver",
    "recursion_config",
]

"""Wrap stage: prove a recursion program over the OUTER (BN254) context.

Reference: crates/prover/src/components.rs:50 (WrapSC = the shard prover
instantiated over the Bn254 basefold config), wrap_fri_config
(crates/primitives/src/fri_params.rs:36-42: log_blowup 3, 22-bit PoW)
and crates/recursion/circuit/src/machine/wrap.rs (the wrap verifier
program is the shard verifier of the shrink proof).

The wrap proof's transcript runs over the MultiField32Challenger
(BN254-Fr Poseidon2 sponge) and all Merkle commitments are one-element
BN254 digests (pcs/outer_merkle.OuterTcs) — so a gnark circuit verifying
it only evaluates BN254-native hashes. The IOPs (zerocheck, LogUp GKR,
jagged/stacked/BaseFold sumchecks) are unchanged KoalaBear logic: only
the commitment scheme and the transcript move to the outer field.

Chain position: core -> normalize -> compose -> shrink -> WRAP:

    shrink_proof = ...                             # FriConfig.shrink()
    wprog = rcompile.build_shard_verify_program(rec_machine, cfg, shrink_proof)
    wp = WrapProver(wprog)
    wproof = wp.prove(rcompile.shard_witness_stream(shrink_vk, shrink_proof))
    assert wp.verify(wproof)
    gnark.write_gnark_artifacts(wprog, stream, "constraints.json", "witness.json")
"""

from __future__ import annotations

from ..iop.multifield import MultiField32Challenger
from ..pcs.basefold import FriConfig
from ..pcs.jagged import JaggedConfig
from ..pcs.outer_merkle import OuterTcs
from ..prover import machine as mm
from . import tracegen
from .executor import execute
from .machine import build_recursion_machine


def build_wrap_program(rec_machine, rec_config, shrink_proof):
    """Compile the single-child verifier program for the shrink proof
    (crates/recursion/circuit/src/machine/wrap.rs: the wrap circuit is
    the shard verifier of the shrink shard)."""
    from .compose import build_compose_program

    return build_compose_program(
        rec_machine, rec_config, shrink_proof, num_children=1
    )


def wrap_witness_stream(shrink_vk, shrink_proof):
    from .compose import compose_witness_stream

    return compose_witness_stream(shrink_vk, [shrink_proof])


def wrap_config(program, fri: FriConfig | None = None,
                mlrc: int | None = None) -> JaggedConfig:
    mlrc = mlrc if mlrc is not None else tracegen.min_mlrc(program)
    return JaggedConfig(
        fri or FriConfig.wrap(),
        # WRAP_LOG_STACKING_HEIGHT = 21 (components.rs:40), clamped to
        # the program size for small wrap machines
        log_stacking_height=min(21, mlrc + 4),
        max_log_row_count=mlrc,
    )


class WrapProver:
    """Setup/prove/verify one RecursionProgram over the outer context."""

    def __init__(self, program, config: JaggedConfig | None = None,
                 fri: FriConfig | None = None):
        self.program = program
        self.config = config or wrap_config(program, fri=fri)
        self.machine = build_recursion_machine(program.num_pvs)
        self.tcs = OuterTcs()
        self.prover = mm.ShardProver(self.machine, self.config, tcs=self.tcs)
        self.verifier = mm.ShardVerifier(self.machine, self.config, tcs=self.tcs)
        prep = tracegen.preprocessed_traces(
            program, self.config.max_log_row_count
        )
        self.pk = self.prover.setup(preprocessed_traces=prep)

    @property
    def vk(self):
        return self.pk.vk

    def prove(self, witness_stream) -> mm.ShardProof:
        record = execute(self.program, witness_stream)
        traces = tracegen.main_traces(
            self.program, record, self.config.max_log_row_count
        )
        challenger = MultiField32Challenger()
        self.pk.vk.observe_into(challenger)
        return self.prover.prove_shard(
            self.pk, traces, [int(v) for v in record.public_values], challenger
        )

    def verify(self, proof: mm.ShardProof) -> bool:
        challenger = MultiField32Challenger()
        self.pk.vk.observe_into(challenger)
        return self.verifier.verify_shard(self.pk.vk, proof, challenger)

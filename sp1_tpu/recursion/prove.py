"""Prove RecursionProgram executions with the shard prover.

The recursion program's preprocessed traces are committed at setup; the
resulting MachineVerifyingKey IS the recursion vk (it binds the program,
i.e. the in-circuit verifier and therefore the core vk/shape it checks).
Reference: crates/prover/src/recursion.rs normalize-stage setup/prove.
"""

from __future__ import annotations

from ..iop.challenger import DuplexChallenger
from ..pcs.basefold import FriConfig
from ..pcs.jagged import JaggedConfig
from ..prover import machine as mm
from . import tracegen
from .executor import execute
from .machine import build_recursion_machine


def recursion_config(program, fri: FriConfig | None = None,
                     mlrc: int | None = None) -> JaggedConfig:
    mlrc = mlrc if mlrc is not None else tracegen.min_mlrc(program)
    return JaggedConfig(
        fri or FriConfig.core(),
        log_stacking_height=min(21, mlrc + 4),
        max_log_row_count=mlrc,
    )


class RecursionProver:
    """Setup/prove/verify for one RecursionProgram shape."""

    def __init__(self, program, config: JaggedConfig | None = None,
                 fri: FriConfig | None = None):
        self.program = program
        self.config = config or recursion_config(program, fri=fri)
        self.machine = build_recursion_machine(program.num_pvs)
        self.prover = mm.ShardProver(self.machine, self.config)
        self.verifier = mm.ShardVerifier(self.machine, self.config)
        prep = tracegen.preprocessed_traces(
            program, self.config.max_log_row_count
        )
        self.pk = self.prover.setup(preprocessed_traces=prep)

    @property
    def vk(self):
        return self.pk.vk

    def prove(self, witness_stream) -> mm.ShardProof:
        """Execute the program on the witness stream and prove the run."""
        record = execute(self.program, witness_stream)
        traces = tracegen.main_traces(
            self.program, record, self.config.max_log_row_count
        )
        challenger = DuplexChallenger()
        self.pk.vk.observe_into(challenger)
        return self.prover.prove_shard(
            self.pk, traces, [int(v) for v in record.public_values], challenger
        )

    def verify(self, proof: mm.ShardProof) -> bool:
        challenger = DuplexChallenger()
        self.pk.vk.observe_into(challenger)
        return self.verifier.verify_shard(self.pk.vk, proof, challenger)

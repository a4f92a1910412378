"""User-facing prover client (reference: crates/sdk/src/client.rs
`ProverClient`, crates/sdk/src/prover.rs `Prover` trait).

    client = ProverClient.builder().cpu().build()
    pk, vk = client.setup(program)
    report = client.execute(program, stdin)
    proof = client.prove(pk, stdin)
    assert client.verify(proof, vk)

`program` is an array of RV64 instruction words (see executor.asm for the
assembler); `stdin` is a list of 64-bit input words consumed by READ
ecalls. Proof modes follow the reference vocabulary: "core" is
implemented; compressed/groth16/plonk arrive with the recursion stack.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..executor import native
from ..iop.challenger import DuplexChallenger
from ..pcs.basefold import FriConfig
from ..pcs.jagged import JaggedConfig
from ..prover import machine as mm
from ..riscv import tracegen
from ..riscv.machine import WordSpec, build_machine


@dataclass
class ExecutionReport:
    """Reference: crates/core/executor/src/report.rs ExecutionReport
    (cycle count, per-opcode-class counts, syscall counts)."""

    exit_code: int
    cycles: int
    output: bytes
    opcode_counts: dict = None
    syscall_counts: dict = None


@dataclass
class SP1ProofWithPublicValues:
    shard_proofs: list
    public_values: list
    mode: str = "core"


@dataclass
class SP1ShrinkProof:
    """Wrap-grade recursion proof of the compress-tree root (blowup 2^3,
    22-bit PoW — fri_params.rs shrink schedule)."""

    proof: object  # mm.ShardProof over the RecursionAir machine
    vk: object
    public_values: list
    compressed: object  # the SP1CompressedProof this shrinks
    _prover: object = None  # RecursionProver (in-process verification)
    mode: str = "shrink"


@dataclass
class SP1Groth16Proof:
    """BN254 wrap proof + the gnark circuit artifacts it feeds.

    Everything gnark's Groth16 pipeline consumes (go/sp1/sp1.go Define):
    the wrap proof with its BN254 transcript/commitments, the exported
    constraint system, and the witness — semantically evaluated by
    recursion/gnark_eval.py at prove AND verify time. The external Go
    BuildGroth16/ProveGroth16 step (prove_groth16.go:25) is the only
    piece not run in-process (no Go toolchain in this environment)."""

    wrap_proof: object
    wrap_vk: object
    constraints: dict
    witness: dict
    public_values: list
    shrink: SP1ShrinkProof
    _prover: object = None  # WrapProver
    mode: str = "groth16"


class CpuProver:
    """Local prover running the TPU-backed proving stack in-process.

    Defaults are the production parameters (reference:
    crates/primitives/src/fri_params.rs core config — log_blowup=2,
    unique-decoding query count, 16-bit PoW grind — and the 16-bit limb
    word model). Pass explicit `word_spec`/`config` to opt into smaller
    test shapes.
    """

    def __init__(self, word_spec=None, max_log_row_count=16, config=None,
                 shape=frozenset(), recursion_fri=None):
        self.ws = word_spec or WordSpec(limb_bits=16)
        if max_log_row_count < self.ws.limb_bits:
            raise ValueError(
                f"max_log_row_count={max_log_row_count} cannot fit the "
                f"2^{self.ws.limb_bits}-row range table"
            )
        self.mlrc = max_log_row_count
        self.config = config or JaggedConfig(
            FriConfig.core(),
            log_stacking_height=min(21, max_log_row_count + 3),
            max_log_row_count=max_log_row_count,
        )
        # `shape` selects the optional precompile chip cluster (reference
        # role: MachineShape, crates/hypercube/src/machine.rs). The vk is
        # shape-specific: verification fails under a different shape.
        self.shape = frozenset(shape)
        self.machine = build_machine(self.ws, self.shape)
        self.shard_prover = mm.ShardProver(self.machine, self.config)
        self.shard_verifier = mm.ShardVerifier(self.machine, self.config)
        # recursion-stage parameters for .compressed() (reference:
        # RecursionSC, crates/prover/src/components.rs); tests may pass a
        # smaller recursion_fri for fast runs.
        self.recursion_fri = recursion_fri or FriConfig.core()
        self.vk_map_root = None  # pinned on first compressed prove
        self._pipeline = None

    # -- Prover trait ------------------------------------------------------
    def setup(self, program, pc_base: int = 0, memory_image=None, pc_start=None):
        """Returns (pk, vk) with the program ROM committed.

        `program` is either an instruction-word array or a loaded ELF
        Program object (executor.elf) — the latter carries its data
        segments (memory_image) and entry point (pc_start), which the
        proof attests via vk.pc_start and the executor's initial memory.
        """
        if hasattr(program, "words"):  # executor.elf Program
            pc_base = program.pc_base
            memory_image = program.memory_image if memory_image is None else memory_image
            pc_start = program.pc_start if pc_start is None else pc_start
            program = program.words
        if pc_start is None:
            pc_start = pc_base
        rom_prep = self._preprocessed_for(program, pc_base)
        pk = self.shard_prover.setup(
            pc_start=[pc_start, 0, 0], preprocessed_traces=rom_prep
        )
        pk.program = program
        pk.pc_base = pc_base
        pk.memory_image = memory_image
        pk.pc_start = pc_start
        return pk, pk.vk

    def _preprocessed_for(self, program, pc_base):
        return tracegen.make_preprocessed(program, pc_base, self.ws, self.mlrc)

    def execute(self, program: np.ndarray, stdin: list | None = None) -> ExecutionReport:
        res = native.execute(program, inputs=stdin or [])
        return ExecutionReport(
            exit_code=int(res.exit_code),
            cycles=int(res.cycles),
            output=res.output,
            opcode_counts=res.report.get("opcode_counts", {}),
            syscall_counts=res.report.get("syscall_counts", {}),
        )

    def prove(self, pk, stdin: list | None = None) -> "ProveRequest":
        """Returns a proof request: `.core()` for per-shard proofs,
        `.compressed()` for one aggregated recursion proof (reference:
        crates/sdk/src/cpu/prove.rs request builder). The request itself
        still quacks like a core proof (shard_proofs/public_values), so
        `proof = client.prove(pk, stdin); client.verify(proof, vk)`
        keeps working.
        """
        return ProveRequest(self, pk, stdin)

    def _prove_core(self, pk, stdin) -> SP1ProofWithPublicValues:
        """Prove an execution, splitting into shards when it exceeds one.

        Each shard proves under a fresh transcript (the septic-digest
        global argument makes shards independent — reference:
        crates/prover/src/worker/controller/core.rs ProveShard fan-out).
        """
        from ..prover import multi

        res = native.execute(
            pk.program,
            pc_base=pk.pc_base,
            inputs=stdin or [],
            memory=getattr(pk, "memory_image", None),
            pc_start=getattr(pk, "pc_start", None),
        )
        needed = tracegen.shape_of_px(getattr(res, "px_events", None))
        if not needed <= self.shape:
            raise ValueError(
                f"execution uses precompiles {sorted(needed - self.shape)} "
                f"not in this prover's machine shape {sorted(self.shape)}; "
                "build the client with shape={...}"
            )
        shard_inputs = multi.shard_inputs_of(
            res, pk.program, pk.pc_base, self.ws, self.mlrc
        )
        proofs = []
        for traces, pv in shard_inputs:
            pv = pv + [0] * (self.machine.max_num_pvs - len(pv))
            challenger = DuplexChallenger()
            pk.vk.observe_into(challenger)
            proofs.append(self.shard_prover.prove_shard(pk, traces, pv, challenger))
        # public_values are the HALTING shard's padded PV vector (exit code,
        # final pc/clk, global digest); earlier shards' PVs live on their
        # shard proofs. Program-level outputs come from execute().output.
        return SP1ProofWithPublicValues(
            shard_proofs=proofs, public_values=proofs[-1].public_values
        )

    def _prove_compressed(self, pk, stdin):
        """core shards -> normalize -> compose tree -> ONE proof."""
        from .compressed import CompressedPipeline

        core = self._prove_core(pk, stdin)
        if self._pipeline is None:
            self._pipeline = CompressedPipeline(
                self.machine, self.config, fri=self.recursion_fri
            )
        proof = self._pipeline.prove(pk.vk, core.shard_proofs)
        # pin the session's vk-map root: later verifies reject proofs
        # built under any other program set
        self.vk_map_root = proof.vk_map_root
        return proof

    def _prove_shrink(self, pk, stdin) -> "SP1ShrinkProof":
        """compressed -> one wrap-grade proof (RS blowup 2^3, 22-bit PoW).

        Reference: crates/prover/src/recursion.rs:285 shrink stage; the
        SDK surfaces it so callers can hand the result straight to the
        wrap circuit without driving recursion modules themselves."""
        from ..recursion import shrink as rshrink

        comp = self._prove_compressed(pk, stdin)
        rp = self._pipeline.last_root_rp
        sprog = rshrink.build_shrink_program(rp.machine, rp.config, comp.root_proof)
        sprover = rshrink.shrink_prover(sprog)
        sproof = sprover.prove(
            rshrink.shrink_witness_stream(rp.vk, comp.root_proof)
        )
        return SP1ShrinkProof(
            proof=sproof,
            vk=sprover.vk,
            public_values=[int(v) for v in sproof.public_values],
            compressed=comp,
            _prover=sprover,
        )

    def _prove_groth16(self, pk, stdin) -> "SP1Groth16Proof":
        """shrink -> BN254 wrap proof + gnark circuit artifacts.

        Matches the reference chain up to the Go boundary: the wrap
        proof's transcript and Merkle commitments live on BN254-Fr for
        the gnark circuit (crates/recursion/gnark-ffi/go/sp1/sp1.go
        Define), and the exported constraint system + witness are
        SEMANTICALLY EVALUATED in-process (recursion/gnark_eval.py — the
        stand-in consumer for gnark's BuildGroth16/ProveGroth16,
        go/sp1/prove_groth16.go:25, which need a Go toolchain this
        environment does not ship). The final SNARK-proving step is the
        one externalized piece; everything it consumes is produced and
        checked here."""
        from ..recursion import gnark as rgnark
        from ..recursion import gnark_eval
        from ..recursion import wrap as rwrap

        shrink = self._prove_shrink(pk, stdin)
        sprover = shrink._prover
        wprog = rwrap.build_wrap_program(
            sprover.machine, sprover.config, shrink.proof
        )
        wprover = rwrap.WrapProver(wprog)
        wstream = rwrap.wrap_witness_stream(sprover.vk, shrink.proof)
        wproof = wprover.prove(wstream)
        constraints = rgnark.export_constraints(wprog)
        witness = rgnark.export_witness(wprog, wstream)
        gnark_eval.evaluate(constraints, witness)  # raises on mismatch
        return SP1Groth16Proof(
            wrap_proof=wproof,
            wrap_vk=wprover.vk,
            constraints=constraints,
            witness=witness,
            public_values=shrink.public_values,
            shrink=shrink,
            _prover=wprover,
        )

    def verify(self, proof, vk) -> bool:
        from ..prover import multi

        if isinstance(proof, ProveRequest):
            proof = proof.core()
        mode = getattr(proof, "mode", "core")
        if mode == "compressed":
            from .compressed import verify_compressed

            return verify_compressed(
                proof, vk, self.recursion_fri,
                expected_root=self.vk_map_root,
            )
        if mode == "shrink":
            return (
                proof._prover.verify(proof.proof)
                and self.verify(proof.compressed, vk)
            )
        if mode == "groth16":
            from ..recursion import gnark_eval

            try:
                gnark_eval.evaluate(proof.constraints, proof.witness)
            except gnark_eval.GnarkEvalError:
                return False
            return (
                proof._prover.verify(proof.wrap_proof)
                and self.verify(proof.shrink, vk)
            )
        return multi.verify_program(self.shard_verifier, vk, proof.shard_proofs)


class ProveRequest:
    """Deferred proof request (reference: CpuProveBuilder,
    crates/sdk/src/cpu/prove.rs). `.core()` / `.compressed()` run the
    pipeline; plain attribute access runs core mode lazily for
    backward compatibility."""

    def __init__(self, prover, pk, stdin):
        self._prover = prover
        self._pk = pk
        self._stdin = stdin
        self._core = None

    def core(self) -> SP1ProofWithPublicValues:
        if self._core is None:
            self._core = self._prover._prove_core(self._pk, self._stdin)
        return self._core

    def compressed(self):
        return self._prover._prove_compressed(self._pk, self._stdin)

    def shrink(self):
        return self._prover._prove_shrink(self._pk, self._stdin)

    def groth16(self):
        return self._prover._prove_groth16(self._pk, self._stdin)

    @property
    def shard_proofs(self):
        return self.core().shard_proofs

    @property
    def public_values(self):
        return self.core().public_values

    @property
    def mode(self):
        return "core"


class _Builder:
    def __init__(self):
        self._kind = "cpu"
        self._kwargs = {}

    def cpu(self, **kwargs):
        self._kind = "cpu"
        self._kwargs = kwargs
        return self

    def mock(self):
        self._kind = "mock"
        return self

    def build(self):
        if self._kind == "mock":
            return MockProver()
        return CpuProver(**self._kwargs)


class MockProver(CpuProver):
    """Executes and fakes proofs (reference: crates/sdk MockProver).

    Uses a small toy word model — no real proof is ever produced, so the
    production parameters would only slow setup down.
    """

    def __init__(self):
        from ..riscv.machine import WordSpec

        super().__init__(word_spec=WordSpec(limb_bits=8), max_log_row_count=10)

    def prove(self, pk, stdin=None):
        res = native.execute(pk.program, inputs=stdin or [])
        return SP1ProofWithPublicValues(shard_proofs=[], public_values=[], mode="mock")

    def verify(self, proof, vk) -> bool:
        return proof.mode == "mock"


class ProverClient:
    @staticmethod
    def builder() -> _Builder:
        return _Builder()

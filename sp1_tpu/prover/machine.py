"""Machine-level shard prover and verifier, TPU-native.

Ties together trace commitment (jagged PCS), the LogUp GKR interaction
argument, the zerocheck constraint sumcheck, and the PCS opening proof
(reference: crates/hypercube/src/prover/shard.rs `prove_shard_with_data`,
crates/hypercube/src/verifier/shard.rs `verify_shard`).

A `Machine` is an ordered set of chips (sorted by name, mirroring the
reference's BTreeSet ordering) plus the public-values constraint hook.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

import jax.numpy as jnp

from ..field import extension as ext
from ..field import koalabear as kb
from ..iop import sumcheck as sc
from ..iop.challenger import DuplexChallenger
from ..ops import mle as mle_ops
from ..pcs import basefold, jagged
from ..utils import timing
from ..pcs.jagged import JaggedConfig, full_geq_host, point_from_usize


def _commit_remat_enabled(mlrc: int) -> bool:
    """Gate for commit-data offload/recompute (SP1_TPU_COMMIT_REMAT).

    "auto" (default): on only for accelerator backends at shard shapes
    where the codewords + GKR layer tree exceed a single chip's HBM
    (mlrc >= 17); at small shapes the re-encode would cost more latency
    than the memory is worth. "1"/"0" force."""
    import os

    v = os.environ.get("SP1_TPU_COMMIT_REMAT", "auto")
    if v == "auto":
        import jax

        return mlrc >= 17 and jax.default_backend() != "cpu"
    return v not in ("0", "false", "")
from . import logup_gkr as gkr
from . import zerocheck as zc

E4 = ext.npext4


def _to_monty_np(x):
    return ((np.asarray(x, np.uint64) << 32) % kb.P).astype(np.uint32)


class Machine:
    """An ordered collection of chips + public-values hook."""

    def __init__(self, chips: list, num_pv_elts: int = 0, max_num_pvs: int = 187):
        self.chips = sorted(chips, key=lambda c: c.name)
        self.num_pv_elts_ = num_pv_elts
        self.max_num_pvs = max_num_pvs

    def chip(self, name: str):
        for c in self.chips:
            if c.name == name:
                return c
        return None

    def num_pv_elts(self) -> int:
        return self.num_pv_elts_

    def max_pv_interaction_arity(self) -> int:
        """Max values+1 over interactions appearing in eval_public_values."""
        return 1

    def eval_public_values(self, public_values, challenge, alpha, betas):
        """Returns (constraints_ok, local_interaction_digest).

        Default: no public-value constraints, zero digest (balanced
        interactions). Reference: LogUpGkrVerifier::verify_public_values.
        """
        return True, np.zeros(4, np.uint32)

    def pv_digest_spec(self):
        """Declarative form of eval_public_values for external verifiers:
        (boolean_pv_indices, [(kind, [pv_index, ...], sign)]) where the
        digest is sum of sign * 1/fingerprint(kind, pv values). The base
        machine has no public-value interactions."""
        return [], []


@dataclass
class MachineVerifyingKey:
    pc_start: np.ndarray  # (3,) canonical (reference uses a multi-limb pc)
    initial_global_cumulative_sum: np.ndarray  # (14,) canonical septic (x, y)
    preprocessed_commit: np.ndarray  # (8,) canonical digest
    enable_untrusted_programs: int = 0

    def observe_into(self, challenger: DuplexChallenger):
        """Reference: crates/hypercube/src/verifier/config.rs:97."""
        challenger.observe_digest(self.preprocessed_commit)
        challenger.observe_slice(self.pc_start)
        challenger.observe_slice(self.initial_global_cumulative_sum[:7])
        challenger.observe_slice(self.initial_global_cumulative_sum[7:])
        challenger.observe(self.enable_untrusted_programs)
        challenger.observe_slice(np.zeros(6, np.uint32))


@dataclass
class ProvingKey:
    vk: MachineVerifyingKey
    preprocessed_data: object  # JaggedProverData or None
    preprocessed_traces: dict  # name -> (2^mlrc, Wp) monty jnp
    preprocessed_heights: dict


@dataclass
class ChipOpenedValues:
    preprocessed: np.ndarray  # (Wp, 4)
    main: np.ndarray  # (W, 4)
    degree: np.ndarray  # (mlrc+1,) bits


@dataclass
class ShardProof:
    public_values: list
    main_commitment: np.ndarray
    logup_gkr_proof: gkr.LogupGkrProof
    zerocheck_proof: sc.PartialSumcheckProof
    opened_values: dict  # name -> ChipOpenedValues (chip order)
    evaluation_proof: jagged.JaggedPcsProof
    global_gkr_proof: object = None  # LogupGkrProof for the global scope


def global_chips_of(machine, chips):
    return [
        c
        for c in chips
        if any(i.scope == "global" for i in c.sends() + c.receives())
    ]


class _BindingChip:
    """Constraint-free chip mirror used for the zerocheck polys that bind
    the global GKR's trace openings to the zerocheck final point.

    Instances are cached per wrapped chip (`of`) so the jit round kernels
    memoized on the mirror survive across prove calls.
    """

    def __init__(self, chip):
        self.name = chip.name + "#global"
        self.width = chip.width
        self.preprocessed_width = chip.preprocessed_width

    @staticmethod
    def of(chip) -> "_BindingChip":
        mirror = getattr(chip, "_binding_mirror", None)
        if mirror is None:
            mirror = _BindingChip(chip)
            try:
                chip._binding_mirror = mirror
            except AttributeError:
                pass
        return mirror

    def eval(self, f):
        pass


class ShardProver:
    def __init__(self, machine: Machine, config: JaggedConfig, tcs=None):
        self.machine = machine
        self.config = config
        # Optional outer tensor-commitment scheme (wrap stage: BN254
        # Poseidon2 Merkle + MultiField32 transcript; pcs/outer_merkle.py)
        self.tcs = tcs

    # -- setup --------------------------------------------------------------
    def setup(self, pc_start=None, preprocessed_traces: dict | None = None) -> ProvingKey:
        """Commit the preprocessed traces of all chips that have them."""
        mlrc = self.config.max_log_row_count
        preprocessed_traces = preprocessed_traces or {}
        prep_mles, prep_heights, names = [], {}, []
        for chip in self.machine.chips:
            if chip.preprocessed_width > 0:
                trace, h = preprocessed_traces[chip.name]
                assert int(trace.shape[0]) == 1 << mlrc
                prep_mles.append(trace)
                prep_heights[chip.name] = h
                names.append(chip.name)
        if prep_mles:
            heights = [prep_heights[n] for n in names]
            commit, data = jagged.commit_multilinears(
                prep_mles, heights, self.config, tcs=self.tcs
            )
        else:
            # Commit a single dummy zero table so the preprocessed round exists
            # (the reference machine always has preprocessed chips).
            dummy = jnp.zeros((1 << mlrc, 1), jnp.uint32)
            commit, data = jagged.commit_multilinears(
                [dummy], [1], self.config, tcs=self.tcs
            )
            prep_heights["__dummy__"] = 1
        vk = MachineVerifyingKey(
            pc_start=np.asarray(pc_start if pc_start is not None else [0, 0, 0], np.uint32),
            initial_global_cumulative_sum=np.zeros(14, np.uint32),
            preprocessed_commit=commit,
        )
        traces = {n: preprocessed_traces[n][0] for n in names}
        return ProvingKey(
            vk=vk,
            preprocessed_data=data,
            preprocessed_traces=traces,
            preprocessed_heights=prep_heights,
        )

    # -- prove --------------------------------------------------------------
    def prove_shard(
        self,
        pk: ProvingKey,
        traces: dict,  # name -> ((2^mlrc, W) monty jnp, height)
        public_values: list,
        challenger: DuplexChallenger,
        global_ctx=None,  # (alpha_g, betas_g) shared across shards
    ) -> ShardProof:
        machine = self.machine
        mlrc = self.config.max_log_row_count
        chips = [c for c in machine.chips if c.name in traces]
        heights = {n: traces[n][1] for n in traces}
        trace_mles = {n: traces[n][0] for n in traces}

        public_values = list(public_values) + [0] * (
            machine.max_num_pvs - len(public_values)
        )

        challenger.observe_slice(np.asarray(public_values, np.uint32))

        # Commit main traces (in chip order).
        main_mles = [trace_mles[c.name] for c in chips]
        main_heights = [heights[c.name] for c in chips]
        with timing.span("commit"):
            main_commit, main_data = jagged.commit_multilinears(
                main_mles, main_heights, self.config, tcs=self.tcs
            )
        # HBM relief at large shard shapes: the commit's codewords +
        # Merkle tree (log_blowup x the trace data) are dead weight until
        # the opening phase, while GKR's layer tree is the peak consumer.
        # Drop them now and re-derive (bit-identically) before opening.
        remat = self.tcs is None and _commit_remat_enabled(mlrc)
        if remat:
            basefold.offload_prover_data(main_data.stacked_data.basefold_data)
        challenger.observe_digest(main_commit)
        challenger.observe(len(chips))
        for c in chips:
            challenger.observe(heights[c.name])
            challenger.observe(len(c.name))
            for b in c.name.encode():
                challenger.observe(b)

        with timing.span("gkr"):
            logup_proof = gkr.prove_logup_gkr(
                machine,
                chips,
                pk.preprocessed_traces,
                trace_mles,
                heights,
                public_values,
                challenger,
            )

        # Global (cross-shard) LogUp instance over the global-scope
        # interactions; challenges are shared across shards when provided.
        g_chips = global_chips_of(machine, chips)
        global_proof = None
        if g_chips:
            if global_ctx is None:
                dim = gkr.gkr_beta_seed_dim(machine, g_chips, "global")
                alpha_g = challenger.sample_ext()
                seed_g = challenger.sample_ext_vec(dim)
                betas_g = mle_ops.host.partial_lagrange_ext(seed_g)
            else:
                alpha_g, betas_g = global_ctx
            with timing.span("global_gkr"):
                global_proof = gkr.prove_logup_gkr(
                    machine,
                    g_chips,
                    pk.preprocessed_traces,
                    {c.name: trace_mles[c.name] for c in g_chips},
                    {c.name: heights[c.name] for c in g_chips},
                    public_values,
                    challenger,
                    scope="global",
                    global_challenges=(alpha_g, betas_g),
                )

        batching_challenge = challenger.sample_ext()  # alpha for constraints
        gkr_batch_challenge = challenger.sample_ext()
        gkr2_batch_challenge = challenger.sample_ext() if g_chips else None

        # Zerocheck.
        from ..utils import dfs

        use_dfs = dfs.enabled() and getattr(challenger, "device_traceable", False)
        zeta = logup_proof.logup_evaluations.point
        polys, claims = [], []
        for chip in chips:
            opening = logup_proof.logup_evaluations.chip_openings[chip.name]
            poly = zc.make_zerocheck_poly(
                chip,
                trace_mles[chip.name],
                pk.preprocessed_traces.get(chip.name),
                heights[chip.name],
                zeta,
                batching_challenge,
                gkr_batch_challenge,
                public_values,
                force_device=use_dfs,
            )
            polys.append(poly)
            # claim: gkrc-batched openings (main then preprocessed)
            claim = np.zeros(4, np.uint32)
            p = gkr_batch_challenge
            evals = [
                opening.main_trace_evaluations[i] for i in range(chip.width)
            ]
            if opening.preprocessed_trace_evaluations is not None:
                evals += [
                    opening.preprocessed_trace_evaluations[i]
                    for i in range(chip.preprocessed_width)
                ]
            for e in evals:
                claim = E4.add(claim, E4.mul(e, p))
                p = E4.mul(p, gkr_batch_challenge)
            claims.append(claim)

        # Binding polys: tie the global GKR's trace openings (at its own
        # point zeta2) to the zerocheck final point.
        if g_chips:
            zeta2 = global_proof.logup_evaluations.point
            for chip in g_chips:
                opening2 = global_proof.logup_evaluations.chip_openings[chip.name]
                bpoly = zc.make_zerocheck_poly(
                    _BindingChip.of(chip),
                    trace_mles[chip.name],
                    pk.preprocessed_traces.get(chip.name),
                    heights[chip.name],
                    zeta2,
                    batching_challenge,
                    gkr2_batch_challenge,
                    public_values,
                    force_device=use_dfs,
                )
                polys.append(bpoly)
                claim2 = np.zeros(4, np.uint32)
                pgk = gkr2_batch_challenge
                evals2 = [
                    opening2.main_trace_evaluations[i] for i in range(chip.width)
                ]
                if opening2.preprocessed_trace_evaluations is not None:
                    evals2 += [
                        opening2.preprocessed_trace_evaluations[i]
                        for i in range(chip.preprocessed_width)
                    ]
                for e in evals2:
                    claim2 = E4.add(claim2, E4.mul(e, pgk))
                    pgk = E4.mul(pgk, gkr2_batch_challenge)
                claims.append(claim2)

        lam = challenger.sample_ext()
        with timing.span("zerocheck"):
            if use_dfs and not any(getattr(p, "host", False) for p in polys):
                from ..iop import dsumcheck as dsc

                zerocheck_proof, component_evals = (
                    dsc.reduce_sumcheck_to_evaluation_device(
                        polys, challenger, claims, lam
                    )
                )
            else:
                zerocheck_proof, component_evals = sc.reduce_sumcheck_to_evaluation(
                    polys, challenger, claims, lam
                )
        component_evals = component_evals[: len(chips)]

        challenger.observe(len(chips))
        opened_values = {}
        for chip, evals in zip(chips, component_evals):
            prep_evals = np.stack(evals[: chip.preprocessed_width]) if chip.preprocessed_width else np.zeros((0, 4), np.uint32)
            main_evals = np.stack(evals[chip.preprocessed_width :])
            challenger.observe_variable_length_slice(prep_evals.reshape(-1))
            challenger.observe_variable_length_slice(main_evals.reshape(-1))
            opened_values[chip.name] = ChipOpenedValues(
                preprocessed=prep_evals,
                main=main_evals,
                degree=point_from_usize(heights[chip.name], mlrc + 1),
            )

        # PCS opening proof.
        eval_point = zerocheck_proof.point
        prep_claims = [
            opened_values[c.name].preprocessed
            for c in chips
            if c.preprocessed_width > 0
        ]
        if not prep_claims:
            prep_claims = [np.zeros((1, 4), np.uint32)]  # dummy table
        main_claims = [opened_values[c.name].main for c in chips]
        if remat:
            with timing.span("recommit"):
                basefold.rematerialize_prover_data(
                    main_data.stacked_data.basefold_data, self.config.fri
                )
        with timing.span("opening"):
            evaluation_proof = jagged.prove_trusted_evaluations(
                eval_point,
                [prep_claims, main_claims],
                [pk.preprocessed_data, main_data],
                self.config,
                challenger,
                tcs=self.tcs,
            )

        return ShardProof(
            public_values=public_values,
            main_commitment=main_commit,
            logup_gkr_proof=logup_proof,
            zerocheck_proof=zerocheck_proof,
            opened_values=opened_values,
            evaluation_proof=evaluation_proof,
            global_gkr_proof=global_proof,
        )


class ShardVerifier:
    def __init__(self, machine: Machine, config: JaggedConfig, tcs=None):
        self.machine = machine
        self.config = config
        self.tcs = tcs

    def verify_shard(
        self,
        vk: MachineVerifyingKey,
        proof: ShardProof,
        challenger: DuplexChallenger,
        global_ctx=None,
    ) -> bool:
        machine = self.machine
        mlrc = self.config.max_log_row_count
        public_values = proof.public_values
        if len(public_values) != machine.max_num_pvs:
            return False
        if any(int(v) != 0 for v in public_values[machine.num_pv_elts():]):
            return False

        chip_names = list(proof.opened_values.keys())
        chips = [c for c in machine.chips if c.name in chip_names]
        if len(chips) != len(chip_names) or not chips:
            return False
        if [c.name for c in chips] != chip_names:
            return False

        challenger.observe_slice(np.asarray(public_values, np.uint32))
        challenger.observe_digest(proof.main_commitment)
        challenger.observe(len(chips))
        degrees = {}
        for name, ov in proof.opened_values.items():
            if ov.degree.shape[0] != mlrc + 1 or ov.degree.shape[0] >= 30:
                return False
            if any(int(b) not in (0, 1) for b in ov.degree):
                return False
            # height <= 2^mlrc: if top bit set, all others must be zero
            if int(ov.degree[0]) == 1 and any(int(b) for b in ov.degree[1:]):
                return False
            height = 0
            for b in ov.degree:
                height = int(b) + 2 * height
            degrees[name] = ov.degree
            challenger.observe(height)
            challenger.observe(len(name))
            for b in name.encode():
                challenger.observe(b)

        # GKR verification.
        if len(proof.logup_gkr_proof.logup_evaluations.chip_openings) != len(chips):
            return False
        if not gkr.verify_logup_gkr(
            machine,
            chips,
            degrees,
            mlrc,
            proof.logup_gkr_proof,
            public_values,
            challenger,
        ):
            return False

        # Global (cross-shard) GKR verification.
        g_chips = global_chips_of(machine, chips)
        if g_chips:
            if proof.global_gkr_proof is None:
                return False
            if global_ctx is None:
                dim = gkr.gkr_beta_seed_dim(machine, g_chips, "global")
                alpha_g = challenger.sample_ext()
                seed_g = challenger.sample_ext_vec(dim)
                betas_g = mle_ops.host.partial_lagrange_ext(seed_g)
            else:
                alpha_g, betas_g = global_ctx
            g_degrees = {c.name: degrees[c.name] for c in g_chips}
            if not gkr.verify_logup_gkr(
                machine,
                g_chips,
                g_degrees,
                mlrc,
                proof.global_gkr_proof,
                public_values,
                challenger,
                scope="global",
                global_challenges=(alpha_g, betas_g),
            ):
                return False
        elif proof.global_gkr_proof is not None:
            return False

        # Zerocheck verification.
        if not self._verify_zerocheck(
            chips, proof, public_values, challenger
        ):
            return False

        # PCS opening proof. First bind the two height declarations
        # together: the degree bits in opened_values (which drove the
        # GKR/zerocheck padded-row adjustments above) must equal the row
        # counts in the jagged layout metadata (which drive the PCS
        # semantics) — the prover must not control them independently
        # (reference: verifier derives jagged params from opened degrees,
        # crates/hypercube/src/verifier/shard.rs).
        rc_cc = proof.evaluation_proof.row_counts_and_column_counts
        if len(rc_cc) != 2:
            return False
        main_rc = rc_cc[1]
        # main round layout = one (rows, cols) per chip + 2 padding tables
        if len(main_rc) != len(chips) + 2:
            return False
        for i, chip in enumerate(chips):
            height = 0
            for b in proof.opened_values[chip.name].degree:
                height = int(b) + 2 * height
            if int(main_rc[i][0]) != height or int(main_rc[i][1]) != chip.width:
                return False

        prep_claims = [
            proof.opened_values[c.name].preprocessed
            for c in chips
            if c.preprocessed_width > 0
        ]
        if not prep_claims:
            prep_claims = [np.zeros((1, 4), np.uint32)]
        main_claims = [proof.opened_values[c.name].main for c in chips]
        return jagged.verify_trusted_evaluations(
            [vk.preprocessed_commit, proof.main_commitment],
            proof.zerocheck_proof.point,
            [prep_claims, main_claims],
            proof.evaluation_proof,
            self.config,
            challenger,
            tcs=self.tcs,
        )

    def _verify_zerocheck(self, chips, proof, public_values, challenger) -> bool:
        """Reference: crates/hypercube/src/verifier/shard.rs:288."""
        mlrc = self.config.max_log_row_count
        gkr_evals = proof.logup_gkr_proof.logup_evaluations
        g_chips = global_chips_of(self.machine, chips)
        alpha = challenger.sample_ext()
        gkr_batch_challenge = challenger.sample_ext()
        gkr2_batch_challenge = challenger.sample_ext() if g_chips else None
        lam = challenger.sample_ext()

        if gkr_evals.point.shape[0] != mlrc:
            return False
        if proof.zerocheck_proof.point.shape[0] != mlrc:
            return False
        zerocheck_eq_val = mle_ops.host.eq_points(
            gkr_evals.point, proof.zerocheck_proof.point
        )

        rlc_eval = np.zeros(4, np.uint32)
        for chip in chips:
            ov = proof.opened_values[chip.name]
            if ov.preprocessed.shape[0] != chip.preprocessed_width:
                return False
            if ov.main.shape[0] != chip.width:
                return False
            # add_dimension prepends a zero at the FRONT (MSB) — reference
            # Point::add_dimension semantics.
            point_extended = np.concatenate(
                [np.zeros((1, 4), np.uint32), proof.zerocheck_proof.point]
            )
            geq_val = full_geq_host(ov.degree, point_extended)
            adj = zc.padded_row_adjustment_host(chip, public_values, alpha)
            main_rows = [ov.main[i] for i in range(chip.width)]
            prep_rows = [ov.preprocessed[i] for i in range(chip.preprocessed_width)]
            constraint_eval = zc.eval_constraints_host(
                chip, prep_rows, main_rows, public_values, alpha
            )
            constraint_eval = E4.sub(constraint_eval, E4.mul(adj, geq_val))
            batch = np.zeros(4, np.uint32)
            p = gkr_batch_challenge
            for e in main_rows + prep_rows:
                batch = E4.add(batch, E4.mul(e, p))
                p = E4.mul(p, gkr_batch_challenge)
            chip_term = E4.mul(zerocheck_eq_val, E4.add(constraint_eval, batch))
            rlc_eval = E4.add(E4.mul(rlc_eval, lam), chip_term)

        # Binding terms for the global GKR openings at zeta2.
        if g_chips:
            zeta2 = proof.global_gkr_proof.logup_evaluations.point
            eq2_val = mle_ops.host.eq_points(zeta2, proof.zerocheck_proof.point)
            for chip in g_chips:
                ov = proof.opened_values[chip.name]
                batch2 = np.zeros(4, np.uint32)
                pgk = gkr2_batch_challenge
                rows2 = [ov.main[i] for i in range(chip.width)] + [
                    ov.preprocessed[i] for i in range(chip.preprocessed_width)
                ]
                for e in rows2:
                    batch2 = E4.add(batch2, E4.mul(e, pgk))
                    pgk = E4.mul(pgk, gkr2_batch_challenge)
                rlc_eval = E4.add(E4.mul(rlc_eval, lam), E4.mul(eq2_val, batch2))

        if not np.array_equal(proof.zerocheck_proof.eval, rlc_eval):
            return False

        # claimed sum must equal the lambda-Horner of the gkrc-batched GKR evals
        mods = []
        for chip in chips:
            opening = gkr_evals.chip_openings[chip.name]
            evals = [opening.main_trace_evaluations[i] for i in range(chip.width)]
            if opening.preprocessed_trace_evaluations is not None:
                evals += [
                    opening.preprocessed_trace_evaluations[i]
                    for i in range(chip.preprocessed_width)
                ]
            m = np.zeros(4, np.uint32)
            p = gkr_batch_challenge
            for e in evals:
                m = E4.add(m, E4.mul(e, p))
                p = E4.mul(p, gkr_batch_challenge)
            mods.append(m)
        if g_chips:
            ge = proof.global_gkr_proof.logup_evaluations
            for chip in g_chips:
                opening2 = ge.chip_openings[chip.name]
                evals2 = [
                    opening2.main_trace_evaluations[i] for i in range(chip.width)
                ]
                if opening2.preprocessed_trace_evaluations is not None:
                    evals2 += [
                        opening2.preprocessed_trace_evaluations[i]
                        for i in range(chip.preprocessed_width)
                    ]
                m2 = np.zeros(4, np.uint32)
                pgk = gkr2_batch_challenge
                for e in evals2:
                    m2 = E4.add(m2, E4.mul(e, pgk))
                    pgk = E4.mul(pgk, gkr2_batch_challenge)
                mods.append(m2)
        expected_claim = np.zeros(4, np.uint32)
        for m in mods:
            expected_claim = E4.add(E4.mul(expected_claim, lam), m)
        if not np.array_equal(proof.zerocheck_proof.claimed_sum, expected_claim):
            return False

        if not sc.partially_verify_sumcheck_proof(
            proof.zerocheck_proof, challenger, mlrc, zc.MAX_CONSTRAINT_DEGREE + 1
        ):
            return False

        challenger.observe(len(chips))
        for chip in chips:
            ov = proof.opened_values[chip.name]
            challenger.observe_variable_length_slice(ov.preprocessed.reshape(-1))
            challenger.observe_variable_length_slice(ov.main.reshape(-1))
        return True


def debug_constraints(machine, chips, preprocessed, traces, heights, public_values):
    """Row-by-row constraint check on real traces (host, canonical).

    Returns list of (chip, row) violations. Reference:
    crates/hypercube/src/debug.rs:27.
    """
    from ..air.builder import NpOps

    violations = []
    alpha = NpOps.one()
    for chip in chips:
        if chip.name not in traces:
            continue  # optional chip (e.g. precompile with no calls)
        mt = np.asarray(
            kb.from_monty(jnp.asarray(traces[chip.name]).reshape(-1)), np.uint32
        ).reshape(traces[chip.name].shape)
        pt = None
        if chip.name in preprocessed:
            pt = np.asarray(
                kb.from_monty(jnp.asarray(preprocessed[chip.name]).reshape(-1)),
                np.uint32,
            ).reshape(preprocessed[chip.name].shape)
        for r in range(heights[chip.name]):
            main_row = [NpOps.const(int(mt[r, i])) for i in range(chip.width)]
            prep_row = (
                [NpOps.const(int(pt[r, i])) for i in range(chip.preprocessed_width)]
                if pt is not None
                else []
            )
            acc = zc.eval_constraints_host(
                chip, prep_row, main_row, public_values, alpha
            )
            if np.any(acc != 0):
                violations.append((chip.name, r))
    return violations

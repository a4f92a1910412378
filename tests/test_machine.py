"""End-to-end shard prove/verify on a toy 2-chip machine with interactions.

AddChip sends (value) lookups into a preprocessed RangeChip table; the
LogUp GKR argument must balance them, the zerocheck must accept the
constraints (degrees 1..3), and the jagged PCS must verify the openings.
"""

import numpy as np

import jax.numpy as jnp

from sp1_tpu.air.builder import Affine, Chip, Interaction, KIND_RANGE, main_col, prep_col
from sp1_tpu.field import koalabear as kb
from sp1_tpu.iop.challenger import DuplexChallenger
from sp1_tpu.pcs.basefold import FriConfig
from sp1_tpu.pcs.jagged import JaggedConfig
from sp1_tpu.prover import machine as mm

MLRC = 3
CONFIG = JaggedConfig(
    FriConfig(log_blowup=1, num_queries=5, proof_of_work_bits=2),
    log_stacking_height=4,
    max_log_row_count=MLRC,
)


def to_monty(x):
    return ((np.asarray(x, np.uint64) << 32) % kb.P).astype(np.uint32)


class AddChip(Chip):
    name = "Add"
    width = 4  # a, b, c, mult

    def eval(self, f):
        a, b, c, mult = f.main
        f.assert_eq(f.ops.add(a, b), c)  # degree 1
        f.assert_bool(mult)  # degree 2
        # degree-3: mult^3 == mult (true for boolean)
        f.assert_eq(f.ops.mul(f.ops.mul(mult, mult), mult), mult)

    def sends(self):
        return [
            Interaction(
                values=(Affine.col(main_col(2)),),
                multiplicity=Affine.col(main_col(3)),
                kind=KIND_RANGE,
            )
        ]


class RangeChip(Chip):
    name = "Range"
    width = 1  # multiplicity
    preprocessed_width = 1  # value

    def eval(self, f):
        pass  # no constraints; preprocessed values are fixed at setup

    def receives(self):
        return [
            Interaction(
                values=(Affine.col(prep_col(0)),),
                multiplicity=Affine.col(main_col(0)),
                kind=KIND_RANGE,
            )
        ]


def build_machine():
    return mm.Machine([AddChip(), RangeChip()], num_pv_elts=0)


def build_traces():
    n = 1 << MLRC
    # Add rows: (a, b, c=a+b, mult=1); c values in 0..3
    add_rows = [(1, 2, 3, 1), (0, 1, 1, 1), (2, 1, 3, 1), (0, 0, 0, 1), (1, 1, 2, 1)]
    add = np.zeros((n, 4), np.uint32)
    for r, row in enumerate(add_rows):
        add[r] = row
    counts = {v: 0 for v in range(4)}
    for _, _, c, m in add_rows:
        counts[c] += m
    # Range table: preprocessed value column 0..3; main multiplicity
    prep = np.zeros((n, 1), np.uint32)
    rng_main = np.zeros((n, 1), np.uint32)
    for v in range(4):
        prep[v, 0] = v
        rng_main[v, 0] = counts[v]
    return (
        {"Add": (jnp.asarray(to_monty(add)), len(add_rows)),
         "Range": (jnp.asarray(to_monty(rng_main)), 4)},
        {"Range": (jnp.asarray(to_monty(prep)), 4)},
    )


class TestToyMachine:
    def test_debug_constraints_clean(self):
        machine = build_machine()
        traces, prep = build_traces()
        violations = mm.debug_constraints(
            machine,
            machine.chips,
            {"Range": prep["Range"][0]},
            {n: t for n, (t, _) in traces.items()},
            {n: h for n, (_, h) in traces.items()},
            [0] * 187,
        )
        assert violations == []

    def test_prove_verify_roundtrip(self):
        machine = build_machine()
        traces, prep = build_traces()
        prover = mm.ShardProver(machine, CONFIG)
        pk = prover.setup(preprocessed_traces=prep)
        pch = DuplexChallenger()
        pk.vk.observe_into(pch)
        proof = prover.prove_shard(pk, traces, [], pch)
        verifier = mm.ShardVerifier(machine, CONFIG)
        vch = DuplexChallenger()
        pk.vk.observe_into(vch)
        assert verifier.verify_shard(pk.vk, proof, vch)

    def test_commit_remat_transcript_identical(self, monkeypatch):
        """Offload/recompute of commit data must not change the proof: the
        re-derived codewords + tree are bit-identical, so the whole
        transcript (and thus every challenge) matches the resident path."""
        machine = build_machine()
        traces, prep = build_traces()
        prover = mm.ShardProver(machine, CONFIG)
        pk = prover.setup(preprocessed_traces=prep)

        def run():
            ch = DuplexChallenger()
            pk.vk.observe_into(ch)
            return prover.prove_shard(pk, traces, [], ch)

        monkeypatch.setenv("SP1_TPU_COMMIT_REMAT", "0")
        base = run()
        monkeypatch.setenv("SP1_TPU_COMMIT_REMAT", "1")
        remat = run()
        assert np.array_equal(base.main_commitment, remat.main_commitment)
        assert np.array_equal(
            base.zerocheck_proof.point, remat.zerocheck_proof.point
        )
        bq = base.evaluation_proof.pcs_proof.basefold_proof.query_openings
        rq = remat.evaluation_proof.pcs_proof.basefold_proof.query_openings
        assert len(bq) == len(rq)
        verifier = mm.ShardVerifier(machine, CONFIG)
        vch = DuplexChallenger()
        pk.vk.observe_into(vch)
        assert verifier.verify_shard(pk.vk, remat, vch)

    def test_unbalanced_interactions_rejected(self):
        machine = build_machine()
        traces, prep = build_traces()
        # tamper: change one multiplicity so lookups don't balance
        bad = np.asarray(traces["Add"][0]).copy()
        bad[0, 3] = kb.to_monty_i(0)  # zero out a send multiplicity
        traces["Add"] = (jnp.asarray(bad), traces["Add"][1])
        prover = mm.ShardProver(machine, CONFIG)
        pk = prover.setup(preprocessed_traces=prep)
        pch = DuplexChallenger()
        pk.vk.observe_into(pch)
        proof = prover.prove_shard(pk, traces, [], pch)
        verifier = mm.ShardVerifier(machine, CONFIG)
        vch = DuplexChallenger()
        pk.vk.observe_into(vch)
        assert not verifier.verify_shard(pk.vk, proof, vch)

    def test_constraint_violation_rejected(self):
        machine = build_machine()
        traces, prep = build_traces()
        bad = np.asarray(traces["Add"][0]).copy()
        bad[1, 2] = kb.to_monty_i(5)  # c != a + b — also unbalances lookups
        traces["Add"] = (jnp.asarray(bad), traces["Add"][1])
        # debug checker catches it
        violations = mm.debug_constraints(
            machine,
            machine.chips,
            {"Range": prep["Range"][0]},
            {n: t for n, (t, _) in traces.items()},
            {n: h for n, (_, h) in traces.items()},
            [0] * 187,
        )
        assert ("Add", 1) in violations
        prover = mm.ShardProver(machine, CONFIG)
        pk = prover.setup(preprocessed_traces=prep)
        pch = DuplexChallenger()
        pk.vk.observe_into(pch)
        proof = prover.prove_shard(pk, traces, [], pch)
        verifier = mm.ShardVerifier(machine, CONFIG)
        vch = DuplexChallenger()
        pk.vk.observe_into(vch)
        assert not verifier.verify_shard(pk.vk, proof, vch)

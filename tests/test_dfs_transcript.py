"""Device-Fiat-Shamir (no mesh) vs host transcript equality.

The DFS prover path — mega-fused GKR rounds, fused BaseFold opening,
fused jagged-eval — must produce BIT-IDENTICAL proofs to the host
orchestrated path (the transcripts are the protocol; reference:
slop/crates/challenger semantics)."""

import os
import pickle
import sys

import pytest

sys.path.insert(0, os.path.dirname(__file__))

from sp1_tpu.iop.challenger import DuplexChallenger
from sp1_tpu.pcs.basefold import FriConfig
from sp1_tpu.pcs.jagged import JaggedConfig
from sp1_tpu.prover import machine as mm
from sp1_tpu.riscv import tracegen
from sp1_tpu.riscv.machine import WordSpec, build_machine
from sp1_tpu.executor import asm, native


def _prove(ws, mlrc, config):
    prog = asm.assemble(asm.FIBONACCI)
    res = native.execute(prog, inputs=[40])
    traces, prep = tracegen.generate_traces(res, prog, 0, ws, mlrc)
    machine = build_machine(ws)
    prover = mm.ShardProver(machine, config)
    pk = prover.setup(preprocessed_traces=prep)
    pv = tracegen.make_public_values(res, 0, ws, traces=traces)
    ch = DuplexChallenger()
    pk.vk.observe_into(ch)
    proof = prover.prove_shard(pk, traces, pv, ch)
    return machine, pk, proof


def _proof_bytes(proof):
    import numpy as np

    def canon(x):
        if isinstance(x, np.ndarray):
            return x.tolist()
        return x

    return pickle.dumps(
        [
            canon(proof.main_commitment),
            [canon(rp.sumcheck_proof.univariate_polys)
             for rp in proof.logup_gkr_proof.round_proofs],
            [canon(rp.sumcheck_proof.claimed_sum)
             for rp in proof.logup_gkr_proof.round_proofs],
            [canon(rp.sumcheck_proof.eval)
             for rp in proof.logup_gkr_proof.round_proofs],
            canon(proof.zerocheck_proof.univariate_polys),
            canon(proof.zerocheck_proof.point),
            canon(proof.evaluation_proof.sumcheck_proof.univariate_polys),
            canon(proof.evaluation_proof.jagged_eval_proof.univariate_polys),
            canon(proof.evaluation_proof.expected_eval),
            canon(
                proof.evaluation_proof.pcs_proof.basefold_proof.univariate_messages
            ),
            [canon(c) for c in
             proof.evaluation_proof.pcs_proof.basefold_proof.fri_commitments],
            canon(proof.evaluation_proof.pcs_proof.basefold_proof.final_poly),
            proof.evaluation_proof.pcs_proof.basefold_proof.pow_witness,
        ]
    )


@pytest.mark.medium
def test_dfs_no_mesh_matches_host_transcript(monkeypatch):
    ws = WordSpec(limb_bits=8)
    mlrc = 9
    config = JaggedConfig(
        FriConfig(log_blowup=1, num_queries=6, proof_of_work_bits=2),
        log_stacking_height=12,
        max_log_row_count=mlrc,
    )
    monkeypatch.setenv("SP1_TPU_DEVICE_FS", "0")
    _, _, host_proof = _prove(ws, mlrc, config)
    monkeypatch.setenv("SP1_TPU_DEVICE_FS", "1")
    machine, pk, dfs_proof = _prove(ws, mlrc, config)
    assert _proof_bytes(host_proof) == _proof_bytes(dfs_proof)
    verifier = mm.ShardVerifier(machine, config)
    vch = DuplexChallenger()
    pk.vk.observe_into(vch)
    assert verifier.verify_shard(pk.vk, dfs_proof, vch)

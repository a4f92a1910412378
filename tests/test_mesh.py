"""Intra-proof multi-chip sharding: prove REAL RISC-V shards under an
8-device mesh (`parallel.mesh.prover_mesh`) and check the proof is
bit-identical to the single-device prover's (sharding is a pure storage/
compute arrangement — the Fiat-Shamir transcript must not change).

This is the TPU-new work axis (SURVEY §2.8.7): the reference has no
intra-proof multi-GPU analog. conftest.py provisions 8 virtual CPU
devices for exactly these paths. The production-FRI limb16 variant runs
in the slow tier."""

import pickle

import numpy as np
import pytest

import jax

from sp1_tpu.executor import asm, native
from sp1_tpu.iop.challenger import DuplexChallenger
from sp1_tpu.parallel import mesh as pm
from sp1_tpu.pcs.basefold import FriConfig
from sp1_tpu.pcs.jagged import JaggedConfig
from sp1_tpu.prover import machine as mm
from sp1_tpu.riscv import tracegen
from sp1_tpu.riscv.machine import WordSpec, build_machine


def _prove(ws, mlrc, config, mesh=None, n_iters=40):
    machine = build_machine(ws)
    prog = asm.assemble(asm.FIBONACCI)
    res = native.execute(prog, inputs=[n_iters])
    traces, prep = tracegen.generate_traces(res, prog, 0, ws, mlrc)
    pv = tracegen.make_public_values(res, 0, ws, traces=traces)
    pv = pv + [0] * (machine.max_num_pvs - len(pv))
    prover = mm.ShardProver(machine, config)
    pk = prover.setup(pc_start=[0, 0, 0], preprocessed_traces=prep)
    ch = DuplexChallenger()
    pk.vk.observe_into(ch)
    if mesh is not None:
        with pm.prover_mesh(mesh):
            proof = prover.prove_shard(pk, traces, pv, ch)
    else:
        proof = prover.prove_shard(pk, traces, pv, ch)
    return machine, config, pk, proof


def _proof_equal(a, b) -> bool:
    """Structural equality via the pickled byte streams (all payloads are
    numpy arrays / plain data, so pickling is deterministic)."""
    return pickle.dumps(a) == pickle.dumps(b)


class TestMeshProve:
    def test_mesh_prove_matches_single_device(self):
        """8-device meshed prove == single-device prove, bit for bit, and
        verifies. Exercises the sharded zerocheck, sharded GKR layer
        sumchecks and the column-sharded commit on the virtual mesh."""
        ws = WordSpec(limb_bits=8)
        mlrc = 9
        config = JaggedConfig(
            FriConfig(log_blowup=1, num_queries=6, proof_of_work_bits=2),
            log_stacking_height=12,
            max_log_row_count=mlrc,
        )
        devs = jax.devices()
        assert len(devs) >= 8, "conftest must provision 8 virtual devices"
        mesh = pm.make_mesh(devs[:8])
        machine, config, pk, meshed = _prove(ws, mlrc, config, mesh=mesh)
        _, _, _, single = _prove(ws, mlrc, config, mesh=None)
        assert _proof_equal(meshed, single), (
            "meshed prove diverged from the single-device transcript"
        )
        verifier = mm.ShardVerifier(machine, config)
        vch = DuplexChallenger()
        pk.vk.observe_into(vch)
        assert verifier.verify_shard(pk.vk, meshed, vch)

    @pytest.mark.medium
    def test_mesh_dfs_prove_matches_host_transcript(self, monkeypatch):
        """Device-Fiat-Shamir + mesh: forcing SP1_TPU_DEVICE_FS=1 routes
        the GKR layer sumchecks through the packed fixed-shape poly
        (sharded over the mesh) and BaseFold through the TraceChallenger;
        the transcript must still match the plain host prover's."""
        ws = WordSpec(limb_bits=8)
        mlrc = 9
        config = JaggedConfig(
            FriConfig(log_blowup=1, num_queries=6, proof_of_work_bits=2),
            log_stacking_height=12,
            max_log_row_count=mlrc,
        )
        monkeypatch.setenv("SP1_TPU_DEVICE_FS", "0")
        _, _, _, single = _prove(ws, mlrc, config, mesh=None)
        monkeypatch.setenv("SP1_TPU_DEVICE_FS", "1")
        mesh = pm.make_mesh(jax.devices()[:8])
        machine, config, pk, meshed = _prove(ws, mlrc, config, mesh=mesh)
        assert _proof_equal(meshed, single), (
            "DFS+mesh prove diverged from the host transcript"
        )
        verifier = mm.ShardVerifier(machine, config)
        vch = DuplexChallenger()
        pk.vk.observe_into(vch)
        assert verifier.verify_shard(pk.vk, meshed, vch)

    @pytest.mark.medium
    def test_mesh_sizes_2_and_4(self):
        """Smaller meshes give the same transcript too."""
        ws = WordSpec(limb_bits=8)
        mlrc = 9
        config = JaggedConfig(
            FriConfig(log_blowup=1, num_queries=4, proof_of_work_bits=1),
            log_stacking_height=12,
            max_log_row_count=mlrc,
        )
        _, _, _, single = _prove(ws, mlrc, config, mesh=None)
        for nd in (2, 4):
            mesh = pm.make_mesh(jax.devices()[:nd])
            _, _, _, meshed = _prove(ws, mlrc, config, mesh=mesh)
            assert _proof_equal(meshed, single), f"mesh size {nd} diverged"


@pytest.mark.slow
class TestMeshProductionShape:
    def test_mesh_prove_limb16_core_fri(self):
        """Production word model + FriConfig.core() under the 8-device
        mesh (VERDICT r3 item 2)."""
        ws = WordSpec(limb_bits=16)
        mlrc = 16
        config = JaggedConfig(
            FriConfig.core(),
            log_stacking_height=min(21, mlrc + 3),
            max_log_row_count=mlrc,
        )
        mesh = pm.make_mesh(jax.devices()[:8])
        machine, config, pk, proof = _prove(
            ws, mlrc, config, mesh=mesh, n_iters=((1 << 12) - 9) // 6
        )
        verifier = mm.ShardVerifier(machine, config)
        vch = DuplexChallenger()
        pk.vk.observe_into(vch)
        assert verifier.verify_shard(pk.vk, proof, vch)

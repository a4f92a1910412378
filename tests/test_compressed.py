"""SDK compressed() mode: multi-shard execution -> ONE recursion proof.

The full pipeline (core shards -> normalize per shape -> riscv compose
tree with pc/clk chaining + septic digest accumulation + vk-map
membership -> root proof) through the public client API only (VERDICT
r4 item 3); the vk-map pin rejection covers item 4's enforcement.
Reference: crates/sdk/src/cpu/prove.rs `.compressed()`,
crates/prover/src/worker/controller/mod.rs.
"""

import copy
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

from sp1_tpu.executor import asm
from sp1_tpu.pcs.basefold import FriConfig
from sp1_tpu.pcs.jagged import JaggedConfig
from sp1_tpu.riscv.machine import WordSpec
from sp1_tpu.sdk.client import ProverClient

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def compressed_session():
    cfg = JaggedConfig(
        FriConfig(log_blowup=1, num_queries=6, proof_of_work_bits=2),
        log_stacking_height=12,
        max_log_row_count=9,
    )
    rec_fri = FriConfig(log_blowup=1, num_queries=6, proof_of_work_bits=2)
    client = (
        ProverClient.builder()
        .cpu(
            word_spec=WordSpec(limb_bits=8),
            max_log_row_count=9,
            config=cfg,
            recursion_fri=rec_fri,
        )
        .build()
    )
    prog = asm.assemble(asm.FIBONACCI)
    pk, vk = client.setup(prog)
    n_iters = (2 * (1 << 9) - 30) // 6  # ~2 shards
    req = client.prove(pk, stdin=[n_iters])
    return client, vk, req


class TestCompressed:
    def test_core_still_verifies(self, compressed_session):
        client, vk, req = compressed_session
        core = req.core()
        assert len(core.shard_proofs) >= 2
        assert client.verify(core, vk)

    def test_compressed_prove_verify(self, compressed_session):
        client, vk, req = compressed_session
        comp = req.compressed()
        assert comp.mode == "compressed"
        assert client.verify(comp, vk)

        bad = copy.deepcopy(comp)
        bad.root_proof.public_values[8] = (
            int(bad.root_proof.public_values[8]) + 1
        ) % ((1 << 31) - (1 << 24) + 1)
        assert not client.verify(bad, vk)

        # pin a different vk-map root: the legit proof must be rejected
        saved = client.vk_map_root
        client.vk_map_root = np.asarray([1] * 8, np.uint32)
        assert not client.verify(comp, vk)
        client.vk_map_root = saved
        assert client.verify(comp, vk)

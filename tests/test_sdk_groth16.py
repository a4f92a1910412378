"""SDK shrink() / groth16() modes: the full recursion chain through the
public client API only (VERDICT r4: "recursion/compressed/groth16 not
reachable from the public API" — compressed landed earlier in round 5;
this covers the remaining two stages).

Chain: core -> normalize -> compose tree -> shrink (blowup 2^3 role,
tiny FRI here) -> wrap over BN254 -> gnark constraint/witness export,
semantically evaluated in-process. Reference:
crates/sdk/src/prover.rs:38-81 (prove().groth16()),
crates/prover/src/recursion.rs:285 (shrink),
crates/recursion/gnark-ffi/go/sp1/sp1.go Define (the consumer the
export + evaluator stand in for).
"""

import copy
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(__file__))

from sp1_tpu.executor import asm
from sp1_tpu.pcs.basefold import FriConfig
from sp1_tpu.pcs.jagged import JaggedConfig
from sp1_tpu.riscv.machine import WordSpec
from sp1_tpu.sdk.client import ProverClient

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def groth16_session():
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
    n_iters = ((1 << 9) - 30) // 6  # single shard keeps the tree small
    g16 = client.prove(pk, stdin=[n_iters]).groth16()
    return client, vk, g16


class TestSdkGroth16:
    def test_groth16_prove_verify(self, groth16_session):
        client, vk, g16 = groth16_session
        assert g16.mode == "groth16"
        assert g16.constraints["constraints"]
        assert client.verify(g16, vk)

    def test_shrink_component_verifies(self, groth16_session):
        client, vk, g16 = groth16_session
        shrink = g16.shrink
        assert shrink.mode == "shrink"
        assert client.verify(shrink, vk)

    def test_tampered_witness_rejected(self, groth16_session):
        client, vk, g16 = groth16_session
        bad = copy.copy(g16)
        bad.witness = copy.deepcopy(g16.witness)
        blocks = bad.witness["felts"]  # list of witness blocks (stream order)
        b = next(i for i, blk in enumerate(blocks) if blk)
        blocks[b][0] = str(
            (int(blocks[b][0]) + 1) % ((1 << 31) - (1 << 24) + 1)
        )
        assert not client.verify(bad, vk)

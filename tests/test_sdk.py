"""SDK surface tests: ProverClient setup/execute/prove/verify."""

from sp1_tpu.executor import asm
from sp1_tpu.pcs.basefold import FriConfig
from sp1_tpu.pcs.jagged import JaggedConfig
from sp1_tpu.riscv.machine import WordSpec
from sp1_tpu.sdk.client import ProverClient


def small_client():
    # The toy word model / small FRI parameters are an explicit opt-in;
    # the SDK defaults are the production parameters (16-bit limbs,
    # FriConfig.core()).
    return (
        ProverClient.builder()
        .cpu(
            word_spec=WordSpec(limb_bits=8),
            max_log_row_count=8,
            config=JaggedConfig(
                FriConfig(log_blowup=1, num_queries=6, proof_of_work_bits=2),
                log_stacking_height=11,
                max_log_row_count=8,
            ),
        )
        .build()
    )


class TestSdk:
    def test_execute(self):
        client = small_client()
        prog = asm.assemble(asm.FIBONACCI)
        report = client.execute(prog, stdin=[10])
        assert report.exit_code == 55
        assert report.cycles > 0

    def test_prove_verify(self):
        client = small_client()
        prog = asm.assemble(asm.FIBONACCI)
        pk, vk = client.setup(prog)
        proof = client.prove(pk, stdin=[10])
        assert client.verify(proof, vk)

    def test_mock(self):
        client = ProverClient.builder().mock().build()
        prog = asm.assemble(asm.FIBONACCI)
        pk, vk = client.setup(prog)
        proof = client.prove(pk, stdin=[5])
        assert client.verify(proof, vk)

"""On-disk guest ELF corpus: load, execute, and prove real ELF files.

The three fixtures under tests/elfs/ are real ELF64 RV64IM executables
(emitted by scripts/build_elf_corpus.py — the env has no RISC-V cross
compiler), loaded from disk through the same `load_elf` path a
compiler-produced binary takes. Mirrors the reference's prebuilt guest
fixtures (reference: crates/test-artifacts/src/lib.rs:11).
"""

import os

import pytest

from scripts.build_elf_corpus import (
    memory_tester_expected,
    sha_expected,
)
from sp1_tpu.executor import elf

pytestmark = pytest.mark.medium

ELFS = os.path.join(os.path.dirname(__file__), "elfs")


def load(name: str) -> bytes:
    with open(os.path.join(ELFS, name), "rb") as f:
        return f.read()


class TestCorpusExecute:
    def test_fibonacci(self):
        _, res = elf.execute_elf(load("fibonacci.elf"), inputs=[20])
        assert res.exit_code == 6765

    def test_memory_tester_sweeps_16mb(self):
        prog, res = elf.execute_elf(load("memory_tester.elf"), inputs=[7])
        assert res.exit_code == memory_tester_expected(7)
        addrs = res.touched_memory[0]
        span = int(addrs.max()) - int(addrs.min())
        assert span >= 60 * 0x3FFF8, f"expected ~16MB sweep, got {span:#x}"

    def test_sha_extend(self):
        w16 = [(0x6A09E667 * (i + 1)) & 0xFFFFFFFF for i in range(16)]
        _, res = elf.execute_elf(load("sha_extend.elf"), inputs=w16)
        assert res.exit_code == sha_expected(w16)

    def test_corpus_is_reproducible(self):
        """Checked-in binaries match what the generator emits today."""
        from scripts.build_elf_corpus import CORPUS
        from sp1_tpu.executor import asm

        for name, src in CORPUS.items():
            assert load(name) == elf.make_elf(asm.assemble(src)), name


class TestCorpusProve:
    @pytest.mark.parametrize("name,stdin", [
        ("fibonacci.elf", [9]),
        ("memory_tester.elf", [3]),
    ])
    def test_prove_from_disk(self, name, stdin):
        from sp1_tpu.pcs.basefold import FriConfig
        from sp1_tpu.pcs.jagged import JaggedConfig
        from sp1_tpu.riscv.machine import WordSpec
        from sp1_tpu.sdk.client import ProverClient

        prog = elf.load_elf(load(name))
        cfg = JaggedConfig(
            FriConfig(log_blowup=1, num_queries=6, proof_of_work_bits=2),
            log_stacking_height=12,
            max_log_row_count=9,
        )
        client = (
            ProverClient.builder()
            .cpu(max_log_row_count=9, word_spec=WordSpec(limb_bits=8),
                 config=cfg)
            .build()
        )
        pk, vk = client.setup(prog.words, pc_base=prog.pc_base)
        proof = client.prove(pk, stdin=stdin)
        assert client.verify(proof, vk)

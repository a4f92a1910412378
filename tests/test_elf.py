"""ELF64 loader: parse/execute round-trips and SDK proving from an ELF."""

import numpy as np
import pytest

from sp1_tpu.executor import asm, elf, native


class TestElfLoader:
    def test_roundtrip_fibonacci(self):
        words = asm.assemble(asm.FIBONACCI)
        data = elf.make_elf(words, pc_base=0x1000)
        prog = elf.load_elf(data)
        assert prog.pc_base == 0x1000
        assert prog.pc_start == 0x1000
        assert np.array_equal(prog.words, words)
        _, res = elf.execute_elf(data, inputs=[10])
        # fib(10) = 55 returned as the HALT code
        assert res.exit_code == 55

    def test_entry_offset(self):
        # entry point past a leading nop: execution starts at e_entry
        src = "nop\n" + asm.FIBONACCI
        words = asm.assemble(src)
        data = elf.make_elf(words, pc_base=0x1000, entry=0x1004)
        prog = elf.load_elf(data)
        assert prog.pc_start == 0x1004
        _, res = elf.execute_elf(data, inputs=[9])
        assert res.exit_code == 34

    def test_data_segment_in_memory_image(self):
        words = asm.assemble(asm.FIBONACCI)
        payload = (1234567890123456789).to_bytes(8, "little")
        data = elf.make_elf(words, pc_base=0x1000,
                            data_segments=[(0x8000, payload)])
        prog = elf.load_elf(data)
        assert prog.memory_image[0x8000] == 1234567890123456789

    def test_rejects_garbage(self):
        with pytest.raises(elf.ElfError):
            elf.load_elf(b"\x7fELFxxxx" + b"\x00" * 100)
        with pytest.raises(elf.ElfError):
            elf.load_elf(b"not an elf at all")

    def test_rejects_wrong_machine(self):
        words = asm.assemble("nop\nhalt" if hasattr(asm, "HALT") else asm.FIBONACCI)
        data = bytearray(elf.make_elf(words))
        data[18] = 62  # EM_X86_64
        with pytest.raises(elf.ElfError):
            elf.load_elf(bytes(data))


class TestElfProve:
    def test_prove_from_elf(self):
        from sp1_tpu.sdk.client import ProverClient

        words = asm.assemble(asm.FIBONACCI)
        data = elf.make_elf(words, pc_base=0)
        prog = elf.load_elf(data)
        from sp1_tpu.riscv.machine import WordSpec

        client = (
            ProverClient.builder()
            .cpu(max_log_row_count=9, word_spec=WordSpec(limb_bits=8))
            .build()
        )
        pk, vk = client.setup(prog.words, pc_base=prog.pc_base)
        proof = client.prove(pk, stdin=[8])
        assert client.verify(proof, vk)

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


class TestExpandedCorpus:
    """The round-5 corpus: precompile loops, call/stack, branch/sort,
    div/mul, memory-bandwidth and tendermint-class synthetic guests
    (VERDICT r4 item 6), each cross-checked against an independent
    Python model."""

    def test_keccak_loop(self):
        from test_keccak import ref_keccak_f

        lanes = list(range(25, 0, -1))
        for _ in range(3):
            lanes = ref_keccak_f(lanes)
        _, res = elf.execute_elf(load("keccak_loop.elf"), inputs=[3])
        assert res.exit_code == lanes[0]

    def test_poseidon2_loop(self):
        import numpy as np

        from sp1_tpu.ops.poseidon2 import hostp2

        state = np.arange(1, 17, dtype=np.uint32)[None, :]
        for _ in range(4):
            state = hostp2.permute(state)
        _, res = elf.execute_elf(load("poseidon2_loop.elf"), inputs=[4])
        assert res.exit_code == int(state[0][0])

    def test_tendermint_sim(self):
        from scripts.build_elf_corpus import sha_expected

        M = 1 << 64
        s4 = 0
        for _ in range(3):  # blocks
            t1 = s4
            w16 = []
            for _ in range(16):
                t1 = (t1 + 97) % M
                w16.append(t1 & 0xFFFFFFFF)
            # sha_extend consumes 32-bit words; cells store 64-bit t1
            # values whose low words are what the precompile reads
            digest = sha_expected([w & 0xFFFFFFFF for w in w16])
            s4 = (s4 + digest) % M
            for t0 in range(8, 0, -1):
                t3 = (s4 + t0) % M
                s4 = (s4 + t3) % M
        _, res = elf.execute_elf(load("tendermint_sim.elf"), inputs=[3])
        assert res.exit_code == s4

    def test_sort(self):
        M = 1 << 64
        vals = []
        t1, n = 1234, 50
        for t0 in range(n, 0, -1):
            t1 = (t1 * 1103 + 1234) % M
            vals.append(t1 & 0xFFFF)
        _, res = elf.execute_elf(load("sort.elf"), inputs=[n])
        assert res.exit_code == max(vals)

    def test_divmul(self):
        M = 1 << 64
        s3, s4, s5 = 0x12345, 977, 0
        for _ in range(100):
            t0 = (s3 * s4) % M
            t1 = (s3 * s4) >> 64  # mulh of nonneg small values
            s5 = (s5 + t0 + t1 + t0 // s4 + t0 % s4 + t0 // s4 + t0 % s4) % M
            s3 += 7
        _, res = elf.execute_elf(load("divmul.elf"), inputs=[100])
        assert res.exit_code == s5

    def test_callstack(self):
        depth = 40
        want = sum(range(depth + 1))
        _, res = elf.execute_elf(load("callstack.elf"), inputs=[depth])
        assert res.exit_code == want

    def test_memcpy(self):
        M = 1 << 64
        n, t1 = 64, 777
        last = None
        for t0 in range(n, 0, -1):
            t1 = (t1 * t0 + 13) % M
            last = t1
        _, res = elf.execute_elf(load("memcpy.elf"), inputs=[n])
        assert res.exit_code == last

    def test_secp_double_loop(self):
        from test_curves import SECP_G, PSECP, dwords, ws_double

        pt = SECP_G
        for _ in range(5):
            pt = ws_double(pt, PSECP)
        _, res = elf.execute_elf(
            load("secp_double_loop.elf"),
            inputs=[5] + dwords(SECP_G[0]) + dwords(SECP_G[1]),
        )
        assert res.exit_code == dwords(pt[0])[0]

    def test_uint256_loop(self):
        from test_curves import PSECP, dwords

        x0 = 0x123456789ABCDEF_FEDCBA987654321
        y = 0x0F1E2D3C4B5A6978_8796A5B4C3D2E1F0
        x = x0
        for _ in range(4):
            x = x * y % PSECP
        _, res = elf.execute_elf(
            load("uint256_loop.elf"),
            inputs=[4] + dwords(x0) + dwords(y) + dwords(PSECP),
        )
        assert res.exit_code == dwords(x)[0]

"""Generate the on-disk guest ELF corpus under tests/elfs/.

The environment has no RISC-V cross toolchain, so the corpus is emitted
by the in-repo assembler + ELF64 writer (`executor/{asm,elf}.py`) —
real ELF64 RV64IM executables on disk, loaded through the same
`load_elf` path a compiler-produced binary would take. Stands in for
the reference's prebuilt guest fixtures
(reference: crates/test-artifacts/src/lib.rs:11).

Run from the repo root: python scripts/build_elf_corpus.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from sp1_tpu.executor import asm, elf

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "elfs")

# Strided store/load sweep across a 16 MB span — exercises the 32-bit
# address space (reference workload analog: memory-tester).
MEMORY_TESTER = """
    li a7, 3
    ecall            # a0 = seed
    mv t0, a0
    li s0, 0x100     # base
    li s1, 64        # iterations
    li s2, 0         # checksum
    li s3, 1
    slli s3, s3, 18
    addi s3, s3, -8  # stride 0x3fff8 (keeps cells 8-byte aligned)
loop:
    beq s1, zero, done
    mul t1, t0, s1   # value = seed * i
    add t1, t1, s2
    sd t1, 0(s0)
    ld t2, 0(s0)
    add s2, s2, t2   # checksum += readback
    add s0, s0, s3
    addi s1, s1, -1
    j loop
done:
    mv a0, s2
    li a7, 0
    ecall            # halt with checksum
"""


def memory_tester_expected(seed: int) -> int:
    checksum = 0
    for i in range(64, 0, -1):
        checksum = (checksum + seed * i + checksum) % (1 << 64)
    return checksum


# One SHA-256 extend syscall over a w[0..64] table in memory.
SHA_GUEST = """
    li s0, 0x200     # w table base (cell-aligned)
    li t0, 16
    mv s1, s0
fill:
    beq t0, zero, ext
    li a7, 3
    ecall            # a0 = next initial w word
    sd a0, 0(s1)
    addi s1, s1, 8
    addi t0, t0, -1
    j fill
ext:
    li a7, 8
    mv a0, s0
    ecall            # SHA_EXTEND(w @ s0)
    ld a0, 504(s0)   # w[63]
    li a7, 0
    ecall            # halt with w[63]
"""


def sha_expected(w16: list) -> int:
    w = list(w16) + [0] * 48

    def rotr(x, r):
        return ((x >> r) | (x << (32 - r))) & 0xFFFFFFFF

    for i in range(16, 64):
        s0 = rotr(w[i - 15], 7) ^ rotr(w[i - 15], 18) ^ (w[i - 15] >> 3)
        s1 = rotr(w[i - 2], 17) ^ rotr(w[i - 2], 19) ^ (w[i - 2] >> 10)
        w[i] = (w[i - 16] + s0 + w[i - 7] + s1) & 0xFFFFFFFF
    return w[63]


CORPUS = {
    "fibonacci.elf": asm.FIBONACCI,
    "memory_tester.elf": MEMORY_TESTER,
    "sha_extend.elf": SHA_GUEST,
}


def main():
    os.makedirs(OUT, exist_ok=True)
    for name, src in CORPUS.items():
        words = asm.assemble(src)
        data = elf.make_elf(words)
        path = os.path.join(OUT, name)
        with open(path, "wb") as f:
            f.write(data)
        print(f"{name}: {len(words)} insns, {len(data)} bytes")


if __name__ == "__main__":
    main()

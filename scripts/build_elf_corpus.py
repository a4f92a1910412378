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


# keccak-f[1600] loop over a 25-lane state (precompile-heavy workload;
# reference analog: examples/keccak).
KECCAK_LOOP = """
    li a7, 3
    ecall            # a0 = iteration count
    mv s2, a0
    li s0, 1024
    li t0, 25
    mv s1, s0
fill:
    sd t0, 0(s1)
    addi s1, s1, 8
    addi t0, t0, -1
    bne t0, zero, fill
kloop:
    li a7, 10
    mv a0, s0
    ecall            # KECCAK_PERMUTE(state @ s0)
    addi s2, s2, -1
    bne s2, zero, kloop
    ld a0, 0(s0)
    li a7, 0
    ecall
"""

# Poseidon2 loop: repeated width-16 permutation of a canonical state
# (reference analog: examples/poseidon2).
POSEIDON2_LOOP = """
    li a7, 3
    ecall            # a0 = iteration count
    mv s2, a0
    li s0, 1024
    li t0, 16
    mv s1, s0
    li t1, 1
fill:
    sd t1, 0(s1)
    addi s1, s1, 8
    addi t1, t1, 1
    addi t0, t0, -1
    bne t0, zero, fill
ploop:
    li a7, 38
    mv a0, s0
    ecall            # POSEIDON2_PERMUTE(state @ s0)
    addi s2, s2, -1
    bne s2, zero, ploop
    ld a0, 0(s0)
    li a7, 0
    ecall
"""

# tendermint-class synthetic: hashing (sha extend) + memory churn +
# subroutine calls per block, N blocks (reference workload analog:
# examples/tendermint — block-verification loop shape).
TENDERMINT_SIM = """
    li a7, 3
    ecall            # a0 = number of "blocks"
    mv s2, a0
    li s0, 0x400     # w table base
    li s4, 0         # running digest
block:
    li t0, 16
    mv s1, s0
    mv t1, s4
wfill:
    addi t1, t1, 97  # pseudo block data
    sd t1, 0(s1)
    addi s1, s1, 8
    addi t0, t0, -1
    bne t0, zero, wfill
    jal ra, hashfn   # call the hash subroutine
    add s4, s4, a0   # chain the digest
    li t0, 8         # memory churn: rewrite 8 state cells
    lui t2, 4        # 0x4000
churn:
    add t3, s4, t0
    sd t3, 0(t2)
    ld t4, 0(t2)
    add s4, s4, t4
    addi t2, t2, 64
    addi t0, t0, -1
    bne t0, zero, churn
    addi s2, s2, -1
    bne s2, zero, block
    mv a0, s4
    li a7, 0
    ecall
hashfn:
    li a7, 8
    mv a0, s0
    ecall            # SHA_EXTEND(w @ s0)
    ld a0, 504(s0)   # w[63] is the "digest"
    jalr zero, ra, 0
"""

# Insertion sort of N pseudo-random values (branch/compare heavy).
SORT_GUEST = """
    li a7, 3
    ecall            # a0 = N
    mv s2, a0
    li s0, 1024
    slli s0, s0, 1   # 0x800
    mv s1, s0
    mv t0, s2
    li t1, 1234
gen:
    li t2, 1103
    mul t1, t1, t2
    addi t1, t1, 1234
    lui t2, 0x10
    addi t2, t2, -1  # 0xffff
    and t3, t1, t2
    sd t3, 0(s1)
    addi s1, s1, 8
    addi t0, t0, -1
    bne t0, zero, gen
    li t0, 1         # i = 1
outer:
    bge t0, s2, done
    slli t2, t0, 3
    add t2, s0, t2
    ld t3, 0(t2)     # key
    mv t4, t0        # j = i
inner:
    beq t4, zero, place
    slli t5, t4, 3
    add t5, s0, t5
    ld t6, -8(t5)
    bltu t6, t3, place
    sd t6, 0(t5)
    addi t4, t4, -1
    j inner
place:
    slli t5, t4, 3
    add t5, s0, t5
    sd t3, 0(t5)
    addi t0, t0, 1
    j outer
done:
    slli t2, s2, 3
    add t2, s0, t2
    ld a0, -8(t2)    # max element
    li a7, 0
    ecall
"""

# div/rem/mulh torture loop (M-extension heavy).
DIVMUL_GUEST = """
    li a7, 3
    ecall            # a0 = iterations
    mv s2, a0
    lui s3, 0x12
    addi s3, s3, 0x345
    li s4, 977
    li s5, 0
dloop:
    mul t0, s3, s4
    mulh t1, s3, s4
    div t2, t0, s4
    rem t3, t0, s4
    divu t4, t0, s4
    remu t5, t0, s4
    add s5, s5, t0
    add s5, s5, t1
    add s5, s5, t2
    add s5, s5, t3
    add s5, s5, t4
    add s5, s5, t5
    addi s3, s3, 7
    addi s2, s2, -1
    bne s2, zero, dloop
    mv a0, s5
    li a7, 0
    ecall
"""

# Call-chain guest: nested subroutine calls with a software stack.
CALLSTACK_GUEST = """
    li a7, 3
    ecall            # a0 = depth
    mv s2, a0
    lui sp, 0x10     # 0x10000
    li s4, 0
    jal ra, level
    mv a0, s4
    li a7, 0
    ecall
level:
    addi sp, sp, -16
    sd ra, 0(sp)
    sd s2, 8(sp)
    add s4, s4, s2
    beq s2, zero, unwind
    addi s2, s2, -1
    jal ra, level
unwind:
    ld s2, 8(sp)
    ld ra, 0(sp)
    addi sp, sp, 16
    jalr zero, ra, 0
"""

# Word-copy loop (load/store bandwidth shape).
MEMCPY_GUEST = """
    li a7, 3
    ecall            # a0 = words
    mv s2, a0
    lui s0, 1        # src 0x1000
    lui s1, 0x40     # dst 0x40000
    mv t0, s2
    li t1, 777
sfill:
    mul t1, t1, t0
    addi t1, t1, 13
    sd t1, 0(s0)
    addi s0, s0, 8
    addi t0, t0, -1
    bne t0, zero, sfill
    lui s0, 1
    mv t0, s2
copy:
    ld t2, 0(s0)
    sd t2, 0(s1)
    addi s0, s0, 8
    addi s1, s1, 8
    addi t0, t0, -1
    bne t0, zero, copy
    ld a0, -8(s1)
    li a7, 0
    ecall
"""

# secp256k1 repeated doubling: [2^n]G via the double precompile.
SECP_DOUBLE_LOOP = """
    li a7, 3
    ecall            # a0 = number of doublings
    mv s2, a0
    li s0, 1024
    li t0, 8
    mv s1, s0
read:
    li a7, 3
    ecall            # next coordinate dword
    sd a0, 0(s1)
    addi s1, s1, 8
    addi t0, t0, -1
    bne t0, zero, read
dloop:
    li a7, 13
    mv a0, s0
    ecall            # SECP256K1_DOUBLE(point @ s0)
    addi s2, s2, -1
    bne s2, zero, dloop
    ld a0, 0(s0)
    li a7, 0
    ecall
"""

# uint256 modmul chain: x <- x*x mod m repeatedly.
UINT256_LOOP = """
    li a7, 3
    ecall            # a0 = iterations
    mv s2, a0
    li s0, 1024
    li t0, 12
    mv s1, s0
read:
    li a7, 3
    ecall
    sd a0, 0(s1)
    addi s1, s1, 8
    addi t0, t0, -1
    bne t0, zero, read
uloop:
    li a7, 14
    mv a0, s0
    ecall            # UINT256_MUL(x *= y mod m)
    addi s2, s2, -1
    bne s2, zero, uloop
    ld a0, 0(s0)
    li a7, 0
    ecall
"""


CORPUS = {
    "fibonacci.elf": asm.FIBONACCI,
    "memory_tester.elf": MEMORY_TESTER,
    "sha_extend.elf": SHA_GUEST,
    "keccak_loop.elf": KECCAK_LOOP,
    "poseidon2_loop.elf": POSEIDON2_LOOP,
    "tendermint_sim.elf": TENDERMINT_SIM,
    "sort.elf": SORT_GUEST,
    "divmul.elf": DIVMUL_GUEST,
    "callstack.elf": CALLSTACK_GUEST,
    "memcpy.elf": MEMCPY_GUEST,
    "secp_double_loop.elf": SECP_DOUBLE_LOOP,
    "uint256_loop.elf": UINT256_LOOP,
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

"""Minimal RV64IM assembler for guest test programs.

Supports labels, the base integer ISA (I + M + W-forms), and the
framework syscall convention (a7 selects: 0 = HALT with code in a0,
2 = WRITE byte from a0, 3 = READ word into a0). Standard RISC-V
instruction encodings.
"""

from __future__ import annotations

import numpy as np

REG_NAMES = {f"x{i}": i for i in range(32)}
REG_NAMES.update(
    {
        "zero": 0, "ra": 1, "sp": 2, "gp": 3, "tp": 4, "t0": 5, "t1": 6, "t2": 7,
        "s0": 8, "fp": 8, "s1": 9, "a0": 10, "a1": 11, "a2": 12, "a3": 13,
        "a4": 14, "a5": 15, "a6": 16, "a7": 17, "s2": 18, "s3": 19, "s4": 20,
        "s5": 21, "s6": 22, "s7": 23, "s8": 24, "s9": 25, "s10": 26, "s11": 27,
        "t3": 28, "t4": 29, "t5": 30, "t6": 31,
    }
)


def _r(name):
    return REG_NAMES[name.strip()]


def _enc_r(opcode, rd, f3, rs1, rs2, f7):
    return opcode | (rd << 7) | (f3 << 12) | (rs1 << 15) | (rs2 << 20) | (f7 << 25)


def _enc_i(opcode, rd, f3, rs1, imm):
    return opcode | (rd << 7) | (f3 << 12) | (rs1 << 15) | ((imm & 0xFFF) << 20)


def _enc_s(opcode, f3, rs1, rs2, imm):
    return (
        opcode
        | ((imm & 0x1F) << 7)
        | (f3 << 12)
        | (rs1 << 15)
        | (rs2 << 20)
        | (((imm >> 5) & 0x7F) << 25)
    )


def _enc_b(opcode, f3, rs1, rs2, imm):
    return (
        opcode
        | (((imm >> 11) & 1) << 7)
        | (((imm >> 1) & 0xF) << 8)
        | (f3 << 12)
        | (rs1 << 15)
        | (rs2 << 20)
        | (((imm >> 5) & 0x3F) << 25)
        | (((imm >> 12) & 1) << 31)
    )


def _enc_u(opcode, rd, imm):
    return opcode | (rd << 7) | (imm & 0xFFFFF000)


def _enc_j(opcode, rd, imm):
    return (
        opcode
        | (rd << 7)
        | (((imm >> 12) & 0xFF) << 12)
        | (((imm >> 11) & 1) << 20)
        | (((imm >> 1) & 0x3FF) << 21)
        | (((imm >> 20) & 1) << 31)
    )


R_OPS = {
    "add": (0x33, 0, 0x00), "sub": (0x33, 0, 0x20), "sll": (0x33, 1, 0x00),
    "slt": (0x33, 2, 0x00), "sltu": (0x33, 3, 0x00), "xor": (0x33, 4, 0x00),
    "srl": (0x33, 5, 0x00), "sra": (0x33, 5, 0x20), "or": (0x33, 6, 0x00),
    "and": (0x33, 7, 0x00),
    "mul": (0x33, 0, 0x01), "mulh": (0x33, 1, 0x01), "mulhsu": (0x33, 2, 0x01),
    "mulhu": (0x33, 3, 0x01), "div": (0x33, 4, 0x01), "divu": (0x33, 5, 0x01),
    "rem": (0x33, 6, 0x01), "remu": (0x33, 7, 0x01),
    "addw": (0x3B, 0, 0x00), "subw": (0x3B, 0, 0x20), "sllw": (0x3B, 1, 0x00),
    "srlw": (0x3B, 5, 0x00), "sraw": (0x3B, 5, 0x20), "mulw": (0x3B, 0, 0x01),
    "divw": (0x3B, 4, 0x01), "divuw": (0x3B, 5, 0x01), "remw": (0x3B, 6, 0x01),
    "remuw": (0x3B, 7, 0x01),
}

I_OPS = {
    "addi": (0x13, 0), "slti": (0x13, 2), "sltiu": (0x13, 3), "xori": (0x13, 4),
    "ori": (0x13, 6), "andi": (0x13, 7), "addiw": (0x1B, 0), "jalr": (0x67, 0),
    "lb": (0x03, 0), "lh": (0x03, 1), "lw": (0x03, 2), "ld": (0x03, 3),
    "lbu": (0x03, 4), "lhu": (0x03, 5), "lwu": (0x03, 6),
}

S_OPS = {"sb": (0x23, 0), "sh": (0x23, 1), "sw": (0x23, 2), "sd": (0x23, 3)}
B_OPS = {"beq": 0, "bne": 1, "blt": 4, "bge": 5, "bltu": 6, "bgeu": 7}


def assemble(source: str, pc_base: int = 0) -> np.ndarray:
    """Assemble source text into an array of uint32 instruction words."""
    lines = []
    for raw in source.strip().splitlines():
        line = raw.split("#")[0].strip()
        if line:
            lines.append(line)
    # first pass: labels
    labels, instrs = {}, []
    for line in lines:
        while ":" in line:
            label, _, rest = line.partition(":")
            labels[label.strip()] = pc_base + 4 * len(instrs)
            line = rest.strip()
            if not line:
                break
        if line:
            instrs.append(line)

    def parse_imm(tok, pc):
        tok = tok.strip()
        if tok in labels:
            return labels[tok] - pc
        return int(tok, 0)

    words = []
    for i, line in enumerate(instrs):
        pc = pc_base + 4 * i
        parts = line.replace(",", " ").split()
        op = parts[0]
        if op in R_OPS:
            opc, f3, f7 = R_OPS[op]
            words.append(_enc_r(opc, _r(parts[1]), f3, _r(parts[2]), _r(parts[3]), f7))
        elif op in ("slli", "srli", "srai", "slliw", "srliw", "sraiw"):
            sh = int(parts[3], 0)
            w = op.endswith("w")
            opc = 0x1B if w else 0x13
            f3 = 1 if op.startswith("sl") else 5
            top = 0x10 if "a" in op[2:] else 0x00  # srai/sraiw
            imm = (top << 6) | (sh & (31 if w else 63))
            words.append(_enc_i(opc, _r(parts[1]), f3, _r(parts[2]), imm))
        elif op in I_OPS and op not in ("lb", "lh", "lw", "ld", "lbu", "lhu", "lwu", "jalr"):
            opc, f3 = I_OPS[op]
            words.append(
                _enc_i(opc, _r(parts[1]), f3, _r(parts[2]), parse_imm(parts[3], pc))
            )
        elif op in ("lb", "lh", "lw", "ld", "lbu", "lhu", "lwu"):
            opc, f3 = I_OPS[op]
            off, reg = parts[2].split("(")
            words.append(_enc_i(opc, _r(parts[1]), f3, _r(reg.rstrip(")")), int(off, 0)))
        elif op in S_OPS:
            opc, f3 = S_OPS[op]
            off, reg = parts[2].split("(")
            words.append(
                _enc_s(opc, f3, _r(reg.rstrip(")")), _r(parts[1]), int(off, 0))
            )
        elif op in B_OPS:
            words.append(
                _enc_b(
                    0x63, B_OPS[op], _r(parts[1]), _r(parts[2]), parse_imm(parts[3], pc)
                )
            )
        elif op == "jal":
            if len(parts) == 2:  # jal label -> rd = ra
                words.append(_enc_j(0x6F, 1, parse_imm(parts[1], pc)))
            else:
                words.append(_enc_j(0x6F, _r(parts[1]), parse_imm(parts[2], pc)))
        elif op == "jalr" and len(parts) >= 3:
            opc, f3 = I_OPS["jalr"]
            if "(" in parts[2]:
                off, reg = parts[2].split("(")
                words.append(_enc_i(opc, _r(parts[1]), f3, _r(reg.rstrip(")")), int(off, 0)))
            else:
                words.append(_enc_i(opc, _r(parts[1]), f3, _r(parts[2]), int(parts[3], 0)))
        elif op == "lui":
            words.append(_enc_u(0x37, _r(parts[1]), int(parts[2], 0) << 12))
        elif op == "auipc":
            words.append(_enc_u(0x17, _r(parts[1]), int(parts[2], 0) << 12))
        elif op == "ecall":
            words.append(0x73)
        elif op == "li":  # pseudo: small immediates only
            v = int(parts[2], 0)
            assert -2048 <= v < 2048, "li supports 12-bit immediates only"
            words.append(_enc_i(0x13, _r(parts[1]), 0, 0, v))
        elif op == "mv":
            words.append(_enc_i(0x13, _r(parts[1]), 0, _r(parts[2]), 0))
        elif op == "j":
            words.append(_enc_j(0x6F, 0, parse_imm(parts[1], pc)))
        elif op == "nop":
            words.append(0x13)
        else:
            raise ValueError(f"unknown instruction: {line}")
    return np.array(words, np.uint32)


FIBONACCI = """
    # fib(n): n in a0 via READ; result via HALT code (mod 2^64)
    li a7, 3
    ecall            # a0 = n
    mv t0, a0        # t0 = counter
    li t1, 0         # t1 = fib(i)
    li t2, 1         # t2 = fib(i+1)
loop:
    beq t0, zero, done
    add t3, t1, t2
    mv t1, t2
    mv t2, t3
    addi t0, t0, -1
    j loop
done:
    mv a0, t1
    li a7, 0
    ecall            # halt with fib(n)
"""


MIXED_OPS = """
    # exercise ld/sd/and/or/xor/mul/slli; result via HALT code
    li a7, 3
    ecall            # a0 = x
    mv t0, a0
    li t1, 0x155
    and t2, t0, t1   # t2 = x & 0x155
    or t3, t0, t1    # t3 = x | 0x155
    xor t4, t2, t3   # t4 = (x&m) ^ (x|m)
    mul t5, t0, t4   # t5 = x * t4
    slli t5, t5, 3   # t5 <<= 3
    li s0, 0x100
    sd t5, 8(s0)     # store
    ld s1, 8(s0)     # load back
    add a0, s1, t0
    li a7, 0
    ecall
"""


def mixed_ops_expected(x: int) -> int:
    m = 0x155
    t4 = (x & m) ^ (x | m)
    t5 = (x * t4 << 3) % (1 << 64)
    return (t5 + x) % (1 << 64)


CMP_OPS = """
    # comparisons: read two signed values, compute flags and min
    li a7, 3
    ecall            # a0 = x
    mv t0, a0
    li a7, 3
    ecall            # a0 = y
    mv t1, a0
    slt t2, t0, t1   # t2 = (x <s y)
    sltu t3, t0, t1  # t3 = (x <u y)
    blt t0, t1, xmin
    mv t4, t1        # min = y
    j donemin
xmin:
    mv t4, t0        # min = x
donemin:
    slli t2, t2, 1
    add t5, t2, t3   # t5 = 2*(x<s y) + (x<u y)
    slli t5, t5, 8
    add a0, t5, t4   # pack flags above min (min assumed < 256 in tests)
    li a7, 0
    ecall
"""


def cmp_ops_expected(x: int, y: int) -> int:
    sx = x - (1 << 64) if x >> 63 else x
    sy = y - (1 << 64) if y >> 63 else y
    flags = 2 * (1 if sx < sy else 0) + (1 if x < y else 0)
    mn = (y if sx >= sy else x) & ((1 << 64) - 1)
    return ((flags << 8) + mn) % (1 << 64)


SHIFT_OPS = """
    # exercise sll/srl/sra (register) and srli/srai (immediate)
    li a7, 3
    ecall            # a0 = n
    li t0, 0x123
    sll t1, t0, a0   # t0 << (n & 63)
    srl t2, t1, a0   # back down
    li t3, -1
    slli t3, t3, 12  # t3 = -4096
    srai t4, t3, 4   # -256
    srli t5, t3, 52  # 0xFFF
    li t6, 13
    sra s0, t3, t6   # -1
    srli s2, t3, 60  # 0xF
    add s1, t1, t2
    add s1, s1, t4
    add s1, s1, t5
    add s1, s1, s0
    add s1, s1, s2
    mv a0, s1
    li a7, 0
    ecall            # halt with the checksum
"""


def shift_ops_expected(n: int) -> int:
    M = (1 << 64) - 1
    sh = n & 63
    t1 = (0x123 << sh) & M
    t2 = t1 >> sh
    t3 = (-4096) & M
    t4 = (-256) & M
    t5 = t3 >> 52
    s0 = (-1) & M
    s2 = t3 >> 60
    return (t1 + t2 + t4 + t5 + s0 + s2) & M


DIV_OPS = """
    # exercise divu/remu incl. the divide-by-zero special case
    li a7, 3
    ecall            # a0 = n
    li t0, 1000
    mul t0, t0, t0   # 1_000_000
    add t0, t0, a0
    li t1, 7
    divu t2, t0, t1  # (1e6+n)/7
    remu t3, t0, t1  # (1e6+n)%7
    li t4, 0
    divu t5, t0, t4  # div by zero -> all-ones
    remu t6, t0, t4  # rem by zero -> t0
    divu s0, t4, t1  # 0/7 = 0
    add s1, t2, t3
    add s1, s1, t5
    add s1, s1, t6
    add s1, s1, s0
    mv a0, s1
    li a7, 0
    ecall
"""


def div_ops_expected(n: int) -> int:
    M = (1 << 64) - 1
    t0 = (1000 * 1000 + n) & M
    t2 = t0 // 7
    t3 = t0 % 7
    t5 = M
    t6 = t0
    return (t2 + t3 + t5 + t6) & M


CALL_OPS = """
    # exercise jalr (call/ret), lui, auipc
    li a7, 3
    ecall            # a0 = n
    lui t0, 0x12     # 0x12000
    auipc t1, 0      # pc of this instruction (12)
    jal ra, func
    add s1, a0, t0
    add s1, s1, t1
    mv a0, s1
    li a7, 0
    ecall
func:
    add a0, a0, a0   # a0 *= 2
    jalr zero, ra, 0 # ret
"""


def call_ops_expected(n: int) -> int:
    M = (1 << 64) - 1
    return (2 * n + 0x12000 + 12) & M


MEMBYTE_OPS = """
    # exercise sub-word loads/stores incl. sign extension and RMW
    li a7, 3
    ecall            # a0 = n
    li t0, 256
    sd a0, 0(t0)     # full word
    li t1, -2
    sb t1, 3(t0)     # poke byte 3 (0xFE)
    lb t2, 3(t0)     # -2 (sign-extended)
    lbu t3, 3(t0)    # 0xFE
    li t4, -3
    sh t4, 4(t0)     # halfword at offset 4
    lh t5, 4(t0)     # -3
    lhu t6, 4(t0)    # 0xFFFD
    sw t4, 8(t0)     # word store in the next cell
    lw s0, 8(t0)     # -3
    lwu s1, 8(t0)    # 0xFFFFFFFD
    ld s2, 0(t0)     # whole mutated word
    add s3, t2, t3
    add s3, s3, t5
    add s3, s3, t6
    add s3, s3, s0
    add s3, s3, s1
    add s3, s3, s2
    mv a0, s3
    li a7, 0
    ecall
"""


def membyte_ops_expected(n: int) -> int:
    M = (1 << 64) - 1
    word = n & M
    # sb 0xFE at byte 3
    word = (word & ~(0xFF << 24)) | (0xFE << 24)
    # sh 0xFFFD at bytes 4..5
    word = (word & ~(0xFFFF << 32)) | (0xFFFD << 32)
    t2 = (-2) & M
    t3 = 0xFE
    t5 = (-3) & M
    t6 = 0xFFFD
    s0 = (-3) & M
    s1 = 0xFFFFFFFD
    return (t2 + t3 + t5 + t6 + s0 + s1 + word) & M


WORD_OPS = """
    # exercise addw/addiw/subw/mulw incl. 32-bit wrap and sign extension
    li a7, 3
    ecall            # a0 = n
    lui t0, 0x7FFFF
    slli t0, t0, 4   # 0x7FFFF000 << 4 = 0x7FFFF0000 -> 32-bit ops use low half
    addw t1, t0, a0  # sext32(0xFFFF0000 + n)
    addiw t2, t1, 100
    subw t3, t2, a0
    li t4, 1037
    mulw t5, t3, t4  # 32-bit product, sign-extended
    addw t6, t5, t5
    add s1, t1, t2
    add s1, s1, t3
    add s1, s1, t5
    add s1, s1, t6
    mv a0, s1
    li a7, 0
    ecall
"""


def word_ops_expected(n: int) -> int:
    M = (1 << 64) - 1

    def sext32(v):
        v &= 0xFFFFFFFF
        return (v - (1 << 32) if v >> 31 else v) & M

    t0 = 0x7FFFF0000
    t1 = sext32((t0 + n) & 0xFFFFFFFF)
    t2 = sext32((t1 + 100) & 0xFFFFFFFF)
    t3 = sext32((t2 - n) & 0xFFFFFFFF)
    t5 = sext32((t3 * 1037) & 0xFFFFFFFF)
    t6 = sext32((t5 + t5) & 0xFFFFFFFF)
    return (t1 + t2 + t3 + t5 + t6) & M


WSHIFT_OPS = """
    # exercise sllw/srlw/sraw and slliw/srliw/sraiw
    li a7, 3
    ecall            # a0 = n
    lui t0, 0x80001  # 0x80001000 -> bit 31 set
    sllw t1, t0, a0  # 32-bit left shift by n&31, sext
    srlw t2, t0, a0  # 32-bit logical right
    sraw t3, t0, a0  # 32-bit arithmetic right (negative operand)
    slliw t4, t0, 3
    srliw t5, t0, 7
    sraiw t6, t0, 7
    li s0, 0
    sraw s1, t0, s0  # shift by zero: pure sext32
    add s2, t1, t2
    add s2, s2, t3
    add s2, s2, t4
    add s2, s2, t5
    add s2, s2, t6
    add s2, s2, s1
    mv a0, s2
    li a7, 0
    ecall
"""


def wshift_ops_expected(n: int) -> int:
    M = (1 << 64) - 1

    def sext32(v):
        v &= 0xFFFFFFFF
        return (v - (1 << 32) if v >> 31 else v) & M

    t0_32 = 0x80001000
    sh = n & 31
    t1 = sext32((t0_32 << sh) & 0xFFFFFFFF)
    t2 = sext32(t0_32 >> sh)
    t3 = sext32(((t0_32 - (1 << 32)) >> sh) & 0xFFFFFFFF)
    t4 = sext32((t0_32 << 3) & 0xFFFFFFFF)
    t5 = sext32(t0_32 >> 7)
    t6 = sext32(((t0_32 - (1 << 32)) >> 7) & 0xFFFFFFFF)
    s1 = sext32(t0_32)
    return (t1 + t2 + t3 + t4 + t5 + t6 + s1) & M


SDIV_OPS = """
    # signed div/rem: mixed signs, div-by-zero, INT64_MIN/-1 overflow
    li a7, 3
    ecall            # a0 = n (positive)
    li t0, -1000
    sub t0, t0, a0   # negative dividend
    li t1, 7
    div t2, t0, t1   # negative / positive
    rem t3, t0, t1
    li t4, -7
    div t5, t0, t4   # negative / negative
    rem t6, t0, t4
    div s0, a0, t4   # positive / negative
    li s1, 0
    div s2, t0, s1   # div by zero -> -1
    rem s3, t0, s1   # rem by zero -> t0
    li s4, 1
    slli s4, s4, 63  # INT64_MIN
    li s5, -1
    div s6, s4, s5   # overflow -> INT64_MIN
    rem s7, s4, s5   # overflow -> 0
    add s8, t2, t3
    add s8, s8, t5
    add s8, s8, t6
    add s8, s8, s0
    add s8, s8, s2
    add s8, s8, s3
    add s8, s8, s6
    add s8, s8, s7
    mv a0, s8
    li a7, 0
    ecall
"""


def sdiv_ops_expected(n: int) -> int:
    M = (1 << 64) - 1

    def tdiv(a, b):
        q = abs(a) // abs(b)
        return -q if (a < 0) != (b < 0) else q

    def trem(a, b):
        r = abs(a) % abs(b)
        return -r if a < 0 else r

    t0 = -1000 - n
    vals = [
        tdiv(t0, 7), trem(t0, 7),
        tdiv(t0, -7), trem(t0, -7),
        tdiv(n, -7),
        -1, t0,                      # div/rem by zero
        -(1 << 63), 0,               # overflow pair
    ]
    return sum(v & M for v in vals) & M


WDIV_OPS = """
    # 32-bit division family: mixed signs, div-by-zero, INT32_MIN/-1
    li a7, 3
    ecall            # a0 = n (positive)
    li t0, -1000
    sub t0, t0, a0   # negative (64-bit, low32 used)
    li t1, 7
    divw t2, t0, t1
    remw t3, t0, t1
    divuw t4, t0, t1 # unsigned on the low 32 bits
    remuw t5, t0, t1
    li t6, 0
    divw s0, t0, t6  # div0 -> -1
    remw s1, t0, t6  # -> sext32(b32)
    divuw s2, t0, t6 # -> -1
    remuw s3, t0, t6 # -> sext32(b32)
    li s4, 1
    slli s4, s4, 31  # INT32_MIN as u64 0x80000000
    li s5, -1
    divw s6, s4, s5  # overflow -> sext32(INT32_MIN)
    remw s7, s4, s5  # -> 0
    add s8, t2, t3
    add s8, s8, t4
    add s8, s8, t5
    add s8, s8, s0
    add s8, s8, s1
    add s8, s8, s2
    add s8, s8, s3
    add s8, s8, s6
    add s8, s8, s7
    mv a0, s8
    li a7, 0
    ecall
"""


def wdiv_ops_expected(n: int) -> int:
    M = (1 << 64) - 1

    def sext32(v):
        v &= 0xFFFFFFFF
        return (v - (1 << 32) if v >> 31 else v) & M

    def s32(v):
        v &= 0xFFFFFFFF
        return v - (1 << 32) if v >> 31 else v

    def tdiv(a, b):
        q = abs(a) // abs(b)
        return -q if (a < 0) != (b < 0) else q

    def trem(a, b):
        r = abs(a) % abs(b)
        return -r if a < 0 else r

    t0_64 = (-1000 - n) & M
    b32 = t0_64 & 0xFFFFFFFF
    sb = s32(b32)
    vals = [
        sext32(tdiv(sb, 7)), sext32(trem(sb, 7)),
        sext32(b32 // 7), sext32(b32 % 7),
        M, sext32(b32), M, sext32(b32),          # div0 quartet
        sext32(-(1 << 31)), 0,                   # overflow pair
    ]
    return sum(vals) & M


MULH_OPS = """
    # high-word multiplication: mulh/mulhu/mulhsu with mixed signs
    li a7, 3
    ecall            # a0 = n
    li t0, -1
    srli t0, t0, 13  # large unsigned
    add t0, t0, a0
    li t1, -2037
    mulhu t2, t0, t0 # unsigned x unsigned
    mulh t3, t0, t1  # signed (pos x neg)
    mulh t4, t1, t1  # neg x neg
    mulhsu t5, t1, t0  # signed x unsigned
    mulhu t6, t1, t1
    add s1, t2, t3
    add s1, s1, t4
    add s1, s1, t5
    add s1, s1, t6
    mv a0, s1
    li a7, 0
    ecall
"""


def mulh_ops_expected(n: int) -> int:
    M = (1 << 64) - 1

    def s64(v):
        v &= M
        return v - (1 << 64) if v >> 63 else v

    t0 = (((1 << 64) - 1) >> 13) + n & M
    t1 = (-2037) & M
    t2 = (t0 * t0) >> 64
    t3 = (s64(t0) * s64(t1)) >> 64 & M
    t4 = (s64(t1) * s64(t1)) >> 64
    t5 = (s64(t1) * t0) >> 64 & M
    t6 = (t1 * t1) >> 64
    return (t2 + t3 + t4 + t5 + t6) & M

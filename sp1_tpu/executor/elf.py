"""ELF64 loader for RISC-V guest programs.

Parses a statically-linked little-endian RV64 ELF into the executor's
program model: a contiguous array of instruction words at a base address,
an initial memory image for the data segments, and the entry point
(reference behavior: crates/core/executor/src/program.rs
Program::from_elf / crates/core/executor/src/disassembler/elf.rs — the
reference validates the magic/class/machine the same way, loads PT_LOAD
segments, and takes instructions from the executable segment).

No external toolchain dependency: tests build ELF images in-memory around
the mini-assembler's output with `make_elf`.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np

EM_RISCV = 243
PT_LOAD = 1
PF_X = 1


@dataclass
class Program:
    """Loaded guest program."""

    words: np.ndarray  # uint32 instruction words, contiguous from pc_base
    pc_base: int  # vaddr of words[0]
    pc_start: int  # ELF entry point
    memory_image: dict = field(default_factory=dict)  # byte addr (8-aligned) -> u64


class ElfError(ValueError):
    pass


def load_elf(data: bytes) -> Program:
    """Parse an ELF64 little-endian RISC-V executable."""
    if len(data) < 64 or data[:4] != b"\x7fELF":
        raise ElfError("not an ELF file")
    ei_class, ei_data = data[4], data[5]
    if ei_class != 2:
        raise ElfError("only ELF64 is supported (RV64 guest)")
    if ei_data != 1:
        raise ElfError("only little-endian ELF is supported")
    e_type, e_machine = struct.unpack_from("<HH", data, 16)
    if e_machine != EM_RISCV:
        raise ElfError(f"not a RISC-V ELF (e_machine={e_machine})")
    (e_entry,) = struct.unpack_from("<Q", data, 24)
    (e_phoff,) = struct.unpack_from("<Q", data, 32)
    e_phentsize, e_phnum = struct.unpack_from("<HH", data, 54)

    exec_segs = []  # (vaddr, bytes)
    memory_image: dict[int, int] = {}
    for i in range(e_phnum):
        off = e_phoff + i * e_phentsize
        p_type, p_flags = struct.unpack_from("<II", data, off)
        p_offset, p_vaddr = struct.unpack_from("<QQ", data, off + 8)
        p_filesz, p_memsz = struct.unpack_from("<QQ", data, off + 32)
        if p_type != PT_LOAD:
            continue
        if p_offset + p_filesz > len(data):
            raise ElfError("segment file range out of bounds")
        seg = data[p_offset: p_offset + p_filesz] + b"\x00" * (p_memsz - p_filesz)
        if p_flags & PF_X:
            if p_vaddr % 4:
                raise ElfError("executable segment not 4-byte aligned")
            exec_segs.append((p_vaddr, seg))
        # Every loaded segment (code included — it may hold rodata) goes
        # into the initial memory image as 8-byte words.
        base = p_vaddr & ~7
        lead = p_vaddr - base
        padded = b"\x00" * lead + seg
        if len(padded) % 8:
            padded += b"\x00" * (8 - len(padded) % 8)
        for w in range(len(padded) // 8):
            (val,) = struct.unpack_from("<Q", padded, w * 8)
            addr = base + 8 * w
            memory_image[addr] = memory_image.get(addr, 0) | val

    if not exec_segs:
        raise ElfError("no executable PT_LOAD segment")
    exec_segs.sort()
    pc_base = exec_segs[0][0]
    end = max(v + len(s) for v, s in exec_segs)
    blob = bytearray(end - pc_base)
    for v, s in exec_segs:
        blob[v - pc_base: v - pc_base + len(s)] = s
    if len(blob) % 4:
        blob += b"\x00" * (4 - len(blob) % 4)
    words = np.frombuffer(bytes(blob), dtype="<u4").copy()
    if not (pc_base <= e_entry < pc_base + 4 * len(words)) or e_entry % 4:
        raise ElfError("entry point outside executable segment")
    return Program(
        words=words, pc_base=pc_base, pc_start=int(e_entry), memory_image=memory_image
    )


def make_elf(
    words: np.ndarray,
    pc_base: int = 0,
    entry: int | None = None,
    data_segments: list | None = None,
) -> bytes:
    """Build a minimal valid ELF64 RISC-V executable around instruction words.

    `data_segments`: optional [(vaddr, bytes)] extra PT_LOAD (RW) segments.
    Test/tooling helper standing in for the guest build toolchain."""
    words = np.ascontiguousarray(words, "<u4")
    code = words.tobytes()
    segs = [(pc_base, code, PF_X | 4)]  # R+X
    for vaddr, payload in data_segments or []:
        segs.append((vaddr, bytes(payload), 6))  # R+W
    ehsize, phentsize = 64, 56
    phoff = ehsize
    data_off = phoff + phentsize * len(segs)
    body = b""
    phdrs = b""
    for vaddr, payload, flags in segs:
        off = data_off + len(body)
        phdrs += struct.pack(
            "<IIQQQQQQ", PT_LOAD, flags, off, vaddr, vaddr,
            len(payload), len(payload), 8,
        )
        body += payload
    entry = pc_base if entry is None else entry
    ehdr = struct.pack(
        "<4sBBBBB7xHHIQQQIHHHHHH",
        b"\x7fELF", 2, 1, 1, 0, 0,  # magic, ELF64, LE, current, SysV
        2, EM_RISCV, 1,  # ET_EXEC, RISC-V, version
        entry, phoff, 0,  # entry, phoff, shoff
        0, ehsize, phentsize, len(segs), 0, 0, 0,
    )
    return ehdr + phdrs + body


def execute_elf(data: bytes, inputs: list | None = None, max_cycles: int = 1 << 24):
    """Load an ELF and run it in the native executor."""
    from . import native

    prog = load_elf(data)
    res = native.execute(
        prog.words,
        pc_base=prog.pc_base,
        inputs=inputs,
        memory=prog.memory_image,
        max_cycles=max_cycles,
        pc_start=prog.pc_start,
    )
    return prog, res

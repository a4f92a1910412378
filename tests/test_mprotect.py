"""Untrusted (user-mode) execution + MPROTECT syscall.

Reference behavior being matched: crates/core/executor/src/mode.rs
(UserMode enables page-protection checks, SupervisorMode compiles them
out), minimal/precompiles/mprotect.rs (page-aligned addr, permitted
prot combinations NONE/R/RW/RX), and the per-access page_prot_check in
executor/src/vm.rs (R on loads, W on stores, X on fetch).

Framework divergences (documented): 32-bit guest address space (2^20
pages of 4 KiB), and the single-register syscall ABI — MPROTECT is
ecall 39 with a0 = page_addr | prot (prot rides in the always-zero
page-offset bits).
"""

import pytest

from sp1_tpu.executor import asm, native
from sp1_tpu.executor.native import (
    PROT_EXEC,
    PROT_NONE,
    PROT_READ,
    PROT_WRITE,
    ProtectionFault,
)

# Store to a fresh RW page, drop it to read-only, store again -> fault.
STORE_THEN_PROTECT = """
    lui t0, 2        # t0 = 0x2000 (a data page)
    li t1, 7
    sd t1, 0(t0)     # RW default: OK
    lui a0, 2
    addi a0, a0, 4   # a0 = 0x2000 | PROT_READ
    li a7, 39
    ecall            # mprotect(0x2000, R)
    ld t2, 0(t0)     # read still OK
    sd t1, 8(t0)     # write faults here
    li a0, 0
    li a7, 0
    ecall
"""

PROTECT_NONE_THEN_LOAD = """
    lui a0, 2        # a0 = 0x2000 | PROT_NONE
    li a7, 39
    ecall
    lui t0, 2
    ld t2, 0(t0)     # read faults
    li a7, 0
    ecall
"""

BAD_PROT = """
    lui a0, 2
    addi a0, a0, 2   # W without R: not a permitted combination
    li a7, 39
    ecall
    li a7, 0
    ecall
"""

DROP_OWN_EXEC = """
    li a0, 4         # mprotect(page 0, R) — our own text page
    li a7, 39
    ecall
    li a7, 0         # fetch of this instruction faults
    ecall
"""


class TestMprotect:
    def test_trusted_mode_ignores_protections(self):
        # Supervisor mode: the page table updates but nothing checks it
        # (mode.rs SupervisorMode PAGE_PROTECTION_ENABLED = false).
        res = native.execute(asm.assemble(STORE_THEN_PROTECT))
        assert res.exit_code == 0

    def test_write_violation(self):
        with pytest.raises(ProtectionFault) as ei:
            native.execute(asm.assemble(STORE_THEN_PROTECT), untrusted=True)
        assert ei.value.code == 2  # write
        assert ei.value.addr == 0x2008

    def test_read_violation(self):
        with pytest.raises(ProtectionFault) as ei:
            native.execute(asm.assemble(PROTECT_NONE_THEN_LOAD), untrusted=True)
        assert ei.value.code == 1  # read
        assert ei.value.addr == 0x2000

    def test_bad_prot_combination_rejected(self):
        with pytest.raises(ProtectionFault) as ei:
            native.execute(asm.assemble(BAD_PROT), untrusted=True)
        assert ei.value.code == 4

    def test_exec_violation_after_dropping_x(self):
        with pytest.raises(ProtectionFault) as ei:
            native.execute(asm.assemble(DROP_OWN_EXEC), untrusted=True)
        assert ei.value.code == 3  # exec

    def test_untrusted_clean_run_matches_trusted(self):
        prog = asm.assemble(asm.FIBONACCI)
        a = native.execute(prog, inputs=[10])
        b = native.execute(prog, inputs=[10], untrusted=True)
        assert a.exit_code == b.exit_code == 55
        assert a.cycles == b.cycles

    def test_page_prots_preset(self):
        # Host-set protections (the ELF loader's segment-flags hook).
        prog = asm.assemble("""
            lui t0, 3
            sd t0, 0(t0)
            li a7, 0
            ecall
        """)
        with pytest.raises(ProtectionFault) as ei:
            native.execute(
                prog, untrusted=True, page_prots={0x3000: PROT_READ}
            )
        assert ei.value.code == 2

    def test_precompile_buffer_protection(self):
        # sha_extend over a read-only buffer must fault (px_prot_ok).
        prog = asm.assemble("""
            lui a0, 2
            addi a0, a0, 4
            li a7, 39
            ecall            # mprotect(0x2000, R)
            lui a0, 2
            li a7, 8
            ecall            # sha_extend(w @ 0x2000)
            li a7, 0
            ecall
        """)
        with pytest.raises(ProtectionFault):
            native.execute(prog, untrusted=True)

    def test_prot_constants_match_elf_pf_bits(self):
        assert (PROT_NONE, PROT_EXEC, PROT_WRITE, PROT_READ) == (0, 1, 2, 4)

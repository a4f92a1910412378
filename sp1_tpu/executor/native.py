"""ctypes binding for the native RV64IM executor (native/executor.cpp).

Always builds from source: the library filename is keyed by a hash of
executor.cpp, so a stale or foreign binary can never be loaded (build
artifacts live under native/build/, which is gitignored). The events
come back as a structured numpy array matching the C++ `Event`
layout — the input to trace generation.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO, "native", "executor.cpp")


def _lib_path() -> str:
    with open(_SRC, "rb") as fh:
        digest = hashlib.sha256(fh.read()).hexdigest()[:16]
    return os.path.join(_REPO, "native", "build", f"libsp1executor-{digest}.so")

EVENT_DTYPE = np.dtype(
    [
        ("clk", np.uint64),
        ("pc", np.uint64),
        ("instr", np.uint64),
        ("next_pc", np.uint64),
        ("a", np.uint64),
        ("b", np.uint64),
        ("c", np.uint64),
        ("rs1_prev_ts", np.uint64),
        ("rs2_prev_ts", np.uint64),
        ("rd_prev_ts", np.uint64),
        ("rd_prev_val", np.uint64),
        ("mem_addr", np.uint64),
        ("mem_prev_ts", np.uint64),
        ("mem_prev_val", np.uint64),
        ("mem_val", np.uint64),
        ("flags", np.uint64),
    ]
)

FLAG_MEM = 1
FLAG_STORE = 2
FLAG_HALT = 4

# Precompile round events (native PxEvent; reference role:
# crates/core/executor/src/events/precompiles/). One record per round:
# up to 4 reads + 1 read-modify-write of 8-byte cells.
PX_EVENT_DTYPE = np.dtype(
    [
        ("clk", np.uint64),       # per-round clk = parent ecall clk + 1 + step
        ("kind", np.uint64),      # syscall id
        ("step", np.uint64),
        ("ptr", np.uint64),
        ("r_addr", np.uint64, (4,)),
        ("r_prev_ts", np.uint64, (4,)),
        ("r_val", np.uint64, (4,)),
        ("w_addr", np.uint64),
        ("w_prev_ts", np.uint64),
        ("w_prev_val", np.uint64),
        ("w_val", np.uint64),
    ]
)

SYSCALL_SHA_EXTEND = 8
SYSCALL_SHA_COMPRESS = 9

_lib = None


def _build(lib_path: str):
    os.makedirs(os.path.dirname(lib_path), exist_ok=True)
    tmp = lib_path + f".tmp{os.getpid()}"
    subprocess.run(
        ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", tmp, _SRC],
        check=True,
    )
    os.replace(tmp, lib_path)  # atomic under concurrent builders


def get_lib():
    global _lib
    if _lib is None:
        lib_path = _lib_path()
        if not os.path.exists(lib_path):
            _build(lib_path)
        lib = ctypes.CDLL(lib_path)
        lib.ex_create.restype = ctypes.c_void_p
        lib.ex_create.argtypes = [
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.c_uint64,
            ctypes.c_uint64,
        ]
        lib.ex_set_input.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_uint64),
            ctypes.c_uint64,
        ]
        lib.ex_write_memory.argtypes = [ctypes.c_void_p, ctypes.c_uint64, ctypes.c_uint64]
        lib.ex_set_pc.argtypes = [ctypes.c_void_p, ctypes.c_uint64]
        lib.ex_run.restype = ctypes.c_int64
        lib.ex_run.argtypes = [ctypes.c_void_p, ctypes.c_uint64]
        lib.ex_num_events.restype = ctypes.c_uint64
        lib.ex_num_events.argtypes = [ctypes.c_void_p]
        lib.ex_get_events.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint64)]
        lib.ex_exit_code.restype = ctypes.c_uint64
        lib.ex_exit_code.argtypes = [ctypes.c_void_p]
        lib.ex_clk.restype = ctypes.c_uint64
        lib.ex_clk.argtypes = [ctypes.c_void_p]
        lib.ex_reg.restype = ctypes.c_uint64
        lib.ex_reg.argtypes = [ctypes.c_void_p, ctypes.c_uint64]
        lib.ex_reg_ts.restype = ctypes.c_uint64
        lib.ex_reg_ts.argtypes = [ctypes.c_void_p, ctypes.c_uint64]
        lib.ex_output_len.restype = ctypes.c_uint64
        lib.ex_output_len.argtypes = [ctypes.c_void_p]
        lib.ex_get_output.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8)]
        lib.ex_touched_memory.restype = ctypes.c_uint64
        lib.ex_touched_memory.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_uint64),
            ctypes.POINTER(ctypes.c_uint64),
            ctypes.POINTER(ctypes.c_uint64),
        ]
        lib.ex_destroy.argtypes = [ctypes.c_void_p]
        lib.ex_run_chunk.restype = ctypes.c_int64
        lib.ex_run_chunk.argtypes = [ctypes.c_void_p, ctypes.c_uint64]
        lib.ex_set_record.argtypes = [ctypes.c_void_p, ctypes.c_uint64]
        lib.ex_num_px_events.restype = ctypes.c_uint64
        lib.ex_num_px_events.argtypes = [ctypes.c_void_p]
        lib.ex_get_px_events.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint64)]
        lib.ex_clear_events.argtypes = [ctypes.c_void_p]
        lib.ex_report_len.restype = ctypes.c_uint64
        lib.ex_set_mode.argtypes = [ctypes.c_void_p, ctypes.c_uint64]
        lib.ex_set_page_prot.argtypes = [
            ctypes.c_void_p, ctypes.c_uint64, ctypes.c_uint64,
        ]
        lib.ex_trap.restype = ctypes.c_uint64
        lib.ex_trap.argtypes = [ctypes.c_void_p]
        lib.ex_trap_addr.restype = ctypes.c_uint64
        lib.ex_trap_addr.argtypes = [ctypes.c_void_p]
        lib.ex_report_len.argtypes = []
        lib.ex_report.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint64)]
        _lib = lib
    return _lib


# Opcode-class names, index-matched to native/executor.cpp OpClass.
OP_CLASSES = [
    "alu", "alu_imm", "alu_w", "alu_imm_w", "mul", "div",
    "load", "store", "branch", "jal", "jalr", "lui", "auipc", "ecall",
]


def _read_report(lib, vm) -> dict:
    buf = np.zeros(lib.ex_report_len(), np.uint64)
    lib.ex_report(vm, buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)))
    counts = {
        name: int(buf[i]) for i, name in enumerate(OP_CLASSES) if buf[i]
    }
    syscalls = {
        int(i): int(c)
        for i, c in enumerate(buf[len(OP_CLASSES):])
        if c
    }
    return {"opcode_counts": counts, "syscall_counts": syscalls}


class ProtectionFault(RuntimeError):
    """Untrusted-mode page-protection violation (reference role: the
    executor Interrupt raised by page_prot_check, mode.rs UserMode).

    trap codes: 1 read, 2 write, 3 exec, 4 bad mprotect call."""

    def __init__(self, code: int, addr: int):
        super().__init__(f"page protection fault (trap={code}, addr={addr:#x})")
        self.code = code
        self.addr = addr


# mprotect prot bits (ELF PF_* encoding, reference consts.rs)
PROT_NONE, PROT_EXEC, PROT_WRITE, PROT_READ = 0, 1, 2, 4
SYSCALL_MPROTECT = 39


class ExecutionResult:
    def __init__(
        self, events, exit_code, cycles, output, touched, regs, report=None, px_events=None
    ):
        self.events = events  # structured np array (EVENT_DTYPE)
        self.exit_code = exit_code
        self.cycles = cycles
        self.output = output
        self.touched_memory = touched  # (addrs, vals, tss)
        self.regs = regs
        self.report = report or {}  # opcode_counts / syscall_counts
        # precompile round events (PX_EVENT_DTYPE), clk-ordered
        self.px_events = (
            px_events if px_events is not None else np.zeros(0, PX_EVENT_DTYPE)
        )


def _fetch_px_events(lib, vm) -> np.ndarray:
    n = lib.ex_num_px_events(vm)
    px = np.zeros(n, PX_EVENT_DTYPE)
    if n:
        lib.ex_get_px_events(vm, px.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)))
    return px


def execute(
    program_words: np.ndarray,
    pc_base: int = 0,
    inputs: list | None = None,
    memory: dict | None = None,
    max_cycles: int = 1 << 24,
    pc_start: int | None = None,
    record_events: bool = True,
    untrusted: bool = False,
    page_prots: dict | None = None,
) -> ExecutionResult:
    """record_events=False runs the pure-execution fast path (no event
    stream; tens of MHz) — the analog of the reference's minimal
    executor mode (crates/perf executor `simple` runs). The report,
    exit code, output and touched memory are still produced.

    untrusted=True enables user-mode page-protection checks (reference:
    mode.rs UserMode): pages default to RW, the program's own pages are
    marked R|X, and the guest adjusts protections via the MPROTECT
    syscall (39). A violation raises ProtectionFault. page_prots maps
    addr -> prot byte for extra pre-set pages (e.g. ELF segment flags)."""
    lib = get_lib()
    words = np.ascontiguousarray(program_words, np.uint32)
    vm = lib.ex_create(
        words.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), len(words), pc_base
    )
    try:
        if inputs:
            arr = np.asarray(inputs, np.uint64)
            lib.ex_set_input(
                vm, arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)), len(arr)
            )
        if memory:
            for addr, val in memory.items():
                lib.ex_write_memory(vm, addr, val)
        if pc_start is not None:
            lib.ex_set_pc(vm, pc_start)
        if not record_events:
            lib.ex_set_record(vm, 0)
        if untrusted:
            lib.ex_set_mode(vm, 1)
            page = 1 << 12
            lo = pc_base & ~(page - 1)
            hi = pc_base + 4 * len(words)
            for addr in range(lo, hi, page):
                lib.ex_set_page_prot(vm, addr, PROT_READ | PROT_EXEC)
        if page_prots:
            lib.ex_set_mode(vm, 1)
            for addr, prot in page_prots.items():
                lib.ex_set_page_prot(vm, addr, prot)
        rc = lib.ex_run(vm, max_cycles)
        if rc == -2:
            raise ProtectionFault(lib.ex_trap(vm), lib.ex_trap_addr(vm))
        if rc != 0:
            raise RuntimeError(f"execution did not halt cleanly (rc={rc})")
        n = lib.ex_num_events(vm)
        events = np.zeros(n, EVENT_DTYPE)
        if n:
            lib.ex_get_events(
                vm, events.ctypes.data.__index__() and events.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64))
            )
        out_len = lib.ex_output_len(vm)
        output = np.zeros(out_len, np.uint8)
        if out_len:
            lib.ex_get_output(vm, output.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        ntouched = lib.ex_touched_memory(vm, None, None, None)
        addrs = np.zeros(ntouched, np.uint64)
        vals = np.zeros(ntouched, np.uint64)
        tss = np.zeros(ntouched, np.uint64)
        if ntouched:
            lib.ex_touched_memory(
                vm,
                addrs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
                vals.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
                tss.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            )
        regs = np.array([lib.ex_reg(vm, r) for r in range(32)], np.uint64)
        reg_ts = np.array([lib.ex_reg_ts(vm, r) for r in range(32)], np.uint64)
        res = ExecutionResult(
            events=events,
            exit_code=lib.ex_exit_code(vm),
            cycles=lib.ex_clk(vm),
            output=bytes(output.tobytes()),
            touched=(addrs, vals, tss),
            regs=regs,
            report=_read_report(lib, vm),
            px_events=_fetch_px_events(lib, vm),
        )
        res.reg_ts = reg_ts
        return res
    finally:
        lib.ex_destroy(vm)


class StreamingVM:
    """Bounded-memory chunked execution: events are drained in fixed-size
    chunks instead of materializing the whole stream in RAM (reference
    role: the JIT's shm trace ring + splicing engine,
    crates/core/jit/src/shm.rs + crates/core/executor/src/splicing.rs).
    Each drained chunk maps 1:1 to one proof shard's event segment.

    Usage:
        vm = StreamingVM(program, inputs=[...])
        for chunk in vm.run_chunks(1 << mlrc):
            ...  # chunk: structured EVENT_DTYPE array, len <= chunk size
        vm.exit_code, vm.cycles, vm.touched_memory, vm.report
    """

    def __init__(self, program_words, pc_base: int = 0, inputs=None, memory=None):
        self._lib = get_lib()
        words = np.ascontiguousarray(program_words, np.uint32)
        self._vm = self._lib.ex_create(
            words.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            len(words),
            pc_base,
        )
        if inputs:
            arr = np.asarray(inputs, np.uint64)
            self._lib.ex_set_input(
                self._vm, arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)), len(arr)
            )
        if memory:
            for addr, val in memory.items():
                self._lib.ex_write_memory(self._vm, addr, val)
        self.exit_code = None
        self.cycles = None
        self.output = b""
        self.touched_memory = None
        self.report = {}

    def run_chunks(self, chunk_events: int, max_cycles: int = 1 << 40, with_px=False):
        """Yields EVENT_DTYPE chunks; with_px=True yields (events, px_events)
        pairs where px_events are the precompile rounds spawned by ecalls
        inside the chunk (they always travel with their parent chunk)."""
        lib, vm = self._lib, self._vm
        try:
            while True:
                rc = lib.ex_run_chunk(vm, chunk_events)
                if rc == -1:
                    raise RuntimeError("illegal instruction / out-of-bounds pc")
                n = lib.ex_num_events(vm)
                if n:
                    events = np.zeros(n, EVENT_DTYPE)
                    lib.ex_get_events(
                        vm, events.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64))
                    )
                    px = _fetch_px_events(lib, vm)
                    lib.ex_clear_events(vm)
                    yield (events, px) if with_px else events
                if rc == 0:
                    break
                if lib.ex_clk(vm) >= max_cycles:
                    raise RuntimeError(f"exceeded max_cycles={max_cycles}")
            self._finish()
        finally:
            self.close()

    def _finish(self):
        lib, vm = self._lib, self._vm
        self.exit_code = lib.ex_exit_code(vm)
        self.cycles = lib.ex_clk(vm)
        out_len = lib.ex_output_len(vm)
        output = np.zeros(out_len, np.uint8)
        if out_len:
            lib.ex_get_output(vm, output.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        self.output = bytes(output.tobytes())
        ntouched = lib.ex_touched_memory(vm, None, None, None)
        addrs = np.zeros(ntouched, np.uint64)
        vals = np.zeros(ntouched, np.uint64)
        tss = np.zeros(ntouched, np.uint64)
        if ntouched:
            lib.ex_touched_memory(
                vm,
                addrs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
                vals.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
                tss.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            )
        self.touched_memory = (addrs, vals, tss)
        self.regs = np.array([lib.ex_reg(vm, r) for r in range(32)], np.uint64)
        self.report = _read_report(lib, vm)

    def close(self):
        if self._vm is not None:
            self._lib.ex_destroy(self._vm)
            self._vm = None

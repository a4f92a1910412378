"""sp1-tpu command line: execute / prove / verify / vkey on guest ELFs.

The TPU-native counterpart of `cargo prove` (reference:
crates/cli/src/bin/cargo-prove.rs:26-49 — new/build/vkey subcommands —
plus the perf binaries' execute/prove drivers in
crates/perf/src/bin/{executor,prover}.rs). There is no guest Rust
toolchain in this environment, so `build` is replaced by `asm`
(assemble a .s file written in the in-repo assembler dialect to a
guest ELF).

Usage:
    python -m sp1_tpu.cli execute PROG.elf [--stdin 1,2,3]
    python -m sp1_tpu.cli prove   PROG.elf [--stdin ...] [-o proof.bin]
    python -m sp1_tpu.cli verify  proof.bin
    python -m sp1_tpu.cli vkey    PROG.elf
    python -m sp1_tpu.cli asm     GUEST.s -o PROG.elf

Proof files are pickled (proof, vk) pairs — a local artifact format,
not a network wire format.
"""

from __future__ import annotations

import argparse
import json
import pickle
import sys
import time


def _parse_stdin(s: str | None) -> list:
    if not s:
        return []
    return [int(x, 0) for x in s.split(",") if x.strip()]


def _client(args):
    from .pcs.basefold import FriConfig
    from .pcs.jagged import JaggedConfig
    from .riscv.machine import WordSpec
    from .sdk.client import ProverClient

    kwargs = {}
    if args.mlrc is not None:
        kwargs["max_log_row_count"] = args.mlrc
    if args.limb_bits is not None:
        kwargs["word_spec"] = WordSpec(limb_bits=args.limb_bits)
        if args.mlrc is not None and args.mlrc < 16:
            kwargs["config"] = JaggedConfig(
                FriConfig(log_blowup=1, num_queries=6, proof_of_work_bits=2),
                log_stacking_height=args.mlrc + 3,
                max_log_row_count=args.mlrc,
            )
    return ProverClient.builder().cpu(**kwargs).build()


def _load_program(path: str):
    from .executor import elf

    with open(path, "rb") as f:
        return elf.load_elf(f.read())


def cmd_execute(args) -> int:
    from .executor import native

    prog = _load_program(args.elf)
    t0 = time.time()
    res = native.execute(
        prog.words, pc_base=prog.pc_base, inputs=_parse_stdin(args.stdin),
        memory=prog.memory_image, pc_start=prog.pc_start,
    )
    secs = time.time() - t0
    report = {
        "exit_code": int(res.exit_code),
        "cycles": int(res.cycles),
        "execute_secs": round(secs, 4),
        "mhz": round(int(res.cycles) / max(secs, 1e-9) / 1e6, 3),
        "opcode_counts": res.report.get("opcode_counts", {}),
        "syscall_counts": res.report.get("syscall_counts", {}),
    }
    print(json.dumps(report))
    return 0


def cmd_prove(args) -> int:
    client = _client(args)
    prog = _load_program(args.elf)
    # The whole Program object goes through setup so the proof attests the
    # same execution `execute` reports: data segments (memory_image) seed
    # the executor's initial RAM and the ELF entry (pc_start) becomes
    # vk.pc_start (checked against the first shard's public values).
    pk, vk = client.setup(prog)
    t0 = time.time()
    proof = client.prove(pk, stdin=_parse_stdin(args.stdin)).core()
    secs = time.time() - t0
    out = args.output or (args.elf + ".proof")
    with open(out, "wb") as f:
        pickle.dump({"proof": proof, "vk": vk}, f)
    print(json.dumps({
        "shards": len(proof.shard_proofs),
        "prove_secs": round(secs, 3),
        "proof_file": out,
    }))
    return 0


class _ProofUnpickler(pickle.Unpickler):
    """Restricted unpickler for proof files: a proof is the canonical
    ADVERSARIAL input to a verifier, so arbitrary-code-execution pickles
    are rejected — only numpy array reconstruction and the proof/vk
    dataclasses are allowed."""

    _ALLOWED_PREFIXES = (
        "sp1_tpu.prover.",
        "sp1_tpu.pcs.",
        "sp1_tpu.iop.",
        "sp1_tpu.sdk.",
        "sp1_tpu.recursion.",
    )

    def find_class(self, module, name):
        if module == "numpy" and name in ("ndarray", "dtype", "uint32", "uint64", "int64"):
            return super().find_class(module, name)
        if module in ("numpy.core.multiarray", "numpy._core.multiarray") and name in (
            "_reconstruct", "scalar",
        ):
            return super().find_class(module, name)
        if module.startswith(self._ALLOWED_PREFIXES) and not name.startswith("_"):
            import importlib

            cls = getattr(importlib.import_module(module), name)
            if isinstance(cls, type):
                return cls
        raise pickle.UnpicklingError(
            f"proof file references disallowed global {module}.{name}"
        )


def cmd_verify(args) -> int:
    client = _client(args)
    with open(args.proof, "rb") as f:
        blob = _ProofUnpickler(f).load()
    ok = client.verify(blob["proof"], blob["vk"])
    print(json.dumps({"verified": bool(ok)}))
    return 0 if ok else 1


def cmd_vkey(args) -> int:
    client = _client(args)
    prog = _load_program(args.elf)
    _, vk = client.setup(prog)
    print(json.dumps({
        "preprocessed_commit": [int(v) for v in vk.preprocessed_commit],
        "pc_start": [int(v) for v in vk.pc_start],
    }))
    return 0


def cmd_asm(args) -> int:
    from .executor import asm, elf

    with open(args.source) as f:
        src = f.read()
    words = asm.assemble(src)
    data = elf.make_elf(words)
    out = args.output or (args.source.rsplit(".", 1)[0] + ".elf")
    with open(out, "wb") as f:
        f.write(data)
    print(json.dumps({"elf": out, "insns": len(words), "bytes": len(data)}))
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="sp1-tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    def common(p, elf=True):
        if elf:
            p.add_argument("elf")
        p.add_argument("--stdin", default=None,
                       help="comma-separated integers fed to READ ecalls")
        p.add_argument("--mlrc", type=int, default=None,
                       help="log2 max shard rows (default: production 16)")
        p.add_argument("--limb-bits", type=int, default=None,
                       help="word limb width; 8 selects the small test machine")

    common(sub.add_parser("execute", help="run an ELF, print ExecutionReport"))
    p = sub.add_parser("prove", help="prove an ELF execution")
    common(p)
    p.add_argument("-o", "--output", default=None)
    p = sub.add_parser("verify", help="verify a proof file")
    p.add_argument("proof")
    p.add_argument("--mlrc", type=int, default=None)
    p.add_argument("--limb-bits", type=int, default=None)
    p = sub.add_parser("vkey", help="print the verifying key of an ELF")
    common(p)
    p = sub.add_parser("asm", help="assemble a guest .s file to an ELF")
    p.add_argument("source")
    p.add_argument("-o", "--output", default=None)

    args = ap.parse_args(argv)
    return {
        "execute": cmd_execute, "prove": cmd_prove, "verify": cmd_verify,
        "vkey": cmd_vkey, "asm": cmd_asm,
    }[args.cmd](args)


if __name__ == "__main__":
    sys.exit(main())

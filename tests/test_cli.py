"""CLI surface: execute / prove / verify / vkey / asm on on-disk ELFs.

Reference: crates/cli/src/bin/cargo-prove.rs (subcommand set) and the
perf execute/prove drivers in crates/perf/src/bin/.
"""

import json
import os

from sp1_tpu import cli

ELFS = os.path.join(os.path.dirname(__file__), "elfs")
FIB = os.path.join(ELFS, "fibonacci.elf")


class TestCli:
    def test_execute_reports_cycles(self, capsys):
        assert cli.main(["execute", FIB, "--stdin", "10"]) == 0
        rep = json.loads(capsys.readouterr().out)
        assert rep["exit_code"] == 55
        assert rep["cycles"] > 10
        assert rep["opcode_counts"]

    def test_asm_roundtrip(self, tmp_path, capsys):
        src = tmp_path / "guest.s"
        src.write_text("    li a7, 3\n    ecall\n    li a7, 0\n    ecall\n")
        assert cli.main(["asm", str(src)]) == 0
        out = json.loads(capsys.readouterr().out)
        assert cli.main(["execute", out["elf"], "--stdin", "42"]) == 0
        rep = json.loads(capsys.readouterr().out)
        assert rep["exit_code"] == 42

    def test_prove_verify_roundtrip(self, tmp_path, capsys):
        proof_file = str(tmp_path / "fib.proof")
        rc = cli.main([
            "prove", FIB, "--stdin", "9", "--mlrc", "9", "--limb-bits", "8",
            "-o", proof_file,
        ])
        assert rc == 0
        rep = json.loads(capsys.readouterr().out)
        assert rep["shards"] >= 1 and os.path.exists(proof_file)
        rc = cli.main(["verify", proof_file, "--mlrc", "9", "--limb-bits", "8"])
        assert rc == 0
        assert json.loads(capsys.readouterr().out)["verified"] is True

    def test_vkey_prints_commit(self, capsys):
        assert cli.main(["vkey", FIB, "--mlrc", "9", "--limb-bits", "8"]) == 0
        rep = json.loads(capsys.readouterr().out)
        assert len(rep["preprocessed_commit"]) == 8

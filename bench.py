"""Benchmark: end-to-end fibonacci shard proof throughput.

Prints the result as JSON lines: the host-suite fallback line first
(guaranteed within ~5 min), then the device-measured line when the TPU
child completes — the LAST line is authoritative.

Metric: prover throughput in kHz (cycles proven per second / 1e3) — the
reference's headline metric (reference: sp1-gpu/crates/perf/src/report.rs
`khz = cycles / prove_secs / 1e3`). vs_baseline compares against a
1000 kHz single-GPU-class target.

Architecture (robustness against cold-cache jit compiles, which on the
axon TPU path are remote requests taking minutes each):

  parent (this file, no jax import):
    1. run a HOST-ONLY child (numpy prover + cpu jax, no TPU contact) —
       fast, deterministic; its number is the guaranteed fallback.
    2. run a DEVICE child (axon TPU) under the remaining time budget,
       reading the in-repo persistent jit cache (.jax_cache/).
    3. print the device JSON if it completed, else the fallback JSON.

Both children print their result JSON on stdout and a per-stage time
split on stderr (commit/gkr/zerocheck/opening — reference:
sp1-gpu/crates/perf/src/report.rs:54-73 kHz split).

The host child additionally proves a keccak-permute and a sha-extend
workload (small shapes) so the final JSON carries a multi-workload
"workloads" report with executor MHz per workload (reference CSV schema:
sp1-gpu/crates/perf/README.md suite runs).

Env knobs: SP1_BENCH_BUDGET (secs, default 2000), SP1_BENCH_MLRC
(log2 shard rows, default 12 host / 16 device), SP1_BENCH_LIMB_BITS
(default 16), SP1_BENCH_DEVICE_ONLY / SP1_BENCH_HOST_ONLY.
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
BASELINE_KHZ = 1000.0  # single-GPU-class reference target


def run_child(mode: str, timeout: float, mlrc: int, limb_bits: int):
    """Run one measurement in a subprocess; returns parsed JSON or None."""
    env = dict(os.environ)
    env["SP1_BENCH_CHILD"] = mode
    env["SP1_BENCH_DEADLINE"] = str(time.time() + timeout - 30)
    env["SP1_BENCH_MLRC"] = str(mlrc)
    env["SP1_BENCH_LIMB_BITS"] = str(limb_bits)
    env["SP1_TPU_TIMING"] = "1"
    if mode == "host":
        # No TPU contact: disable the axon plugin before python starts and
        # route all prover math to numpy (see tests/conftest.py rationale).
        env["PALLAS_AXON_POOL_IPS"] = ""
        env["JAX_PLATFORMS"] = "cpu"
        env["SP1_TPU_HOST_THRESH"] = str(1 << 62)
    try:
        # Child stderr streams through live so a timeout still leaves the
        # per-stage progress trail in the driver log.
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            cwd=REPO,
            timeout=timeout,
            stdout=subprocess.PIPE,
            stderr=None,
            text=True,
        )
    except subprocess.TimeoutExpired as e:
        print(f"[bench] {mode} child timed out after {timeout:.0f}s", file=sys.stderr)
        # salvage the cumulative JSON lines the child printed per stage
        out = e.stdout or ""
        if isinstance(out, bytes):
            out = out.decode(errors="replace")
        result = None
        for line in out.splitlines():
            line = line.strip()
            if line.startswith("{"):
                try:
                    result = json.loads(line)
                except json.JSONDecodeError:
                    continue
        return result
    if proc.returncode != 0:
        print(f"[bench] {mode} child rc={proc.returncode}", file=sys.stderr)
        return None
    result = None
    for line in proc.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                result = json.loads(line)  # LAST line wins (cumulative)
            except json.JSONDecodeError:
                continue
    return result


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

SHA_LOOP = """
    li a7, 3
    ecall            # a0 = iteration count
    mv s2, a0
    li s0, 1024
    li t0, 16
    mv s1, s0
fill:
    sd t0, 0(s1)
    addi s1, s1, 8
    addi t0, t0, -1
    bne t0, zero, fill
sloop:
    li a7, 8
    mv a0, s0
    ecall            # SHA_EXTEND(w @ s0)
    addi s2, s2, -1
    bne s2, zero, sloop
    ld a0, 0(s0)
    li a7, 0
    ecall
"""


def child_main(mode: str):
    """The actual measurement (runs in a subprocess).

    Workload suite (reference: crates/perf/README.md canonical runs):
      fibonacci        — single shard at 2^mlrc cycles (primary metric)
      fibonacci_2shard — 2-shard execution through the multi-shard
                         splicing + septic chaining path
      keccak           — keccak-f[1600] AIR at 2^14 rows ON DEVICE
      sha_extend       — sha extend AIR at ~2^mlrc rows ON DEVICE
    Each stage prints a cumulative JSON line — the LAST line always
    carries every workload that finished inside the deadline."""
    import jax

    cache = ".jax_cache" if mode == "device" else ".jax_cache_cpu"
    jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from sp1_tpu.executor import asm, native
    from sp1_tpu.iop.challenger import DuplexChallenger
    from sp1_tpu.pcs.basefold import FriConfig
    from sp1_tpu.pcs.jagged import JaggedConfig
    from sp1_tpu.prover import machine as mm
    from sp1_tpu.prover import multi
    from sp1_tpu.riscv import tracegen
    from sp1_tpu.riscv.machine import WordSpec, build_machine
    from sp1_tpu.utils import timing

    mlrc = int(os.environ.get("SP1_BENCH_MLRC", "12"))
    limb_bits = int(os.environ.get("SP1_BENCH_LIMB_BITS", "16"))
    deadline = float(os.environ.get("SP1_BENCH_DEADLINE", "0")) or None
    ws = WordSpec(limb_bits=limb_bits)
    config = JaggedConfig(
        FriConfig.core(),  # log_blowup=2, unique-decoding queries, 16-bit PoW
        log_stacking_height=min(21, mlrc + 3),
        max_log_row_count=mlrc,
    )

    def progress(msg):
        print(f"[{time.time() - t_begin:7.1f}s] {msg}", file=sys.stderr, flush=True)

    t_begin = time.time()

    # Reference measurement log (crates/perf/README.md:148-150 schema):
    # each successful prove appends one CSV row. gas has no model here
    # (no gas VM yet) and is reported as 0, like an un-gassed run.
    csv_path = os.path.join(REPO, "bench_data", "measurements.csv")
    os.makedirs(os.path.dirname(csv_path), exist_ok=True)
    if not os.path.exists(csv_path):
        with open(csv_path, "w") as fh:
            fh.write(
                "timestamp,program,param,mode,cycles,gas,elf_bytes,"
                "execute_secs,setup_secs,prove_secs,khz,mgas_per_s\n"
            )

    def csv_row(program_name, elf_words, cycles, execute_secs, setup_secs,
                prove_secs):
        khz_w = cycles / prove_secs / 1e3
        with open(csv_path, "a") as fh:
            fh.write(
                f"{int(time.time())},{program_name},mlrc{mlrc}-limb{limb_bits}"
                f"-{mode},core,{cycles},0,{elf_words * 4},"
                f"{execute_secs:.3f},{setup_secs:.3f},{prove_secs:.3f},"
                f"{khz_w:.4f},0\n"
            )

    def budget_left() -> float:
        return (deadline - time.time()) if deadline else float("inf")

    machine = build_machine(ws)
    prover = mm.ShardProver(machine, config)
    verifier = mm.ShardVerifier(machine, config)

    def executor_mhz() -> float:
        """Pure-execution throughput (reference metric: perf README
        executor MHz — the minimal-executor mode) on a 12M-cycle run."""
        t0 = time.time()
        r = native.execute(
            asm.assemble(asm.FIBONACCI), inputs=[2_000_000],
            max_cycles=1 << 28, record_events=False,
        )
        return r.cycles / (time.time() - t0) / 1e6

    def prove_workload(name, src_asm, inputs, warm=False):
        """Prove one workload shard; returns its kHz."""
        prog_w = asm.assemble(src_asm)
        t_e = time.time()
        res_w = native.execute(prog_w, inputs=inputs)
        exec_secs = time.time() - t_e
        traces_w, prep_w = tracegen.generate_traces(res_w, prog_w, 0, ws, mlrc)
        t_s = time.time()
        pk_w = prover.setup(preprocessed_traces=prep_w)
        setup_secs = time.time() - t_s
        pv_w = tracegen.make_public_values(res_w, 0, ws, traces=traces_w)
        for _timed in ((False, True) if warm else (True,)):
            ch_w = DuplexChallenger()
            pk_w.vk.observe_into(ch_w)
            t0_w = time.time()
            proof_w = prover.prove_shard(pk_w, traces_w, pv_w, ch_w)
            dt_w = time.time() - t0_w
        vch_w = DuplexChallenger()
        pk_w.vk.observe_into(vch_w)
        assert verifier.verify_shard(pk_w.vk, proof_w, vch_w), f"{name} reject"
        progress(f"workload {name}: {res_w.cycles} cycles in {dt_w:.1f}s")
        csv_row(name, len(prog_w), res_w.cycles, exec_secs, setup_secs, dt_w)
        return {
            "cycles": int(res_w.cycles),
            "prove_secs": round(dt_w, 3),
            "khz": round(res_w.cycles / dt_w / 1e3, 4),
        }

    prog = asm.assemble(asm.FIBONACCI)
    # fibonacci loop is 6 cycles/iteration + 9 fixed; fill the shard
    n_iters = ((1 << mlrc) - 9) // 6
    t_e = time.time()
    res = native.execute(prog, inputs=[n_iters])
    fib_exec_secs = time.time() - t_e
    traces, prep = tracegen.generate_traces(res, prog, 0, ws, mlrc)
    progress(f"traces generated ({res.cycles} cycles)")
    t_s = time.time()
    pk = prover.setup(preprocessed_traces=prep)
    fib_setup_secs = time.time() - t_s
    progress("setup done (preprocessed commit)")

    # Warm-up run (jit compilation) in device mode only — the host child
    # is pure numpy, where a warmup just burns the time budget.
    pv = tracegen.make_public_values(res, 0, ws, traces=traces)
    runs = (False, True) if mode == "device" else (True,)
    for timed in runs:
        timing.reset()
        ch = DuplexChallenger()
        pk.vk.observe_into(ch)
        t0 = time.time()
        proof = prover.prove_shard(pk, traces, pv, ch)
        dt = time.time() - t0
        progress(f"{'timed' if timed else 'warmup'} prove: {dt:.1f}s "
                 f"stages={json.dumps(timing.report())}")
        if timed:
            prove_secs = dt
    print(f"stages: {json.dumps(timing.report())}", file=sys.stderr)
    print(f"prove_secs={prove_secs:.3f} cycles={res.cycles} mlrc={mlrc} "
          f"limb_bits={limb_bits}", file=sys.stderr)

    vch = DuplexChallenger()
    pk.vk.observe_into(vch)
    assert verifier.verify_shard(pk.vk, proof, vch), "proof failed to verify"

    csv_row("fibonacci", len(prog), res.cycles, fib_exec_secs,
            fib_setup_secs, prove_secs)
    khz = res.cycles / prove_secs / 1e3
    out = {
        "metric": "core_prover_throughput",
        "value": round(khz, 4),
        "unit": "kHz",
        "vs_baseline": round(khz / BASELINE_KHZ, 6),
        "executor_mhz": round(executor_mhz(), 1),
        "workloads": {
            "fibonacci": {"cycles": int(res.cycles),
                          "prove_secs": round(prove_secs, 3),
                          "khz": round(khz, 4)},
        },
    }
    print(json.dumps(out), flush=True)  # primary metric is now safe

    # -- multi-workload suite -----------------------------------------------
    warm = mode == "device"
    if budget_left() > 900:
        try:
            # 2-shard fibonacci: multi-shard splicing + septic chaining
            n2 = (2 * (1 << mlrc) - 9) // 6
            res2 = native.execute(prog, inputs=[n2], max_cycles=1 << 28)
            if warm:  # first pass pays the second shard shape's compiles
                multi.prove_program(prover, pk, res2, prog, 0, ws, mlrc)
            t0 = time.time()
            proofs2 = multi.prove_program(prover, pk, res2, prog, 0, ws, mlrc)
            dt2 = time.time() - t0
            assert multi.verify_program(verifier, pk.vk, proofs2)
            out["workloads"]["fibonacci_2shard"] = {
                "cycles": int(res2.cycles),
                "prove_secs": round(dt2, 3),
                "khz": round(res2.cycles / dt2 / 1e3, 4),
                "shards": len(proofs2),
            }
            progress(f"fibonacci_2shard: {res2.cycles} cycles in {dt2:.1f}s")
            print(json.dumps(out), flush=True)
        except Exception as e:  # keep earlier results on stage failure
            progress(f"fibonacci_2shard failed: {e}")
    if budget_left() > 900:
        try:
            n_sha = max(((1 << min(mlrc, 16)) // 48) // (1 if mode == "device" else 4), 1)
            out["workloads"]["sha_extend"] = prove_workload(
                "sha_extend", SHA_LOOP, [n_sha], warm=warm
            )
            print(json.dumps(out), flush=True)
        except Exception as e:
            progress(f"sha_extend failed: {e}")
    if budget_left() > 1200:
        try:
            # keccak AIR at up to 2^14 rows (24 rows/permute); the keccak
            # trace is 4017 columns wide, so rows cap below the shard max
            n_kec = max((1 << max(min(13, mlrc - 2), 5)) // 24, 1)
            out["workloads"]["keccak"] = prove_workload(
                "keccak", KECCAK_LOOP, [n_kec], warm=warm
            )
            print(json.dumps(out), flush=True)
        except Exception as e:
            progress(f"keccak failed: {e}")
    print(json.dumps(out))


def main():
    mode = os.environ.get("SP1_BENCH_CHILD")
    if mode:
        child_main(mode)
        return

    # Budget: the host-fallback child guarantees a printed number within
    # ~2 min; the device child needs ~15 min in a fresh process — the jit
    # RETRACING of the ~50 prover kernels (~700s on this 4-core host) is
    # paid per process even with a fully warm .jax_cache; the timed prove
    # itself is ~41s.
    budget = float(os.environ.get("SP1_BENCH_BUDGET", "3000"))
    t_start = time.time()
    result = None

    if os.environ.get("SP1_BENCH_DEVICE_ONLY") != "1":
        # Fallback at the proven small shape: guaranteed to finish fast.
        result = run_child(
            "host",
            timeout=min(budget * 0.2, 300),
            mlrc=int(os.environ.get("SP1_BENCH_HOST_MLRC", "9")),
            limb_bits=int(os.environ.get("SP1_BENCH_HOST_LIMB_BITS", "8")),
        )
        if result is not None:
            # emit the fallback NOW so an external timeout mid-device-child
            # still leaves a measured number on stdout
            print(json.dumps(result), flush=True)

    if os.environ.get("SP1_BENCH_HOST_ONLY") != "1":
        remaining = budget - (time.time() - t_start) - 5
        if remaining > 30:
            # Reference-shaped: 16-bit limbs (2^16-row range table => mlrc>=16).
            dev = run_child(
                "device",
                timeout=remaining,
                mlrc=int(os.environ.get("SP1_BENCH_MLRC", "16")),
                limb_bits=int(os.environ.get("SP1_BENCH_LIMB_BITS", "16")),
            )
            if dev is not None:
                if result is not None and "workloads" in result:
                    # keep the host suite's extra workloads alongside the
                    # device-measured primary metric
                    wl = dict(result["workloads"])
                    wl.update(dev.get("workloads", {}))
                    dev["workloads"] = wl
                result = dev

    if result is None:
        # Nothing completed inside the budget: report a measured-zero rather
        # than no number at all.
        result = {
            "metric": "core_prover_throughput",
            "value": 0.0,
            "unit": "kHz",
            "vs_baseline": 0.0,
        }
    print(json.dumps(result))


if __name__ == "__main__":
    main()

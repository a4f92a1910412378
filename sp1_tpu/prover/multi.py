"""Multi-shard proving: event-stream splicing + septic-digest linking.

An execution's event stream is split into segments of at most 2^mlrc
cycles; each segment proves FULLY INDEPENDENTLY (no cross-shard
challenge barrier — reference role: crates/core/executor/src/splicing.rs
+ worker/controller/core.rs shard fan-out). Cross-shard memory
consistency uses the septic-curve global digest: every shard's Global
chip accumulates hash-to-curve points of its boundary-state messages
(riscv/global_chip.py), the per-shard digests land in the public
values, and the verifier checks that the digest values of all shards
sum to the identity (reference: crates/hypercube/src/septic_digest.rs).
The verifier additionally checks that pc/clk chain across shards.
"""

from __future__ import annotations

import numpy as np

from ..iop.challenger import DuplexChallenger
from ..riscv import tracegen
from ..riscv.machine import (
    PV_CLK_END,
    PV_CLK_START,
    PV_GLOBAL_COUNT,
    PV_GLOBAL_SUM,
    PV_IS_HALTED,
    PV_NEXT_PC,
    PV_PC_START,
)
from ..field import septic


def split_events(events, max_rows: int) -> list:
    return [events[i : i + max_rows] for i in range(0, len(events), max_rows)]


def make_segment_pv(events, ws, is_last: bool, exit_code: int, traces=None) -> list:
    from ..riscv.machine import NUM_PV_ELTS, PV_EXIT_CODE

    pv = [0] * NUM_PV_ELTS
    pv[PV_PC_START] = int(events["pc"][0])
    pv[PV_NEXT_PC] = int(events["next_pc"][-1])
    pv[PV_CLK_START] = int(events["clk"][0])
    pv[PV_CLK_END] = tracegen.segment_clk_end(events)
    if is_last:
        for i in range(ws.num_limbs):
            pv[PV_EXIT_CODE + i] = (exit_code >> (ws.limb_bits * i)) & (
                (1 << ws.limb_bits) - 1
            )
        pv[PV_IS_HALTED] = 1
    if traces is not None:
        tracegen.set_global_pv(pv, traces, ws)
    return pv


def make_px_pv(ws, traces) -> list:
    """Public values of a deferred precompile shard: no program-state
    flow (every KIND_STATE slot zero, so the pv send/receive cancel),
    only the septic global digest it contributes."""
    from ..riscv.machine import NUM_PV_ELTS

    pv = [0] * NUM_PV_ELTS
    tracegen.set_global_pv(pv, traces, ws)
    return pv


def shard_inputs_of(
    result, program_words, pc_base: int, ws, mlrc: int,
    max_rows: int | None = None, defer_kinds=frozenset(),
) -> list:
    """Split an execution into per-shard (traces, public_values) inputs.

    defer_kinds: precompile syscall ids whose rows are stripped from the
    CPU shards into standalone precompile shards, linked back through
    the septic global argument (syscall bridge + per-chain memory
    boundaries). Reference: controller/precompiles.rs:35-111."""
    max_rows = max_rows or (1 << mlrc)
    segments = split_events(result.events, max_rows)
    rom = tracegen.decode_program(program_words, pc_base, ws)
    px = getattr(result, "px_events", None)
    _, full_final_chain = tracegen.compute_segment_states(
        result.events, rom, pc_base, ws, px_events=px
    )
    full_final = tracegen.final_state_dict(full_final_chain)
    genesis_addrs = sorted(full_final.keys())

    shard_inputs = []
    for i, seg in enumerate(segments):
        init_s, final_s = tracegen.compute_segment_states(
            seg, rom, pc_base, ws, px_events=px, defer_kinds=defer_kinds
        )
        traces, _prep = tracegen.generate_traces(
            result,
            program_words,
            pc_base,
            ws,
            mlrc,
            events=seg,
            init_states=init_s,
            final_states=final_s,
            genesis_addrs=genesis_addrs if i == 0 else None,
            final_global_states=full_final if i == len(segments) - 1 else None,
            include_bookends=False,
            defer_kinds=defer_kinds,
        )
        pv = make_segment_pv(
            seg, ws, i == len(segments) - 1, int(result.exit_code), traces=traces
        )
        shard_inputs.append((traces, pv))

    if defer_kinds and px is not None and len(px):
        dpx = px[np.isin(px["kind"], np.asarray(sorted(defer_kinds)))]
        if len(dpx):
            empty = result.events[:0]
            init_p, final_p = tracegen.compute_segment_states(
                empty, rom, pc_base, ws, px_events=dpx,
                defer_kinds=defer_kinds,
            )
            traces_p, _prep = tracegen.generate_traces(
                result,
                program_words,
                pc_base,
                ws,
                mlrc,
                events=empty,
                init_states=init_p,
                final_states=final_p,
                include_bookends=False,
                px_events=dpx,
                defer_kinds=defer_kinds,
                px_shard=True,
            )
            shard_inputs.append((traces_p, make_px_pv(ws, traces_p)))
    return shard_inputs


def prove_program(
    prover,
    pk,
    result,
    program_words,
    pc_base: int,
    ws,
    mlrc: int,
    max_rows: int | None = None,
    defer_kinds=frozenset(),
) -> list:
    """Prove a (possibly multi-shard) execution; returns [ShardProof].

    Shards are independent: each proof runs over its own transcript
    (vk + its public values + its commitment), so they can be proven
    concurrently on separate devices with no synchronization.
    """
    shard_inputs = shard_inputs_of(
        result, program_words, pc_base, ws, mlrc, max_rows,
        defer_kinds=defer_kinds,
    )
    proofs = []
    for traces, pv in shard_inputs:
        ch = DuplexChallenger()
        pk.vk.observe_into(ch)
        proofs.append(prover.prove_shard(pk, traces, pv, ch))
    return proofs


def _shard_digest_value(machine, pv) -> septic.CompletePoint:
    """The septic digest value (digest - Z) claimed by a shard's PVs."""
    if int(pv[PV_GLOBAL_COUNT]) == 0:
        return septic.CompletePoint.infinity()
    coords = [int(v) for v in pv[PV_GLOBAL_SUM : PV_GLOBAL_SUM + 14]]
    point = septic.SepticCurvePoint(
        septic.Septic(coords[:7]), septic.Septic(coords[7:])
    )
    if not point.check_on_curve():
        return None
    return septic.digest_value(point)


def verify_program(verifier, vk, proofs: list) -> bool:
    """Verify a multi-shard proof chain."""
    machine = verifier.machine
    if not proofs:
        return False

    for proof in proofs:
        ch = DuplexChallenger()
        vk.observe_into(ch)
        if not verifier.verify_shard(vk, proof, ch):
            return False

    # Septic digest values must cancel across shards: every global send
    # is matched by exactly one receive somewhere in the execution.
    total = septic.CompletePoint.infinity()
    for proof in proofs:
        value = _shard_digest_value(machine, proof.public_values)
        if value is None:
            return False
        total = total + value
    if not (total == septic.CompletePoint.infinity()):
        return False

    # Deferred precompile shards carry no program state: structurally
    # identified (zero CPU-class rows — opened_values is bound by the
    # commitment, so a prover cannot mislabel a real execution shard)
    # and excluded from the pc/clk chain. Their state-slot PVs must be
    # degenerate so the pv send/receive cancel.
    cpu_names = {c.name for c in machine.chips if c.name.startswith("Cpu")}

    def is_px_shard(proof) -> bool:
        return not any(n in proof.opened_values for n in cpu_names)

    chain = [p for p in proofs if not is_px_shard(p)]
    if not chain:
        return False
    for proof in proofs:
        if not is_px_shard(proof):
            continue
        pv = proof.public_values
        if int(pv[PV_PC_START]) or int(pv[PV_NEXT_PC]):
            return False
        if int(pv[PV_CLK_START]) or int(pv[PV_CLK_END]):
            return False
        if int(pv[PV_IS_HALTED]):
            return False
        if "MemoryGenesis" in proof.opened_values:
            return False
        if "MemoryFinalGlobal" in proof.opened_values:
            return False

    # Public-values chaining over the execution shards.
    for i, proof in enumerate(chain):
        pv = proof.public_values
        if i == 0:
            if int(pv[PV_PC_START]) != int(vk.pc_start[0]):
                return False
            if int(pv[PV_CLK_START]) != 1:
                return False
        else:
            prev = chain[i - 1].public_values
            if int(pv[PV_PC_START]) != int(prev[PV_NEXT_PC]):
                return False
            if int(pv[PV_CLK_START]) != int(prev[PV_CLK_END]):
                return False
        is_last = i == len(chain) - 1
        if int(pv[PV_IS_HALTED]) != (1 if is_last else 0):
            return False
        # bookend chips only in the first/last shard
        has_genesis = "MemoryGenesis" in proof.opened_values
        has_final_global = "MemoryFinalGlobal" in proof.opened_values
        if has_genesis != (i == 0):
            return False
        if has_final_global != is_last:
            return False
    return True

"""Multi-shard proving: event-stream splicing + shared-challenge orchestration.

An execution's event stream is split into segments of at most 2^mlrc
cycles; each segment proves independently (reference role:
crates/core/executor/src/splicing.rs + worker/controller/core.rs shard
fan-out). Cross-shard memory consistency uses the GLOBAL interaction
scope: every shard's memory-boundary states enter a second LogUp
instance whose challenges are sampled AFTER all shard commitments are
observed (the v3-style two-pass global argument; the reference's v6
septic-digest variant replaces this in a later revision — groundwork in
prover/septic.py). The verifier checks that the global cumulative sums
of all shards (including the genesis/final bookend tables) sum to zero,
and that pc/clk chain across shards.
"""

from __future__ import annotations

import numpy as np

from ..field import extension as ext
from ..iop.challenger import DuplexChallenger
from ..ops import mle as mle_ops
from ..riscv import tracegen
from ..riscv.machine import (
    PV_CLK_END,
    PV_CLK_START,
    PV_IS_HALTED,
    PV_NEXT_PC,
    PV_PC_START,
)
from . import logup_gkr as gkr
from .machine import global_chips_of

E4 = ext.npext4


def split_events(events, max_rows: int) -> list:
    return [events[i : i + max_rows] for i in range(0, len(events), max_rows)]


def make_segment_pv(events, ws, is_last: bool, exit_code: int) -> list:
    from ..riscv.machine import NUM_PV_ELTS, PV_EXIT_CODE

    pv = [0] * NUM_PV_ELTS
    pv[PV_PC_START] = int(events["pc"][0])
    pv[PV_NEXT_PC] = int(events["next_pc"][-1])
    pv[PV_CLK_START] = int(events["clk"][0])
    pv[PV_CLK_END] = int(events["clk"][-1]) + 1
    if is_last:
        for i in range(ws.num_limbs):
            pv[PV_EXIT_CODE + i] = (exit_code >> (ws.limb_bits * i)) & (
                (1 << ws.limb_bits) - 1
            )
        pv[PV_IS_HALTED] = 1
    return pv


def prove_program(
    prover,
    pk,
    result,
    program_words,
    pc_base: int,
    ws,
    mlrc: int,
    max_rows: int | None = None,
) -> list:
    """Prove a (possibly multi-shard) execution; returns [ShardProof]."""
    from ..pcs import jagged

    machine = prover.machine
    max_rows = max_rows or (1 << mlrc)
    segments = split_events(result.events, max_rows)
    rom = tracegen.decode_program(program_words, pc_base, ws)
    _, full_final = tracegen.compute_segment_states(
        result.events, rom, pc_base, ws
    )
    genesis_addrs = sorted(full_final.keys())

    shard_inputs = []
    for i, seg in enumerate(segments):
        init_s, final_s = tracegen.compute_segment_states(seg, rom, pc_base, ws)
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
        )
        pv = make_segment_pv(
            seg, ws, i == len(segments) - 1, int(result.exit_code)
        )
        pv = pv + [0] * (machine.max_num_pvs - len(pv))
        shard_inputs.append((traces, pv))

    # Shared transcript prefix: vk + every shard's (pv, main commitment).
    ch = DuplexChallenger()
    pk.vk.observe_into(ch)
    commits = []
    for traces, pv in shard_inputs:
        chips = [c for c in machine.chips if c.name in traces]
        mles = [traces[c.name][0] for c in chips]
        heights = [traces[c.name][1] for c in chips]
        commit, _ = jagged.commit_multilinears(mles, heights, prover.config)
        commits.append(commit)
        ch.observe_slice(np.asarray(pv, np.uint32))
        ch.observe_digest(commit)

    g_chips = global_chips_of(machine, machine.chips)
    dim = gkr.gkr_beta_seed_dim(machine, g_chips, "global")
    alpha_g = ch.sample_ext()
    seed_g = ch.sample_ext_vec(dim)
    betas_g = mle_ops.host.partial_lagrange_ext(seed_g)

    proofs = []
    for i, (traces, pv) in enumerate(shard_inputs):
        fork = ch.clone()
        fork.observe(i)
        proofs.append(
            prover.prove_shard(
                pk, traces, pv, fork, global_ctx=(alpha_g, betas_g)
            )
        )
    return proofs


def verify_program(verifier, vk, proofs: list) -> bool:
    """Verify a multi-shard proof chain."""
    machine = verifier.machine
    if not proofs:
        return False

    ch = DuplexChallenger()
    vk.observe_into(ch)
    for proof in proofs:
        ch.observe_slice(np.asarray(proof.public_values, np.uint32))
        ch.observe_digest(proof.main_commitment)

    g_chips = global_chips_of(machine, machine.chips)
    dim = gkr.gkr_beta_seed_dim(machine, g_chips, "global")
    alpha_g = ch.sample_ext()
    seed_g = ch.sample_ext_vec(dim)
    betas_g = mle_ops.host.partial_lagrange_ext(seed_g)

    for i, proof in enumerate(proofs):
        fork = ch.clone()
        fork.observe(i)
        if not verifier.verify_shard(
            vk, proof, fork, global_ctx=(alpha_g, betas_g)
        ):
            return False

    # Global cumulative sums must cancel across shards.
    total = np.zeros(4, np.uint32)
    for proof in proofs:
        if proof.global_gkr_proof is None:
            return False
        total = E4.add(
            total, np.asarray(proof.global_gkr_proof.cumulative_sum, np.uint32)
        )
    if np.any(total != 0):
        return False

    # Public-values chaining.
    for i, proof in enumerate(proofs):
        pv = proof.public_values
        if i == 0:
            if int(pv[PV_PC_START]) != int(vk.pc_start[0]):
                return False
            if int(pv[PV_CLK_START]) != 1:
                return False
        else:
            prev = proofs[i - 1].public_values
            if int(pv[PV_PC_START]) != int(prev[PV_NEXT_PC]):
                return False
            if int(pv[PV_CLK_START]) != int(prev[PV_CLK_END]):
                return False
        is_last = i == len(proofs) - 1
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

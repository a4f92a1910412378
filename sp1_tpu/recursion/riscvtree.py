"""RISC-V aggregation tree: compose programs with execution semantics.

`build_riscv_compose_program` compiles the arity-<=4 reduction node of
the compressed-proof pipeline: it verifies N child recursion proofs
(normalize leaves and/or lower compose nodes, mixed shapes allowed),
enforces the cross-shard execution chaining rules in-circuit, verifies
every child vk's membership in the recursion vk map, and accumulates
the shards' septic global digests so ONE compressed proof carries the
whole execution's memory-consistency argument.

Reference: crates/recursion/circuit/src/machine/compress.rs
(SP1CompressWithVKeyVerifier), crates/prover/src/recursion.rs:248
(compose program), crates/prover/src/worker/controller/compress.rs
(the streaming reduction this feeds).

Node public-value layout (IDENTICAL at every tree level):

    [ vk_map_root (8) | core_vk_commit (8) | core_pc_start (3)
      | core pvs (NUM_PV_ELTS, with the GLOBAL_SUM slots holding the
        running septic sum T and GLOBAL_COUNT := 1) ]

A NORMALIZE child's pvs are [core_vk (8), core_pc (3), core pvs] (see
compile.py), so its merge section starts at offset 0; a COMPOSE child's
section starts at offset 8 (skipping its vk_map_root). The vk-map root
is WITNESSED (not baked), committed by every node, and asserted equal
to each compose child's committed root — the final verifier pins the
root value, which keeps program/vk generation map-independent
(reference: vk_root as a public value, go/sp1/verify.go PV layout).

Digest semantics: every node commits T = W + sum(contributions), where
W = DIGEST_SUM_START; a normalize child contributes (digest - Z)
(Z = CURVE_CUMULATIVE_SUM_START, see field/septic.py digest_value) and
a compose child contributes (T_child - W). At the root, the execution
is balanced iff T == W.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..field import septic as sp
from ..riscv.machine import (
    NUM_PV_ELTS,
    PV_CLK_END,
    PV_CLK_START,
    PV_GLOBAL_COUNT,
    PV_GLOBAL_SUM,
    PV_IS_HALTED,
    PV_NEXT_PC,
    PV_PC_START,
)
from ..verifier.backend import P
from ..verifier.challenger import VChallenger
from ..verifier.lift import lift_shard_proof, lift_vk
from ..verifier.shard import observe_vk, verify_shard
from . import septic_circuit as sc7
from . import vkmap
from .builder import SymbolicBackend
from .compile import _ShapeVk
from .witness import LiftToWitness, StreamWriter

NORMALIZE = "normalize"
COMPOSE = "compose"

# Fixed vk-map depth: programs embed only the depth, never the map, so
# the whole program/vk family is enumerable before the map exists
# (reference: crates/prover/src/shapes.rs builds the map over all
# program vks once). 2^8 = 256 allowed recursion programs.
VK_TREE_DEPTH = 8

NUM_NODE_PVS = 8 + 8 + 3 + NUM_PV_ELTS


@dataclass
class ChildSpec:
    """One child of a compose node.

    kind: NORMALIZE (leaf: a core-shard verifier proof) or COMPOSE.
    machine/config: the recursion machine+config the child was proven
    under. shape_proof: a proof of the child's shape (values ignored at
    compile time).
    """

    kind: str
    machine: object
    config: object
    shape_proof: object


def _section(child_pv, kind: str):
    off = 0 if kind == NORMALIZE else 8
    return child_pv[off : off + 11 + NUM_PV_ELTS]


def build_riscv_compose_program(children: list):
    """Compile the compose node for the given child specs."""
    assert children
    sym = SymbolicBackend(num_pvs=NUM_NODE_PVS)
    wbk = LiftToWitness(sym)
    root = [sym.witness_felt() for _ in range(8)]
    vvks = [lift_vk(wbk, _ShapeVk) for _ in children]
    vproofs = [lift_shard_proof(wbk, c.shape_proof) for c in children]
    for c, vvk, vproof in zip(children, vvks, vproofs):
        ch = VChallenger(sym)
        observe_vk(vvk, ch)
        verify_shard(sym, c.machine, c.config, vvk, vproof, ch)
    # vk-map membership for every child vk, under the witnessed root.
    for vvk in vvks:
        digest = vkmap.circuit_vk_digest(sym, vvk)
        _verify_membership_witnessed_root(sym, digest, VK_TREE_DEPTH, root)

    secs = [_section(p.public_values, c.kind)
            for c, p in zip(children, vproofs)]
    # compose children must commit the same vk-map root
    for c, p in zip(children, vproofs):
        if c.kind == COMPOSE:
            for a, b in zip(p.public_values[:8], root):
                sym.assert_f_eq(a, b, "child vk_map_root")
    # core vk + pc start identical across children
    for s in secs[1:]:
        for a, b in zip(secs[0][:11], s[:11]):
            sym.assert_f_eq(a, b, "core vk equality")
    # pc / clk chaining; non-last children not halted
    base = 11
    for k in range(len(secs) - 1):
        sym.assert_f_eq(
            secs[k + 1][base + PV_PC_START], secs[k][base + PV_NEXT_PC],
            "pc chain",
        )
        sym.assert_f_eq(
            secs[k + 1][base + PV_CLK_START], secs[k][base + PV_CLK_END],
            "clk chain",
        )
        sym.assert_f_eq(secs[k][base + PV_IS_HALTED], sym.felt(0),
                        "non-last child halted")

    # septic digest accumulation: T = W + sum(child contributions)
    W = sp.SepticCurvePoint.digest_sum_start()
    Z = sp.SepticCurvePoint.cumulative_sum_start()
    neg_z = sc7.point_const(sym, Z.neg())
    neg_w = sc7.point_const(sym, W.neg())
    contributions = []
    for c, s in zip(children, secs):
        coords = s[base + PV_GLOBAL_SUM : base + PV_GLOBAL_SUM + 14]
        pt = (list(coords[:7]), list(coords[7:14]))
        if c.kind == NORMALIZE:
            # the shard's own digest: must be on-curve and nonempty
            sc7.assert_on_curve(sym, pt, "leaf digest on curve")
            sym.finv(s[base + PV_GLOBAL_COUNT])  # constrains count != 0
            start = neg_z
        else:
            start = neg_w
        # contribution = pt + (-start_point), witnessed
        contrib = sc7.point_witness(sym)
        dx = sc7.s_sub(sym, start[0], pt[0])
        sc7.assert_incomplete_add(sym, pt, start, contrib, "contrib")
        sc7.s_assert_nonzero(sym, dx, "contrib distinct x")
        contributions.append(contrib)
    acc = sc7.circuit_accumulate(
        sym, sc7.point_const(sym, W), contributions, "digest sum"
    )

    merged = list(secs[0][base : base + NUM_PV_ELTS])
    last = secs[-1]
    for idx in ([PV_NEXT_PC, PV_CLK_END, PV_IS_HALTED]
                + list(range(4, 12))):  # exit-code limbs
        merged[idx] = last[base + idx]
    merged[PV_GLOBAL_COUNT] = sym.felt(1)
    for i in range(7):
        merged[PV_GLOBAL_SUM + i] = acc[0][i]
        merged[PV_GLOBAL_SUM + 7 + i] = acc[1][i]
    sym.commit_public_values(list(root) + list(secs[0][:11]) + merged)
    return sym.finalize()


def _verify_membership_witnessed_root(sym, digest, depth: int, root):
    """Like vkmap.circuit_verify_membership but against witnessed root
    cells (the root is a public value pinned by the final verifier)."""
    cur = list(digest)
    for _lvl in range(depth):
        bit = sym.witness_felt()
        sym.assert_f_eq(
            sym.fmul(bit, sym.fsub(bit, sym.felt(1))), sym.felt(0),
            "vkmap path bit boolean",
        )
        sib = [sym.witness_felt() for _ in range(8)]
        left = [sym.select_f(bit, s, c) for s, c in zip(sib, cur)]
        right = [sym.select_f(bit, c, s) for c, s in zip(cur, sib)]
        cur = list(sym.poseidon2(left + right)[:8])
    for c, r in zip(cur, root):
        sym.assert_f_eq(c, r, "vkmap root")


def riscv_compose_witness_stream(children_rt: list, vk_map: "vkmap.VkMap"):
    """Witness blocks for a compose node, in circuit order.

    children_rt: [(kind, vk, proof, vk_index)] — runtime objects in the
    same order as the ChildSpecs the program was built from.
    """
    w = StreamWriter()
    root = [int(v) for v in padded_vk_root(vk_map)]
    for r in root:
        w.felt(r)
    for _, vk, _, _ in children_rt:
        lift_vk(w, vk)
    for _, _, proof, _ in children_rt:
        lift_shard_proof(w, proof)
    for _, _, _, idx in children_rt:
        _membership_witness_fixed_depth(w, vk_map, idx)

    # septic hints, mirroring the circuit's witness order
    W = sp.SepticCurvePoint.digest_sum_start()
    Z = sp.SepticCurvePoint.cumulative_sum_start()
    contribs = []
    for kind, _, proof, _ in children_rt:
        base = (0 if kind == NORMALIZE else 8) + 11
        pv = proof.public_values
        coords = [int(v) for v in pv[base + PV_GLOBAL_SUM : base + PV_GLOBAL_SUM + 14]]
        pt = sp.SepticCurvePoint(sp.Septic(coords[:7]), sp.Septic(coords[7:]))
        start = Z if kind == NORMALIZE else W
        contrib = pt.add_incomplete(start.neg())
        for c in contrib.x.c + contrib.y.c:
            w.felt(int(c))
        for h in sc7.nonzero_hint(start.neg().x - pt.x):
            w.felt(int(h))
        contribs.append(contrib)
    hacc = sc7.HostAccumulator(W)
    for p in contribs:
        hacc.add(p)
    for h in hacc.hints:
        w.felt(int(h))
    return w.stream


def _membership_witness_fixed_depth(w, vk_map: "vkmap.VkMap", index: int):
    """Membership path padded to VK_TREE_DEPTH levels: above the map's
    real depth the chain continues with the precomputed upper digests of
    the zero-padded tree."""
    path = vk_map.prove(index)
    layers = _padded_layers(vk_map)
    for lvl in range(VK_TREE_DEPTH):
        bit = (index >> lvl) & 1 if lvl < vk_map.depth else 0
        w.felt(bit)
        sib = (
            path[lvl]
            if lvl < vk_map.depth
            else layers[lvl][1] if len(layers[lvl]) > 1 else [0] * 8
        )
        for s in sib:
            w.felt(int(s))


def _padded_layers(vk_map: "vkmap.VkMap"):
    """Layers of the map's tree extended to VK_TREE_DEPTH with zero
    siblings on the right spine."""
    cached = getattr(vk_map, "_padded_layers", None)
    if cached is not None:
        return cached
    from .vkmap import _compress_ints

    layers = [list(l) for l in vk_map.layers]
    while len(layers) - 1 < VK_TREE_DEPTH:
        top = layers[-1]
        zero = _zero_digest(len(layers) - 1)
        layers.append([_compress_ints(top[0], zero)])
        layers[-2] = top + [zero]
    vk_map._padded_layers = layers
    return layers


_ZERO_DIGESTS = {}


def _zero_digest(level: int):
    """Root digest of an all-zero subtree of the given height."""
    if level not in _ZERO_DIGESTS:
        from .vkmap import _compress_ints

        d = [0] * 8
        for _ in range(level):
            d = _compress_ints(d, d)
        _ZERO_DIGESTS[level] = d
    return _ZERO_DIGESTS[level]


def padded_vk_root(vk_map: "vkmap.VkMap") -> np.ndarray:
    """The root at the FIXED depth the circuit verifies against."""
    return np.asarray(_padded_layers(vk_map)[-1][0], np.uint32)

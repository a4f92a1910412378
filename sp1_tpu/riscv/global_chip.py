"""Global chip: septic-digest accumulation of cross-shard interactions.

Every cross-shard ("global") interaction is hashed to a point on the
septic curve y^2 = x^3 + 45x + 41z^3 (Poseidon2 hash-to-curve with an
offset search); a shard's points are summed in-AIR with an incomplete-
addition chain, and the final digest lands in the public values. The
multi-shard verifier checks that the digests of all shards sum to the
identity — no cross-shard challenge is needed, so shards prove fully
independently (reference: crates/core/machine/src/global/mod.rs,
crates/core/machine/src/operations/{global_interaction,
global_accumulation}.rs, crates/hypercube/src/septic_digest.rs).

Row layout (w = ws.limb_bits, the range-table width):
  message[8], kind, is_real, is_receive, is_send, offset, index,
  [m7 limbs when w == 8 (message[7] < 2^16 decomposition)],
  y6 limbs + top6 (y6_value < 63*2^24 decomposition),
  y[7], permutation round states (28 x 16), initial_digest[14],
  cumulative_sum[14].

Kind and offset both pack into element 7 of the hash input
(message[7] + offset*2^16 + kind*2^24 < 2^30): elements 0..6 are free
field elements, so message[0] can carry full 32-bit-address cell
indices (2^29 + 32) without a dedicated decomposition.

The in-AIR hash is the full Poseidon2-16 permutation over committed
round states (air/p2air.py); x = the first 7 output lanes. The y sign
convention (receive: y6 in [1, 63*2^24]; send: the negation) makes the
direction of each interaction binding.
"""

from __future__ import annotations

import numpy as np

from ..air import p2air
from ..air.builder import (
    KIND_GLOBAL,
    KIND_GLOBAL_ACC,
    KIND_RANGE,
    Affine,
    Chip,
    Interaction,
    main_col,
)
from ..field import koalabear as kb
from ..field import septic

P = kb.P
NUM_ROUNDS = p2air.NUM_ROUNDS
PERM_COLS = 16 * NUM_ROUNDS


def _sept_add(ops, a, b):
    return [ops.add(x, y) for x, y in zip(a, b)]


def _sept_sub(ops, a, b):
    return [ops.sub(x, y) for x, y in zip(a, b)]


def _sept_mul(ops, a, b):
    conv = [None] * 13
    for i in range(7):
        for j in range(7):
            t = ops.mul(a[i], b[j])
            k = i + j
            conv[k] = t if conv[k] is None else ops.add(conv[k], t)
    # z^(7+t) = 3 z^(t+1) + 5 z^t
    for k in range(12, 6, -1):
        v = conv[k]
        conv[k - 6] = ops.add(conv[k - 6], ops.scale_base(v, 3))
        conv[k - 7] = ops.add(conv[k - 7], ops.scale_base(v, 5))
    return conv[:7]


def _sept_const(ops, coeffs):
    return [ops.const(int(c) % P) for c in coeffs]


class GlobalChip(Chip):
    """One global interaction per row; septic digest accumulation."""

    name = "Global"

    def __init__(self, ws):
        self.ws = ws
        L = ws.limb_bits
        assert L in (8, 16)
        self.L = L
        # --- column layout ---
        idx = {}
        c = 0

        def alloc(name, n=1):
            nonlocal c
            idx[name] = c
            c += n

        alloc("message", 8)
        alloc("kind")
        alloc("is_real")
        alloc("is_receive")
        alloc("is_send")
        alloc("offset")
        alloc("index")
        # message[7] < 2^16 limbs (only needed when the table is 2^8)
        self.m7_widths = [] if L == 16 else [8, 8]
        if self.m7_widths:
            alloc("m7", len(self.m7_widths))
        # y6_value < 63 * 2^24: low 24 bits in table-width limbs + top6
        self.y6_widths = ([16, 8] if L == 16 else [8, 8, 8]) + [6]
        alloc("y6", len(self.y6_widths))
        alloc("y", 7)
        alloc("perm", PERM_COLS)
        alloc("init_digest", 14)
        alloc("cum_sum", 14)
        self.cols = idx
        self.width = c

    # -- helpers -------------------------------------------------------------
    def _aff(self, name, k=0, weight=1):
        return Affine.col(main_col(self.cols[name] + k), weight)

    def _range_lookup_affines(self) -> list:
        """All KIND_RANGE lookup value expressions (each must land in
        [0, 2^L)). A sub-L n-bit check on x is the pair of lookups
        (x, x * 2^(L-n)): the first bounds x below 2^L, so the scaled
        product does not wrap mod p, and the second then forces x < 2^n."""
        L = self.L
        out = []

        def check_bits(affine, n):
            out.append(affine)
            if n < L:
                scaled = Affine(
                    affine.constant * (1 << (L - n)) % P,
                    tuple((c, w * (1 << (L - n)) % P) for c, w in affine.terms),
                )
                out.append(scaled)

        for k, w in enumerate(self.m7_widths):
            check_bits(self._aff("m7", k), w)
        if not self.m7_widths:
            check_bits(self._aff("message", 7), 16)
        for k, w in enumerate(self.y6_widths):
            check_bits(self._aff("y6", k), w)
        # top6 < 63: (62 - top6) wraps negative (huge) for top6 == 63
        top = self.cols["y6"] + len(self.y6_widths) - 1
        out.append(Affine(62, ((main_col(top), P - 1),)))
        check_bits(self._aff("offset"), 8)
        check_bits(self._aff("kind"), 6)
        return out

    # -- AIR ------------------------------------------------------------------
    def eval(self, f):
        ops = f.ops
        C = self.cols
        m = f.main

        def col(name, k=0):
            return m[C[name] + k]

        is_real = col("is_real")
        is_recv = col("is_receive")
        is_send = col("is_send")
        f.assert_bool(is_real)
        f.assert_bool(is_recv)
        f.assert_bool(is_send)
        f.assert_eq(ops.add(is_recv, is_send), is_real)

        # message[0] / message[7] limb recompositions.
        def recompose(name, widths):
            acc = None
            shift = 0
            for k, w in enumerate(widths):
                term = ops.scale_base(col(name, k), 1 << shift)
                acc = term if acc is None else ops.add(acc, term)
                shift += w
            return acc

        if self.m7_widths:
            f.assert_eq(col("message", 7), recompose("m7", self.m7_widths))

        # Hash input: offset and kind both pack into message[7]'s high
        # bits (message[7] < 2^16 range-checked, offset < 2^8,
        # kind < 2^6, so the packing is injective and < 2^30).
        m_trial = [
            col("message", 0),
            col("message", 1),
            col("message", 2),
            col("message", 3),
            col("message", 4),
            col("message", 5),
            col("message", 6),
            ops.add(
                col("message", 7),
                ops.add(
                    ops.scale_base(col("offset"), 1 << 16),
                    ops.scale_base(col("kind"), 1 << 24),
                ),
            ),
        ] + [ops.zero()] * 8

        perm0 = C["perm"]
        p2air.eval_permutation(
            f, m_trial, lambda r: m[perm0 + 16 * r: perm0 + 16 * (r + 1)]
        )

        # x = first 7 lanes of the permutation output; (x, y) on curve.
        out0 = perm0 + 16 * (NUM_ROUNDS - 1)
        x = m[out0: out0 + 7]
        y = m[C["y"]: C["y"] + 7]
        y2 = _sept_mul(ops, y, y)
        x2 = _sept_mul(ops, x, x)
        x3 = _sept_mul(ops, x2, x)
        rhs = _sept_add(
            ops,
            _sept_add(ops, x3, [ops.scale_base(xi, 45) for xi in x]),
            _sept_const(ops, (0, 0, 0, 41, 0, 0, 0)),
        )
        for i in range(7):
            f.assert_eq(y2[i], rhs[i])

        # Sign convention: y6_value = sum of range-checked limbs.
        y6_value = recompose("y6", self.y6_widths)
        one = ops.one()
        # receive: y[6] == 1 + y6_value ; send: y[6] == p - 1 - y6_value
        f.assert_zero(
            ops.mul(is_recv, ops.sub(y[6], ops.add(one, y6_value)))
        )
        f.assert_zero(
            ops.mul(is_send, ops.add(y[6], ops.add(one, y6_value)))
        )

        # Accumulation: initial_digest + (x, y) == cumulative_sum.
        p1 = (m[C["init_digest"]: C["init_digest"] + 7],
              m[C["init_digest"] + 7: C["init_digest"] + 14])
        p3 = (m[C["cum_sum"]: C["cum_sum"] + 7],
              m[C["cum_sum"] + 7: C["cum_sum"] + 14])
        dx = _sept_sub(ops, x, p1[0])
        dy = _sept_sub(ops, y, p1[1])
        x_sum = _sept_add(ops, _sept_add(ops, p1[0], x), p3[0])
        checker_x = _sept_sub(
            ops, _sept_mul(ops, x_sum, _sept_mul(ops, dx, dx)),
            _sept_mul(ops, dy, dy),
        )
        # (p1.y + p3.y) * (p2.x - p1.x) - (p2.y - p1.y) * (p1.x - p3.x)
        checker_y = _sept_sub(
            ops,
            _sept_mul(ops, _sept_add(ops, p1[1], p3[1]), dx),
            _sept_mul(ops, dy, _sept_sub(ops, p1[0], p3[0])),
        )
        for i in range(7):
            # x-checker is degree 3 already, so it cannot be is_real-gated;
            # padding rows are handled by the zerocheck's padded-row
            # adjustment instead.
            f.assert_zero(checker_x[i])
            f.assert_zero(ops.mul(is_real, checker_y[i]))

    # -- interactions ----------------------------------------------------------
    def receives(self) -> list:
        real = self._aff("is_real")
        msg = [self._aff("message", k) for k in range(8)]
        out = [
            Interaction(
                tuple(msg + [self._aff("is_send"), self._aff("is_receive"),
                             self._aff("kind")]),
                real,
                KIND_GLOBAL,
            ),
            Interaction(
                tuple([self._aff("index")]
                      + [self._aff("init_digest", k) for k in range(14)]),
                real,
                KIND_GLOBAL_ACC,
            ),
        ]
        return out

    def sends(self) -> list:
        real = self._aff("is_real")
        out = [
            Interaction(
                tuple([Affine(1, ((main_col(self.cols["index"]), 1),))]
                      + [self._aff("cum_sum", k) for k in range(14)]),
                real,
                KIND_GLOBAL_ACC,
            )
        ]
        for affine in self._range_lookup_affines():
            out.append(Interaction((affine,), real, KIND_RANGE))
        return out


# ---------------------------------------------------------------------------
# Trace generation (host)
# ---------------------------------------------------------------------------


def _decomp(value: int, widths: list) -> list:
    out = []
    for w in widths:
        out.append(value & ((1 << w) - 1))
        value >>= w
    assert value == 0
    return out


def generate_global_trace(chip: GlobalChip, events: list, mlrc: int):
    """events: [(message8 ints, is_receive bool, kind int)].

    Returns (trace (2^h, width) canonical uint32, height, final_digest
    (SepticCurvePoint), range_counts dict value->count).
    """
    from .tracegen import _pad_pow2

    n = len(events)
    h = _pad_pow2(max(n, 1), mlrc)
    C = chip.cols
    trace = np.zeros((h, chip.width), np.uint32)
    range_counts: dict[int, int] = {}

    acc = septic.SepticCurvePoint.cumulative_sum_start()
    m_trials = np.zeros((max(n, 1), 16), np.uint32)
    rows_meta = []
    for j, (message, is_receive, kind) in enumerate(events):
        message = [int(v) % P for v in message]
        assert message[7] < (1 << 16)
        assert 0 <= kind < 64
        hash_msg = list(message)
        hash_msg[7] = message[7] + (kind << 24)
        point, offset, m_trial, _ = septic.lift_x(hash_msg)
        if not is_receive:
            point = point.neg()
        m_trials[j, :8] = m_trial
        rows_meta.append((message, is_receive, kind, offset, point))

    perm_states = p2air.permute_states_host(m_trials) if n else []

    for j, (message, is_receive, kind, offset, point) in enumerate(rows_meta):
        row = trace[j]
        row[C["message"]: C["message"] + 8] = message
        row[C["kind"]] = kind
        row[C["is_real"]] = 1
        row[C["is_receive"]] = 1 if is_receive else 0
        row[C["is_send"]] = 0 if is_receive else 1
        row[C["offset"]] = offset
        row[C["index"]] = j
        if chip.m7_widths:
            row[C["m7"]: C["m7"] + len(chip.m7_widths)] = _decomp(
                message[7], chip.m7_widths
            )
        y6 = point.y.c[6]
        y6_value = (y6 - 1) if is_receive else (P - y6 - 1)
        assert 0 <= y6_value < 63 * (1 << 24)
        row[C["y6"]: C["y6"] + len(chip.y6_widths)] = _decomp(
            y6_value, chip.y6_widths
        )
        row[C["y"]: C["y"] + 7] = point.y.c
        for r in range(NUM_ROUNDS):
            row[C["perm"] + 16 * r: C["perm"] + 16 * (r + 1)] = perm_states[r][j]
        row[C["init_digest"]: C["init_digest"] + 7] = acc.x.c
        row[C["init_digest"] + 7: C["init_digest"] + 14] = acc.y.c
        acc = acc.add_incomplete(point)
        row[C["cum_sum"]: C["cum_sum"] + 7] = acc.x.c
        row[C["cum_sum"] + 7: C["cum_sum"] + 14] = acc.y.c

    # Range lookup counts (must mirror _range_lookup_affines exactly).
    if n:
        real = trace[:n]
        for affine in chip._range_lookup_affines():
            vals = np.full(n, affine.constant, np.int64)
            for pc, w in affine.terms:
                vals = (vals + real[:, pc.index].astype(np.int64) * w) % P
            for v, cnt in zip(*np.unique(vals, return_counts=True)):
                assert 0 <= v < (1 << chip.L), (
                    f"global range lookup out of table: {v}"
                )
                range_counts[int(v)] = range_counts.get(int(v), 0) + int(cnt)

    return trace, n, acc, range_counts

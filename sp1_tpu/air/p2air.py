"""Poseidon2-16 permutation as AIR constraints (shared helper).

The permutation's 28 round states are committed columns; each round is a
degree-3 constraint linking consecutive states (x^3 S-box). The input
may be an arbitrary expression vector (it is folded into round 0's
constraint through the linear pre-rounds external layer).

Reference: the wide Poseidon2 chip
crates/recursion/machine/src/chips/poseidon2_wide/ and the in-row
permutation of crates/core/machine/src/operations/global_interaction.rs.
"""

from __future__ import annotations

from ..verifier.backend import (
    EXTERNAL_RC,
    INTERNAL_DIAG,
    INTERNAL_RC,
    ROUNDS_F,
    ROUNDS_P,
    WIDTH,
)

NUM_ROUNDS = ROUNDS_F + ROUNDS_P  # 28


def ext_layer(ops, s):
    """The external linear layer (M4 circulant blocks + block sums)."""
    out = [None] * WIDTH
    for g in range(0, WIDTH, 4):
        x0, x1, x2, x3 = s[g:g + 4]
        # M4 rows: (2,3,1,1), (1,2,3,1), (1,1,2,3), (3,1,1,2)
        out[g] = ops.add(ops.add(ops.scale_base(x0, 2), ops.scale_base(x1, 3)),
                         ops.add(x2, x3))
        out[g + 1] = ops.add(ops.add(x0, ops.scale_base(x1, 2)),
                             ops.add(ops.scale_base(x2, 3), x3))
        out[g + 2] = ops.add(ops.add(x0, x1),
                             ops.add(ops.scale_base(x2, 2), ops.scale_base(x3, 3)))
        out[g + 3] = ops.add(ops.add(ops.scale_base(x0, 3), x1),
                             ops.add(x2, ops.scale_base(x3, 2)))
    sums = [None] * 4
    for lane in range(4):
        sums[lane] = out[lane]
        for g in range(4, WIDTH, 4):
            sums[lane] = ops.add(sums[lane], out[g + lane])
    return [ops.add(out[i], sums[i % 4]) for i in range(WIDTH)]


def eval_permutation(f, input_exprs, stored_state):
    """Assert stored_state encodes permute(input_exprs).

    input_exprs: 16 expressions (any degree-1 affine combination of
    committed columns). stored_state(r) -> 16 committed columns holding
    the state after loop round r (0 <= r < 28). The permutation output is
    stored_state(NUM_ROUNDS - 1).
    """
    ops = f.ops

    def cube(e):
        return ops.mul(ops.mul(e, e), e)

    half = ROUNDS_F // 2
    prev = ext_layer(ops, input_exprs)  # pre-rounds layer (linear)
    r_idx = 0
    for r in range(half):
        cubes = [cube(ops.add(prev[i], ops.const(int(EXTERNAL_RC[r][i]))))
                 for i in range(WIDTH)]
        nxt = ext_layer(ops, cubes)
        stored = stored_state(r_idx)
        for i in range(WIDTH):
            f.assert_eq(stored[i], nxt[i])
        prev = stored
        r_idx += 1
    for r in range(ROUNDS_P):
        s0 = cube(ops.add(prev[0], ops.const(int(INTERNAL_RC[r]))))
        star = [s0] + list(prev[1:])
        total = star[0]
        for i in range(1, WIDTH):
            total = ops.add(total, star[i])
        stored = stored_state(r_idx)
        for i in range(WIDTH):
            f.assert_eq(
                stored[i],
                ops.add(ops.scale_base(star[i], int(INTERNAL_DIAG[i])), total),
            )
        prev = stored
        r_idx += 1
    for r in range(half, ROUNDS_F):
        cubes = [cube(ops.add(prev[i], ops.const(int(EXTERNAL_RC[r][i]))))
                 for i in range(WIDTH)]
        nxt = ext_layer(ops, cubes)
        stored = stored_state(r_idx)
        for i in range(WIDTH):
            f.assert_eq(stored[i], nxt[i])
        prev = stored
        r_idx += 1


def permute_states_host(states):
    """All 28 round states of permute(states) (numpy, batched).

    states: (..., 16) canonical uint32. Returns list of 28 arrays
    (..., 16) — the state after each loop round, matching
    eval_permutation's stored_state layout.
    """
    from ..field import koalabear as kb
    from ..ops.poseidon2 import EXTERNAL_RC as EXT_RC_NP
    from ..ops.poseidon2 import INTERNAL_RC as INT_RC_NP
    from ..ops.poseidon2 import hostp2

    out = []
    state = hostp2._external(states)
    for r in range(ROUNDS_F // 2):
        state = kb.npf.add(state, EXT_RC_NP[r])
        state = hostp2._sbox(state)
        state = hostp2._external(state)
        out.append(state)
    for r in range(ROUNDS_P):
        state = state.copy()
        state[..., 0] = hostp2._sbox(kb.npf.add(state[..., 0], INT_RC_NP[r]))
        state = hostp2._internal(state)
        out.append(state)
    for r in range(ROUNDS_F // 2, ROUNDS_F):
        state = kb.npf.add(state, EXT_RC_NP[r])
        state = hostp2._sbox(state)
        state = hostp2._external(state)
        out.append(state)
    return out

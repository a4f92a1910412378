"""Poseidon2 permutation over KoalaBear, width 16, for TPU.

Parameters match the reference proof system exactly (public protocol
constants):
  * width 16, rate 8, digest 8, S-box x^3, 8 full + 20 partial rounds
    (reference: slop/crates/koala-bear/src/koala_bear_poseidon2.rs:48-67).
  * external linear layer = Poseidon2 "general" matrix: per-4-lane M4 light
    permutation followed by cross-block column sums.
  * internal linear layer = 1*J + diag(V) with
    V = [-2, 1, 2, 4, ..., 2^13, 2^15]
    (reference: sp1-gpu/crates/sys/include/poseidon2/poseidon2_kb31_16.cuh:114-136
    documents the same diagonal for Plonky3's DiffusionMatrixKoalaBear).

Device path: `permute` operates on monty-form uint32 arrays of shape
(..., 16) built purely from the 32-bit primitives in `field.koalabear`, so
it is Pallas-safe and jit/vmap-friendly. Host path: `HostPoseidon2`
mirrors it on canonical-form numpy arrays for the Fiat-Shamir challenger.

Layout note for TPU: callers hashing many rows should arrange instances
along leading dims (N, 16); XLA vectorizes the 16 fixed lanes into
registers and the N axis onto the 8x128 VPU grid.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..field import koalabear as kb

WIDTH = 16
RATE = 8
DIGEST = 8
ROUNDS_F = 8
ROUNDS_P = 20
SBOX_DEGREE = 3

# Round constants, canonical form. Reference:
# slop/crates/koala-bear/src/koala_bear_poseidon2.rs:96 (RC16 table);
# identical values in sp1-gpu/crates/sys/include/poseidon2/poseidon2_kb31_16.cuh.
EXTERNAL_RC = np.array(
    [
        [0x7EE56A48, 0x11367045, 0x12E41941, 0x7EBBC12B, 0x1970B7D5, 0x662B60E8,
         0x3E4990C6, 0x679F91F5, 0x350813BB, 0x00874AD4, 0x28A0081A, 0x18FA5872,
         0x5F25B071, 0x5E5D5998, 0x5E6FD3E7, 0x5B2E2660],
        [0x6F1837BF, 0x3FE6182B, 0x1EDD7AC5, 0x57470D00, 0x43D486D5, 0x1982C70F,
         0x0EA53AF9, 0x61D6165B, 0x51639C00, 0x2DEC352C, 0x2950E531, 0x2D2CB947,
         0x08256CEF, 0x1A0109F6, 0x1F51FAF3, 0x5CEF1C62],
        [0x3D65E50E, 0x33D91626, 0x133D5A1E, 0x0FF49B0D, 0x38900CD1, 0x2C22CC3F,
         0x28852BB2, 0x06C65A02, 0x7B2CF7BC, 0x68016E1A, 0x15E16BC0, 0x5248149A,
         0x6DD212A0, 0x18D6830A, 0x5001BE82, 0x64DAC34E],
        [0x5902B287, 0x426583A0, 0x0C921632, 0x3FE028A5, 0x245F8E49, 0x43BB297E,
         0x7873DBD9, 0x3CC987DF, 0x286BB4CE, 0x640A8DCD, 0x512A8E36, 0x03A4CF55,
         0x481837A2, 0x03D6DA84, 0x73726AC7, 0x760E7FDF],
        # ending full rounds
        [0x43E7DC24, 0x259A5D61, 0x27E85A3B, 0x1B9133FA, 0x343E5628, 0x485CD4C2,
         0x16E269F5, 0x165B60C6, 0x25F683D9, 0x124F81F9, 0x174331F9, 0x77344DC5,
         0x5A821DBA, 0x5FC4177F, 0x54153BF5, 0x5E3F1194],
        [0x3BDBF191, 0x088C84A3, 0x68256C9B, 0x3C90BBC6, 0x6846166A, 0x03F4238D,
         0x463335FB, 0x5E3D3551, 0x6E59AE6F, 0x32D06CC0, 0x596293F3, 0x6C87EDB2,
         0x08FC60B5, 0x34BCCA80, 0x24F007F3, 0x62731C6F],
        [0x1E1DB6C6, 0x0CA409BB, 0x585C1E78, 0x56E94EDC, 0x16D22734, 0x18E11467,
         0x7B2C3730, 0x770075E4, 0x35D1B18C, 0x22BE3DB5, 0x4FB1FBB7, 0x477CB3ED,
         0x7D5311C6, 0x5B62AE7D, 0x559C5FA8, 0x77F15048],
        [0x3211570B, 0x490FEF6A, 0x77EC311F, 0x2247171B, 0x4E0AC711, 0x2EDF69C9,
         0x3B5A8850, 0x65809421, 0x5619B4AA, 0x362019A7, 0x6BF9D4ED, 0x5B413DFF,
         0x617E181E, 0x5E7AB57B, 0x33AD7833, 0x3466C7CA],
    ],
    dtype=np.uint32,
)

INTERNAL_RC = np.array(
    [0x54DFEB5D, 0x7D40AFD6, 0x722CB316, 0x106A4573, 0x45A7CCDB, 0x44061375,
     0x154077A5, 0x45744FAA, 0x4EB5E5EE, 0x3794E83F, 0x47C7093C, 0x5694903C,
     0x69CB6299, 0x373DF84C, 0x46A0DF58, 0x46B8758A, 0x3241EBCB, 0x0B09D233,
     0x1AF42357, 0x1E66CEC2],
    dtype=np.uint32,
)

# Internal diagonal V (mathematical values mod p).
INTERNAL_DIAG = np.array(
    [kb.P - 2] + [1 << s for s in [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 15]],
    dtype=np.uint32,
)

# Precomputed Montgomery-form constants for the device path.
_EXT_RC_M = np.array(
    [[kb.to_monty_i(int(c)) for c in row] for row in EXTERNAL_RC], dtype=np.uint32
)
_INT_RC_M = np.array([kb.to_monty_i(int(c)) for c in INTERNAL_RC], dtype=np.uint32)
_DIAG_M = np.array([kb.to_monty_i(int(c)) for c in INTERNAL_DIAG], dtype=np.uint32)


# ---------------------------------------------------------------------------
# Device permutation (monty form, jnp / Pallas-safe)
# ---------------------------------------------------------------------------

def _sbox(x):
    return kb.mul(kb.mul(x, x), x)


def _external_layer(state):
    """M_E: per-4-block M4 light permutation + circulant block sums.

    state: (..., 16) monty uint32.
    """
    s = state.reshape(state.shape[:-1] + (4, 4))
    x0, x1, x2, x3 = s[..., 0], s[..., 1], s[..., 2], s[..., 3]
    add = kb.add
    t01 = add(x0, x1)
    t23 = add(x2, x3)
    t0123 = add(t01, t23)
    t01123 = add(t0123, x1)
    t01233 = add(t0123, x3)
    n3 = add(t01233, kb.double(x0))
    n1 = add(t01123, kb.double(x2))
    n0 = add(t01123, t01)
    n2 = add(t01233, t23)
    blocks = jnp.stack([n0, n1, n2, n3], axis=-1)  # (..., 4 blocks, 4 lanes)
    sums = blocks[..., 0, :]
    for b in range(1, 4):
        sums = add(sums, blocks[..., b, :])
    out = add(blocks, sums[..., None, :])
    return out.reshape(state.shape)


def _internal_layer(state):
    """M_I: out[i] = V[i]*x[i] + sum_j x[j]."""
    total = state[..., 0]
    for i in range(1, WIDTH):
        total = kb.add(total, state[..., i])
    scaled = kb.mul(state, jnp.asarray(_DIAG_M))
    return kb.add(scaled, total[..., None])


def _ext_round(state, rc):
    state = kb.add(state, rc)
    state = _sbox(state)
    return _external_layer(state), None


def _int_round(state, rc):
    s0 = _sbox(kb.add(state[..., 0], rc))
    state = jnp.concatenate([s0[..., None], state[..., 1:]], axis=-1)
    return _internal_layer(state), None


def permute(state):
    """Poseidon2 permutation on monty-form uint32 arrays of shape (..., 16).

    Rounds run under lax.scan (compile-time friendly; each round body is a
    single fused elementwise kernel over the batch)."""
    import jax

    ext_rc = jnp.asarray(_EXT_RC_M)
    int_rc = jnp.asarray(_INT_RC_M)
    state = _external_layer(state)
    state, _ = jax.lax.scan(_ext_round, state, ext_rc[: ROUNDS_F // 2])
    state, _ = jax.lax.scan(_int_round, state, int_rc)
    state, _ = jax.lax.scan(_ext_round, state, ext_rc[ROUNDS_F // 2 :])
    return state


def permute_unrolled(state):
    """Fully unrolled variant (larger trace, potentially faster on TPU)."""
    ext_rc = jnp.asarray(_EXT_RC_M)
    int_rc = jnp.asarray(_INT_RC_M)
    state = _external_layer(state)
    for r in range(ROUNDS_F // 2):
        state, _ = _ext_round(state, ext_rc[r])
    for r in range(ROUNDS_P):
        state, _ = _int_round(state, int_rc[r])
    for r in range(ROUNDS_F // 2, ROUNDS_F):
        state, _ = _ext_round(state, ext_rc[r])
    return state


def hash_rows(rows):
    """PaddingFreeSponge over the trailing axis: (..., n) monty -> (..., 8) digest.

    Absorbs `rows` in rate-8 chunks into a zero-initialised width-16 state
    (reference: PaddingFreeSponge<KoalaPerm, 16, 8, 8>,
    slop/crates/koala-bear/src/koala_bear_poseidon2.rs:33). The final chunk is
    zero-padded (no domain padding, matching the padding-free sponge). The
    chunk loop runs under lax.scan to keep traces small.
    """
    import jax

    n = rows.shape[-1]
    batch = rows.shape[:-1]
    nchunks = -(-n // RATE)
    if n % RATE:
        pad = jnp.zeros(batch + (nchunks * RATE - n,), dtype=jnp.uint32)
        rows = jnp.concatenate([rows, pad], axis=-1)
    chunks = jnp.moveaxis(rows.reshape(batch + (nchunks, RATE)), -2, 0)

    def absorb(state, chunk):
        state = jnp.concatenate([chunk, state[..., RATE:]], axis=-1)
        return permute(state), None

    # Derive the zero state from the input so it inherits any shard_map
    # varying-axis metadata (a plain jnp.zeros carry breaks lax.scan's
    # carry-type check under shard_map).
    zrow = rows[..., :1] ^ rows[..., :1]
    state = jnp.broadcast_to(zrow, batch + (WIDTH,)).astype(jnp.uint32)
    state, _ = jax.lax.scan(absorb, state, chunks)
    return state[..., :DIGEST]


def compress(left, right):
    """TruncatedPermutation<KoalaPerm, 2, 8, 16>: 2-to-1 digest compression.

    left/right: (..., 8) monty digests -> (..., 8).
    """
    state = jnp.concatenate([left, right], axis=-1)
    return permute(state)[..., :DIGEST]


# ---------------------------------------------------------------------------
# Host mirror (canonical form, numpy) — challenger + test oracle
# ---------------------------------------------------------------------------

class hostp2:
    """Canonical-form Poseidon2 on numpy arrays, same shapes as device path."""

    @staticmethod
    def _sbox(x):
        f = kb.npf
        return f.mul(f.mul(x, x), x)

    @staticmethod
    def _external(state):
        f = kb.npf
        s = state.reshape(state.shape[:-1] + (4, 4))
        x0, x1, x2, x3 = s[..., 0], s[..., 1], s[..., 2], s[..., 3]
        t01 = f.add(x0, x1)
        t23 = f.add(x2, x3)
        t0123 = f.add(t01, t23)
        t01123 = f.add(t0123, x1)
        t01233 = f.add(t0123, x3)
        n3 = f.add(t01233, f.add(x0, x0))
        n1 = f.add(t01123, f.add(x2, x2))
        n0 = f.add(t01123, t01)
        n2 = f.add(t01233, t23)
        blocks = np.stack([n0, n1, n2, n3], axis=-1)
        sums = blocks[..., 0, :]
        for b in range(1, 4):
            sums = f.add(sums, blocks[..., b, :])
        return f.add(blocks, sums[..., None, :]).reshape(state.shape)

    @staticmethod
    def _internal(state):
        f = kb.npf
        total = state[..., 0]
        for i in range(1, WIDTH):
            total = f.add(total, state[..., i])
        scaled = f.mul(state, INTERNAL_DIAG)
        return f.add(scaled, total[..., None])

    @staticmethod
    def permute(state):
        state = np.asarray(state, np.uint32)
        state = hostp2._external(state)
        for r in range(ROUNDS_F // 2):
            state = kb.npf.add(state, EXTERNAL_RC[r])
            state = hostp2._sbox(state)
            state = hostp2._external(state)
        for r in range(ROUNDS_P):
            state = state.copy()
            state[..., 0] = hostp2._sbox(kb.npf.add(state[..., 0], INTERNAL_RC[r]))
            state = hostp2._internal(state)
        for r in range(ROUNDS_F // 2, ROUNDS_F):
            state = kb.npf.add(state, EXTERNAL_RC[r])
            state = hostp2._sbox(state)
            state = hostp2._external(state)
        return state

    @staticmethod
    def hash_rows(rows):
        rows = np.asarray(rows, np.uint32)
        n = rows.shape[-1]
        batch = rows.shape[:-1]
        state = np.zeros(batch + (WIDTH,), np.uint32)
        for start in range(0, n, RATE):
            chunk = rows[..., start:start + RATE]
            if chunk.shape[-1] < RATE:
                pad = np.zeros(batch + (RATE - chunk.shape[-1],), np.uint32)
                chunk = np.concatenate([chunk, pad], axis=-1)
            state = np.concatenate([chunk, state[..., RATE:]], axis=-1)
            state = hostp2.permute(state)
        return state[..., :DIGEST]

    @staticmethod
    def compress(left, right):
        state = np.concatenate(
            [np.asarray(left, np.uint32), np.asarray(right, np.uint32)], axis=-1
        )
        return hostp2.permute(state)[..., :DIGEST]


# ---------------------------------------------------------------------------
# Scalar (python-int) permutation — Fiat-Shamir hot path
# ---------------------------------------------------------------------------

_EXT_RC_I = [[int(c) for c in row] for row in EXTERNAL_RC]
_INT_RC_I = [int(c) for c in INTERNAL_RC]
_DIAG_I = [int(c) for c in INTERNAL_DIAG]
_P_I = int(kb.P)


def _ext_layer_ints(s):
    for g in range(0, 16, 4):
        x0, x1, x2, x3 = s[g], s[g + 1], s[g + 2], s[g + 3]
        t01 = x0 + x1
        t23 = x2 + x3
        t0123 = t01 + t23
        t01123 = t0123 + x1
        t01233 = t0123 + x3
        s[g] = (t01123 + t01) % _P_I
        s[g + 1] = (t01123 + 2 * x2) % _P_I
        s[g + 2] = (t01233 + t23) % _P_I
        s[g + 3] = (t01233 + 2 * x0) % _P_I
    sums = [0, 0, 0, 0]
    for g in range(0, 16, 4):
        for l in range(4):
            sums[l] += s[g + l]
    for g in range(0, 16, 4):
        for l in range(4):
            s[g + l] = (s[g + l] + sums[l]) % _P_I
    return s


def permute_ints(state):
    """Poseidon2 on a python list of 16 canonical ints (single sponge).

    ~10x faster than the row-wise numpy mirror for the sequential
    Fiat-Shamir challenger, where per-call numpy overhead dominates."""
    s = _ext_layer_ints([int(x) for x in state])
    P = _P_I
    for r in range(ROUNDS_F // 2):
        rc = _EXT_RC_I[r]
        s = [pow((x + c) % P, 3, P) for x, c in zip(s, rc)]
        s = _ext_layer_ints(s)
    for r in range(ROUNDS_P):
        s0 = pow((s[0] + _INT_RC_I[r]) % P, 3, P)
        s[0] = s0
        total = sum(s) % P
        s = [(x * d + total) % P for x, d in zip(s, _DIAG_I)]
    for r in range(ROUNDS_F // 2, ROUNDS_F):
        rc = _EXT_RC_I[r]
        s = [pow((x + c) % P, 3, P) for x, c in zip(s, rc)]
        s = _ext_layer_ints(s)
    return s

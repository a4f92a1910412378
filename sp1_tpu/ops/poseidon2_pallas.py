"""Pallas TPU kernels for Poseidon2: permutation, sponge, compression.

Why Pallas here: the scan-based `ops.poseidon2.permute` round-trips the
(N, 16) state through HBM on every one of the 28 rounds, so hashing is
HBM-bandwidth bound at ~28x the minimum traffic. These kernels hold the
whole state resident in VMEM/vector registers for all rounds (and, for the
sponge, for all absorb chunks), reading each input element from HBM exactly
once and writing each digest once — the speed-of-light traffic pattern for
a Merkle commit (reference hot path: sp1-gpu's fused poseidon2 leaf+tree
kernels, crates/sys/include/poseidon2/poseidon2_kb31_16.cuh; here the same
role is played by Mosaic kernels instead of CUDA).

Layout: batch along the 128-wide lane axis. State is a python list of 16
arrays of shape (block_n,) — one vector register row per Poseidon2 state
element — so every round is pure elementwise VPU work with zero shuffles;
the external/internal linear layers unroll into explicit adds. Inputs are
transposed to (16|W, N) once outside the kernel (a single XLA transpose
pass) rather than shuffling inside.

All arithmetic is the monty-form uint32 primitives from `field.koalabear`,
which lower to Mosaic (32-bit multiplies/shifts/compares only).

Fallback: `interpret=True` is used automatically on non-TPU backends so the
same code runs under the CPU test mesh.

Measured (TPU v5e, 2026-08-17): compress (32768,8): pallas 27.8 ms vs scan
30.4 ms; hash_rows (8192,32): 31.0 vs 28.6 ms; permute (65536,16): 0.203 vs
0.092 ms — XLA's fused scan already keeps the state VMEM-resident at these
sizes, so these kernels are kept behind `SP1_TPU_PALLAS=1` (see pcs/merkle)
rather than made the default; they become the substrate for a future fused
leaf+tree commit kernel where a single launch covers the whole tree.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from ..field import koalabear as kb
from . import poseidon2 as p2

WIDTH = p2.WIDTH
RATE = p2.RATE
DIGEST = p2.DIGEST

# Montgomery-form round constants as python ints (compile-time scalars).
_EXT_RC = [[int(c) for c in row] for row in p2._EXT_RC_M]
_INT_RC = [int(c) for c in p2._INT_RC_M]
_DIAG = [int(c) for c in p2._DIAG_M]

_LANES = 512  # block width along the batch axis (4 x 128 lanes)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _sbox(x):
    return kb.mul(kb.mul(x, x), x)


def _m4(x0, x1, x2, x3):
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
    return [n0, n1, n2, n3]


def _external(s):
    """M_E on a list of 16 vectors."""
    blocks = [_m4(*s[4 * g: 4 * g + 4]) for g in range(4)]
    sums = []
    for lane in range(4):
        acc = blocks[0][lane]
        for g in range(1, 4):
            acc = kb.add(acc, blocks[g][lane])
        sums.append(acc)
    return [kb.add(blocks[g][lane], sums[lane]) for g in range(4) for lane in range(4)]


def _internal(s):
    """M_I: out[i] = V[i]*x[i] + sum_j x[j]."""
    total = s[0]
    for i in range(1, WIDTH):
        total = kb.add(total, s[i])
    return [kb.add(kb.mul(s[i], jnp.uint32(_DIAG[i])), total) for i in range(WIDTH)]


def _perm(s):
    """Full unrolled permutation on a list of 16 same-shape vectors."""
    s = _external(s)
    for r in range(p2.ROUNDS_F // 2):
        s = [_sbox(kb.add(s[i], jnp.uint32(_EXT_RC[r][i]))) for i in range(WIDTH)]
        s = _external(s)
    for r in range(p2.ROUNDS_P):
        s = [_sbox(kb.add(s[0], jnp.uint32(_INT_RC[r])))] + s[1:]
        s = _internal(s)
    for r in range(p2.ROUNDS_F // 2, p2.ROUNDS_F):
        s = [_sbox(kb.add(s[i], jnp.uint32(_EXT_RC[r][i]))) for i in range(WIDTH)]
        s = _external(s)
    return s


def _permute_kernel(x_ref, o_ref):
    s = [x_ref[i, :] for i in range(WIDTH)]
    s = _perm(s)
    for i in range(WIDTH):
        o_ref[i, :] = s[i]


def _sponge_kernel(x_ref, o_ref, *, width: int):
    """Absorb a (width, block_n) tile in rate-8 chunks; write (8, block_n)."""
    nchunks = -(-width // RATE)
    zero = jnp.zeros_like(x_ref[0, :])
    s = [zero] * WIDTH
    for c in range(nchunks):
        for j in range(RATE):
            idx = c * RATE + j
            s[j] = x_ref[idx, :] if idx < width else zero
        s = _perm(s)
    for i in range(DIGEST):
        o_ref[i, :] = s[i]


def _compress_kernel(l_ref, r_ref, o_ref):
    s = [l_ref[i, :] for i in range(DIGEST)] + [r_ref[i, :] for i in range(DIGEST)]
    s = _perm(s)
    for i in range(DIGEST):
        o_ref[i, :] = s[i]


def _pad_lanes(x):
    """Pad trailing axis up to a multiple of _LANES; returns (padded, n)."""
    n = x.shape[-1]
    pn = max(-(-n // _LANES), 1) * _LANES
    if pn > n:
        x = jnp.concatenate(
            [x, jnp.zeros(x.shape[:-1] + (pn - n,), jnp.uint32)], axis=-1
        )
    return x, n


@jax.jit
def permute_t(state_t):
    """Permute transposed states: (16, N) monty uint32 -> (16, N)."""
    x, n = _pad_lanes(state_t)
    out = pl.pallas_call(
        _permute_kernel,
        grid=(x.shape[1] // _LANES,),
        in_specs=[pl.BlockSpec((WIDTH, _LANES), lambda i: (0, i))],
        out_specs=pl.BlockSpec((WIDTH, _LANES), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((WIDTH, x.shape[1]), jnp.uint32),
        interpret=_interpret(),
    )(x)
    return out[:, :n]


def permute(state):
    """(N, 16) monty -> (N, 16); drop-in for ops.poseidon2.permute."""
    return permute_t(state.T).T


@functools.partial(jax.jit, static_argnames=("width",))
def _hash_rows_t(rows_t, width: int):
    x, n = _pad_lanes(rows_t)
    out = pl.pallas_call(
        functools.partial(_sponge_kernel, width=width),
        grid=(x.shape[1] // _LANES,),
        in_specs=[pl.BlockSpec((width, _LANES), lambda i: (0, i))],
        out_specs=pl.BlockSpec((DIGEST, _LANES), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((DIGEST, x.shape[1]), jnp.uint32),
        interpret=_interpret(),
    )(x)
    return out[:, :n]


def hash_rows(rows):
    """PaddingFreeSponge per row: (N, W) monty -> (N, 8) digests.

    One HBM read of the matrix, one write of the digests; all chunk
    absorptions stay in registers."""
    return _hash_rows_t(rows.T, int(rows.shape[-1])).T


@jax.jit
def _compress_t(left_t, right_t):
    l, n = _pad_lanes(left_t)
    r, _ = _pad_lanes(right_t)
    out = pl.pallas_call(
        _compress_kernel,
        grid=(l.shape[1] // _LANES,),
        in_specs=[
            pl.BlockSpec((DIGEST, _LANES), lambda i: (0, i)),
            pl.BlockSpec((DIGEST, _LANES), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((DIGEST, _LANES), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((DIGEST, l.shape[1]), jnp.uint32),
        interpret=_interpret(),
    )(l, r)
    return out[:, :n]


def compress(left, right):
    """2-to-1 digest compression: (N, 8), (N, 8) -> (N, 8)."""
    return _compress_t(left.T, right.T).T

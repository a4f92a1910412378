"""Host (numpy, canonical-form) mirrors of the small MLE kernels.

Sumcheck tails operate on tiny tables (the table halves every round); the
last ~10 rounds of every sumcheck are latency/compile-bound, not
FLOP-bound, so they run on the host in canonical form. The crossover
threshold is SP1_TPU_HOST_THRESH rows (default 4096): above it, device
(jnp, monty) kernels run; at or below it, these numpy routines do.

This mirrors the reference GPU's design concern (tiny late GKR layers are
fused/kept off the wide device path) with a host tail instead.
"""

from __future__ import annotations

import os

import numpy as np

from ..field import extension as ext
from ..field import koalabear as kb

E4 = ext.npext4

HOST_THRESH = int(os.environ.get("SP1_TPU_HOST_THRESH", "4096"))

_RINV = pow(1 << 32, -1, kb.P)


def from_monty_host(x: np.ndarray) -> np.ndarray:
    # monty values are < 2^32: split 16/16 so int64 products stay < 2^63
    # (numpy uint64 kernels are scalar on this target; int64 is SIMD).
    x64 = np.asarray(x).astype(np.int64)
    hi = (x64 >> 16) * ((_RINV << 16) % kb.P) % kb.P
    lo = (x64 & 0xFFFF) * _RINV % kb.P
    return ((hi + lo) % kb.P).astype(np.uint32)


def to_monty_host(x: np.ndarray) -> np.ndarray:
    return (np.asarray(x).astype(np.int64) * ((1 << 32) % kb.P) % kb.P).astype(
        np.uint32
    )


def dev_to_host(x) -> np.ndarray:
    """jnp monty array -> numpy canonical array."""
    return from_monty_host(np.asarray(x))


def fix_last(guts: np.ndarray, alpha: np.ndarray) -> np.ndarray:
    """(2m, ..., 4) canonical -> (m, ..., 4): lo + alpha*(hi - lo)."""
    v = guts.reshape((guts.shape[0] // 2, 2) + guts.shape[1:])
    lo, hi = v[:, 0], v[:, 1]
    return E4.add(lo, E4.mul(E4.sub(hi, lo), np.broadcast_to(alpha, lo.shape)))


def fix_last_base_to_ext(guts: np.ndarray, alpha: np.ndarray) -> np.ndarray:
    """(2m, ...) BASE canonical -> (m, ..., 4) ext: lo + alpha*(hi - lo)."""
    v = guts.reshape((guts.shape[0] // 2, 2) + guts.shape[1:]).astype(np.int64)
    lo, hi = v[:, 0], v[:, 1]
    diff = (hi + kb.P - lo) % kb.P
    out = diff[..., None] * alpha.astype(np.int64) % kb.P
    out[..., 0] = (out[..., 0] + lo) % kb.P
    return out.astype(np.uint32)


def fold(guts: np.ndarray, beta: np.ndarray) -> np.ndarray:
    """(2m, 4) canonical -> (m, 4): lo + beta*hi (BaseFold fold)."""
    v = guts.reshape(-1, 2, 4)
    return E4.add(v[:, 0], E4.mul(v[:, 1], np.broadcast_to(beta, v[:, 1].shape)))


def sum0(x: np.ndarray) -> np.ndarray:
    """Field-sum along axis 0 of a canonical array (..., 4)."""
    acc = x[0].astype(np.int64)
    for i in range(1, x.shape[0]):
        acc = (acc + x[i]) % kb.P
    return acc.astype(np.uint32)


def sum0_fast(x: np.ndarray) -> np.ndarray:
    """Vectorized field-sum along axis 0 (batches of int64 adds)."""
    v = x.astype(np.int64)
    while v.shape[0] > 1:
        n = v.shape[0]
        if n % 2:
            v = np.concatenate([v, np.zeros_like(v[:1])], axis=0)
            n += 1
        v = (v[: n // 2] + v[n // 2 :]) % kb.P
    return v[0].astype(np.uint32)


def at_x(table: np.ndarray, x: int) -> np.ndarray:
    """Even/odd interpolation at integer point x: lo + x*(hi - lo).

    table: (2m, ..., 4) canonical.
    """
    v = table.reshape((table.shape[0] // 2, 2) + table.shape[1:])
    lo, hi = v[:, 0].astype(np.int64), v[:, 1].astype(np.int64)
    if x == 0:
        return lo.astype(np.uint32)
    if x == 1:
        return hi.astype(np.uint32)
    diff = (hi + kb.P - lo) % kb.P
    return ((lo + x * diff) % kb.P).astype(np.uint32)


def eval_at_point(guts: np.ndarray, point: np.ndarray) -> np.ndarray:
    """Canonical ext4 MLE (2^n, 4) evaluated at canonical point (n, 4)."""
    from . import mle as mle_ops

    return mle_ops.host.eval_ext_mle(guts, point)


class NpVecOps:
    """Vectorized host ops: values are (N, 4) canonical numpy arrays."""

    def __init__(self, n: int):
        self.n = n

    def const(self, v: int):
        arr = np.zeros((self.n, 4), np.uint32)
        arr[:, 0] = v % kb.P
        return arr

    @staticmethod
    def add(a, b):
        return E4.add(a, b)

    @staticmethod
    def sub(a, b):
        return E4.sub(a, b)

    @staticmethod
    def mul(a, b):
        return E4.mul(a, b)

    @staticmethod
    def neg(a):
        return E4.sub(np.zeros_like(a), a)

    @staticmethod
    def scale_base(a, w: int):
        return kb.npf.mul(np.asarray(a, np.uint32), np.uint32(w % kb.P))

    def zero(self):
        return np.zeros((self.n, 4), np.uint32)

    def one(self):
        return self.const(1)

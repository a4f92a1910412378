"""Two-adic domain utilities for KoalaBear (host-side, numpy).

Vectorized power tables and bit-reversal permutations used by the NTT,
RS encoder, and FRI fold. All canonical-form uint32.
"""

from __future__ import annotations

import numpy as np

from . import koalabear as kb


def two_adic_generator(log_n: int) -> int:
    """Generator of the order-2^log_n multiplicative subgroup."""
    assert 0 <= log_n <= kb.TWO_ADICITY
    return pow(kb.TWO_ADIC_GENERATOR, 1 << (kb.TWO_ADICITY - log_n), kb.P)


def pow_vector(base: int, n: int) -> np.ndarray:
    """[base^0, base^1, ..., base^(n-1)] mod p, canonical uint32.

    Vectorized: for each bit b of the exponent, multiply in (base^(2^b))
    where that bit is set. O(n log n) uint64 ops.
    """
    out = np.ones(n, dtype=np.uint64)
    idx = np.arange(n, dtype=np.uint64)
    sq = base % kb.P
    b = 0
    while (1 << b) < max(n, 1):
        mask = (idx >> np.uint64(b)) & np.uint64(1)
        out = np.where(mask == 1, out * sq % kb.P, out)
        sq = sq * sq % kb.P
        b += 1
    return out.astype(np.uint32)


def bit_reverse_indices(log_n: int) -> np.ndarray:
    """Permutation r with r[i] = bit-reversal of i over log_n bits."""
    n = 1 << log_n
    idx = np.arange(n, dtype=np.uint32)
    rev = np.zeros(n, dtype=np.uint32)
    for b in range(log_n):
        rev |= ((idx >> np.uint32(b)) & np.uint32(1)) << np.uint32(log_n - 1 - b)
    return rev


def reverse_bits(x: int, bits: int) -> int:
    out = 0
    for b in range(bits):
        out |= ((x >> b) & 1) << (bits - 1 - b)
    return out

"""Radix-2 NTT over KoalaBear along axis 0, TPU-native.

Used for Reed-Solomon encoding in the BaseFold PCS (reference:
slop/crates/basefold-prover/src/encoder.rs `CpuDftEncoder::encode_batch`,
slop/crates/dft/src/p3.rs). The encoder computes a zero-padded DFT with
output in BIT-REVERSED order, which is what makes adjacent codeword
entries FRI-foldable pairs.

Design for TPU: the transform axis (rows, up to 2^23) is axis 0; the
column axis (many polynomials at once) rides the 128-wide VPU lanes. Each
DIF stage is a reshape + elementwise butterfly, so a full transform is
log2(N) fused elementwise passes under jit. A natural-input DIF network
produces bit-reversed output directly — no separate permutation pass.

All values monty-form uint32.
"""

from __future__ import annotations

from functools import lru_cache, partial

import numpy as np

import jax
import jax.numpy as jnp

from ..field import koalabear as kb
from ..field.domain import pow_vector, two_adic_generator


@lru_cache(maxsize=None)
def _dif_twiddles(log_n: int) -> tuple[np.ndarray, ...]:
    """Monty-form twiddle tables for each DIF stage of a length-2^log_n NTT.

    Stage s (s=0 first) has blocks of size m = N >> s; twiddles are
    w_m^j, j in 0..m/2, with w_m the order-m root.
    """
    tables = []
    for s in range(log_n):
        m = 1 << (log_n - s)
        w = two_adic_generator(log_n - s)
        tw = pow_vector(w, m // 2).astype(np.uint64)
        tables.append(((tw << 32) % kb.P).astype(np.uint32))  # to monty
    return tuple(tables)


def ntt_bitrev(x, log_n: int):
    """Forward NTT along axis 0; natural input, bit-reversed output.

    x: (N, ...) monty uint32 with N = 2^log_n.
    """
    shape_rest = x.shape[1:]
    for s in range(log_n):
        m = 1 << (log_n - s)
        half = m // 2
        tw = jnp.asarray(_dif_twiddles(log_n)[s])
        v = x.reshape((-1, m) + shape_rest)
        lo, hi = v[:, :half], v[:, half:]
        tshape = (1, half) + (1,) * len(shape_rest)
        new_lo = kb.add(lo, hi)
        new_hi = kb.mul(kb.sub(lo, hi), tw.reshape(tshape))
        x = jnp.concatenate([new_lo, new_hi], axis=1).reshape((-1,) + shape_rest)
    return x


@lru_cache(maxsize=None)
def _dit_twiddles(log_n: int) -> tuple[np.ndarray, ...]:
    """Monty inverse-twiddles for the inverse transform (DIT, bitrev input)."""
    tables = []
    for s in range(log_n):
        m = 1 << (log_n - s)
        w = pow(two_adic_generator(log_n - s), kb.P - 2, kb.P)  # inverse root
        tw = pow_vector(w, m // 2).astype(np.uint64)
        tables.append(((tw << 32) % kb.P).astype(np.uint32))
    return tuple(tables)


def intt_from_bitrev(x, log_n: int):
    """Inverse NTT along axis 0; bit-reversed input, natural output.

    Inverts `ntt_bitrev` exactly (including the 1/N scaling).
    """
    shape_rest = x.shape[1:]
    n = 1 << log_n
    # Run the DIF stages backwards as a DIT network with inverse twiddles.
    for s in reversed(range(log_n)):
        m = 1 << (log_n - s)
        half = m // 2
        tw = jnp.asarray(_dit_twiddles(log_n)[s])
        v = x.reshape((-1, m) + shape_rest)
        lo, hi = v[:, :half], v[:, half:]
        tshape = (1, half) + (1,) * len(shape_rest)
        hi_t = kb.mul(hi, tw.reshape(tshape))
        new_lo = kb.add(lo, hi_t)
        new_hi = kb.sub(lo, hi_t)
        x = jnp.concatenate([new_lo, new_hi], axis=1).reshape((-1,) + shape_rest)
    n_inv = kb.to_monty_i(pow(n, kb.P - 2, kb.P))
    return kb.mul(x, jnp.asarray(np.uint32(n_inv)))


@partial(jax.jit, static_argnums=(1, 2))
def rs_encode(msg, log_h: int, log_blowup: int):
    """Reed-Solomon encode columns: zero-pad rows by 2^log_blowup, NTT.

    msg: (2^log_h, ...) monty uint32 interpreted as univariate
    coefficients per column. Returns the codeword in bit-reversed row
    order, shape (2^(log_h+log_blowup), ...).

    Reference semantics: slop/crates/basefold-prover/src/encoder.rs:34
    `dft.dft(data, log_blowup, DftOrdering::BitReversed, 0)`.
    """
    h = 1 << log_h
    assert msg.shape[0] == h
    pad_shape = ((1 << (log_h + log_blowup)) - h,) + msg.shape[1:]
    padded = jnp.concatenate([msg, jnp.zeros(pad_shape, dtype=jnp.uint32)], axis=0)
    return ntt_bitrev(padded, log_h + log_blowup)


# ---------------------------------------------------------------------------
# Host reference (numpy, canonical) for differential tests
# ---------------------------------------------------------------------------

def host_ntt_naive(coeffs: np.ndarray, log_n: int) -> np.ndarray:
    """O(N^2) canonical-form DFT along axis 0, natural output order."""
    n = 1 << log_n
    g = two_adic_generator(log_n)
    powers = pow_vector(g, n).astype(np.uint64)
    out = np.zeros_like(coeffs, dtype=np.uint64)
    acc = np.zeros((n,) + coeffs.shape[1:], dtype=np.uint64)
    for k in range(n):
        # row k: sum_j c_j * g^(jk)
        idx = (np.arange(n, dtype=np.uint64) * k) % n
        w = powers[idx]
        w = w.reshape((n,) + (1,) * (coeffs.ndim - 1))
        acc[k] = (coeffs.astype(np.uint64) * w % kb.P).sum(axis=0) % kb.P
    out = acc % kb.P
    return out.astype(np.uint32)

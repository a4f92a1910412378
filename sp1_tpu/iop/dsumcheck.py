"""Device-orchestrated sumcheck: all rounds enqueue asynchronously.

The host driver in `iop.sumcheck` pays one device->host readback per
round (the Fiat-Shamir challenger runs on the host). This driver keeps
the challenger ON DEVICE (iop.dchallenger.TraceChallenger): each round's
restricted sums feed a small jitted interpolate+RLC kernel, the message
is absorbed by the device sponge, and the sampled challenge flows
straight into the next round's fold kernels — the Python loop only
ENQUEUES work. Nothing synchronizes until `DeferredSumcheck.finalize()`
reads the whole transcript back in one transfer.

Protocol and transcript are bit-identical to the host driver
(reference: slop/crates/sumcheck/src/prover.rs:13); tests compare the
two drivers' proofs directly.

Device polys must expose:
  num_variables, degree,
  sum_values_device() -> (degree+2, 4) monty restricted sums,
  fix_last_variable_dev(alpha_monty) -> poly (must stay on device),
  component_evals_device() -> (k, 4) monty evals at the final point.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache

import numpy as np

import jax
import jax.numpy as jnp

from ..field import extension as ext
from ..field import koalabear as kb
from ..utils.fetch import batch_fetch
from . import sumcheck as sc
from .dchallenger import TraceChallenger

E4 = ext.npext4


def _to_monty_np(x):
    return ((np.asarray(x, np.uint64) << 32) % kb.P).astype(np.uint32)


_to_monty_jit = jax.jit(kb.to_monty)


@lru_cache(maxsize=None)
def _vinv_monty(npts: int):
    """Monty-form inverse Vandermonde for nodes 0..npts-1 (see
    sumcheck coefficient interpolation, prover/zerocheck.py:interp_coeffs)."""
    m = [[pow(x, k, kb.P) for k in range(npts)] for x in range(npts)]
    inv = [[1 if i == j else 0 for j in range(npts)] for i in range(npts)]
    for col in range(npts):
        piv = next(r for r in range(col, npts) if m[r][col] % kb.P != 0)
        m[col], m[piv] = m[piv], m[col]
        inv[col], inv[piv] = inv[piv], inv[col]
        pinv = pow(m[col][col], kb.P - 2, kb.P)
        m[col] = [v * pinv % kb.P for v in m[col]]
        inv[col] = [v * pinv % kb.P for v in inv[col]]
        for r in range(npts):
            if r != col and m[r][col] % kb.P:
                f = m[r][col] % kb.P
                m[r] = [(a - f * b) % kb.P for a, b in zip(m[r], m[col])]
                inv[r] = [(a - f * b) % kb.P for a, b in zip(inv[r], inv[col])]
    return _to_monty_np(np.array(inv, np.uint32))


@lru_cache(maxsize=None)
def _interp_rlc_fn(n_polys: int, npts: int):
    """(n_polys, npts, 4) monty sums -> (per-poly coeffs monty, rlc msg canonical)."""
    vinv = jnp.asarray(_vinv_monty(npts))

    @jax.jit
    def f(sums, lam_m):
        # coeffs[p, k] = sum_x vinv[k, x] * sums[p, x]  (base-scalar * ext)
        coeffs = kb.mul(sums[:, None, :, :], vinv[None, :, :, None])  # (P,K,X,4)
        acc = coeffs[:, :, 0]
        for x in range(1, npts):
            acc = kb.add(acc, coeffs[:, :, x])
        coeffs_m = acc  # (n_polys, npts, 4)
        rlc = coeffs_m[0]
        for p in range(1, n_polys):
            rlc = kb.add(
                ext.ext4_mul(rlc, jnp.broadcast_to(lam_m, rlc.shape)), coeffs_m[p]
            )
        return coeffs_m, kb.from_monty(rlc)

    return f


@dataclass
class DeferredSumcheck:
    """Device handles for a finished (but unfetched) sumcheck."""

    messages: list  # per round: (d+1, 4) canonical device
    alphas: list  # big-endian: alphas[0] = LAST round's challenge (canonical)
    last_coeffs: object  # (n_polys, d+1, 4) monty device (final round)
    component_evals: list  # per poly: (k, 4) monty device
    claims: list  # (4,) canonical np arrays
    lam: np.ndarray  # (4,) canonical np

    def handles(self) -> list:
        return (
            list(self.messages)
            + list(self.alphas)
            + [self.last_coeffs]
            + list(self.component_evals)
        )

    def from_fetched(self, fetched: list):
        """Build (PartialSumcheckProof, component_evals) from the numpy
        arrays `batch_fetch(self.handles())` returned."""
        n_r = len(self.messages)
        msgs = fetched[:n_r]
        alphas = fetched[n_r : 2 * n_r]
        last_coeffs = np.asarray(
            kb_from_monty_host(fetched[2 * n_r]), np.uint32
        )
        comps = [
            np.asarray(kb_from_monty_host(c), np.uint32)
            for c in fetched[2 * n_r + 1 :]
        ]
        point = np.stack(alphas)
        message_evals = [sc.uni_eval(last_coeffs[p], point[0]) for p in range(last_coeffs.shape[0])]
        final_eval = (
            sc.rlc_polys(message_evals, self.lam)
            if len(message_evals) > 1
            else message_evals[0]
        )
        batched_claim = (
            sc.rlc_polys([np.asarray(c, np.uint32) for c in self.claims], self.lam)
            if len(self.claims) > 1
            else np.asarray(self.claims[0], np.uint32)
        )
        proof = sc.PartialSumcheckProof(
            univariate_polys=np.stack(msgs),
            claimed_sum=batched_claim,
            point=point,
            eval=final_eval,
        )
        component_evals = [[c[i] for i in range(c.shape[0])] for c in comps]
        return proof, component_evals

    def finalize(self):
        return self.from_fetched(batch_fetch(self.handles()))


def kb_from_monty_host(x: np.ndarray) -> np.ndarray:
    from ..ops.hostmle import from_monty_host

    return from_monty_host(np.asarray(x, np.uint32))


def device_sumcheck(
    polys: list,
    tch: TraceChallenger,
    claims: list,
    lam: np.ndarray,
) -> DeferredSumcheck:
    """Run all rounds on device with a device challenger; returns handles.

    claims/lam are host canonical (they only enter the PROOF metadata,
    not the transcript — matching the host driver)."""
    assert polys
    num_vars = polys[0].num_variables
    assert all(p.num_variables == num_vars for p in polys)
    npts = polys[0].degree + 1  # sample points X = 0..degree
    lam_m = jnp.asarray(_to_monty_np(np.asarray(lam, np.uint32)))
    interp = _interp_rlc_fn(len(polys), npts)

    cursor = list(polys)
    messages, alphas = [], []
    last_coeffs = None
    for _ in range(num_vars):
        sums = jnp.stack([p.sum_values_device() for p in cursor])
        coeffs_m, msg_c = interp(sums, lam_m)
        last_coeffs = coeffs_m
        messages.append(msg_c)
        tch.observe_slice(msg_c.reshape(-1))
        alpha = tch.sample_ext()
        alphas.insert(0, alpha)
        am = _to_monty_jit(alpha)
        cursor = [p.fix_last_variable_dev(am) for p in cursor]

    comp = [p.component_evals_device() for p in cursor]
    return DeferredSumcheck(
        messages=messages,
        alphas=alphas,
        last_coeffs=last_coeffs,
        component_evals=comp,
        claims=[np.asarray(c, np.uint32) for c in claims],
        lam=np.asarray(lam, np.uint32),
    )


def reduce_sumcheck_to_evaluation_device(polys, challenger, claims, lam):
    """Drop-in replacement for sc.reduce_sumcheck_to_evaluation that runs
    the rounds device-side (one readback total) and keeps the host
    challenger in sync."""
    tch = TraceChallenger.from_host(challenger)
    deferred = device_sumcheck(polys, tch, claims, lam)
    proof, component_evals = deferred.finalize()
    tch.to_host(challenger)
    return proof, component_evals

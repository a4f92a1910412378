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
        if any(not isinstance(c, np.ndarray) for c in self.claims):
            # device-resident claims (GKR DFS loop): the caller patches
            # claimed_sum from its own batched fetch.
            batched_claim = np.zeros(4, np.uint32)
        else:
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


def _interp_rlc_body(sums, lam_m, vinv, n_polys: int, npts: int):
    """Inlinable body of _interp_rlc_fn (shared with the fused step)."""
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


_FUSED_STEPS = {}
_FUSED_TAILS = {}

# Remaining rounds whose live pairs fit under this bound are unrolled into
# ONE dispatch (only for polys flagging `tail_fusable` — cheap sums bodies
# like the GKR layer / Hadamard tables, where a 10-round unroll compiles
# in seconds; zerocheck's constraint tapes stay one-dispatch-per-round).
import os

TAIL_FUSE = int(os.environ.get("SP1_TPU_TAIL_FUSE", "4096"))


def _fused_tail(key, sums_fns, fold_fn, npts: int, nbuf0: int, rounds: int,
                n_live0: int):
    """All remaining sumcheck rounds in ONE jit: sums + message interp +
    sponge absorb/sample + fold, unrolled over `rounds` shrinking rounds.
    Tables are sliced to the exact live prefix each round (free inside a
    single trace), so the tail does optimal work."""
    cached = _FUSED_TAILS.get(key)
    if cached is not None:
        return cached
    from .dchallenger import RATE, _permute_canonical

    n_polys = len(sums_fns)
    msg_len = npts * 4
    vinv = jnp.asarray(_vinv_monty(npts))

    @jax.jit
    def tail(state, buf, lam_m, tables, auxes):
        msgs, alphas = [], []
        coeffs_m = None
        nbuf = nbuf0
        n_live = n_live0
        tables = [t[:n_live] for t in tables]
        for _ in range(rounds):
            sums = jnp.stack(
                [sums_fns[i](tables[i], jnp.uint32(n_live // 2), *auxes[i])
                 for i in range(n_polys)]
            )
            coeffs_m, msg_c = _interp_rlc_body(sums, lam_m, vinv, n_polys, npts)
            vec = msg_c.reshape(-1)
            vals = jnp.concatenate([buf, vec]) if nbuf else vec
            total = nbuf + msg_len
            for c in range(total // RATE):
                state = _permute_canonical(
                    jnp.concatenate([vals[c * RATE : (c + 1) * RATE], state[RATE:]])
                )
            left = total % RATE
            if left:
                state = _permute_canonical(
                    jnp.concatenate([vals[total - left :], state[left:]])
                )
            alpha4 = jnp.stack([state[RATE - 1 - k] for k in range(4)])
            am = kb.to_monty(alpha4)
            tables = [fold_fn(t, am)[: t.shape[0] // 2] for t in tables]
            n_live //= 2
            nbuf = 0
            buf = jnp.zeros(0, jnp.uint32)
            msgs.append(msg_c)
            alphas.append(alpha4)
        return state, tuple(msgs), tuple(alphas), coeffs_m, tuple(tables)

    _FUSED_TAILS[key] = tail
    return tail


def _fused_step(key, sums_fns, fold_fn, npts: int, nbuf: int):
    """One-dispatch-per-round sumcheck step: restricted sums for every
    poly, message interpolation, the TraceChallenger absorb + duplex +
    4-felt sample, and all fold kernels — fused into a single jit so a
    round costs ONE device dispatch instead of ~2*n_polys + 6 (the
    dominant cost on the remote-tunnel TPU path).

    The sponge phase arithmetic is STATIC (nbuf in the cache key): each
    round absorbs npts*4 felts and samples 4, mirroring observe_slice +
    sample_ext of dchallenger.TraceChallenger bit for bit."""
    from .dchallenger import RATE, _permute_canonical

    cached = _FUSED_STEPS.get(key)
    if cached is not None:
        return cached
    n_polys = len(sums_fns)
    msg_len = npts * 4
    vinv = jnp.asarray(_vinv_monty(npts))

    def absorb(state, buf, vec):
        total = nbuf + vec.shape[0]
        nchunks = total // RATE
        vals = jnp.concatenate([buf, vec]) if nbuf else vec
        for c in range(nchunks):
            chunk = vals[c * RATE : (c + 1) * RATE]
            state = jnp.concatenate([chunk, state[RATE:]])
            state = _permute_canonical(state)
        return state, vals[nchunks * RATE :]

    nbuf2 = (nbuf + msg_len) % RATE
    landed = (nbuf + msg_len) >= RATE and nbuf2 == 0

    @jax.jit
    def step(state, buf, lam_m, live_pairs, tables, auxes):
        sums = jnp.stack(
            [sums_fns[i](tables[i], live_pairs, *auxes[i])
             for i in range(n_polys)]
        )
        coeffs_m, msg_c = _interp_rlc_body(sums, lam_m, vinv, n_polys, npts)
        state2, leftover = absorb(state, buf, msg_c.reshape(-1))
        if landed:
            state3 = state2  # output buffer exactly refilled: no duplex
        else:
            state3 = _permute_canonical(
                jnp.concatenate([leftover, state2[nbuf2:]])
            )
        alpha4 = jnp.stack(
            [state3[RATE - 1 - k] for k in range(4)]
        )  # sample_ext pop order
        am = kb.to_monty(alpha4)
        tables2 = [fold_fn(t, am) for t in tables]
        return state3, msg_c, coeffs_m, alpha4, tables2

    _FUSED_STEPS[key] = step
    return step


def _device_sumcheck_fused(polys, parts, tch, claims, lam) -> DeferredSumcheck:
    from .dchallenger import RATE

    num_vars = polys[0].num_variables
    npts = polys[0].degree + 1
    if isinstance(lam, np.ndarray):
        lam_m = jnp.asarray(_to_monty_np(lam))
        lam_host = lam
    else:
        lam_m = _to_monty_jit(jnp.asarray(lam))  # device lam: no host sync
        lam_host = None
    sums_fns = tuple(pt[0] for pt in parts)
    fold_fn = parts[0][1]
    tables = [pt[2] for pt in parts]
    auxes = tuple(pt[3] for pt in parts)
    clones = [pt[4] for pt in parts]

    tail_ok = all(getattr(p, "tail_fusable", False) for p in polys)
    # polys with a cheap sums body can fuse EVERY round into one dispatch
    fuse_all = tail_ok and all(
        getattr(p, "tail_fuse_all", False) for p in polys
    )
    tail_bound = (1 << num_vars) if fuse_all else TAIL_FUSE
    messages, alphas = [], []
    last_coeffs = None
    n_live = 1 << num_vars
    rounds_done = 0
    while rounds_done < num_vars:
        if tail_ok and n_live <= tail_bound:
            # Unroll every remaining round into one dispatch.
            rounds_left = num_vars - rounds_done
            nbuf = tch._nbuf
            key = (
                "tail",
                tuple(id(f) for f in sums_fns),
                tuple(tuple(t.shape) for t in tables),
                npts,
                nbuf,
                rounds_left,
                n_live,
            )
            tail = _fused_tail(key, sums_fns, fold_fn, npts, nbuf,
                               rounds_left, n_live)
            state3, msgs, alphas4, coeffs_m, tables = tail(
                tch.state, tch._buf_array(), lam_m, tables, auxes
            )
            tables = list(tables)
            from .dchallenger import RATE as _RATE

            tch.state = state3
            tch._segs = []
            tch._nbuf = 0
            tch._out_left = _RATE - 4
            messages.extend(msgs)
            for a in alphas4:
                alphas.insert(0, a)
            last_coeffs = coeffs_m
            n_live >>= rounds_left
            rounds_done = num_vars
            break
        # Compact the packed buffers when the live prefix drops to a
        # quarter of the allocation: the masked full-buffer scheme would
        # otherwise pay leaf-size work EVERY round (8x the optimal
        # shrinking-table total). 4x steps keep the fused-step compile
        # count at ~log4(n) shapes while staying within 1.35x of optimal.
        n_alloc = int(tables[0].shape[0])
        if n_live * 4 <= n_alloc and n_live >= 512:
            tables = [t[:n_live] for t in tables]
        nbuf = tch._nbuf
        key = (
            tuple(id(f) for f in sums_fns),
            tuple(tuple(t.shape) for t in tables),
            npts,
            nbuf,
        )
        step = _fused_step(key, sums_fns, fold_fn, npts, nbuf)
        state3, msg_c, coeffs_m, alpha4, tables = step(
            tch.state, tch._buf_array(), lam_m, jnp.uint32(n_live // 2),
            tables, auxes,
        )
        # mirror observe_slice + sample_ext bookkeeping on the challenger
        tch.state = state3
        tch._segs = []
        tch._nbuf = 0
        tch._out_left = RATE - 4
        messages.append(msg_c)
        alphas.insert(0, alpha4)
        last_coeffs = coeffs_m
        n_live //= 2
        rounds_done += 1

    comp = [
        clone(t).component_evals_device() for clone, t in zip(clones, tables)
    ]
    return DeferredSumcheck(
        messages=messages,
        alphas=alphas,
        last_coeffs=last_coeffs,
        component_evals=comp,
        claims=[np.asarray(c, np.uint32) if isinstance(c, np.ndarray) else c
                for c in claims],
        lam=np.asarray(lam_host, np.uint32) if lam_host is not None else None,
    )


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
    parts = [getattr(p, "fused_parts", lambda: None)() for p in polys]
    if parts and all(pt is not None for pt in parts):
        return _device_sumcheck_fused(polys, parts, tch, claims, lam)
    npts = polys[0].degree + 1  # sample points X = 0..degree
    if isinstance(lam, np.ndarray):
        lam_m = jnp.asarray(_to_monty_np(lam))
        lam_host = lam
    else:
        lam_m = _to_monty_jit(jnp.asarray(lam))  # device lam: no host sync
        lam_host = None
    interp = _interp_rlc_fn(len(polys), npts)

    from .dchallenger import _unshard

    cursor = list(polys)
    messages, alphas = [], []
    last_coeffs = None
    for _ in range(num_vars):
        # mesh-committed partials (sharded polys) must be pinned before
        # mixing with the single-device challenger values
        sums = jnp.stack([_unshard(p.sum_values_device()) for p in cursor])
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
        claims=[np.asarray(c, np.uint32) if isinstance(c, np.ndarray) else c
                for c in claims],
        lam=np.asarray(lam_host, np.uint32) if lam_host is not None else None,
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

"""Device-resident Fiat-Shamir challenger (TraceChallenger).

Exact mirror of `iop.challenger.DuplexChallenger` (reference:
slop/crates/challenger/src/lib.rs DuplexChallenger semantics) with the
sponge STATE living on device as a (16,) canonical uint32 jnp array.

The key observation making this fast AND traceable: the duplex buffer
dynamics are data-independent — how many values are buffered and when a
permutation fires depends only on the SEQUENCE of observe/sample calls,
never on the values. So the input/output buffer positions are plain
Python ints at orchestration time and only the 16-lane state (plus the
buffered values themselves) are device arrays. Each duplex is a single
jitted Poseidon2 permutation over (16,) — the challenger can run between
async device kernel launches without ever synchronizing with the host.

This removes the per-round device->host readback from every sumcheck /
GKR / BaseFold round loop: the proof messages are observed as device
arrays, challenges are sampled as device arrays that feed the next
round's kernel, and the host reads everything back ONCE per phase.

Grinding runs fully on device: a lax.while_loop scans candidate batches
in order and returns the first witness whose post-duplex lane passes,
matching the host challenger's lowest-witness scan order.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

import jax
import jax.numpy as jnp

from ..field import koalabear as kb
from ..ops.poseidon2 import RATE, WIDTH, permute


def _permute_canonical(state):
    """Poseidon2 on a (..., 16) CANONICAL uint32 array."""
    return kb.from_monty(permute(kb.to_monty(state)))


def _unshard(x):
    """Pin a (possibly mesh-replicated) array to one device: shard_map'd
    prover kernels emit arrays committed to the whole mesh, which cannot
    mix with the challenger's single-device state inside one jit."""
    try:
        dset = x.sharding.device_set
    except AttributeError:
        return x
    if len(dset) > 1:
        return jax.device_put(x, jax.devices()[0])
    return x


@lru_cache(maxsize=None)
def _duplex_fn(nbuf: int):
    """state' = permute(buf || state[nbuf:]) for a static buffer length."""

    @jax.jit
    def f(state, buf):
        if nbuf:
            state = jnp.concatenate([buf, state[nbuf:]])
        return _permute_canonical(state)

    return f


@lru_cache(maxsize=None)
def _absorb_fn(nbuf: int, n: int):
    """Absorb an (n,) canonical vector into (state, (nbuf,) buffered vals).

    Returns (state', leftover) where leftover has the static length
    (nbuf + n) % RATE. All full-rate duplexes happen inside one jit.
    """
    total = nbuf + n
    nchunks = total // RATE

    @jax.jit
    def f(state, buf, vec):
        vals = jnp.concatenate([buf, vec]) if nbuf else vec
        for c in range(nchunks):
            chunk = vals[c * RATE : (c + 1) * RATE]
            state = jnp.concatenate([chunk, state[RATE:]])
            state = _permute_canonical(state)
        return state, vals[nchunks * RATE :]

    return f


@lru_cache(maxsize=None)
def _sample_vec_fn(nbuf: int, out_left: int, count: int):
    """Fused sampler: `count` felts popped in ONE dispatch.

    The duplex schedule (when a permutation fires, which output lane each
    pop reads) is data-independent, so it is unrolled statically here —
    mirroring `sample()` call-by-call. Returns (state', (count,) felts);
    the caller's final (nbuf=0, out_left) is computed with the same
    static recurrence."""

    @jax.jit
    def f(state, buf):
        outs = []
        ol = out_left
        nb = nbuf
        for _ in range(count):
            if nb or ol == 0:
                state = _permute_canonical(
                    jnp.concatenate([buf, state[nb:]]) if nb else state
                )
                nb = 0
                ol = RATE
            outs.append(state[ol - 1])
            ol -= 1
        return state, jnp.stack(outs)

    return f


def _sample_vec_final_out_left(nbuf: int, out_left: int, count: int) -> int:
    ol, nb = out_left, nbuf
    for _ in range(count):
        if nb or ol == 0:
            nb, ol = 0, RATE
        ol -= 1
    return ol


@lru_cache(maxsize=None)
def _grind_fn(nbuf: int, bits: int, log_batch: int = 16):
    """Device grind: first witness w (scanning 0,1,2,...) such that
    observing w and sampling `bits` low bits gives zero.

    Mirrors DuplexChallenger.grind / check_witness: the probe lane is
    state[RATE-1] after the duplex that includes the candidate at buffer
    position nbuf. Returns the witness as a (,) canonical uint32 scalar —
    entirely on device (lax.while_loop over candidate batches).
    """
    batch = 1 << log_batch
    mask = np.uint32((1 << bits) - 1)

    @jax.jit
    def f(state, buf):
        base = jnp.concatenate([buf, state[nbuf:]]) if nbuf else state
        base_m = kb.to_monty(base)

        def probe(start):
            cands = start + jnp.arange(batch, dtype=jnp.uint32)
            states = jnp.broadcast_to(base_m, (batch, WIDTH))
            cands_m = kb.to_monty(cands)
            states = states.at[:, nbuf].set(cands_m)
            out = permute(states)
            lane = kb.from_monty(out[:, RATE - 1])
            hits = (lane & mask) == 0
            found = jnp.any(hits)
            idx = jnp.argmax(hits)
            return found, cands[idx]

        def cond(carry):
            found, _, _ = carry
            return ~found

        def body(carry):
            _, _, start = carry
            found, w = probe(start)
            return found, w, start + np.uint32(batch)

        found0, w0 = probe(jnp.uint32(0))
        found, w, _ = jax.lax.while_loop(
            cond, body, (found0, w0, jnp.uint32(batch))
        )
        return w

    return f


class InlineSponge:
    """Duplex sponge for use INSIDE a jit trace (mega-fused kernels).

    Mirrors TraceChallenger/DuplexChallenger bit for bit: values are
    traced (16,) canonical arrays, buffer/output POSITIONS are static
    Python ints tracked during tracing. After the kernel, sync the host
    challenger with `final_*` and the returned state."""

    def __init__(self, state, buf, nbuf: int, out_left: int):
        self.state = state
        self._buf = buf  # traced (nbuf,) vector
        self.nbuf = nbuf
        self.out_left = out_left

    def observe_vec(self, vec):
        """Absorb a static-length traced vector (observe_slice mirror)."""
        n = int(vec.shape[0])
        if n == 0:
            return
        self.out_left = 0
        vals = jnp.concatenate([self._buf, vec]) if self.nbuf else vec
        total = self.nbuf + n
        state = self.state
        for c in range(total // RATE):
            state = _permute_canonical(
                jnp.concatenate([vals[c * RATE : (c + 1) * RATE], state[RATE:]])
            )
        left = total % RATE
        if total >= RATE and left == 0:
            self.out_left = RATE
        self.state = state
        self._buf = vals[total - left :] if left else jnp.zeros(0, jnp.uint32)
        self.nbuf = left

    def sample_vec(self, count: int):
        """(count,) canonical felts (sample mirror)."""
        outs = []
        for _ in range(count):
            if self.nbuf or self.out_left == 0:
                self.state = _permute_canonical(
                    jnp.concatenate([self._buf, self.state[self.nbuf :]])
                    if self.nbuf
                    else self.state
                )
                self._buf = jnp.zeros(0, jnp.uint32)
                self.nbuf = 0
                self.out_left = RATE
            outs.append(self.state[self.out_left - 1])
            self.out_left -= 1
        return jnp.stack(outs)

    def sample_ext(self):
        return self.sample_vec(4)


class TraceChallenger:
    """Device twin of DuplexChallenger. Values are canonical uint32 jnp
    scalars/arrays; buffer POSITIONS are static Python ints."""

    def __init__(self):
        self.state = jnp.zeros(WIDTH, jnp.uint32)
        # buffered input values: list of (array, static_len) segments
        self._segs: list = []
        self._nbuf = 0
        self._out_left = 0

    # -- host sync -----------------------------------------------------------
    @classmethod
    def from_host(cls, ch) -> "TraceChallenger":
        """Snapshot a host DuplexChallenger into device form."""
        c = cls()
        c.state = jnp.asarray(np.asarray(ch.state, np.uint32))
        if ch.input_buffer:
            arr = jnp.asarray(np.asarray(ch.input_buffer, np.uint32))
            c._segs = [(arr, len(ch.input_buffer))]
            c._nbuf = len(ch.input_buffer)
        c._out_left = len(ch.output_buffer)
        return c

    def to_host(self, ch) -> None:
        """Write this challenger's state back into a host DuplexChallenger.
        Costs one device->host readback."""
        buf = self._buf_array()
        flat = jnp.concatenate([self.state, buf]) if self._nbuf else self.state
        vals = np.asarray(flat, np.uint32)
        ch.state = vals[:WIDTH].copy()
        ch.input_buffer = [int(v) for v in vals[WIDTH:]]
        ch.output_buffer = [int(v) for v in ch.state[: self._out_left]]

    # -- internals -----------------------------------------------------------
    def _buf_array(self):
        if not self._segs:
            return jnp.zeros(0, jnp.uint32)
        parts = [jnp.asarray(a, jnp.uint32).reshape(-1) for a, _ in self._segs]
        return parts[0] if len(parts) == 1 else jnp.concatenate(parts)

    def _duplex(self):
        self.state = _duplex_fn(self._nbuf)(self.state, self._buf_array())
        self._segs = []
        self._nbuf = 0
        self._out_left = RATE

    # -- observe -------------------------------------------------------------
    def observe(self, value):
        """value: canonical scalar (python int or jnp scalar)."""
        self._out_left = 0
        if isinstance(value, (int, np.integer)):
            value = jnp.uint32(int(value) % kb.P)
        else:
            value = _unshard(value)
        self._segs.append((value.reshape(1), 1))
        self._nbuf += 1
        if self._nbuf == RATE:
            self._duplex()

    def observe_slice(self, values):
        """values: (n,) canonical jnp array (static length) or numpy."""
        if isinstance(values, np.ndarray) or np.isscalar(values):
            values = jnp.asarray(np.asarray(values, np.uint32).reshape(-1))
        else:
            values = _unshard(values)
        values = values.reshape(-1)
        n = int(values.shape[0])
        if n == 0:
            return
        self._out_left = 0
        state, leftover = _absorb_fn(self._nbuf, n)(
            self.state, self._buf_array(), values
        )
        self.state = state
        left = (self._nbuf + n) % RATE
        if (self._nbuf + n) >= RATE and left == 0:
            # final observe landed exactly on a duplex: output buffer full
            self._out_left = RATE
        self._segs = [(leftover, left)] if left else []
        self._nbuf = left

    def observe_ext(self, coeffs):
        self.observe_slice(coeffs.reshape(-1))

    def observe_digest(self, digest):
        self.observe_slice(digest.reshape(-1))

    def observe_variable_length_slice(self, values):
        values = values.reshape(-1)
        self.observe(int(values.shape[0]))
        self.observe_slice(values)

    # -- sample --------------------------------------------------------------
    def sample(self):
        if self._nbuf or self._out_left == 0:
            self._duplex()
        v = self.state[self._out_left - 1]
        self._out_left -= 1
        return v

    def _sample_vec(self, count: int):
        """(count,) felts in one fused dispatch."""
        state, vals = _sample_vec_fn(self._nbuf, self._out_left, count)(
            self.state, self._buf_array()
        )
        self._out_left = _sample_vec_final_out_left(
            self._nbuf, self._out_left, count
        )
        self.state = state
        self._segs = []
        self._nbuf = 0
        return vals

    def sample_ext(self):
        """(4,) canonical ext4 challenge."""
        return self._sample_vec(4)

    def sample_ext_vec(self, n: int):
        if n == 0:
            return jnp.zeros((0, 4), jnp.uint32)
        return self._sample_vec(4 * n).reshape(n, 4)

    def sample_bits(self, bits: int):
        return self.sample() & jnp.uint32((1 << bits) - 1)

    # -- grinding ------------------------------------------------------------
    def grind(self, bits: int):
        """Find + absorb the grind witness, fully on device.

        Returns the witness as a device scalar (canonical). Matches the
        host grind's scan order (lowest witness wins)."""
        w = _grind_fn(self._nbuf, bits)(self.state, self._buf_array())
        self.observe(w)
        s = self.sample()  # advances the sponge exactly like check_witness
        del s
        return w

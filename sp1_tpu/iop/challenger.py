"""Fiat-Shamir duplex challenger over KoalaBear (host side).

Mirrors the reference's `DuplexChallenger<SP1Field, KoalaPerm, 16, 8>`
(reference: slop/crates/koala-bear/src/koala_bear_poseidon2.rs:32,
slop/crates/challenger/src/lib.rs) so that transcripts are reproducible:

  * `observe(x)` clears the output buffer, pushes x into an input buffer;
    when the input buffer reaches RATE=8 the sponge duplexes.
  * duplexing: overwrite state[0..len(input)] with the buffered inputs,
    permute, refill the output buffer with state[0..8]; `sample()` pops
    from the END of that output buffer (state[7] first).
  * `sample_ext()` draws 4 base samples as ext4 coefficients 0..3.
  * grinding: `check_witness(bits, w)` observes w then requires the low
    `bits` bits of a sample to be zero.

Values are canonical uint32; the permutation is the numpy host mirror of
the device kernel (differentially tested against it).
"""

from __future__ import annotations

import numpy as np

from ..field import koalabear as kb
from ..ops.poseidon2 import DIGEST, RATE, WIDTH, hostp2, permute_ints


class DuplexChallenger:
    # the device TraceChallenger (iop/dchallenger.py) can mirror this
    # transcript on-device; outer-field challengers cannot
    device_traceable = True
    def __init__(self):
        self.state = np.zeros(WIDTH, dtype=np.uint32)
        self.input_buffer: list[int] = []
        self.output_buffer: list[int] = []

    def clone(self) -> "DuplexChallenger":
        c = DuplexChallenger()
        c.state = self.state.copy()
        c.input_buffer = list(self.input_buffer)
        c.output_buffer = list(self.output_buffer)
        return c

    def _duplex(self):
        assert len(self.input_buffer) <= RATE
        for i, v in enumerate(self.input_buffer):
            self.state[i] = v
        self.input_buffer.clear()
        self.state = np.asarray(permute_ints(self.state), np.uint32)
        self.output_buffer = [int(x) for x in self.state[:RATE]]

    # -- observe -----------------------------------------------------------
    def observe(self, value: int):
        self.output_buffer.clear()
        self.input_buffer.append(int(value) % kb.P)
        if len(self.input_buffer) == RATE:
            self._duplex()

    def observe_slice(self, values):
        for v in np.asarray(values, dtype=np.uint32).reshape(-1):
            self.observe(int(v))

    def observe_ext(self, coeffs):
        coeffs = np.asarray(coeffs, dtype=np.uint32).reshape(-1)
        assert coeffs.shape[-1] == 4
        self.observe_slice(coeffs)

    def observe_digest(self, digest):
        digest = np.asarray(digest, dtype=np.uint32).reshape(-1)
        assert digest.shape[0] == DIGEST
        self.observe_slice(digest)

    def observe_variable_length_slice(self, values):
        values = np.asarray(values, dtype=np.uint32).reshape(-1)
        self.observe(len(values))
        self.observe_slice(values)

    # -- sample ------------------------------------------------------------
    def sample(self) -> int:
        if self.input_buffer or not self.output_buffer:
            self._duplex()
        return self.output_buffer.pop()

    def sample_ext(self) -> np.ndarray:
        return np.array([self.sample() for _ in range(4)], dtype=np.uint32)

    def sample_ext_vec(self, n: int) -> np.ndarray:
        if n == 0:
            return np.zeros((0, 4), np.uint32)
        return np.stack([self.sample_ext() for _ in range(n)])

    def sample_bits(self, bits: int) -> int:
        return self.sample() & ((1 << bits) - 1)

    # -- grinding ----------------------------------------------------------
    def check_witness(self, bits: int, witness: int) -> bool:
        self.observe(witness)
        return self.sample_bits(bits) == 0

    def grind(self, bits: int) -> int:
        """Find a witness w such that `check_witness(bits, w)` passes.

        Vectorized on device: candidate witnesses are scanned in batches
        by replaying the duplex semantics of observe(w)+sample_bits(bits)
        for all candidates at once with the jnp Poseidon2 kernel.
        (Reference: GrindingChallenger::grind; the GPU backend moves the
        same search on-device, sp1-gpu challenger kernels.)
        """
        batch = 1 << 18  # fixed size: one device kernel shape for all grinds
        base_state = self.state.copy()
        nbuf = len(self.input_buffer)
        assert nbuf < RATE
        for start in range(0, kb.P, batch):
            w = self._grind_batch(base_state, nbuf, start, batch, bits)
            if w is not None:
                ok = self.check_witness(bits, w)
                assert ok
                return w
        raise RuntimeError("grind failed")

    def _grind_batch(self, base_state, nbuf, start, batch, bits):
        import jax.numpy as jnp

        from ..field import koalabear as kbf
        from ..ops.poseidon2 import permute as dev_permute

        cands = (np.arange(start, start + batch, dtype=np.uint64) % kb.P).astype(
            np.uint32
        )
        # Build the pre-permutation states: current sponge state with the
        # input buffer (plus candidate witness) overwritten at the front.
        states = np.broadcast_to(base_state, (batch, WIDTH)).copy()
        for i, v in enumerate(self.input_buffer):
            states[:, i] = v
        states[:, nbuf] = cands
        # to monty, permute on device, read lane RATE-1 (first sample popped)
        states_m = ((states.astype(np.uint64) << 32) % kb.P).astype(np.uint32)
        out = dev_permute(jnp.asarray(states_m))
        lane = np.asarray(kbf.from_monty(out[:, RATE - 1]), np.uint32)
        hits = np.nonzero((lane & ((1 << bits) - 1)) == 0)[0]
        if hits.size == 0:
            return None
        return int(cands[hits[0]])

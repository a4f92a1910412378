"""Duplex Fiat-Shamir challenger over a verifier backend.

Mirrors the transcript semantics of the prover-side challenger exactly
(reference: slop/crates/challenger/src/duplex_challenger.rs,
DuplexChallenger<SP1Field, KoalaPerm, 16, 8>):

  * observe clears the output buffer and pushes into an input buffer;
    at RATE=8 the sponge duplexes (overwrite state[0..k], permute).
  * sample duplexes if inputs are pending or outputs exhausted, then
    pops from the END of the output buffer.
  * sample_ext draws 4 base samples as ext4 coefficients.
  * check_witness(bits, w) observes w and requires the low `bits` bits
    of the next sample to be zero (grinding check).
"""

from __future__ import annotations

from .backend import RATE, WIDTH


class VChallenger:
    def __init__(self, bk):
        self.bk = bk
        self.state = [bk.felt(0)] * WIDTH
        self.input_buffer = []
        self.output_buffer = []

    def clone(self) -> "VChallenger":
        c = VChallenger(self.bk)
        c.state = list(self.state)
        c.input_buffer = list(self.input_buffer)
        c.output_buffer = list(self.output_buffer)
        return c

    def _duplex(self):
        assert len(self.input_buffer) <= RATE
        for i, v in enumerate(self.input_buffer):
            self.state[i] = v
        self.input_buffer.clear()
        self.state = self.bk.poseidon2(self.state)
        self.output_buffer = list(self.state[:RATE])

    # -- observe ------------------------------------------------------------
    def observe(self, value):
        """value: a backend felt HANDLE (never a plain int — symbolic
        handles are ints too, so constants must go through observe_const)."""
        self.output_buffer.clear()
        self.input_buffer.append(value)
        if len(self.input_buffer) == RATE:
            self._duplex()

    def observe_const(self, v: int):
        """Observe a static protocol constant (length, height, name byte)."""
        self.observe(self.bk.felt(int(v)))

    def observe_slice(self, values):
        for v in values:
            self.observe(v)

    def observe_ext(self, e):
        self.observe_slice(self.bk.ext_coeffs(e))

    def observe_ext_slice(self, exts):
        for e in exts:
            self.observe_ext(e)

    def observe_digest(self, digest):
        assert len(digest) == 8
        self.observe_slice(digest)

    def observe_variable_length_slice(self, values):
        self.observe_const(len(values))
        self.observe_slice(values)

    def observe_variable_length_ext_slice(self, exts):
        self.observe_const(4 * len(exts))
        self.observe_ext_slice(exts)

    # -- sample -------------------------------------------------------------
    def sample(self):
        if self.input_buffer or not self.output_buffer:
            self._duplex()
        return self.output_buffer.pop()

    def sample_ext(self):
        return self.bk.ext_from_felts([self.sample() for _ in range(4)])

    def sample_ext_vec(self, n: int):
        return [self.sample_ext() for _ in range(n)]

    def sample_bits(self, bits: int):
        """LSB-first bit list of a fresh sample, truncated to `bits`."""
        s = self.sample()
        return self.bk.num2bits(s, 31)[:bits]

    # -- grinding -----------------------------------------------------------
    def check_witness(self, bits: int, witness):
        self.observe(witness)
        self.bk.assert_low_bits_zero(self.sample(), bits, "proof-of-work check")

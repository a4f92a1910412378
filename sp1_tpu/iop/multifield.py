"""MultiField32Challenger: the wrap-stage transcript over BN254-Fr.

KoalaBear field elements are absorbed into a width-3 Poseidon2 sponge
over the BN254 scalar field: 8 felts pack into one Bn254 element
(reduce_31: sum of felt_i * 2^(31 i)), two rate elements duplex at 16
absorbed felts, and samples come from splitting rate elements into four
64-bit chunks wrapped back into KoalaBear. Mirrors the reference
byte-for-byte (crates/recursion/circuit/src/challenger.rs
MultiField32ChallengerVariable + slop/crates/bn254 OuterPerm config).
"""

from __future__ import annotations

import numpy as np

from ..field import bn254
from ..field import koalabear as kb

NUM_DUPLEX_ELMS = 254 // 31       # 8 felts per Bn254 element
NUM_F_ELMS = 254 // 31 // 2       # 4 sampled felts per rate element
RATE = bn254.OUTER_CHALLENGER_RATE
WIDTH = bn254.WIDTH


class MultiField32Challenger:
    """Host transcript over BN254 (canonical ints / uint32 KoalaBear)."""

    device_traceable = False

    def __init__(self):
        self.state = [0] * WIDTH
        self.input_buffer: list[int] = []   # KoalaBear canonical
        self.output_buffer: list[int] = []  # KoalaBear canonical
        self.output_var_buffer: list[int] = []  # Bn254 canonical

    # -- absorb --------------------------------------------------------------
    def observe(self, value: int):
        self.output_buffer.clear()
        self.output_var_buffer.clear()
        self.input_buffer.append(int(value) % kb.P)
        if len(self.input_buffer) == NUM_DUPLEX_ELMS * RATE:
            self.duplexing()

    def observe_slice(self, values):
        for v in np.asarray(values, np.uint64).reshape(-1):
            self.observe(int(v))

    def observe_commitment(self, value: int):
        """Absorb a Bn254 digest by splitting it into 4 wrapped felts
        (reference: observe_commitment / split_32)."""
        for f in _split_32(int(value) % bn254.P, NUM_F_ELMS):
            self.observe(f)

    def observe_digest(self, digest):
        """DuplexChallenger-call-compat: Bn254 int digests go through
        observe_commitment; KoalaBear digest arrays through observe_slice."""
        if isinstance(digest, (int, np.integer)):
            self.observe_commitment(int(digest))
        else:
            self.observe_slice(np.asarray(digest).reshape(-1))

    def observe_ext(self, coeffs):
        self.observe_slice(np.asarray(coeffs).reshape(-1))

    def observe_variable_length_slice(self, values):
        values = np.asarray(values).reshape(-1)
        self.observe(int(values.shape[0]))
        self.observe_slice(values)

    # -- sponge --------------------------------------------------------------
    def duplexing(self):
        assert len(self.input_buffer) <= NUM_DUPLEX_ELMS * RATE
        for i in range(0, len(self.input_buffer), NUM_DUPLEX_ELMS):
            chunk = self.input_buffer[i : i + NUM_DUPLEX_ELMS]
            self.state[i // NUM_DUPLEX_ELMS] = _reduce_31(chunk)
        self.input_buffer.clear()
        self.state = bn254.permute(self.state)
        self.output_buffer.clear()
        self.output_var_buffer = [self.state[i] for i in range(RATE)]

    def _split_var(self):
        assert not self.output_buffer and self.output_var_buffer
        val = self.output_var_buffer.pop()
        self.output_buffer.extend(_split_32(val, NUM_F_ELMS))

    # -- sample --------------------------------------------------------------
    def sample(self) -> int:
        if self.input_buffer or (
            not self.output_buffer and not self.output_var_buffer
        ):
            self.duplexing()
        if not self.output_buffer:
            self._split_var()
        return self.output_buffer.pop()

    def sample_ext(self) -> np.ndarray:
        return np.array([self.sample() for _ in range(4)], np.uint32)

    def sample_ext_vec(self, n: int) -> np.ndarray:
        return np.stack([self.sample_ext() for _ in range(n)])

    def sample_bits(self, bits: int) -> int:
        return self.sample() & ((1 << bits) - 1)

    # -- proof of work ---------------------------------------------------------
    def check_witness(self, bits: int, witness: int) -> bool:
        self.observe(witness)
        return self.sample_bits(bits) == 0

    def grind(self, bits: int) -> int:
        try:
            from ..ops import outer_hash as oh

            w = oh.grind(self.state, self.input_buffer, bits)
        except Exception:  # no native toolchain: pure-python scan
            w = 0
            while not _copy(self).check_witness(bits, w):
                w += 1
        self.observe(w)
        assert self.sample_bits(bits) == 0
        return w


def _copy(ch: MultiField32Challenger) -> MultiField32Challenger:
    c = MultiField32Challenger()
    c.state = list(ch.state)
    c.input_buffer = list(ch.input_buffer)
    c.output_buffer = list(ch.output_buffer)
    c.output_var_buffer = list(ch.output_var_buffer)
    return c


def _reduce_31(felts: list) -> int:
    acc, power = 0, 1
    for v in felts:
        acc = (acc + v * power) % bn254.P
        power = power * (1 << 31) % bn254.P
    return acc


def _split_32(val: int, n: int) -> list:
    """n 64-bit little-endian chunks of the 256-bit value, wrapped into
    KoalaBear (from_wrapped_u64 = chunk mod p)."""
    return [((val >> (64 * i)) & ((1 << 64) - 1)) % kb.P for i in range(n)]

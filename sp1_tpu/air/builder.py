"""AIR constraint-builder framework, TPU-native.

Chips define their constraints as Python functions over an abstract ops
namespace, so the SAME definition is:
  * traced by JAX into a fused vectorized kernel over all trace rows for
    the zerocheck prover (this replaces the reference GPU's constraint
    bytecode interpreter — XLA jit-compiles per chip, so no bytecode VM
    is needed; reference: sp1-gpu/crates/air/src/ir/),
  * executed on single numpy rows for the verifier's `eval_constraints`
    (reference: crates/hypercube/src/verifier/shard.rs:237), and
  * usable by the debug checker on real traces
    (reference: crates/hypercube/src/debug.rs).

Constraint accumulation is Horner in alpha: acc = acc * alpha + c_i
(reference: VerifierConstraintFolder and the reversed alpha powers at
crates/hypercube/src/prover/shard.rs:525).

Interactions (for the LogUp GKR argument) are AFFINE expressions in the
trace columns, represented structurally (reference:
crates/hypercube/src/lookup/interaction.rs `VirtualPairCol`).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

import jax.numpy as jnp

from ..field import extension as ext
from ..field import koalabear as kb

E4 = ext.npext4

# Interaction kinds (reference: lookup/interaction.rs InteractionKind).
KIND_MEMORY = 1
KIND_PROGRAM = 2
KIND_BYTE = 5
KIND_STATE = 7
KIND_SYSCALL = 8
KIND_GLOBAL = 9
KIND_GLOBAL_ACC = 10  # septic-digest accumulation chain (Global chip rows)
KIND_RANGE = 22  # framework-specific kinds may extend past the reference's
KIND_PX_CHAIN = 23  # precompile round-chain messages (per-call shift register)
KIND_SHA_K = 24  # SHA-256 round-constant table lookups
KIND_GLOBAL_MEMORY = 30  # cross-shard memory-state interactions (global scope)
KIND_GLOBAL_SYSCALL = 31  # deferred precompile dispatch (global scope)


@dataclass(frozen=True)
class PairCol:
    """A reference to a trace column: space is 'main' or 'preprocessed'."""

    space: str
    index: int


def main_col(i: int) -> PairCol:
    return PairCol("main", i)


def prep_col(i: int) -> PairCol:
    return PairCol("preprocessed", i)


@dataclass(frozen=True)
class Affine:
    """constant + sum_i weight_i * col_i over the base field (canonical ints)."""

    constant: int = 0
    terms: tuple = ()  # tuple[(PairCol, int weight)]

    @staticmethod
    def col(c: PairCol, weight: int = 1) -> "Affine":
        return Affine(0, ((c, weight % kb.P),))

    @staticmethod
    def const(v: int) -> "Affine":
        return Affine(v % kb.P, ())

    def apply(self, preprocessed, main, ops):
        """Evaluate given row values through an ops namespace."""
        acc = ops.const(self.constant)
        for col, w in self.terms:
            v = main[col.index] if col.space == "main" else preprocessed[col.index]
            acc = ops.add(acc, ops.scale_base(v, w))
        return acc


@dataclass(frozen=True)
class Interaction:
    values: tuple  # tuple[Affine]
    multiplicity: Affine
    kind: int
    scope: str = "local"  # "local" (per-shard LogUp) or "global" (cross-shard)

    @property
    def argument_index(self) -> int:
        return self.kind

    def eval(self, preprocessed, main, alpha, betas, ops):
        """(multiplicity, fingerprint) for row values.

        fingerprint = alpha + betas[0]*kind + sum_k betas[k+1]*value_k
        (reference: lookup/interaction.rs:170).
        """
        mult = self.multiplicity.apply(preprocessed, main, ops)
        fp = ops.add(alpha, ops.scale_base(betas[0], self.argument_index))
        for k, v in enumerate(self.values):
            val = v.apply(preprocessed, main, ops)
            fp = ops.add(fp, ops.mul(betas[k + 1], val))
        return mult, fp


# ---------------------------------------------------------------------------
# Ops namespaces
# ---------------------------------------------------------------------------


class JnpOps:
    """Vectorized device ops: values are (N, 4) monty uint32 jnp arrays."""

    def __init__(self, n: int):
        self.n = n

    def const(self, v: int):
        arr = np.zeros(4, np.uint32)
        arr[0] = kb.to_monty_i(v % kb.P)
        return jnp.broadcast_to(jnp.asarray(arr), (self.n, 4))

    @staticmethod
    def add(a, b):
        return ext.ext4_add(a, b)

    @staticmethod
    def sub(a, b):
        return ext.ext4_sub(a, b)

    @staticmethod
    def mul(a, b):
        return ext.ext4_mul(a, b)

    @staticmethod
    def neg(a):
        return ext.ext4_neg(a)

    @staticmethod
    def scale_base(a, w: int):
        wm = np.uint32(kb.to_monty_i(w % kb.P))
        return kb.mul(a, jnp.asarray(wm))

    def zero(self):
        return jnp.zeros((self.n, 4), jnp.uint32)

    def one(self):
        return self.const(1)


class NpOps:
    """Host ops: values are (4,) canonical uint32 numpy arrays."""

    @staticmethod
    def const(v: int):
        arr = np.zeros(4, np.uint32)
        arr[0] = v % kb.P
        return arr

    add = staticmethod(E4.add)
    sub = staticmethod(E4.sub)
    mul = staticmethod(E4.mul)

    @staticmethod
    def neg(a):
        return E4.sub(NpOps.const(0), a)

    @staticmethod
    def scale_base(a, w: int):
        return kb.npf.mul(np.asarray(a, np.uint32), np.uint32(w % kb.P))

    @staticmethod
    def zero():
        return np.zeros(4, np.uint32)

    @staticmethod
    def one():
        return NpOps.const(1)


class ConstraintFolder:
    """Accumulates constraints Horner-style in alpha."""

    def __init__(self, ops, preprocessed, main, public_values, alpha):
        self.ops = ops
        self.preprocessed = preprocessed
        self.main = main
        self.public_values = public_values
        self.alpha = alpha
        self.accumulator = ops.zero()
        self.num_constraints = 0

    def assert_zero(self, e):
        self.accumulator = self.ops.add(
            self.ops.mul(self.accumulator, self.alpha), e
        )
        self.num_constraints += 1

    def assert_eq(self, a, b):
        self.assert_zero(self.ops.sub(a, b))

    def assert_bool(self, a):
        self.assert_zero(self.ops.mul(a, self.ops.sub(a, self.ops.one())))


class Chip:
    """Base class for AIR chips.

    Subclasses define: name, width, preprocessed_width (default 0),
    eval(folder), sends(), receives(), and trace generation.
    """

    name: str = ""
    width: int = 0
    preprocessed_width: int = 0

    def eval(self, folder: ConstraintFolder):
        raise NotImplementedError

    def sends(self) -> list:
        return []

    def receives(self) -> list:
        return []

    def num_constraints(self) -> int:
        """Count constraints by dry-running eval on zero rows."""
        ops = NpOps()
        folder = ConstraintFolder(
            ops,
            [ops.zero()] * self.preprocessed_width,
            [ops.zero()] * self.width,
            [np.uint32(0)] * 64,
            ops.one(),
        )
        self.eval(folder)
        return folder.num_constraints

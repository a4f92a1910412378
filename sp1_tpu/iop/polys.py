"""Sumcheck polynomial backends (device-side restricted sums).

Each class implements the protocol interface used by `iop.sumcheck`:
  num_variables, sum_as_poly_in_last_variable(claim), fix_last_variable,
returning canonical-form numpy coefficient arrays for the transcript
while keeping the hypercube data on device in monty form.

Reference trait: slop/crates/sumcheck/src/poly.rs `SumcheckPoly`.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..field import extension as ext
from ..field import koalabear as kb
from ..ops import mle as mle_ops


def _from_monty_np(x) -> np.ndarray:
    return np.asarray(kb.from_monty(jnp.asarray(x)), np.uint32)


def _to_monty_np(x) -> np.ndarray:
    return ((np.asarray(x, np.uint64) << 32) % kb.P).astype(np.uint32)


@jax.jit
def _sum_halves_ext(guts):
    """guts (2m, 4) -> (c0, c1even) for a degree-1 last-variable message.

    Returns sums over even rows (X_last=0) and odd rows (X_last=1).
    """
    v = guts.reshape(-1, 2, 4)
    s0 = mle_ops._sum_ext_axis0(v[:, 0])
    s1 = mle_ops._sum_ext_axis0(v[:, 1])
    return s0, s1


@jax.jit
def _fix_last_ext(guts, alpha):
    return mle_ops.fix_last_variable_ext(guts, alpha)


class DenseExtMlePoly:
    """A single ext4 MLE; degree-1 sumcheck messages."""

    degree = 1

    def __init__(self, guts):
        self.guts = jnp.asarray(guts, jnp.uint32)  # (2^n, 4) monty

    @property
    def num_variables(self) -> int:
        n = self.guts.shape[0]
        return int(n).bit_length() - 1

    def sum_as_poly_in_last_variable(self, claim=None) -> np.ndarray:
        s0, s1 = _sum_halves_ext(self.guts)
        c0 = _from_monty_np(s0)
        v1 = _from_monty_np(s1)
        c1 = ext.npext4.sub(v1, c0)
        return np.stack([c0, c1])

    def fix_last_variable(self, alpha: np.ndarray) -> "DenseExtMlePoly":
        alpha_m = jnp.asarray(_to_monty_np(alpha))
        return DenseExtMlePoly(_fix_last_ext(self.guts, alpha_m))

    def final_eval(self) -> np.ndarray:
        assert self.guts.shape[0] == 1
        return _from_monty_np(self.guts[0])


@jax.jit
def _prod_round_sums(a, b):
    """Degree-2 message sums for the product of two ext4 MLEs.

    Returns sums over the hypercube-prefix of (p(Y,0), p(Y,1), p(Y,2))
    where p = a*b and the evaluation at X=2 uses the linear extension of
    each factor: v(2) = 2*v(1) - v(0).
    """
    av = a.reshape(-1, 2, 4)
    bv = b.reshape(-1, 2, 4)
    a0, a1 = av[:, 0], av[:, 1]
    b0, b1 = bv[:, 0], bv[:, 1]
    a2 = kb.sub(kb.add(a1, a1), a0)
    b2 = kb.sub(kb.add(b1, b1), b0)
    p0 = ext.ext4_mul(a0, b0)
    p1 = ext.ext4_mul(a1, b1)
    p2 = ext.ext4_mul(a2, b2)
    return (
        mle_ops._sum_ext_axis0(p0),
        mle_ops._sum_ext_axis0(p1),
        mle_ops._sum_ext_axis0(p2),
    )


class ProductExtMlePoly:
    """Product of two ext4 MLEs; degree-2 sumcheck messages."""

    degree = 2

    def __init__(self, a, b):
        self.a = jnp.asarray(a, jnp.uint32)
        self.b = jnp.asarray(b, jnp.uint32)

    @property
    def num_variables(self) -> int:
        return int(self.a.shape[0]).bit_length() - 1

    def sum_as_poly_in_last_variable(self, claim=None) -> np.ndarray:
        s0, s1, s2 = _prod_round_sums(self.a, self.b)
        e = ext.npext4
        v0, v1, v2 = _from_monty_np(s0), _from_monty_np(s1), _from_monty_np(s2)
        # Interpolate coefficient form from evals at 0,1,2:
        # c0 = v0; c2 = (v2 - 2*v1 + v0)/2; c1 = v1 - v0 - c2.
        inv2 = np.uint32(pow(2, kb.P - 2, kb.P))
        t = e.sub(e.add(v2, v0), e.add(v1, v1))
        c2 = e.mul(t, np.broadcast_to(np.array([inv2, 0, 0, 0], np.uint32), (4,))[..., 0:1].repeat(1, 0)) if False else _scale_base(t, inv2)
        c1 = e.sub(e.sub(v1, v0), c2)
        return np.stack([v0, c1, c2])

    def fix_last_variable(self, alpha: np.ndarray) -> "ProductExtMlePoly":
        alpha_m = jnp.asarray(_to_monty_np(alpha))
        return ProductExtMlePoly(
            _fix_last_ext(self.a, alpha_m), _fix_last_ext(self.b, alpha_m)
        )

    def final_eval(self) -> np.ndarray:
        assert self.a.shape[0] == 1
        e = ext.npext4
        return e.mul(_from_monty_np(self.a[0]), _from_monty_np(self.b[0]))


def _scale_base(x: np.ndarray, c: np.uint32) -> np.ndarray:
    """Multiply canonical ext4 array by canonical base scalar."""
    return kb.npf.mul(np.asarray(x, np.uint32), np.uint32(c))

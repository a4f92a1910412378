"""Multilinear-extension primitives over KoalaBear, TPU-native.

Conventions match the reference exactly (reference:
slop/crates/multilinear/src/{mle,lagrange,fold}.rs):

  * An MLE over n variables is its evaluation vector on the hypercube,
    shape (2^n, W) for W stacked polynomials ("guts"), row index i in
    BIG-ENDIAN bit order: point[0] is the most significant bit of i, so
    the LAST variable is the LSB and strides adjacent rows.
  * `fold(beta)`: v'[i] = v[2i] + beta * v[2i+1] (unnormalized — used by
    BaseFold where the evaluation vector doubles as univariate coeffs).
  * `fix_last_variable(alpha)`: v'[i] = v[2i] + alpha * (v[2i+1] - v[2i]).
  * `partial_lagrange(point)`: vector of eq(i, point) products.

Base-field arrays are (..., ) uint32 monty; extension-field arrays carry
a trailing dim 4. Functions with an `_ext` suffix operate on ext4 data
or mixed base/ext operands.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..field import extension as ext
from ..field import koalabear as kb

# ---------------------------------------------------------------------------
# partial Lagrange (eq polynomial)
# ---------------------------------------------------------------------------


def partial_lagrange_ext(point):
    """eq table for an ext4 point: (n, 4) -> (2^n, 4) monty.

    point[0] is the most significant index bit (reference:
    slop/crates/multilinear/src/lagrange.rs:48 big-endian doc).
    """
    point = jnp.asarray(point, jnp.uint32)
    n = point.shape[0]
    evals = ext.ext4_one((1,))
    for k in range(n):
        x = point[k]
        prod = ext.ext4_mul(evals, jnp.broadcast_to(x, evals.shape))
        lo = ext.ext4_sub(evals, prod)
        evals = jnp.stack([lo, prod], axis=1).reshape(-1, 4)
    return evals


def partial_lagrange_base(point):
    """eq table for a base point: (n,) -> (2^n,) monty."""
    point = jnp.asarray(point, jnp.uint32)
    n = point.shape[0]
    evals = jnp.full((1,), np.uint32(kb.to_monty_i(1)), dtype=jnp.uint32)
    for k in range(n):
        x = point[k]
        prod = kb.mul(evals, jnp.broadcast_to(x, evals.shape))
        lo = kb.sub(evals, prod)
        evals = jnp.stack([lo, prod], axis=1).reshape(-1)
    return evals


# ---------------------------------------------------------------------------
# evaluation
# ---------------------------------------------------------------------------


def eval_mle_at_point_ext(guts, point):
    """Evaluate base-field MLE columns at an ext4 point.

    guts: (2^n, W) monty base. point: (n, 4). Returns (W, 4).
    """
    eq = partial_lagrange_ext(point)  # (2^n, 4)
    # sum_i guts[i, w] * eq[i] — base*ext scale then tree-sum.
    prod = kb.mul(guts[..., None], eq[:, None, :])  # (2^n, W, 4)
    return _sum_ext_axis0(prod)


def eval_ext_mle_at_point_ext(guts, point):
    """Evaluate ext4 MLE columns at an ext4 point.

    guts: (2^n, W, 4). point: (n, 4). Returns (W, 4).
    """
    eq = partial_lagrange_ext(point)  # (2^n, 4)
    prod = ext.ext4_mul(guts, eq[:, None, :])
    return _sum_ext_axis0(prod)


def _sum_ext_axis0(x):
    """Field-sum along axis 0 (works for base or trailing-ext arrays)."""
    # Tree reduction keeps everything < p with the monty add.
    while x.shape[0] > 1:
        n = x.shape[0]
        if n % 2 == 1:
            x = jnp.concatenate([x, jnp.zeros_like(x[:1])], axis=0)
            n += 1
        x = kb.add(x[: n // 2], x[n // 2:])
    return x[0]


def full_lagrange_eval_ext(point_a, point_b):
    """eq(point_a, point_b) for two ext4 points, shape (n, 4) -> (4,).

    eq(x, y) = prod_k (x_k y_k + (1-x_k)(1-y_k)).
    """
    point_a = jnp.asarray(point_a, jnp.uint32)
    point_b = jnp.asarray(point_b, jnp.uint32)
    n = point_a.shape[0]
    acc = ext.ext4_one(())
    one = ext.ext4_one(())
    for k in range(n):
        xy = ext.ext4_mul(point_a[k], point_b[k])
        term = ext.ext4_add(
            ext.ext4_add(xy, xy),
            ext.ext4_sub(one, ext.ext4_add(point_a[k], point_b[k])),
        )
        acc = ext.ext4_mul(acc, term)
    return acc


# ---------------------------------------------------------------------------
# folding / fixing variables
# ---------------------------------------------------------------------------


def fold_ext(guts, beta):
    """BaseFold fold on ext4 vector: (2m, 4) -> (m, 4), v[2i] + beta*v[2i+1]."""
    v = guts.reshape(-1, 2, 4)
    return ext.ext4_add(v[:, 0], ext.ext4_mul(v[:, 1], jnp.broadcast_to(beta, v[:, 1].shape)))


def fix_last_variable_base_to_ext(guts, alpha):
    """Fix last var of base MLE at ext4 alpha: (2m, W) -> (m, W, 4)."""
    v = guts.reshape(-1, 2, guts.shape[-1]) if guts.ndim == 2 else guts.reshape(-1, 2)
    lo, hi = v[:, 0], v[:, 1]
    diff = kb.sub(hi, lo)
    scaled = kb.mul(diff[..., None], jnp.broadcast_to(alpha, diff.shape + (4,)))
    return ext.ext4_add(ext4_embed(lo), scaled)


def fix_last_variable_ext(guts, alpha):
    """Fix last var of ext4 MLE at ext4 alpha: (2m, ..., 4) -> (m, ..., 4)."""
    v = guts.reshape((-1, 2) + guts.shape[1:])
    lo, hi = v[:, 0], v[:, 1]
    diff = ext.ext4_sub(hi, lo)
    return ext.ext4_add(lo, ext.ext4_mul(diff, jnp.broadcast_to(alpha, diff.shape)))


def ext4_embed(a):
    """Base monty array -> ext4 with trailing zero coefficients."""
    zero = jnp.zeros_like(a)
    return jnp.stack([a, zero, zero, zero], axis=-1)


def fixed_at_zero_ext(guts, point):
    """Evaluate MLE with LAST variable fixed to 0 at ext4 `point` (n-1 vars).

    guts: (2^n, W) base monty. Equals eval of even rows at point.
    Reference: slop/crates/multilinear/src/mle.rs:216 `fixed_at_zero`.
    """
    even = guts[0::2]
    return eval_mle_at_point_ext(even, point)


def fixed_at_zero_ext_mle(guts, point):
    """Same for ext4 guts: (2^n, 4) -> (4,)."""
    even = guts[0::2]
    return eval_ext_mle_at_point_ext(even[:, None, :], point)[0]


# ---------------------------------------------------------------------------
# Host (numpy, canonical) mirrors for tests and the verifier
# ---------------------------------------------------------------------------


class host:
    @staticmethod
    def partial_lagrange_ext(point: np.ndarray) -> np.ndarray:
        point = np.asarray(point, np.uint32)
        evals = ext.npext4.one()[None]
        for k in range(point.shape[0]):
            x = point[k]
            prod = ext.npext4.mul(evals, np.broadcast_to(x, evals.shape))
            lo = ext.npext4.sub(evals, prod)
            evals = np.stack([lo, prod], axis=1).reshape(-1, 4)
        return evals

    @staticmethod
    def eval_base_mle(guts: np.ndarray, point: np.ndarray) -> np.ndarray:
        """guts (2^n, W) canonical; point (n, 4). Returns (W, 4)."""
        eq = host.partial_lagrange_ext(point)  # (2^n, 4)
        f = kb.npf
        acc = np.zeros((guts.shape[1], 4), np.uint32)
        prod = f.mul(guts[..., None].astype(np.uint32), eq[:, None, :])
        for i in range(prod.shape[0]):
            acc = f.add(acc, prod[i])
        return acc

    @staticmethod
    def eval_ext_mle(guts: np.ndarray, point: np.ndarray) -> np.ndarray:
        eq = host.partial_lagrange_ext(point)
        prod = ext.npext4.mul(guts, eq[:, None, :] if guts.ndim == 3 else eq)
        acc = np.zeros(prod.shape[1:], np.uint32)
        for i in range(prod.shape[0]):
            acc = ext.npext4.add(acc, prod[i])
        return acc

    @staticmethod
    def eq_points(a: np.ndarray, b: np.ndarray) -> np.ndarray:
        one = ext.npext4.one()
        acc = one.copy()
        for k in range(a.shape[0]):
            xy = ext.npext4.mul(a[k], b[k])
            term = ext.npext4.add(
                ext.npext4.add(xy, xy), ext.npext4.sub(one, ext.npext4.add(a[k], b[k]))
            )
            acc = ext.npext4.mul(acc, term)
        return acc

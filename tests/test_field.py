"""Field arithmetic tests: device (monty, uint32-limb) vs host (uint64 mod)."""

import numpy as np
import jax
import jax.numpy as jnp

from sp1_tpu.field import koalabear as kb
from sp1_tpu.field import extension as ext

rng = np.random.default_rng(0)


def rand_canonical(shape):
    return rng.integers(0, kb.P, size=shape, dtype=np.uint32)


def test_monty_roundtrip():
    x = rand_canonical((1024,))
    xm = kb.to_monty(x)
    back = np.asarray(kb.from_monty(xm))
    np.testing.assert_array_equal(back, x)


def test_mulhi32_exhaustive_edges():
    edge = np.array(
        [0, 1, 2, 0xFFFF, 0x10000, 0x7FFFFFFF, 0x80000000, 0xFFFFFFFE, 0xFFFFFFFF],
        dtype=np.uint32,
    )
    a, b = np.meshgrid(edge, edge)
    got = np.asarray(kb.mulhi32(jnp.asarray(a.ravel()), jnp.asarray(b.ravel())))
    want = ((a.ravel().astype(np.uint64) * b.ravel().astype(np.uint64)) >> 32).astype(np.uint32)
    np.testing.assert_array_equal(got, want)


def test_mul_matches_host():
    a = rand_canonical((4096,))
    b = rand_canonical((4096,))
    got = np.asarray(kb.from_monty(kb.mul(kb.to_monty(a), kb.to_monty(b))))
    want = kb.npf.mul(a, b)
    np.testing.assert_array_equal(got, want)


def test_add_sub_neg():
    a = rand_canonical((4096,))
    b = rand_canonical((4096,))
    am, bm = kb.to_monty(a), kb.to_monty(b)
    np.testing.assert_array_equal(np.asarray(kb.from_monty(kb.add(am, bm))), kb.npf.add(a, b))
    np.testing.assert_array_equal(np.asarray(kb.from_monty(kb.sub(am, bm))), kb.npf.sub(a, b))
    np.testing.assert_array_equal(np.asarray(kb.from_monty(kb.neg(am))), kb.npf.neg(a))


def test_inv():
    a = rand_canonical((512,))
    a[a == 0] = 1
    am = kb.to_monty(a)
    prod = np.asarray(kb.from_monty(kb.mul(am, kb.inv(am))))
    np.testing.assert_array_equal(prod, np.ones_like(a))


def test_two_adic_generator():
    w = kb.TWO_ADIC_GENERATOR
    assert pow(w, 1 << 24, kb.P) == 1
    assert pow(w, 1 << 23, kb.P) != 1


def test_ext4_mul_matches_host():
    a = rand_canonical((256, 4))
    b = rand_canonical((256, 4))
    am, bm = kb.to_monty(a), kb.to_monty(b)
    got = np.asarray(kb.from_monty(ext.ext4_mul(am, bm)))
    want = ext.npext4.mul(a, b)
    np.testing.assert_array_equal(got, want)


def test_ext4_inv():
    a = rand_canonical((64, 4))
    a[0] = [5, 0, 0, 0]
    am = kb.to_monty(a)

    @jax.jit
    def check(x):
        return kb.from_monty(ext.ext4_mul(x, ext.ext4_inv(x)))

    prod = np.asarray(check(am))
    want = np.broadcast_to(ext.npext4.one(), prod.shape)
    np.testing.assert_array_equal(prod, want)


def test_ext4_is_field_pow_order():
    # a^(p^4 - 1) == 1 for random nonzero a (host mirror, already
    # cross-checked against the device path in test_ext4_mul_matches_host)
    a = rand_canonical((8, 4))
    got = ext.npext4.pow(a, kb.P**4 - 1)
    want = np.broadcast_to(ext.npext4.one(), got.shape)
    np.testing.assert_array_equal(got, want)


_septic_mul_jit = jax.jit(ext.septic_mul)


def test_septic_mul_associative_and_identity():
    a = rand_canonical((32, 7))
    b = rand_canonical((32, 7))
    c = rand_canonical((32, 7))
    am, bm, cm = kb.to_monty(a), kb.to_monty(b), kb.to_monty(c)
    left = _septic_mul_jit(_septic_mul_jit(am, bm), cm)
    right = _septic_mul_jit(am, _septic_mul_jit(bm, cm))
    np.testing.assert_array_equal(np.asarray(left), np.asarray(right))
    one = np.zeros((32, 7), np.uint32)
    one[:, 0] = 1
    np.testing.assert_array_equal(
        np.asarray(kb.from_monty(_septic_mul_jit(am, kb.to_monty(one)))), a
    )


def test_septic_irreducibility_witness():
    # z^(p^7) == z in the quotient ring iff the reduction polynomial divides
    # z^(p^7) - z; combined with z^p != z this witnesses irreducibility.
    z = np.zeros((1, 7), np.uint32)
    z[0, 1] = 1
    zm = kb.to_monty(z)

    def septic_pow(a, e):
        result = np.zeros((1, 7), np.uint32)
        result[0, 0] = 1
        result = kb.to_monty(result)
        base = a
        while e > 0:
            if e & 1:
                result = _septic_mul_jit(result, base)
            base = _septic_mul_jit(base, base)
            e >>= 1
        return result

    zp = septic_pow(zm, kb.P)
    assert not np.array_equal(np.asarray(zp), np.asarray(zm))
    zp7 = septic_pow(zm, kb.P**7)
    np.testing.assert_array_equal(np.asarray(zp7), np.asarray(zm))


def test_field_ops_jit_and_vmap():
    a = rand_canonical((128,))
    b = rand_canonical((128,))
    am, bm = kb.to_monty(a), kb.to_monty(b)
    f = jax.jit(kb.mul)
    np.testing.assert_array_equal(np.asarray(f(am, bm)), np.asarray(kb.mul(am, bm)))
    g = jax.vmap(kb.mul)
    np.testing.assert_array_equal(np.asarray(g(am, bm)), np.asarray(kb.mul(am, bm)))

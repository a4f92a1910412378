"""Device-orchestrated sumcheck must produce bit-identical proofs to the
host driver (same transcript, same challenger end state)."""

import numpy as np

import jax.numpy as jnp

from sp1_tpu.field import koalabear as kb
from sp1_tpu.iop import dsumcheck as dsc
from sp1_tpu.iop import sumcheck as sc
from sp1_tpu.iop.challenger import DuplexChallenger
from sp1_tpu.pcs.jagged import HadamardPoly

LOG_N = 13  # above HOST_THRESH so the polys stay on the device path


def _to_monty(x):
    return ((np.asarray(x, np.uint64) << 32) % kb.P).astype(np.uint32)


def _mk_polys(seed, n_polys):
    rng = np.random.default_rng(seed)
    polys, claims = [], []
    from sp1_tpu.field.extension import npext4 as E4

    for _ in range(n_polys):
        a = rng.integers(0, kb.P, size=(1 << LOG_N, 4), dtype=np.uint64)
        b = rng.integers(0, kb.P, size=(1 << LOG_N, 4), dtype=np.uint64)
        claim = np.zeros(4, np.uint32)
        prods = E4.mul(a.astype(np.uint32), b.astype(np.uint32))
        for row in prods:
            claim = E4.add(claim, row)
        polys.append(
            HadamardPoly(jnp.asarray(_to_monty(a)), jnp.asarray(_to_monty(b)))
        )
        claims.append(claim)
    return polys, claims


def test_device_driver_matches_host_driver():
    lam = np.array([3, 1, 4, 1], np.uint32)

    host_ch = DuplexChallenger()
    host_ch.observe_slice(np.arange(5, dtype=np.uint32))
    polys, claims = _mk_polys(0, 2)
    proof_h, evals_h = sc.reduce_sumcheck_to_evaluation(
        polys, host_ch, claims, lam
    )

    dev_ch = DuplexChallenger()
    dev_ch.observe_slice(np.arange(5, dtype=np.uint32))
    polys2, claims2 = _mk_polys(0, 2)
    proof_d, evals_d = dsc.reduce_sumcheck_to_evaluation_device(
        polys2, dev_ch, claims2, lam
    )

    assert np.array_equal(proof_h.univariate_polys, proof_d.univariate_polys)
    assert np.array_equal(proof_h.point, proof_d.point)
    assert np.array_equal(proof_h.claimed_sum, proof_d.claimed_sum)
    assert np.array_equal(proof_h.eval, proof_d.eval)
    for eh, ed in zip(evals_h, evals_d):
        for vh, vd in zip(eh, ed):
            assert np.array_equal(vh, vd)
    # challenger states advanced identically
    assert np.array_equal(host_ch.state, dev_ch.state)
    assert host_ch.input_buffer == dev_ch.input_buffer
    assert host_ch.output_buffer == dev_ch.output_buffer
    # and the proof verifies
    vch = DuplexChallenger()
    vch.observe_slice(np.arange(5, dtype=np.uint32))
    assert sc.partially_verify_sumcheck_proof(proof_d, vch, LOG_N, 2)

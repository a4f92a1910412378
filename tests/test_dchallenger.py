"""TraceChallenger must match DuplexChallenger on every op sequence."""

import numpy as np

import jax.numpy as jnp

from sp1_tpu.iop.challenger import DuplexChallenger
from sp1_tpu.iop.dchallenger import TraceChallenger


def _sync_check(host, dev):
    probe = DuplexChallenger()
    probe.state = host.state.copy()
    probe.input_buffer = list(host.input_buffer)
    probe.output_buffer = list(host.output_buffer)
    out = DuplexChallenger()
    dev.to_host(out)
    assert np.array_equal(out.state, probe.state)
    assert out.input_buffer == probe.input_buffer
    assert out.output_buffer == probe.output_buffer


def test_mixed_op_sequence_matches_host():
    rng = np.random.default_rng(7)
    host = DuplexChallenger()
    dev = TraceChallenger()
    for step in range(60):
        op = rng.integers(0, 5)
        if op == 0:
            v = int(rng.integers(0, 2**31 - 2**24 + 1))
            host.observe(v)
            dev.observe(v)
        elif op == 1:
            n = int(rng.integers(1, 23))
            vals = rng.integers(0, 2**31 - 2**24 + 1, size=n).astype(np.uint32)
            host.observe_slice(vals)
            dev.observe_slice(vals)
        elif op == 2:
            hs = host.sample()
            ds = int(np.asarray(dev.sample()))
            assert hs == ds, f"sample mismatch at step {step}"
        elif op == 3:
            he = host.sample_ext()
            de = np.asarray(dev.sample_ext(), np.uint32)
            assert np.array_equal(he, de)
        else:
            vals = rng.integers(0, 100, size=int(rng.integers(0, 6))).astype(
                np.uint32
            )
            host.observe_variable_length_slice(vals)
            dev.observe_variable_length_slice(vals)
    _sync_check(host, dev)


def test_from_host_roundtrip():
    host = DuplexChallenger()
    host.observe_slice(np.arange(13, dtype=np.uint32))
    host.sample()
    host.observe(5)
    dev = TraceChallenger.from_host(host)
    _sync_check(host, dev)
    # continue in parallel
    host.observe_slice(np.arange(9, dtype=np.uint32))
    dev.observe_slice(np.arange(9, dtype=np.uint32))
    assert host.sample() == int(np.asarray(dev.sample()))
    _sync_check(host, dev)


def test_grind_matches_host():
    for bits in (4, 8):
        host = DuplexChallenger()
        host.observe_slice(np.arange(3, dtype=np.uint32))
        dev = TraceChallenger.from_host(host)
        w_host = host.grind(bits)
        w_dev = int(np.asarray(dev.grind(bits)))
        assert w_host == w_dev
        _sync_check(host, dev)


def test_observe_device_values():
    host = DuplexChallenger()
    dev = TraceChallenger()
    vals = np.arange(20, dtype=np.uint32) * 7 + 3
    host.observe_slice(vals)
    dev.observe_slice(jnp.asarray(vals))
    assert host.sample() == int(np.asarray(dev.sample()))
    assert host.sample_bits(10) == int(np.asarray(dev.sample_bits(10)))
    _sync_check(host, dev)

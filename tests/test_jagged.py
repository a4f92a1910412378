"""Jagged PCS tests: branching program indicator, jagged eval sumcheck,
and full commit/prove/verify roundtrip with heterogeneous table heights."""

import pytest

import numpy as np

import jax.numpy as jnp

from sp1_tpu.field import extension as ext
from sp1_tpu.field import koalabear as kb
from sp1_tpu.iop.challenger import DuplexChallenger
from sp1_tpu.ops import mle as mle_ops
from sp1_tpu.pcs import jagged
from sp1_tpu.pcs.basefold import FriConfig

pytestmark = pytest.mark.medium

RNG = np.random.default_rng(23)
E4 = ext.npext4


def rand_canon(shape):
    return RNG.integers(0, kb.P, size=shape, dtype=np.uint64).astype(np.uint32)


def to_monty(x):
    return ((x.astype(np.uint64) << 32) % kb.P).astype(np.uint32)


def embed(bits):
    return np.stack([np.asarray(bits, np.uint32)] + [np.zeros(len(bits), np.uint32)] * 3, axis=-1)


class TestBranchingProgram:
    def test_indicator_on_boolean_points(self):
        # single table of 4 rows, 2 columns: indices 0..7
        log_rows, log_cols = 2, 1
        log_m = log_rows + log_cols
        heights = [1 << log_rows] * (1 << log_cols)
        params = jagged.JaggedParams(col_heights=heights, max_log_row_count=log_rows)
        prefix = params.prefix_sums
        bits = log_m + 1
        for index in range(1 << log_m):
            row = index % (1 << log_rows)
            col = index // (1 << log_rows)
            z_row = embed(jagged.point_from_usize(row, log_rows + 1))
            z_index = embed(jagged.point_from_usize(index, bits))
            bp = jagged.BranchingProgram(z_row, z_index)
            pre = embed(jagged.point_from_usize(prefix[col], bits))[None]
            nxt = embed(jagged.point_from_usize(prefix[col + 1], bits))[None]
            out = bp.eval(pre, nxt)[0]
            np.testing.assert_array_equal(out, E4.one())
            # wrong column -> 0
            wrong = (col + 1) % (1 << log_cols)
            pre_w = embed(jagged.point_from_usize(prefix[wrong], bits))[None]
            nxt_w = embed(jagged.point_from_usize(prefix[wrong + 1], bits))[None]
            out_w = bp.eval(pre_w, nxt_w)[0]
            assert np.all(out_w == 0)

    def test_full_eval_matches_partial_mle(self):
        heights = [5, 1, 0, 3]
        mlrc = 3
        params = jagged.JaggedParams(col_heights=heights, max_log_row_count=mlrc)
        log_m = params.log_m
        z_row = rand_canon((mlrc, 4))
        z_col = rand_canon((2, 4))
        z_index = rand_canon((log_m, 4))
        full = jagged._full_jagged_eval(
            params, z_row, z_col,
            np.concatenate([z_index]),
        )
        # partial table evaluated at z_index must agree
        jt = jagged.partial_jagged_mle(params, z_row, z_col)
        jt_c = np.asarray(kb.from_monty(jt.reshape(-1)), np.uint32).reshape(-1, 4)
        got = mle_ops.host.eval_ext_mle(jt_c, z_index)
        # note: _full_jagged_eval uses z_trace of dim log_m (z_index here)
        np.testing.assert_array_equal(got, full)


class TestJaggedEvalSumcheck:
    def test_prove_verify(self):
        heights = [12, 1, 0, 0, 17, 0]
        mlrc = 7
        params = jagged.JaggedParams(col_heights=heights, max_log_row_count=mlrc)
        log_m = params.log_m
        z_row = rand_canon((mlrc, 4))
        z_col = rand_canon((3, 4))
        z_trace = rand_canon((log_m, 4))
        pch = DuplexChallenger()
        proof = jagged.prove_jagged_eval(params, z_row, z_col, z_trace, pch)
        vch = DuplexChallenger()
        out = jagged.verify_jagged_eval(params, z_row, z_col, z_trace, proof, vch)
        assert out is not None
        expected = jagged._full_jagged_eval(params, z_row, z_col, z_trace)
        np.testing.assert_array_equal(out, expected)


class TestJaggedPcs:
    def test_roundtrip(self):
        mlrc = 4
        config = jagged.JaggedConfig(
            FriConfig(log_blowup=1, num_queries=5, proof_of_work_bits=2),
            log_stacking_height=5,
            max_log_row_count=mlrc,
        )
        heights = [9, 4, 1]
        widths = [3, 2, 4]
        mles, claims = [], []
        point = rand_canon((mlrc, 4))
        for h, w in zip(heights, widths):
            data = np.zeros((1 << mlrc, w), np.uint32)
            data[:h] = rand_canon((h, w))
            m = jnp.asarray(to_monty(data))
            mles.append(m)
            claims.append(
                np.stack(
                    [mle_ops.host.eval_base_mle(data, point)[c] for c in range(w)]
                )
            )
        commit, pd = jagged.commit_multilinears(mles, heights, config)
        pch = DuplexChallenger()
        pch.observe_digest(commit)
        proof = jagged.prove_trusted_evaluations(point, [claims], [pd], config, pch)
        vch = DuplexChallenger()
        vch.observe_digest(commit)
        ok = jagged.verify_trusted_evaluations(
            [commit], point, [claims], proof, config, vch
        )
        assert ok

    def test_wrong_claim_rejected(self):
        mlrc = 3
        config = jagged.JaggedConfig(
            FriConfig(log_blowup=1, num_queries=4, proof_of_work_bits=2),
            log_stacking_height=4,
            max_log_row_count=mlrc,
        )
        heights = [6]
        data = np.zeros((1 << mlrc, 2), np.uint32)
        data[:6] = rand_canon((6, 2))
        m = jnp.asarray(to_monty(data))
        point = rand_canon((mlrc, 4))
        claims = [
            np.stack([mle_ops.host.eval_base_mle(data, point)[c] for c in range(2)])
        ]
        commit, pd = jagged.commit_multilinears([m], heights, config)
        pch = DuplexChallenger()
        proof = jagged.prove_trusted_evaluations(point, [claims], [pd], config, pch)
        bad = [claims[0].copy()]
        bad[0][0, 0] ^= 1
        vch = DuplexChallenger()
        assert not jagged.verify_trusted_evaluations(
            [commit], point, bad, proof, config, vch
        )

"""Septic extension + curve tests against the reference's fixed points."""

import numpy as np

from sp1_tpu.prover import septic
from sp1_tpu.prover.septic import Septic, SepticCurvePoint, lift_x


class TestSepticField:
    def test_mul_inv_roundtrip(self):
        rng = np.random.default_rng(3)
        for _ in range(5):
            a = Septic(rng.integers(0, septic.P, 7))
            assert a * a.inv() == Septic.one()

    def test_frobenius_is_pth_power(self):
        rng = np.random.default_rng(4)
        a = Septic(rng.integers(0, septic.P, 7))
        assert a.frobenius() == a.pow(septic.P)

    def test_sqrt(self):
        rng = np.random.default_rng(5)
        found = 0
        for _ in range(8):
            a = Septic(rng.integers(0, septic.P, 7))
            sq = a.square()
            r = sq.sqrt()
            assert r is not None
            assert r.square() == sq
            found += 1
        assert found == 8


class TestSepticCurve:
    def test_reference_constant_points_on_curve(self):
        # The reference's fixed points must satisfy the curve equation —
        # this cross-validates our field arithmetic against theirs
        # (reference: septic_digest.rs test_const_points).
        assert SepticCurvePoint.dummy().check_on_curve()
        assert SepticCurvePoint.cumulative_sum_start().check_on_curve()
        assert SepticCurvePoint.digest_sum_start().check_on_curve()

    def test_add_double(self):
        p1 = SepticCurvePoint.dummy()
        p2 = SepticCurvePoint.cumulative_sum_start()
        s = p1.add_incomplete(p2)
        assert s.check_on_curve()
        d = p1.double()
        assert d.check_on_curve()
        # commutativity
        assert s == p2.add_incomplete(p1)
        # (P1 + P2) - P2 == P1
        back = s.add_incomplete(p2.neg())
        assert back == p1

    def test_lift_x(self):
        pt, offset, m_in, m_out = lift_x([1, 2, 3, 4, 5, 6, 7, 8])
        assert pt.check_on_curve()
        assert not pt.y.is_exception()
        # deterministic
        pt2, offset2, _, _ = lift_x([1, 2, 3, 4, 5, 6, 7, 8])
        assert pt == pt2 and offset == offset2

"""Curve / uint256 precompiles: executor semantics, AIR constraints and
lookup balance at the production word model (reference behavior:
crates/core/machine/src/syscall/precompiles/{edwards,weierstrass,uint256}).

Full prove+verify of a curve guest runs in the slow tier
(test_slow_e2e.py); here every constraint and interaction is exercised
through the debug oracle in seconds, like test_limb16.py.
"""

import numpy as np
import pytest

from sp1_tpu.air.builder import KIND_GLOBAL_ACC, KIND_STATE
from sp1_tpu.executor import asm, native
from sp1_tpu.prover import machine as mm
from sp1_tpu.prover.lookup_debug import check_balance
from sp1_tpu.riscv import fieldops as fo
from sp1_tpu.riscv import tracegen
from sp1_tpu.riscv.machine import WordSpec, build_machine

pytestmark = pytest.mark.medium

WS = WordSpec(limb_bits=16)
MLRC = 16

P25519 = fo.ED25519_FP.modulus
PSECP = fo.SECP256K1_FP.modulus
PBN = fo.BN254_FP.modulus

ED_G = (
    15112221349535400772501151409588531511454012693041857206046113283949847762202,
    46316835694926478169428394003475163141307993866256225615783033603165251855960,
)
SECP_G = (
    0x79BE667EF9DCBBAC55A06295CE870B07029BFCDB2DCE28D959F2815B16F81798,
    0x483ADA7726A3C4655DA4FBFC0E1108A8FD17B448A68554199C47D08FFB10D4B8,
)
BN_G = (1, 2)


def ed_add(p1, p2):
    x1, y1 = p1
    x2, y2 = p2
    p, d = P25519, fo.ED25519_D
    f = x1 * x2 % p * y1 % p * y2 % p * d % p
    x3 = (x1 * y2 + x2 * y1) * pow(1 + f, p - 2, p) % p
    y3 = (y1 * y2 + x1 * x2) * pow(1 - f, p - 2, p) % p
    return x3, y3


def ws_add(p1, p2, p):
    x1, y1 = p1
    x2, y2 = p2
    s = (y2 - y1) * pow(x2 - x1, p - 2, p) % p
    x3 = (s * s - x1 - x2) % p
    return x3, (s * (x1 - x3) - y1) % p


def ws_double(pt, p, a=0):
    x, y = pt
    s = (3 * x * x + a) * pow(2 * y, p - 2, p) % p
    x3 = (s * s - 2 * x) % p
    return x3, (s * (x - x3) - y) % p


def on_ed_curve(pt):
    x, y = pt
    p = P25519
    return (-x * x + y * y - 1 - fo.ED25519_D * x * x % p * y % p * y) % p == 0


def on_ws_curve(pt, p, a, b):
    x, y = pt
    return (y * y - x * x * x - a * x - b) % p == 0


def dwords(v: int, n: int = 4) -> list:
    return [(v >> (64 * i)) & ((1 << 64) - 1) for i in range(n)]


def guest(sid: int, n_read: int, n_write: int) -> str:
    """Read n_read dwords into a buffer at 1024, invoke syscall sid on
    it, halt with the checksum (mod-2^64 sum) of the written cells."""
    return f"""
    li s0, 1024
    li t0, {n_read}
    mv s1, s0
fill:
    li a7, 3
    ecall
    sd a0, 0(s1)
    addi s1, s1, 8
    addi t0, t0, -1
    bne t0, zero, fill
    li a7, {sid}
    mv a0, s0
    ecall
    li t0, {n_write}
    mv s1, s0
    li s2, 0
acc:
    ld a0, 0(s1)
    add s2, s2, a0
    addi s1, s1, 8
    addi t0, t0, -1
    bne t0, zero, acc
    mv a0, s2
    li a7, 0
    ecall
"""


def run_and_check(sid, n_read, n_write, inputs, expect_out, shape):
    prog = asm.assemble(guest(sid, n_read, n_write))
    res = native.execute(prog, inputs=inputs)
    checksum = sum(expect_out) % (1 << 64)
    assert res.exit_code == checksum, "executor result mismatch"
    machine = build_machine(WS, shape)
    traces, prep = tracegen.generate_traces(res, prog, 0, WS, MLRC)
    pv = tracegen.make_public_values(res, 0, WS, traces=traces)
    pv = pv + [0] * (machine.max_num_pvs - len(pv))
    violations = mm.debug_constraints(
        machine,
        machine.chips,
        {n: t for n, (t, _) in prep.items()},
        {n: t for n, (t, _) in traces.items()},
        {n: h for n, (_, h) in traces.items()},
        pv,
    )
    assert violations == [], f"constraint violations: {violations[:5]}"
    imbal = check_balance(
        machine.chips,
        {n: t for n, (t, _) in prep.items()},
        {n: t for n, (t, _) in traces.items()},
        {n: h for n, (_, h) in traces.items()},
    )
    real = {k: v for k, v in imbal.items()
            if k[0] not in (KIND_STATE, KIND_GLOBAL_ACC)}
    assert real == {}, f"lookup imbalance: {dict(list(real.items())[:5])}"
    return res


class TestEd25519:
    def test_ed_add(self):
        g2 = ed_add(ED_G, ED_G)
        assert on_ed_curve(g2)
        g3 = ed_add(g2, ED_G)
        assert on_ed_curve(g3)
        inputs = (dwords(g2[0]) + dwords(g2[1]) + dwords(ED_G[0])
                  + dwords(ED_G[1]))
        out = dwords(g3[0]) + dwords(g3[1])
        run_and_check(11, 16, 8, inputs, out, frozenset({"ed25519"}))


class TestSecp256k1:
    def test_double(self):
        g2 = ws_double(SECP_G, PSECP)
        assert on_ws_curve(g2, PSECP, 0, 7)
        inputs = dwords(SECP_G[0]) + dwords(SECP_G[1])
        out = dwords(g2[0]) + dwords(g2[1])
        run_and_check(13, 8, 8, inputs, out, frozenset({"secp256k1_double"}))

    def test_add(self):
        g2 = ws_double(SECP_G, PSECP)
        g3 = ws_add(SECP_G, g2, PSECP)
        assert on_ws_curve(g3, PSECP, 0, 7)
        inputs = (dwords(SECP_G[0]) + dwords(SECP_G[1]) + dwords(g2[0])
                  + dwords(g2[1]))
        out = dwords(g3[0]) + dwords(g3[1])
        run_and_check(12, 16, 8, inputs, out, frozenset({"secp256k1_add"}))


class TestBn254:
    def test_add(self):
        g2 = ws_double(BN_G, PBN)
        g3 = ws_add(BN_G, g2, PBN)
        assert on_ws_curve(g3, PBN, 0, 3)
        inputs = (dwords(BN_G[0]) + dwords(BN_G[1]) + dwords(g2[0])
                  + dwords(g2[1]))
        out = dwords(g3[0]) + dwords(g3[1])
        run_and_check(15, 16, 8, inputs, out, frozenset({"bn254_add"}))


R1_G = (
    0x6B17D1F2E12C4247F8BCE6E563A440F277037D812DEB33A0F4A13945D898C296,
    0x4FE342E2FE1A7F9B8EE7EB4A7C0F9E162BCE33576B315ECECBB6406837BF51F5,
)
PR1 = fo.SECP256R1_FP.modulus


class TestSecp256r1:
    def test_double(self):
        g2 = ws_double(R1_G, PR1, a=fo.SECP256R1_A)
        assert on_ws_curve(g2, PR1, fo.SECP256R1_A, fo.SECP256R1_B)
        inputs = dwords(R1_G[0]) + dwords(R1_G[1])
        out = dwords(g2[0]) + dwords(g2[1])
        run_and_check(19, 8, 8, inputs, out, frozenset({"secp256r1_double"}))

    def test_add(self):
        g2 = ws_double(R1_G, PR1, a=fo.SECP256R1_A)
        g3 = ws_add(R1_G, g2, PR1)
        assert on_ws_curve(g3, PR1, fo.SECP256R1_A, fo.SECP256R1_B)
        inputs = (dwords(R1_G[0]) + dwords(R1_G[1]) + dwords(g2[0])
                  + dwords(g2[1]))
        out = dwords(g3[0]) + dwords(g3[1])
        run_and_check(18, 16, 8, inputs, out, frozenset({"secp256r1_add"}))

    def test_decompress(self):
        x, y = R1_G
        sign = y & 1  # desired parity selects +-root
        root = pow((x * x * x + fo.SECP256R1_A * x + fo.SECP256R1_B) % PR1,
                   (PR1 + 1) // 4, PR1)
        if root & 1:
            root = PR1 - root
        want = PR1 - root if sign else root
        assert want in (y, PR1 - y)
        inputs = [sign] + dwords(x)  # sign cell then x (ABI: 5 cells)
        run_and_check(20, 5, 4, inputs, dwords(want),
                      frozenset({"secp256r1_decompress"}))


class TestBn254Double:
    def test_double(self):
        g2 = ws_double(BN_G, PBN)
        assert on_ws_curve(g2, PBN, 0, 3)
        inputs = dwords(BN_G[0]) + dwords(BN_G[1])
        out = dwords(g2[0]) + dwords(g2[1])
        run_and_check(21, 8, 8, inputs, out, frozenset({"bn254_double"}))


PBLS = fo.BLS12381_FP.modulus
BLS_G = (
    0x17F1D3A73197D7942695638C4FA9AC0FC3688C4F9774B905A14E3A3F171BAC586C55E83FF97A1AEFFB3AF00ADB22C6BB,
    0x08B3F481E3AAA0F1A09E30ED741D8AE4FCF5E095D5D00AF600DB18CB2C04B3EDD03CC744A2888AE40CAA232946C5E7E1,
)


class TestBls12381:
    def test_double(self):
        g2 = ws_double(BLS_G, PBLS)
        assert on_ws_curve(g2, PBLS, 0, 4)
        inputs = dwords(BLS_G[0], 6) + dwords(BLS_G[1], 6)
        out = dwords(g2[0], 6) + dwords(g2[1], 6)
        run_and_check(23, 12, 12, inputs, out, frozenset({"bls12381_double"}))

    def test_add(self):
        g2 = ws_double(BLS_G, PBLS)
        g3 = ws_add(BLS_G, g2, PBLS)
        assert on_ws_curve(g3, PBLS, 0, 4)
        inputs = (dwords(BLS_G[0], 6) + dwords(BLS_G[1], 6)
                  + dwords(g2[0], 6) + dwords(g2[1], 6))
        out = dwords(g3[0], 6) + dwords(g3[1], 6)
        run_and_check(22, 24, 12, inputs, out, frozenset({"bls12381_add"}))

    def test_decompress(self):
        x, y = BLS_G
        root = pow((x * x * x + 4) % PBLS, (PBLS + 1) // 4, PBLS)
        if root & 1:
            root = PBLS - root
        sign = 1 if root != y else 0
        want = PBLS - root if sign else root
        assert want == y
        inputs = [sign] + dwords(x, 6)
        run_and_check(24, 7, 6, inputs, dwords(want, 6),
                      frozenset({"bls12381_decompress"}))


class TestUint256:
    def test_mul_mod_m(self):
        x = 0xDEADBEEF_12345678_9ABCDEF0_FEDCBA98_76543210_0F1E2D3C_4B5A6978_8796A5B4
        y = 0x12345678_9ABCDEF0_0F0F0F0F_F0F0F0F0_AAAAAAAA_55555555_01234567_89ABCDEF
        m = PSECP
        r = x * y % m
        inputs = dwords(x) + dwords(y) + dwords(m)
        run_and_check(14, 12, 4, inputs, dwords(r), frozenset({"uint256"}))

    def test_mul_mod_2_256(self):
        x = (1 << 256) - 12345
        y = (1 << 255) + 977
        r = x * y % (1 << 256)
        inputs = dwords(x) + dwords(y) + dwords(0)
        run_and_check(14, 12, 4, inputs, dwords(r), frozenset({"uint256"}))

    def test_executor_traps_carry_overflow(self):
        # m = 1 with large x, y: the 256-bit carry would overflow; the
        # executor must trap instead of producing an unprovable record
        prog = asm.assemble(guest(14, 12, 4))
        x = (1 << 256) - 1
        inputs = dwords(x) + dwords(x) + dwords(1)
        with pytest.raises(RuntimeError):
            native.execute(prog, inputs=inputs)


class TestFpTower:
    """fp/fp2 add/sub/mul for bn254 + bls12-381 (fptower precompiles)."""

    X254 = 0x1234567890ABCDEF_FEDCBA0987654321_0011223344556677_0899AABB % PBN
    Y254 = 0x0F1E2D3C4B5A6978_8796A5B4C3D2E1F0_13579BDF02468ACE % PBN
    X381 = (1 << 380) % PBLS + 12345
    Y381 = (1 << 379) % PBLS + 67890

    def _run_fp(self, sid, shape, p, x, y, op, nw):
        r = op(x, y) % p
        inputs = dwords(x, nw) + dwords(y, nw)
        run_and_check(sid, 2 * nw, nw, inputs, dwords(r, nw),
                      frozenset({shape}))

    def _run_fp2(self, sid, shape, p, x, y, nw, mul=False, op=None):
        x0, x1 = x
        y0, y1 = y
        if mul:
            r0, r1 = (x0 * y0 - x1 * y1) % p, (x0 * y1 + x1 * y0) % p
        else:
            r0, r1 = op(x0, y0) % p, op(x1, y1) % p
        inputs = (dwords(x0, nw) + dwords(x1, nw) + dwords(y0, nw)
                  + dwords(y1, nw))
        out = dwords(r0, nw) + dwords(r1, nw)
        run_and_check(sid, 4 * nw, 2 * nw, inputs, out, frozenset({shape}))

    def test_bn254_fp(self):
        import operator

        self._run_fp(25, "bn254_fp_add", PBN, self.X254, self.Y254,
                     operator.add, 4)
        self._run_fp(26, "bn254_fp_sub", PBN, self.Y254, self.X254,
                     operator.sub, 4)
        self._run_fp(27, "bn254_fp_mul", PBN, self.X254, self.Y254,
                     operator.mul, 4)

    def test_bn254_fp2(self):
        import operator

        x = (self.X254, self.Y254)
        y = (self.Y254, (self.X254 * 3) % PBN)
        self._run_fp2(28, "bn254_fp2_add", PBN, x, y, 4, op=operator.add)
        self._run_fp2(29, "bn254_fp2_sub", PBN, x, y, 4, op=operator.sub)
        self._run_fp2(30, "bn254_fp2_mul", PBN, x, y, 4, mul=True)

    def test_bls12381_fp(self):
        import operator

        self._run_fp(31, "bls12381_fp_add", PBLS, self.X381, self.Y381,
                     operator.add, 6)
        self._run_fp(32, "bls12381_fp_sub", PBLS, self.Y381, self.X381,
                     operator.sub, 6)
        self._run_fp(33, "bls12381_fp_mul", PBLS, self.X381, self.Y381,
                     operator.mul, 6)

    def test_bls12381_fp2(self):
        import operator

        x = (self.X381, self.Y381)
        y = (self.Y381, (self.X381 * 7) % PBLS)
        self._run_fp2(34, "bls12381_fp2_add", PBLS, x, y, 6, op=operator.add)
        self._run_fp2(35, "bls12381_fp2_sub", PBLS, x, y, 6, op=operator.sub)
        self._run_fp2(36, "bls12381_fp2_mul", PBLS, x, y, 6, mul=True)


class TestU256x2048:
    def test_mul(self):
        a = (0xDEADBEEF_CAFEBABE << 192) + (1 << 100) + 977
        b = sum(((i * 0x0123456789ABCDEF + 7) % (1 << 64)) << (64 * i)
                for i in range(32))
        prod = a * b
        lo, hi = prod & ((1 << 2048) - 1), prod >> 2048
        inputs = dwords(a, 4) + dwords(b, 32)
        out = dwords(lo, 32) + dwords(hi, 4)
        run_and_check(37, 36, 36, inputs, out, frozenset({"u256x2048"}))


class TestShape:
    def test_shape_of_px(self):
        prog = asm.assemble(guest(13, 8, 8))
        inputs = dwords(SECP_G[0]) + dwords(SECP_G[1])
        res = native.execute(prog, inputs=inputs)
        assert tracegen.shape_of_px(res.px_events) == frozenset(
            {"secp256k1_double"}
        )

    def test_unknown_shape_rejected(self):
        with pytest.raises(ValueError):
            build_machine(WS, frozenset({"nope"}))

    def test_syscall_without_chip_unbalanced(self):
        """A shard whose machine lacks the precompile chip must show a
        lookup imbalance (this is what makes shapes sound)."""
        prog = asm.assemble(guest(13, 8, 8))
        inputs = dwords(SECP_G[0]) + dwords(SECP_G[1])
        res = native.execute(prog, inputs=inputs)
        machine = build_machine(WS)  # no secp256k1_double chip
        traces, prep = tracegen.generate_traces(res, prog, 0, WS, MLRC)
        traces.pop("Secp256k1Double", None)
        imbal = check_balance(
            machine.chips,
            {n: t for n, (t, _) in prep.items()},
            {n: t for n, (t, _) in traces.items()},
            {n: h for n, (_, h) in traces.items()},
        )
        real = {k: v for k, v in imbal.items()
                if k[0] not in (KIND_STATE, KIND_GLOBAL_ACC)}
        assert real, "missing chip must unbalance the syscall lookup"


class TestDecompress:
    def test_ed_decompress(self):
        # decompress 2G from (sign, y)
        g2 = ed_add(ED_G, ED_G)
        x, y = g2
        # the executor's base representative has lsb 0; sign selects -x
        sign = 0 if (x & 1) == 0 else 1
        # cell 0 = sign (one dword), cells 1..4 = y
        stdin = [sign] + dwords(y)
        out = dwords(x)
        run_and_check(16, 5, 4, stdin, out, frozenset({"ed25519_decompress"}))

    def test_secp256k1_decompress(self):
        g2 = ws_double(SECP_G, PSECP)
        x, y = g2
        base = y if (y & 1) == 0 else PSECP - y
        sign = 0 if base == y else 1
        stdin = [sign] + dwords(x)
        out = dwords(y)
        run_and_check(17, 5, 4, stdin, out, frozenset({"secp256k1_decompress"}))

    def test_ed_decompress_invalid_y_traps(self):
        # y with (y^2-1)/(dy^2+1) a non-residue must trap in the executor
        prog = asm.assemble(guest(16, 5, 4))
        bad_y = 2  # (y^2-1)/(d*y^2+1) is a non-residue for this y
        stdin = [0] + dwords(bad_y)
        with pytest.raises(RuntimeError):
            native.execute(prog, inputs=stdin)


class TestPoseidon2Precompile:
    def test_permute(self):
        import numpy as np

        from sp1_tpu.ops.poseidon2 import hostp2

        state = [(i * 977 + 5) % ((1 << 31) - (1 << 24) + 1)
                 for i in range(16)]
        want = [int(v) for v in
                hostp2.permute(np.asarray([state], np.uint32))[0]]
        run_and_check(38, 16, 16, state, want, frozenset({"poseidon2"}))

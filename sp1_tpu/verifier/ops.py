"""Ops namespace adapter: chip/interaction evaluation over a backend.

Chips define constraints against an abstract ops namespace
(sp1_tpu.air.builder); this adapter lets the SAME machine definitions
evaluate on verifier-backend handles (concrete ints for the standalone
oracle, symbolic nodes for the recursion compiler).
"""

from __future__ import annotations


class VOps:
    """Ext-valued ops namespace over a verifier backend."""

    def __init__(self, bk):
        self.bk = bk

    def const(self, v: int):
        return self.bk.ext((v, 0, 0, 0))

    def add(self, a, b):
        return self.bk.eadd(a, b)

    def sub(self, a, b):
        return self.bk.esub(a, b)

    def mul(self, a, b):
        return self.bk.emul(a, b)

    def neg(self, a):
        return self.bk.eneg(a)

    def scale_base(self, a, w: int):
        return self.bk.emul_const(a, w)

    def zero(self):
        return self.bk.zero_ext()

    def one(self):
        return self.const(1)

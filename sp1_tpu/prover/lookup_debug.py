"""Interaction-balance debugger (reference: crates/hypercube/src/lookup/debug.rs).

Sums every interaction's multiplicity per concrete value tuple across all
chips (sends positive, receives negative) and reports nonzero totals —
the direct witness of a LogUp imbalance, naming the kind and tuple.
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np

import jax.numpy as jnp

from ..field import koalabear as kb


def _canon(trace):
    rinv = pow(1 << 32, -1, kb.P)
    return (np.asarray(trace, np.uint64) * rinv % kb.P).astype(np.uint32)


def check_balance(chips, preprocessed, traces, heights, scope="local") -> dict:
    """Returns {(kind, values_tuple): net_multiplicity (mod p), ...} nonzero."""
    totals = defaultdict(int)
    for chip in chips:
        if chip.name not in traces:
            continue
        mt = _canon(traces[chip.name])
        pt = _canon(preprocessed[chip.name]) if chip.name in preprocessed else None
        h = heights[chip.name]
        for inter, sign in [
            (i, 1) for i in chip.sends() if i.scope == scope
        ] + [(i, -1) for i in chip.receives() if i.scope == scope]:
            for r in range(h):
                main_row = mt[r]
                prep_row = pt[r] if pt is not None else None

                def ap(aff):
                    acc = aff.constant
                    for col, w in aff.terms:
                        v = (
                            main_row[col.index]
                            if col.space == "main"
                            else prep_row[col.index]
                        )
                        acc = (acc + int(v) * w) % kb.P
                    return acc

                mult = ap(inter.multiplicity)
                if mult == 0:
                    continue
                values = tuple(ap(v) for v in inter.values)
                totals[(inter.kind, values)] = (
                    totals[(inter.kind, values)] + sign * mult
                ) % kb.P
    return {k: v for k, v in totals.items() if v != 0}

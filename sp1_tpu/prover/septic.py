"""Compatibility re-export: the septic field/curve moved to field/septic
(it is shared protocol math used by both the prover and the independent
verifier)."""

from ..field.septic import *  # noqa: F401,F403
from ..field.septic import (  # noqa: F401
    CURVE_CUMULATIVE_SUM_START_X,
    CURVE_CUMULATIVE_SUM_START_Y,
    CompletePoint,
    Septic,
    SepticCurvePoint,
    digest_value,
    lift_x,
    sum_checker_x,
    sum_checker_y,
)

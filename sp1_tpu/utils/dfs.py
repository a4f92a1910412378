"""Device-Fiat-Shamir mode switch.

When enabled, the prover's round loops run with the device-resident
TraceChallenger (iop.dchallenger) and defer all readbacks to phase
boundaries — the win on a remote/tunneled TPU where every device->host
sync costs a round trip. Transcripts are bit-identical either way.

SP1_TPU_DEVICE_FS: "1"/"0" to force, "auto" (default) = on when the
default JAX backend is an accelerator.
"""

from __future__ import annotations

import os


def enabled() -> bool:
    v = os.environ.get("SP1_TPU_DEVICE_FS", "auto")
    if v == "auto":
        import jax

        return jax.default_backend() != "cpu"
    return v not in ("0", "false", "")

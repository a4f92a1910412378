"""Batched device->host readback.

On the remote-tunnel TPU path every device_get pays a round trip, so
phase drivers collect ALL their result handles and fetch them with ONE
flat transfer at the end of the phase.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def batch_fetch(arrays: list) -> list:
    """Fetch a list of uint32 device arrays as numpy in one transfer.

    Handles may be committed to different device sets (e.g. mesh-
    replicated shard_map outputs next to single-device challenger
    values); everything is pinned to one device before the concat."""
    if not arrays:
        return []
    from ..iop.dchallenger import _unshard

    arrays = [_unshard(a) for a in arrays]
    shapes = [tuple(a.shape) for a in arrays]
    sizes = [int(np.prod(s)) if s else 1 for s in shapes]
    flat = jnp.concatenate([jnp.asarray(a).reshape(-1) for a in arrays])
    host = np.asarray(flat, np.uint32)
    out, off = [], 0
    for shape, size in zip(shapes, sizes):
        out.append(host[off : off + size].reshape(shape))
        off += size
    return out

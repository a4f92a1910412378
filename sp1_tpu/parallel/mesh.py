"""Device-mesh context for intra-proof sharding.

The prover's hot stages scale across chips by sharding the TRACE ROW
dimension over a 1-axis `jax.sharding.Mesh` (axis "d"): each device owns
a contiguous MSB block of the hypercube, so sumcheck folds (which fix
the LAST variable / LSB) stay device-local, and each round's restricted
sums reduce with a modular butterfly allreduce over ICI
(reference seam: SURVEY §2.8.7 — the reference has no intra-proof
multi-GPU analog; this is the TPU-new work axis).

Usage:
    mesh = make_mesh(jax.devices())
    with prover_mesh(mesh):
        proof = prover.prove_shard(...)   # zerocheck rounds run sharded
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..field import koalabear as kb

_ACTIVE: list = []


def make_mesh(devices) -> "jax.sharding.Mesh":
    from jax.sharding import Mesh

    devs = np.array(list(devices))
    assert devs.size & (devs.size - 1) == 0, "mesh size must be a power of 2"
    return Mesh(devs, axis_names=("d",))


class prover_mesh:
    """Context manager activating a mesh for the prover's sharded stages."""

    def __init__(self, mesh):
        self.mesh = mesh

    def __enter__(self):
        _ACTIVE.append(self.mesh)
        return self.mesh

    def __exit__(self, *exc):
        _ACTIVE.pop()
        return False


def active_mesh():
    return _ACTIVE[-1] if _ACTIVE else None


def mesh_size(mesh) -> int:
    return int(mesh.devices.size)


def row_sharding(mesh, ndim: int):
    """NamedSharding putting axis 0 (rows) on the mesh, rest replicated."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    return NamedSharding(mesh, P("d", *([None] * (ndim - 1))))


def replicate(x, mesh):
    """Commit a small array to the mesh fully replicated, so it can enter
    shard_map'd kernels alongside mesh-sharded tables (a device-0
    committed array — e.g. a TraceChallenger sample — cannot)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    import jax as _jax

    return _jax.device_put(x, NamedSharding(mesh, P()))


def psum_mod(x, axis: str, n_devices: int):
    """Modular allreduce: log2(n) XOR-butterfly ppermute + monty adds.

    A plain lax.psum would overflow uint32 (sums of up to 8 values < 2^31);
    the butterfly keeps every partial reduced mod p.
    """
    k = 1
    while k < n_devices:
        perm = [(i, i ^ k) for i in range(n_devices)]
        y = jax.lax.ppermute(x, axis, perm)
        x = kb.add(x, y)
        k <<= 1
    return x


def shard_map_fn(fn, mesh, in_specs, out_specs):
    """shard_map with the replication check disabled (psum_mod's output
    replication is not statically inferred), across jax versions."""
    try:
        from jax import shard_map  # jax >= 0.8
    except ImportError:
        from jax.experimental.shard_map import shard_map

    kw = dict(mesh=mesh, in_specs=in_specs, out_specs=out_specs)
    try:
        return shard_map(fn, **kw, check_vma=False)
    except TypeError:
        return shard_map(fn, **kw, check_rep=False)

"""Mesh construction and sharding helpers.

The decode workload shards along two axes:
  * 'batch'  — independent images (data parallel; decode state is
    per-image, mirroring the reference's per-call Decoder state,
    /root/reference/src/jpeg/decoder.zig:156-165)
  * 'stripe' — MCU-row stripes within an image (the sequence-parallel
    analog; restart segments make the entropy stream independently
    decodable per stripe, decoder.zig:1432-1452)

Multi-host: the same mesh spans hosts via jax.distributed; collectives ride
ICI within a slice and DCN across hosts.
"""

from __future__ import annotations


def make_mesh(devices=None, batch: int | None = None, stripe: int = 1):
    """Build a ('batch', 'stripe') mesh over the given (or all) devices."""
    import jax
    import numpy as np
    from jax.sharding import Mesh

    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if batch is None:
        batch = n // stripe
    if batch * stripe != n:
        raise ValueError(f"mesh {batch}x{stripe} != {n} devices")
    arr = np.asarray(devices).reshape(batch, stripe)
    return Mesh(arr, ("batch", "stripe"))


def batch_sharding(mesh, *, stripe_dim: int | None = None):
    """NamedSharding placing dim 0 on 'batch' (and optionally one dim on
    'stripe')."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    if stripe_dim is None:
        return NamedSharding(mesh, P("batch"))
    spec = [None] * (stripe_dim + 1)
    spec[0] = "batch"
    spec[stripe_dim] = "stripe"
    return NamedSharding(mesh, P(*spec))

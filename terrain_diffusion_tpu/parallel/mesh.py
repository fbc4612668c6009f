"""Device mesh + sharding helpers.

The framework's parallelism design (replacing the reference's
Accelerate/NCCL DDP, SURVEY §2.7):

- **training**: data parallelism over a 1-D ``('data',)`` mesh — batch
  sharded on axis 0, params/optimizer state replicated; jit inserts the
  gradient all-reduce over ICI.
- **inference**: tile parallelism over the same mesh — the runtime's padded
  window batches shard across devices (each tile independent; no collectives
  on the forward path), so a v5e-8 runs 8 tiles per program call.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def shard_batch(mesh: Mesh, batch, axis: str = "data"):
    """Shard every array leaf along its leading (batch) axis.

    Leaves whose leading dim is not divisible by the mesh size are
    replicated instead (e.g. tiny debug batches on a big mesh).
    """
    n = int(np.prod(mesh.devices.shape))
    sharded = NamedSharding(mesh, P(axis))
    replicated = NamedSharding(mesh, P())

    def put(x):
        shape = np.shape(x)
        if len(shape) >= 1 and shape[0] % n == 0:
            return jax.device_put(x, sharded)
        return jax.device_put(x, replicated)

    return jax.tree.map(put, batch)


def replicate(mesh: Mesh, tree):
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def batch_pspec(axis: str = "data"):
    return P(axis)


def shard_spatial(mesh: Mesh, x, dim: int = 1, axis: str = "data"):
    """Shard one SPATIAL dimension of x across the mesh (row-partitioned
    images).  Under jit, XLA's SPMD partitioner turns every conv that reads
    across the cut into a local conv + halo exchange over ICI — latency
    parallelism for a single large-map forward (e.g. one 512x512 decode
    split over 8 chips), complementing the batch/tile parallelism above.

    Use with the XLA block path: Pallas custom calls are opaque to the
    SPMD partitioner, so spatially-sharded models must be built without
    block_impl='pallas' (see `spatial_model`).
    """
    spec = [None] * x.ndim
    spec[dim] = axis
    return jax.device_put(x, NamedSharding(mesh, P(*spec)))


def spatial_model(model):
    """Clone of an EDMUnet2D/EDMAutoencoder with runtime kernel selectors
    stripped from block_kwargs, safe for spatially-sharded (SPMD) runs."""
    import dataclasses

    bk = {k: v for k, v in (model.config.block_kwargs or {}).items()
          if k not in ("block_impl", "attention_impl")}
    if bk == (model.config.block_kwargs or {}):
        return model
    return type(model)(dataclasses.replace(model.config, block_kwargs=bk))

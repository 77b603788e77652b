"""Device mesh + sharding helpers.

The reference is single-process single-GPU (SURVEY.md §2.8); the one real
parallelism axis for this workload is the episode batch. Accordingly:

  * 1-D mesh over all devices, axis ``data``;
  * episode batches sharded on their leading axis;
  * parameters and optimizer state replicated;
  * gradients are averaged by XLA-inserted collectives (psum over ICI)
    when the loss is jitted with these shardings — no hand-written
    NCCL/MPI equivalent is needed.

At ResNet-50-C4 scale tensor/pipeline parallelism buys nothing (model
~60 MB); the mesh helpers still accept an arbitrary device list so a
multi-host run shards its per-host batch the same way.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence] = None, axis: str = "data") -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.array(devices), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Sharding for arrays whose leading axis is the episode batch."""
    return NamedSharding(mesh, P(axis))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


_REPLICATED_BATCH_FIELDS = ("norm_mean", "norm_std")


def episode_batch_shardings(mesh: Mesh, axis: str = "data"):
    """EpisodeBatch-shaped pytree of shardings: per-episode arrays shard
    on the leading axis; scalar stats (norm_mean/std) replicate."""
    from fgn_tpu.data.batching import EpisodeBatch

    sh = batch_sharding(mesh, axis)
    rep = replicate(mesh)
    return EpisodeBatch(
        **{
            f: (rep if f in _REPLICATED_BATCH_FIELDS else sh)
            for f in EpisodeBatch._fields
        }
    )


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Place an EpisodeBatch on the mesh (batch axis sharded, stats
    replicated)."""
    shardings = episode_batch_shardings(mesh, axis)
    # One device_put over the whole pytree: the runtime can batch the
    # uploads instead of paying the tunnel round-trip once per leaf.
    return jax.device_put(batch, shardings)

"""Device mesh + sharding helpers.

The reference's only parallelism is Julia threads over chains
(`Metropolis(parallel=true)`, reference src/ParticlesMC.jl:246). The TPU-native
equivalent (SURVEY.md §2.10): chains are a batch axis — `vmap` inside one chip,
`NamedSharding(P('chains'))` across chips/hosts. Replica-exchange ladders ride
the same axis; XLA turns the swap permutation into ICI collectives.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(**kwargs) -> None:
    """Multi-host bring-up: `jax.distributed.initialize` passthrough.

    On TPU pods the coordinator/process env is auto-detected; kwargs
    (coordinator_address, num_processes, process_id) override for manual
    setups. After this, `jax.devices()` spans all hosts and the same
    `make_mesh()`/`shard_chains()` calls scale across DCN. The reference has
    no multi-host path at all (SURVEY.md §2.10) — this is the TPU-native
    replacement for its single-process thread fan-out.
    """
    import jax

    jax.distributed.initialize(**kwargs)


def make_mesh(n_devices: Optional[int] = None, axis: str = "chains") -> Mesh:
    """1-D mesh over available devices (or the first n)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def chains_sharding(mesh: Mesh, axis: str = "chains") -> NamedSharding:
    """Shard the leading (chains) axis of every array across the mesh."""
    return NamedSharding(mesh, P(axis))


def shard_chains(tree, mesh: Mesh, axis: str = "chains"):
    """Place a batched pytree (leading chains axis) onto the mesh. Scalars /
    shared statics should not be passed here — only the batched state."""
    sh = chains_sharding(mesh, axis)
    return jax.device_put(tree, sh)


def replicate(tree, mesh: Mesh):
    """Fully-replicated placement for shared parameters (pool params, tables)."""
    sh = NamedSharding(mesh, P())
    return jax.device_put(tree, sh)

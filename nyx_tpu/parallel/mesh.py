"""Device-mesh sharding for ensemble-parallel propagation.

The reference's parallelism is a rayon thread pool over Monte Carlo samples
(mc/montecarlo.rs:143,233); here the ensemble axis is sharded over a
`jax.sharding.Mesh` and XLA's SPMD partitioner runs each lane's adaptive
stepping locally — zero communication during integration, collectives only
at reduction points (statistics), exactly the design in SURVEY.md §2.8.
Multi-chip scaling is the same program over a larger mesh (ICI within a pod,
DCN across slices).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

ENSEMBLE_AXIS = "ensemble"


def ensemble_mesh(devices: Optional[Sequence] = None) -> Mesh:
    """1-D mesh over all (or given) devices with the ensemble axis."""
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.array(devices), (ENSEMBLE_AXIS,))


def ensemble_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(ENSEMBLE_AXIS))


def shard_ensemble(arr, mesh: Optional[Mesh] = None):
    """Place a [B, ...] array sharded along its batch axis over the mesh."""
    mesh = mesh or ensemble_mesh()
    return jax.device_put(arr, ensemble_sharding(mesh))


def pad_to_multiple(arr, multiple: int):
    """Pad the batch axis so it divides the device count; returns (arr, n_pad).

    Padding replicates the last row so padded lanes converge identically
    (no NaN risk) and are sliced away afterwards.
    """
    import jax.numpy as jnp

    b = arr.shape[0]
    n_pad = (-b) % multiple
    if n_pad == 0:
        return arr, 0
    pad = jnp.repeat(arr[-1:], n_pad, axis=0)
    return jnp.concatenate([arr, pad], axis=0), n_pad

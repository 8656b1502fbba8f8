"""Device mesh helpers for multi-chip / multi-host execution.

The reference is single-process single-GPU with no communication backend at
all (SURVEY.md §2.7); the TPU-native scaling story is a jax.sharding.Mesh over
('host', 'chip') with shard_map-placed collectives riding ICI.  Multi-host
entry is jax.distributed.initialize (call init_distributed() once per process
before building meshes).
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        assert len(devs) >= n_devices, (len(devs), n_devices)
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def init_distributed(coordinator: str | None = None, num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """Multi-host bring-up (no-op if single-process)."""
    if num_processes and num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)

"""Device mesh helpers for multi-chip / multi-host execution.

The reference is single-process single-GPU with no communication backend at
all (SURVEY.md §2.7); the TPU-native scaling story is a jax.sharding.Mesh over
('host', 'chip') with shard_map-placed collectives riding ICI.  Multi-host
processes call jax.distributed.initialize themselves before building meshes
(see tests/distributed_worker.py for the 2-process bring-up).
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(n_devices: int | None = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        assert len(devs) >= n_devices, (len(devs), n_devices)
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))

"""Device mesh construction for multi-chip / multi-host scaling.

The reference has no distributed layer at all (SURVEY.md §2 "Parallelism:
none exist"); this module introduces it the TPU way: a 1-D 'envs' data
mesh (optionally folded as hosts x chips) over which env state shards,
with XLA inserting ICI/DCN collectives (SURVEY.md §5.8).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

ENVS_AXIS = "envs"


def make_mesh(devices: Optional[Sequence] = None) -> Mesh:
    """1-D mesh over all (or given) devices with a single 'envs' axis."""
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.array(devices), (ENVS_AXIS,))


def env_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for batched env state / obs: leading axis over 'envs'."""
    return NamedSharding(mesh, P(ENVS_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    """Sharding for params / maps: replicated on every device."""
    return NamedSharding(mesh, P())

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


def make_mesh_hier(n_hosts: int,
                   devices: Optional[Sequence] = None) -> Mesh:
    """Hierarchical (hosts, chips) mesh: env batch shards over BOTH axes;
    learner all-reduces run hierarchically — the 'chips' axis rides ICI
    within a host, the 'hosts' axis rides DCN (SURVEY.md §5.8)."""
    devices = list(devices if devices is not None else jax.devices())
    assert len(devices) % n_hosts == 0, (len(devices), n_hosts)
    grid = np.array(devices).reshape(n_hosts, -1)
    return Mesh(grid, ("hosts", "chips"))


def env_axes(mesh: Mesh) -> tuple:
    """Every mesh axis, in order — the env batch dim shards over all of
    them (1-D 'envs' mesh or hierarchical hosts x chips)."""
    return tuple(mesh.axis_names)


def env_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for batched env state / obs: leading axis over the full
    mesh (all axes)."""
    return NamedSharding(mesh, P(env_axes(mesh)))


def replicated(mesh: Mesh) -> NamedSharding:
    """Sharding for params / maps: replicated on every device."""
    return NamedSharding(mesh, P())

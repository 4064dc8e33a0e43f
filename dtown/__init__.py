"""dtown — TPU-native Duckietown environment engine.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
``dowalder/gym-duckietown`` (see SURVEY.md). The functional core
(`dtown.env.reset` / `dtown.env.step`) is pure and jit/vmap/shard_map
friendly; `dtown.make` offers the reference's gym-style single-env surface
(reference: gym_duckietown/__init__.py env registration).
"""
from __future__ import annotations

import logging

from dtown.types import EnvConfig, EnvState, MapArrays, StepOutput  # noqa: F401
from dtown import constants  # noqa: F401

logger = logging.getLogger("dtown")

__version__ = "0.1.0"


def registered_ids():
    """Env ids mirroring the reference's `Duckietown-<map>-v0` registry."""
    from dtown import map_loader

    ids = [f"Duckietown-{m}-v0" for m in map_loader.list_maps()]
    ids.append("MultiMap-v0")
    return ids


def register_gymnasium():
    """Register `Duckietown-<map>-v0` ids with gymnasium, mirroring the
    reference's classic-gym registration (gym_duckietown/__init__.py)."""
    from dtown.gymnasium_compat import register_gymnasium as _reg

    return _reg()


def make(id_or_map: str = None, **kwargs):
    """Create a single-env, gym-style environment.

    Accepts either a registered id ("Duckietown-udem1-v0") or a bare map
    name ("udem1"). reference: gym.make + envs/duckietown_env.py.
    """
    from dtown import constants as C
    from dtown.gym_compat import DuckietownEnv

    name = id_or_map or C.DEFAULT_MAP_NAME
    if name == "MultiMap-v0":
        from dtown.gym_compat import MultiMapEnv

        return MultiMapEnv(**kwargs)
    if name.startswith("Duckietown-") and name.endswith("-v0"):
        name = name[len("Duckietown-"):-len("-v0")]
    return DuckietownEnv(map_name=name, **kwargs)


def make_vec(map_name, num_envs: int, **kwargs):
    """Vectorized functional env: returns (cfg, maps, reset_fn, step_fn)."""
    from dtown import env as env_core
    from dtown import map_loader
    from dtown.types import EnvConfig

    cfg = EnvConfig(**kwargs)
    if isinstance(map_name, (list, tuple)):
        maps = map_loader.stack_maps(list(map_name))
    else:
        maps = map_loader.load_map(map_name)
    v_reset, v_step = env_core.make_vec_env(cfg, maps, num_envs)
    return cfg, maps, v_reset, v_step

"""Both spawn modes produce valid start poses (bank is the fast default;
rejection mirrors the reference's in-loop sampling semantics)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dtown import env as env_core, map_loader, physics
from dtown.geometry import get_lane_pos2
from dtown.types import EnvConfig


@pytest.mark.parametrize("mode", ["bank", "rejection"])
def test_spawn_mode_validity(mode):
    cfg = EnvConfig(obs_type="state", spawn_mode=mode, spawn_attempts=16)
    maps = map_loader.load_map("loop_obstacles")
    for seed in range(4):
        state = jax.jit(lambda k: env_core.reset(cfg, maps, k))(
            jax.random.PRNGKey(seed)
        )
        valid, _ = physics.valid_pose(
            maps, state.pos, state.angle, maps.obj_corners, maps.obj_norms,
            maps.obj_mask,
        )
        assert bool(valid), (mode, seed)
        lp = get_lane_pos2(maps, state.pos, state.angle)
        assert bool(lp.in_lane)
        assert abs(float(lp.angle_deg)) <= cfg.accept_start_angle_deg + 1e-3


def test_spawn_modes_differ_but_both_on_road():
    maps = map_loader.load_map("small_loop")
    poses = {}
    for mode in ["bank", "rejection"]:
        cfg = EnvConfig(obs_type="state", spawn_mode=mode)
        s = env_core.reset(cfg, maps, jax.random.PRNGKey(0))
        poses[mode] = np.asarray(s.pos)
    # different sampling machinery -> (almost surely) different poses
    assert not np.allclose(poses["bank"], poses["rejection"])

"""Reference config-surface kwargs: start-pose overrides, debug overlays,
full_transparency, randomize_maps_on_reset, 640x480 gym default.

reference: Simulator.__init__ kwargs (SURVEY.md §5 config row, §3.3/§3.4).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import dtown
from dtown import env as env_core, map_loader
from dtown.types import EnvConfig


def test_start_pose_override():
    maps = map_loader.load_map("small_loop")
    cfg = EnvConfig(obs_type="state",
                    start_pose=(0.8, 0.3, 1.25))
    s = env_core.reset(cfg, maps, jax.random.PRNGKey(0))
    np.testing.assert_allclose(
        np.asarray(s.pos), [0.8, 0.0, 0.3], atol=1e-6
    )
    np.testing.assert_allclose(float(s.angle), 1.25, atol=1e-6)
    # deterministic across keys
    s2 = env_core.reset(cfg, maps, jax.random.PRNGKey(7))
    np.testing.assert_allclose(np.asarray(s2.pos), np.asarray(s.pos))


def test_user_tile_start():
    maps = map_loader.load_map("small_loop")
    cfg = EnvConfig(obs_type="state", user_tile_start=(1, 0))
    s = env_core.reset(cfg, maps, jax.random.PRNGKey(0))
    ts = float(maps.tile_size)
    i = int(np.asarray(s.pos)[0] // ts)
    j = int(np.asarray(s.pos)[2] // ts)
    assert (i, j) == (1, 0)
    # heads along the lane: the tile-center pose must be in lane
    from dtown.geometry import get_lane_pos2

    lp = get_lane_pos2(maps, s.pos, s.angle)
    assert bool(lp.in_lane)
    assert float(lp.dot_dir) > 0.7


def test_start_pose_override_fused_bank():
    """The fused kernel's auto-reset respawns at the override pose."""
    from dtown.ops import state_kernel as sk

    maps = map_loader.load_map("small_loop")
    cfg = EnvConfig(obs_type="state", start_pose=(0.8, 0.3, 1.25))
    tables = sk.build_tables(cfg, maps)
    bank = tables["bank"]
    assert np.allclose(bank[sk.BK_X], 0.8, atol=1e-6)
    assert np.allclose(bank[sk.BK_Z], 0.3, atol=1e-6)
    assert np.allclose(bank[sk.BK_ANG], 1.25, atol=1e-6)


def test_draw_curve_overlay():
    maps = map_loader.load_map("small_loop")
    base = EnvConfig(obs_type="rgb", camera_width=64, camera_height=64)
    dbg = EnvConfig(obs_type="rgb", camera_width=64, camera_height=64,
                    draw_curve=True)
    s = env_core.reset(base, maps, jax.random.PRNGKey(2))
    img0 = np.asarray(env_core.render_obs(base, maps, s)).astype(int)
    img1 = np.asarray(env_core.render_obs(dbg, maps, s)).astype(int)
    changed = (np.abs(img1 - img0).sum(-1) > 30)
    assert 0.001 < changed.mean() < 0.5
    # overlay pixels are red-dominant
    reds = img1[changed]
    assert (reds[:, 0] > reds[:, 1]).mean() > 0.9


def test_draw_bbox_overlay():
    maps = map_loader.load_map("loop_obstacles")
    # place the agent near a known object so its footprint box is in view
    pose = (1.0, 0.38, 0.0)
    base = EnvConfig(obs_type="rgb", camera_width=64, camera_height=64,
                     start_pose=pose)
    dbg = EnvConfig(obs_type="rgb", camera_width=64, camera_height=64,
                    start_pose=pose, draw_bbox=True)
    s = env_core.reset(base, maps, jax.random.PRNGKey(3))
    img0 = np.asarray(env_core.render_obs(base, maps, s)).astype(int)
    img1 = np.asarray(env_core.render_obs(dbg, maps, s)).astype(int)
    assert np.abs(img1 - img0).sum() > 0


def test_full_transparency_info():
    env = dtown.make("Duckietown-small_loop-v0", obs_type="state",
                     full_transparency=True)
    env.seed(0)
    env.reset()
    _, _, _, info = env.step(np.array([0.3, 0.0]))
    sim = info["Simulator"]
    assert "domain_rand_params" in sim and "in_lane" in sim
    assert sim["map_name"] == "small_loop"


def test_gym_default_is_640x480():
    env = dtown.make("Duckietown-small_loop-v0")
    assert env.observation_shape == (480, 640, 3)
    env2 = dtown.make("Duckietown-small_loop-v0", camera_width=64,
                      camera_height=64)
    assert env2.observation_shape == (64, 64, 3)


def test_randomize_maps_on_reset():
    env = dtown.make("Duckietown-small_loop-v0", obs_type="state",
                     randomize_maps_on_reset=True, seed=1)
    seen = set()
    for _ in range(6):
        env.reset()
        seen.add(env.map_name)
    assert len(seen) > 1

"""Renderer tests: deterministic golden-property checks (SURVEY.md §4 —
doable here because the rasterizer is our code, not a GL driver)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dtown import env as env_core, map_loader
from dtown.types import EnvConfig

RGB_CFG = EnvConfig(obs_type="rgb", camera_width=64, camera_height=64,
                    auto_reset=False)


@pytest.fixture(scope="module")
def loop_maps():
    return map_loader.load_map("loop_obstacles")


def _state_at(cfg, maps, pos, angle):
    state = env_core.reset(cfg, maps, jax.random.PRNGKey(0))
    return state.replace(
        pos=jnp.asarray(pos, jnp.float32), angle=jnp.float32(angle)
    )


def test_obs_shape_dtype_range(loop_maps):
    state = env_core.reset(RGB_CFG, loop_maps, jax.random.PRNGKey(0))
    img = np.asarray(env_core.render_obs(RGB_CFG, loop_maps, state))
    assert img.shape == (64, 64, 3)
    assert img.dtype == np.uint8
    assert img.std() > 5.0  # non-degenerate image


def test_render_deterministic(loop_maps):
    state = env_core.reset(RGB_CFG, loop_maps, jax.random.PRNGKey(3))
    a = np.asarray(env_core.render_obs(RGB_CFG, loop_maps, state))
    b = np.asarray(env_core.render_obs(RGB_CFG, loop_maps, state))
    np.testing.assert_array_equal(a, b)


def test_sky_above_horizon_ground_below(loop_maps):
    ts = float(loop_maps.tile_size)
    state = _state_at(RGB_CFG, loop_maps, [2.5 * ts, 0.0, 0.5 * ts], 0.0)
    img = np.asarray(env_core.render_obs(RGB_CFG, loop_maps, state))
    # top rows are sky (blueish: B > R), bottom rows are ground
    top = img[0].astype(int)
    assert (top[:, 2] > top[:, 0]).mean() > 0.9
    bottom = img[-1].astype(int)
    assert (bottom[:, 2] <= bottom[:, 0] + 30).mean() > 0.9


def test_duckie_visible_when_aimed(loop_maps):
    ts = float(loop_maps.tile_size)
    # duckie at [2.5, 0.65] tiles; stand 0.5 m south looking -z
    pos = [2.5 * ts, 0.0, 0.65 * ts + 0.5]
    state = _state_at(RGB_CFG, loop_maps, pos, np.pi / 2)
    img = np.asarray(env_core.render_obs(RGB_CFG, loop_maps, state)).astype(int)
    yellow = (img[..., 0] > 150) & (img[..., 1] > 120) & (img[..., 2] < 90)
    assert yellow.sum() > 20, "duckie spheres should cover many pixels"

    # with objects disabled the yellow blob must disappear
    cfg2 = EnvConfig(obs_type="rgb", camera_width=64, camera_height=64,
                     auto_reset=False, render_objects=False)
    img2 = np.asarray(env_core.render_obs(cfg2, loop_maps, state)).astype(int)
    yellow2 = (img2[..., 0] > 150) & (img2[..., 1] > 120) & (img2[..., 2] < 90)
    assert yellow2.sum() < yellow.sum() // 2


def test_lane_markings_visible(loop_maps):
    ts = float(loop_maps.tile_size)
    # on the straight road tile (2, 0), looking along the lane (+x)
    state = _state_at(RGB_CFG, loop_maps, [2.0 * ts, 0.0, 0.66 * ts], 0.0)
    img = np.asarray(env_core.render_obs(RGB_CFG, loop_maps, state)).astype(int)
    # white edge line pixels: all channels bright
    white = (img > 150).all(axis=-1)
    yellowish = (img[..., 0] > 120) & (img[..., 1] > 90) & (img[..., 2] < 80)
    assert white.sum() + yellowish.sum() > 10


def test_grayscale_mode(loop_maps):
    cfg = EnvConfig(obs_type="rgb", camera_width=64, camera_height=64,
                    grayscale=True, auto_reset=False)
    state = env_core.reset(cfg, loop_maps, jax.random.PRNGKey(0))
    img = np.asarray(env_core.render_obs(cfg, loop_maps, state))
    assert img.shape == (64, 64, 1)


def test_distortion_warps_but_preserves_center():
    cfg = EnvConfig(obs_type="rgb", camera_width=64, camera_height=64,
                    distortion=True, auto_reset=False)
    cfg0 = EnvConfig(obs_type="rgb", camera_width=64, camera_height=64,
                     distortion=False, auto_reset=False)
    maps = map_loader.load_map("small_loop")
    state = env_core.reset(cfg, maps, jax.random.PRNGKey(1))
    img_d = np.asarray(env_core.render_obs(cfg, maps, state)).astype(int)
    img_0 = np.asarray(env_core.render_obs(cfg0, maps, state)).astype(int)
    # distortion changes the image but keeps the center nearly fixed
    assert np.abs(img_d - img_0).mean() > 1.0
    c = slice(30, 34)
    assert np.abs(img_d[c, c] - img_0[c, c]).mean() < 10.0


def test_domain_rand_changes_pixels():
    maps = map_loader.load_map("small_loop")
    cfg = EnvConfig(obs_type="rgb", camera_width=64, camera_height=64,
                    domain_rand=True, auto_reset=False)
    s1 = env_core.reset(cfg, maps, jax.random.PRNGKey(0))
    s2 = env_core.reset(cfg, maps, jax.random.PRNGKey(9))
    # same pose, different randomization draws
    s2 = s2.replace(pos=s1.pos, angle=s1.angle)
    i1 = np.asarray(env_core.render_obs(cfg, maps, s1)).astype(int)
    i2 = np.asarray(env_core.render_obs(cfg, maps, s2)).astype(int)
    assert np.abs(i1 - i2).mean() > 1.0


def test_rgb_step_end_to_end(loop_maps):
    cfg = EnvConfig(obs_type="rgb", camera_width=64, camera_height=64)
    v_reset, v_step = env_core.make_vec_env(cfg, loop_maps, 4)
    states = v_reset(jax.random.PRNGKey(0))
    states, outs = v_step(states, jnp.tile(jnp.array([0.3, 0.0]), (4, 1)))
    assert outs.obs.shape == (4, 64, 64, 3)
    assert outs.obs.dtype == jnp.uint8

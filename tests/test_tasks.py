"""Vectorized Nav task (dtown/tasks.py) — the TPU-native counterpart of
gym_compat.DuckietownNav (reference: envs/duckietown_env.py)."""
import numpy as np

import jax
import jax.numpy as jnp

from dtown import map_loader, tasks
from dtown.types import EnvConfig


def test_nav_goal_on_drivable_tiles():
    cfg = EnvConfig(obs_type="state")
    maps = map_loader.load_map("udem1")
    v_reset, _ = tasks.make_nav_vec(cfg, maps, 64)
    ns = v_reset(jax.random.PRNGKey(0))
    driv = np.asarray(maps.drivable)
    gi = np.asarray(ns.goal[:, 0])
    gj = np.asarray(ns.goal[:, 1])
    assert driv[gj, gi].all()
    # goals are spread, not a single tile
    assert len({(int(i), int(j)) for i, j in zip(gi, gj)}) > 4


def test_nav_goal_reached_bonus_and_redraw():
    """Teleport the agent's env-state onto its goal tile: the next step
    must add GOAL_REWARD, set done, and redraw the goal in-graph."""
    cfg = EnvConfig(obs_type="state")
    maps = map_loader.load_map("small_loop")
    v_reset, v_step = tasks.make_nav_vec(cfg, maps, 8)
    ns = v_reset(jax.random.PRNGKey(1))

    ts = float(maps.tile_size)
    # place every env at the center of its goal tile, heading anywhere
    gx = (ns.goal[:, 0].astype(jnp.float32) + 0.5) * ts
    gz = (ns.goal[:, 1].astype(jnp.float32) + 0.5) * ts
    pos = jnp.stack([gx, jnp.zeros_like(gx), gz], axis=-1)
    ns = ns._replace(env=ns.env.replace(pos=pos))

    ns2, out = v_step(ns, jnp.zeros((8, 2), jnp.float32))
    # standing on the goal tile with ~zero motion: no crash, goal scored
    reached = np.asarray(out.reward) > tasks.GOAL_REWARD - 100.0
    assert reached.sum() >= 6  # a spawn clipping a tile edge may miss
    assert np.asarray(out.done)[reached].all()
    # redrawn goals differ for at least some reached envs
    moved = (np.asarray(ns2.goal) != np.asarray(ns.goal)).any(axis=-1)
    assert moved[reached].sum() >= 1


def test_nav_plain_step_matches_base_env_reward():
    """Away from the goal, Nav rewards equal the base env's rewards."""
    from dtown import env as env_core

    cfg = EnvConfig(obs_type="state")
    maps = map_loader.load_map("straight_road")
    v_reset, v_step = tasks.make_nav_vec(cfg, maps, 4)
    ns = v_reset(jax.random.PRNGKey(2))
    # park the goals far outside the agent's next-step tile
    ns = ns._replace(goal=jnp.full_like(ns.goal, 99))

    act = jnp.tile(jnp.array([[0.3, 0.0]], jnp.float32), (4, 1))
    base_states = ns.env
    _, out_nav = v_step(ns, act)
    _, out_base, _ = jax.vmap(
        lambda s, a: env_core.step_physics(cfg, maps, s, a)
    )(base_states, act)
    # jit boundaries differ (composite nav graph vs bare vmap), so XLA
    # fusion order differs: allow f32 ulp-level noise
    np.testing.assert_allclose(
        np.asarray(out_nav.reward), np.asarray(out_base.reward), atol=1e-4
    )


def test_nav_rgb_pallas_obs_path():
    """RGB Nav uses the same batched renderer selection as step_batch
    (fused Pallas kernel when cfg picks it)."""
    cfg = EnvConfig(obs_type="rgb", camera_width=32, camera_height=32,
                    renderer="pallas")
    maps = map_loader.load_map("small_loop")
    v_reset, v_step = tasks.make_nav_vec(cfg, maps, 8)
    ns = v_reset(jax.random.PRNGKey(0))
    ns, out = v_step(ns, jnp.zeros((8, 2), jnp.float32))
    assert out.obs.shape == (8, 32, 32, 3) and out.obs.dtype == jnp.uint8
    assert int(jnp.std(out.obs.astype(jnp.float32))) > 5


def test_nav_rgb_goal_in_obs_tuple():
    """Camera obs + goal_in_obs (r4): the XLA vec path returns
    (image, goal_vec) tuples matching the fused path's contract."""
    cfg = EnvConfig(obs_type="rgb", camera_width=32, camera_height=32,
                    renderer="pallas")
    maps = map_loader.load_map("small_loop")
    v_reset, v_step = tasks.make_nav_vec(cfg, maps, 8, goal_in_obs=True)
    ns = v_reset(jax.random.PRNGKey(2))
    ns, out = v_step(ns, jnp.zeros((8, 2), jnp.float32))
    img, feats = out.obs
    assert img.shape == (8, 32, 32, 3) and img.dtype == jnp.uint8
    assert feats.shape == (8, 3)
    ts = float(maps.tile_size)
    gx = (np.asarray(ns.goal[:, 0]) + 0.5) * ts
    gz = (np.asarray(ns.goal[:, 1]) + 0.5) * ts
    pos = np.asarray(ns.env.pos)
    d = np.hypot(gx - pos[:, 0], gz - pos[:, 2])
    np.testing.assert_allclose(np.asarray(feats[:, 2]), d, rtol=1e-4)


def test_nav_shaping_dense_signal():
    """nav_shaping_coef adds coef*(d_prev - d_next) every live step:
    driving straight toward/away from the goal must move the reward by
    the signed distance delta."""
    cfg = EnvConfig(obs_type="state", nav_shaping_coef=10.0,
                    auto_reset=False)
    cfg0 = EnvConfig(obs_type="state", auto_reset=False)
    maps = map_loader.load_map("straight_road")
    from dtown import env as env_core
    st = env_core.reset(cfg, maps, jax.random.PRNGKey(0))
    ns = tasks.NavState(env=st, goal=jnp.array([4, 0], jnp.int32),
                        rng=jax.random.PRNGKey(1))
    act = jnp.array([0.6, 0.0], jnp.float32)
    ns1, out_s = tasks.nav_step(cfg, maps, ns, act)
    _, out_0 = tasks.nav_step(cfg0, maps, ns, act)
    ts = float(maps.tile_size)
    gx = (4 + 0.5) * ts
    gz = 0.5 * ts
    d0 = float(jnp.hypot(gx - ns.env.pos[0], gz - ns.env.pos[2]))
    d1 = float(jnp.hypot(gx - ns1.env.pos[0], gz - ns1.env.pos[2]))
    expect = 10.0 * (d0 - d1)
    np.testing.assert_allclose(
        float(out_s.reward) - float(out_0.reward), expect, atol=1e-4)


def test_nav_goal_in_obs():
    """goal_in_obs appends the agent-frame goal offset; the forward
    component must be positive when the goal lies ahead and the distance
    must match |goal_center - pos|."""
    cfg = EnvConfig(obs_type="state")
    maps = map_loader.load_map("small_loop")
    v_reset, v_step = tasks.make_nav_vec(cfg, maps, 8, goal_in_obs=True)
    ns = v_reset(jax.random.PRNGKey(0))
    ns, out = v_step(ns, jnp.zeros((8, 2), jnp.float32))
    assert out.obs.shape == (8, 14)  # 11 state + 3 goal features
    ts = float(maps.tile_size)
    gx = (np.asarray(ns.goal[:, 0]) + 0.5) * ts
    gz = (np.asarray(ns.goal[:, 1]) + 0.5) * ts
    pos = np.asarray(ns.env.pos)
    d = np.hypot(gx - pos[:, 0], gz - pos[:, 2])
    np.testing.assert_allclose(np.asarray(out.obs[:, 13]), d, rtol=1e-4)
    fwd = np.asarray(out.obs[:, 11])
    right = np.asarray(out.obs[:, 12])
    np.testing.assert_allclose(np.hypot(fwd, right), d, rtol=1e-4)

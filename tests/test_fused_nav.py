"""Nav task on the fused kernel path (ops/fused_env.make_fused_nav_rollout):
goal rows in the blob, in-kernel bonus/done/redraw. Interpret mode (CPU)."""
import numpy as np

import jax
import jax.numpy as jnp

from dtown import map_loader
from dtown.ops import fused_env, state_kernel as sk
from dtown.types import EnvConfig


def _mk(map_name="small_loop", envs=16, **kw):
    cfg = EnvConfig(obs_type="state", **kw)
    maps = (map_loader.stack_maps(list(map_name))
            if isinstance(map_name, (list, tuple))
            else map_loader.load_map(map_name))
    return cfg, maps


def _set_goals(blob, maps, goals):
    npcs = sk.moving_npcs(maps)
    nvb = sk.nav_base(len(npcs), False)
    blob = blob.at[nvb + sk.NAV_GI].set(goals[:, 0].astype(jnp.float32))
    blob = blob.at[nvb + sk.NAV_GJ].set(goals[:, 1].astype(jnp.float32))
    return blob


def test_fused_nav_matches_plain_away_from_goal():
    """Goal parked off-map: nav rewards/dones equal the plain fused path
    bit-for-bit (the nav sections only add the reached branch)."""
    cfg, maps = _mk()
    init_nav, step_nav = fused_env.make_fused_nav_rollout(cfg, maps, 16)
    init_plain, step_plain, _ = fused_env.make_fused_rollout(cfg, maps, 16)
    blob_nav, states = init_nav(jax.random.PRNGKey(0))
    blob_nav = _set_goals(blob_nav, maps, jnp.full((16, 2), 99))
    blob_plain = fused_env.pack_blob(states, maps, False)
    tmpl = fused_env.template_states(cfg, maps, 16)
    act = jnp.tile(jnp.array([[0.5, 0.1]], jnp.float32), (16, 1))
    for _ in range(5):
        blob_nav, out_n, _ = step_nav(blob_nav, tmpl, act)
        blob_plain, out_p, _ = step_plain(blob_plain, tmpl, act)
        np.testing.assert_array_equal(np.asarray(out_n.reward),
                                      np.asarray(out_p.reward))
        np.testing.assert_array_equal(np.asarray(out_n.done),
                                      np.asarray(out_p.done))


def test_fused_nav_goal_reached_bonus_done_respawn_redraw():
    cfg, maps = _mk()
    init_nav, step_nav = fused_env.make_fused_nav_rollout(cfg, maps, 16)
    init_plain, step_plain, _ = fused_env.make_fused_rollout(cfg, maps, 16)
    blob, states = init_nav(jax.random.PRNGKey(1))
    tmpl = fused_env.template_states(cfg, maps, 16)
    ts = float(maps.tile_size)
    # goal := the tile each env currently stands on; a zero action keeps
    # it there through the step
    gi = np.floor(np.asarray(states.pos[:, 0]) / ts)
    gj = np.floor(np.asarray(states.pos[:, 2]) / ts)
    goals = jnp.asarray(np.stack([gi, gj], axis=1))
    blob_nav = _set_goals(blob, maps, goals)
    blob_plain = fused_env.pack_blob(states, maps, False)
    act = jnp.zeros((16, 2), jnp.float32)
    nb, out_n, _ = step_nav(blob_nav, tmpl, act)
    _, out_p, _ = step_plain(blob_plain, tmpl, act)
    r_n, r_p = np.asarray(out_n.reward), np.asarray(out_p.reward)
    np.testing.assert_allclose(r_n, r_p + 500.0, rtol=1e-6)
    assert np.asarray(out_n.done).all()
    assert not np.asarray(out_p.done).any()
    # respawned: post-reset pose differs for most envs (bank poses)
    moved = (np.abs(np.asarray(nb[sk.F_POS_X]) -
                    np.asarray(blob_nav[sk.F_POS_X])) > 1e-6)
    assert moved.sum() >= 12
    # goals redrawn onto drivable tiles
    nvb = sk.nav_base(0, False)
    g2i = np.asarray(nb[nvb + sk.NAV_GI]).astype(int)
    g2j = np.asarray(nb[nvb + sk.NAV_GJ]).astype(int)
    driv = np.asarray(maps.drivable)
    assert driv[g2j, g2i].all()
    # and dispersed (hash PRNG decorrelates envs)
    assert len(set(zip(g2i.tolist(), g2j.tolist()))) > 3


def test_fused_nav_multimap_goal_segments():
    """On a 2-map stack, redrawn goals are drivable on the env's OWN map."""
    cfg, maps = _mk(("small_loop", "zigzag_dists"))
    init_nav, step_nav = fused_env.make_fused_nav_rollout(cfg, maps, 16)
    blob, states = init_nav(jax.random.PRNGKey(2))
    tmpl = fused_env.template_states(cfg, maps, 16)
    ts = float(np.asarray(maps.tile_size).reshape(-1)[0])
    gi = np.floor(np.asarray(states.pos[:, 0]) / ts)
    gj = np.floor(np.asarray(states.pos[:, 2]) / ts)
    blob = _set_goals(blob, maps, jnp.asarray(np.stack([gi, gj], 1)))
    nb, out, _ = step_nav(blob, tmpl, jnp.zeros((16, 2), jnp.float32))
    assert np.asarray(out.done).all()
    npcs = sk.moving_npcs(maps)
    nvb = sk.nav_base(len(npcs), False)
    g2i = np.asarray(nb[nvb + sk.NAV_GI]).astype(int)
    g2j = np.asarray(nb[nvb + sk.NAV_GJ]).astype(int)
    mi = np.asarray(states.map_idx)
    driv = np.asarray(maps.drivable)  # [n_maps, H, W]
    assert driv[mi, g2j, g2i].all()


def test_fused_nav_goal_in_obs_matches_xla():
    """goal_in_obs appends tasks.goal_features, computed from the blob:
    must match the XLA goal_features on the unpacked states exactly."""
    from dtown.tasks import NavState, goal_features

    cfg, maps = _mk()
    init_nav, step_nav = fused_env.make_fused_nav_rollout(
        cfg, maps, 16, goal_in_obs=True
    )
    blob, states = init_nav(jax.random.PRNGKey(4))
    tmpl = fused_env.template_states(cfg, maps, 16)
    act = jnp.tile(jnp.array([[0.4, 0.1]], jnp.float32), (16, 1))
    blob2, out, obs = step_nav(blob, tmpl, act)
    assert obs.shape == (16, 14)  # 11 state features + (fwd, right, dist)

    st = fused_env.update_states_from_blob(tmpl, blob2, maps, False)
    nvb = sk.nav_base(len(sk.moving_npcs(maps)), False)
    goals = jnp.stack(
        [blob2[nvb + sk.NAV_GI], blob2[nvb + sk.NAV_GJ]], axis=-1
    ).astype(jnp.int32)
    ns = NavState(env=st, goal=goals, rng=jax.random.split(
        jax.random.PRNGKey(0), 16))
    feats = jax.vmap(lambda n: goal_features(maps, n))(ns)
    np.testing.assert_allclose(np.asarray(obs[:, 11:]),
                               np.asarray(feats), rtol=1e-5, atol=1e-5)
    # nonzero / finite: the features are live, not padding
    assert np.abs(np.asarray(feats)).max() > 0.1


def test_fused_nav_goal_in_obs_rgb_tuple():
    """Camera-obs goal conditioning (r4): fused_step returns a
    (planes, goal_vec) tuple and the goal features match the blob."""
    cfg = EnvConfig(obs_type="rgb", camera_width=64, camera_height=64)
    maps = map_loader.load_map("small_loop")
    init_nav, step_nav = fused_env.make_fused_nav_rollout(
        cfg, maps, 8, goal_in_obs=True)
    blob, states = init_nav(jax.random.PRNGKey(5))
    tmpl = fused_env.template_states(cfg, maps, 8)
    act = jnp.tile(jnp.array([[0.4, 0.1]], jnp.float32), (8, 1))
    blob2, out, obs = step_nav(blob, tmpl, act)
    assert isinstance(obs, tuple) and len(obs) == 2
    planes, feats = obs
    assert planes.shape == (8, 3, 64 * 64 // 128, 128)
    assert planes.dtype == jnp.uint8
    assert feats.shape == (8, 3)
    ref = jnp.stack(
        fused_env.nav_goal_features_from_blob(cfg, maps, blob2), axis=-1)
    np.testing.assert_array_equal(np.asarray(feats), np.asarray(ref))


def test_nav_shaping_parity_fused_vs_xla():
    """nav_shaping_coef (EXTENSION): the in-kernel potential-based term
    must match tasks.nav_step's to fp tolerance, and shaping toward the
    goal must be positive when driving at it."""
    from dtown.tasks import NavState, nav_step

    cfg, maps = _mk(nav_shaping_coef=2.0)
    init_nav, step_nav = fused_env.make_fused_nav_rollout(cfg, maps, 16)
    blob, states = init_nav(jax.random.PRNGKey(6))
    goals = jnp.tile(jnp.array([[2, 0]], jnp.int32), (16, 1))
    blob = _set_goals(blob, maps, goals)
    tmpl = fused_env.template_states(cfg, maps, 16)
    act = jnp.tile(jnp.array([[0.5, 0.0]], jnp.float32), (16, 1))
    blob2, out_f, _ = step_nav(blob, tmpl, act)

    base_cfg_na = EnvConfig(obs_type="state", nav_shaping_coef=2.0,
                            auto_reset=False)
    ns = NavState(env=states, goal=goals,
                  rng=jax.random.split(jax.random.PRNGKey(0), 16))
    ns2, out_x = jax.vmap(
        lambda s, a: nav_step(base_cfg_na, maps, s, a))(ns, act)
    np.testing.assert_allclose(np.asarray(out_f.reward),
                               np.asarray(out_x.reward),
                               rtol=1e-4, atol=1e-4)
    # shaping differs from the unshaped reward on at least some envs
    cfg0, _ = _mk()
    init0, step0 = fused_env.make_fused_nav_rollout(cfg0, maps, 16)
    blob0, _ = init0(jax.random.PRNGKey(6))
    blob0 = _set_goals(blob0, maps, goals)
    _, out_0, _ = step0(blob0, tmpl, act)
    assert np.abs(np.asarray(out_f.reward)
                  - np.asarray(out_0.reward)).max() > 1e-4


def test_fused_nav_ppo_rgb_goal_conditioned_trains():
    """Goal-conditioned CAMERA Nav PPO (r4): tuple obs threads through
    rollout storage, minibatching and the conv trunk's vector
    side-channel; one train step produces finite metrics."""
    from dtown.learn.ppo import PPOConfig, make_ppo

    cfg = EnvConfig(obs_type="rgb", camera_width=64, camera_height=64)
    maps = map_loader.load_map("small_loop")
    init, train = make_ppo(cfg, maps, 8,
                           PPOConfig(rollout_len=2, epochs=1,
                                     minibatches=2),
                           fused=True, nav=True, goal_in_obs=True)
    ts = init(jax.random.PRNGKey(0))
    img0, feat0 = ts.env_states[1]
    assert img0.shape == (8, 64, 64, 3) and feat0.shape == (8, 3)
    ts, metrics = jax.jit(lambda t: train(t))(ts)
    assert all(np.isfinite(float(v)) for v in metrics.values())


def test_fused_nav_ppo_goal_conditioned_trains():
    """make_ppo(fused=True, nav=True, goal_in_obs=True): the learnable
    Nav form at kernel speed — obs0 matches rollout obs (14-dim) and a
    train step produces finite metrics."""
    from dtown.learn.ppo import PPOConfig, make_ppo

    cfg, maps = _mk()
    init, train = make_ppo(cfg, maps, 16,
                           PPOConfig(rollout_len=4, epochs=1,
                                     minibatches=2),
                           fused=True, nav=True, goal_in_obs=True)
    ts = init(jax.random.PRNGKey(0))
    assert ts.env_states[1].shape == (16, 14)
    ts, metrics = jax.jit(lambda t: train(t))(ts)
    assert all(np.isfinite(float(v)) for v in metrics.values())


def test_fused_nav_rollout_scan_runs():
    cfg, maps = _mk()
    init_nav, step_nav = fused_env.make_fused_nav_rollout(cfg, maps, 8)
    blob, _ = init_nav(jax.random.PRNGKey(3))
    tmpl = fused_env.template_states(cfg, maps, 8)
    act = jnp.tile(jnp.array([[0.5, 0.0]], jnp.float32), (8, 1))

    @jax.jit
    def run(b):
        def body(b, _):
            b, out, obs = step_nav(b, tmpl, act)
            return b, (out.reward.sum(), obs.sum())
        return jax.lax.scan(body, b, None, length=10)

    b2, (rs, os) = run(blob)
    assert np.isfinite(np.asarray(rs)).all()
    assert np.isfinite(np.asarray(os)).all()

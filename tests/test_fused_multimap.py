"""Fused kernel path over stacked multimaps (BASELINE config 5).

Envs carry a per-map index in the blob (F_MAPID); every kernel lookup
(tile words, curve tables, objects, spawn bank) is offset into that
map's table segment. Fused results must match the XLA multimap path
(select_map gather) env for env.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dtown import env as env_core, map_loader
from dtown.ops import state_kernel as sk
from dtown.ops.fused_env import make_fused_rollout, pack_blob
from dtown.types import EnvConfig

MAPS = ["zigzag_dists", "4way", "small_loop"]


def test_fused_multimap_state_matches_xla():
    cfg = EnvConfig(obs_type="state", auto_reset=True)
    maps = map_loader.stack_maps(MAPS)
    B = 48  # 16 envs per map
    init_blob, fused_step, rollout = make_fused_rollout(cfg, maps, B)
    blob, states = init_blob(jax.random.PRNGKey(0))
    # envs round-robin over the stacked maps
    np.testing.assert_array_equal(
        np.asarray(blob[sk.F_MAPID]).astype(int), np.arange(B) % 3
    )
    actions = jnp.tile(jnp.array([0.4, 0.1], jnp.float32), (B, 1))
    xs, b = states, blob
    alive = np.ones(B, bool)
    f_step = jax.jit(lambda b, a: fused_step(b, states, a))
    x_step = jax.jit(lambda s, a: env_core.step_batch(cfg, maps, s, a))
    for _ in range(4):
        b, out_f, obs_f = f_step(b, actions)
        xs, out_x = x_step(xs, actions)
        alive &= ~np.asarray(out_x.done)
        np.testing.assert_array_equal(
            np.asarray(out_f.done), np.asarray(out_x.done)
        )
    pos_f = np.stack([np.asarray(b[sk.F_POS_X]),
                      np.asarray(b[sk.F_POS_Z])], -1)
    pos_x = np.asarray(xs.pos)[:, [0, 2]]
    assert np.abs(pos_f - pos_x)[alive].max() < 1e-5
    np.testing.assert_allclose(
        np.asarray(out_f.reward)[alive], np.asarray(out_x.reward)[alive],
        atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out_f.lane_dist)[alive],
        np.asarray(out_x.lane_dist)[alive], atol=1e-5,
    )


@pytest.mark.parametrize(
    "stack",
    [
        MAPS,
        # tall-object stack: udem1's buildings/trees overlap the other
        # maps' world coordinates ABOVE the horizon — regression for the
        # finite t-scale fold that bled cross-map objects into sky rows
        ["zigzag_dists", "4way", "udem1"],
    ],
    ids=["short_objs", "tall_objs"],
)
def test_fused_multimap_rgb_matches_xla(stack):
    from dtown.render.blob_raster import (
        build_render_plan, render_frames_from_blob,
    )
    from dtown.render.pallas_raster import planes_to_nhwc

    cfg = EnvConfig(obs_type="rgb", camera_width=64, camera_height=64,
                    auto_reset=False)
    maps = map_loader.stack_maps(stack)
    plan = build_render_plan(cfg, maps)
    assert plan is not None and plan["multi"]["n_maps"] == 3
    B = 8
    keys = jax.random.split(jax.random.PRNGKey(1), B)
    idx = jnp.arange(B, dtype=jnp.int32) % 3
    states = jax.vmap(lambda k, i: env_core.reset(cfg, maps, k, i))(
        keys, idx
    )
    blob = pack_blob(states, maps)
    planes = render_frames_from_blob(cfg, maps, blob, plan, interpret=True)
    img_b = np.asarray(planes_to_nhwc(cfg, planes)).astype(int)
    img_x = np.asarray(
        jax.vmap(lambda s: env_core.render_obs(cfg, maps, s))(states)
    ).astype(int)
    diff = np.abs(img_b - img_x)
    assert diff.mean() < 2.0, diff.mean()
    assert (diff > 10).mean() < 0.03
    # envs on different maps must actually see different worlds
    assert np.abs(img_x[0].astype(int) - img_x[1].astype(int)).mean() > 2.0


def test_fused_multimap_autoreset_stays_on_map():
    cfg = EnvConfig(obs_type="state", auto_reset=True, max_steps=4)
    maps = map_loader.stack_maps(MAPS)
    B = 24
    init_blob, fused_step, rollout = make_fused_rollout(cfg, maps, B)
    blob, states = init_blob(jax.random.PRNGKey(2))
    actions = jnp.zeros((B, 2), jnp.float32)
    f = jax.jit(lambda b, a: fused_step(b, states, a))
    for _ in range(6):  # every env truncates at least once
        blob, out, obs = f(blob, actions)
    # map assignment is sticky across auto-resets (vectorized curriculum)
    np.testing.assert_array_equal(
        np.asarray(blob[sk.F_MAPID]).astype(int), np.arange(B) % 3
    )
    # and every respawn landed on a drivable tile of ITS map
    ts = float(np.asarray(maps.tile_size)[0])
    driv = np.asarray(maps.drivable)
    for e in range(B):
        i = int(np.asarray(blob[sk.F_POS_X])[e] // ts)
        j = int(np.asarray(blob[sk.F_POS_Z])[e] // ts)
        assert driv[e % 3, j, i], (e, i, j)


def test_fused_multimap_npc_matches_xla():
    """Moving NPCs inside a stack: fused state kernel advances each
    map's duckies and matches the XLA multimap path env for env."""
    cfg = EnvConfig(obs_type="state", auto_reset=True)
    maps = map_loader.stack_maps(["loop_pedestrians", "small_loop"])
    npcs = sk.moving_npcs(maps)
    assert len(npcs) == 3 and all(n["map"] == 0 for n in npcs)
    B = 16
    init_blob, fused_step, rollout = make_fused_rollout(cfg, maps, B)
    blob, states = init_blob(jax.random.PRNGKey(3))
    npc_x0 = np.asarray(blob[sk.F_NPC_BASE]).copy()
    npc_z0 = np.asarray(blob[sk.F_NPC_BASE + 1]).copy()
    actions = jnp.tile(jnp.array([0.3, 0.05], jnp.float32), (B, 1))
    f_step = jax.jit(lambda b, a: fused_step(b, states, a))
    x_step = jax.jit(lambda s, a: env_core.step_batch(cfg, maps, s, a))
    xs, b = states, blob
    alive = np.ones(B, bool)
    for _ in range(6):
        b, out_f, obs_f = f_step(b, actions)
        xs, out_x = x_step(xs, actions)
        alive &= ~np.asarray(out_x.done)
        np.testing.assert_array_equal(
            np.asarray(out_f.done)[alive], np.asarray(out_x.done)[alive]
        )
    # duckies actually walked on the pedestrian-map envs (duckie 0 walks
    # along z — rotate 90 — so test both coordinates)
    on0 = (np.arange(B) % 2) == 0
    npc_x1 = np.asarray(b[sk.F_NPC_BASE])
    npc_z1 = np.asarray(b[sk.F_NPC_BASE + 1])
    moved = np.abs(npc_x1 - npc_x0) + np.abs(npc_z1 - npc_z0)
    assert (moved[on0] > 1e-5).any()
    # and the fused NPC poses match the XLA dyn state on those envs
    slot = npcs[0]["slot"]
    np.testing.assert_allclose(
        npc_x1[on0], np.asarray(xs.dyn.pos)[on0, slot, 0], atol=1e-4
    )
    np.testing.assert_allclose(
        npc_z1[on0], np.asarray(xs.dyn.pos)[on0, slot, 2], atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(b[sk.F_POS_X])[alive], np.asarray(xs.pos)[alive, 0],
        atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out_f.reward)[alive], np.asarray(out_x.reward)[alive],
        atol=1e-3,
    )


def test_fused_multimap_npc_rgb_matches_xla():
    from dtown.render.blob_raster import (
        build_render_plan, render_frames_from_blob,
    )
    from dtown.render.pallas_raster import planes_to_nhwc

    cfg = EnvConfig(obs_type="rgb", camera_width=64, camera_height=64,
                    auto_reset=False)
    maps = map_loader.stack_maps(["loop_pedestrians", "small_loop"])
    plan = build_render_plan(cfg, maps)
    assert plan is not None and plan["n_npc"] == 3
    B = 8
    keys = jax.random.split(jax.random.PRNGKey(5), B)
    idx = jnp.arange(B, dtype=jnp.int32) % 2
    states = jax.vmap(lambda k, i: env_core.reset(cfg, maps, k, i))(
        keys, idx
    )
    blob = pack_blob(states, maps)
    planes = render_frames_from_blob(cfg, maps, blob, plan, interpret=True)
    img_b = np.asarray(planes_to_nhwc(cfg, planes)).astype(int)
    img_x = np.asarray(
        jax.vmap(lambda s: env_core.render_obs(cfg, maps, s))(states)
    ).astype(int)
    diff = np.abs(img_b - img_x)
    assert diff.mean() < 2.0, diff.mean()
    assert (diff > 10).mean() < 0.03


def test_fused_multimap_domain_rand():
    """DR inside a stack: per-env DR rows render correctly and are
    redrawn in-kernel at auto-reset on the env's own map."""
    from dtown.render.blob_raster import (
        build_render_plan, render_frames_from_blob,
    )
    from dtown.render.pallas_raster import planes_to_nhwc

    cfg = EnvConfig(obs_type="rgb", camera_width=64, camera_height=64,
                    domain_rand=True, auto_reset=False)
    maps = map_loader.stack_maps(["small_loop", "loop_obstacles"])
    plan = build_render_plan(cfg, maps)
    assert plan is not None and plan["domain_rand"] and plan["multi"]
    B = 8
    keys = jax.random.split(jax.random.PRNGKey(7), B)
    idx = jnp.arange(B, dtype=jnp.int32) % 2
    states = jax.vmap(lambda k, i: env_core.reset(cfg, maps, k, i))(
        keys, idx
    )
    blob = pack_blob(states, maps, domain_rand=True)
    planes = render_frames_from_blob(cfg, maps, blob, plan, interpret=True)
    img_b = np.asarray(planes_to_nhwc(cfg, planes)).astype(int)
    img_x = np.asarray(
        jax.vmap(lambda s: env_core.render_obs(cfg, maps, s))(states)
    ).astype(int)
    diff = np.abs(img_b - img_x)
    assert diff.mean() < 2.0, diff.mean()

    # fused rollout with auto-reset redraws DR fields in range
    cfg2 = EnvConfig(obs_type="state", domain_rand=True, max_steps=4)
    init_blob, fused_step, rollout = make_fused_rollout(cfg2, maps, 16)
    b2, st2 = init_blob(jax.random.PRNGKey(8))
    drb = sk.dr_base(len(sk.moving_npcs(maps)))
    fov0 = np.asarray(b2[drb + sk.DR_FOV]).copy()
    f = jax.jit(lambda b, a: fused_step(b, st2, a))
    acts = jnp.zeros((16, 2), jnp.float32)
    for _ in range(6):
        b2, out, obs = f(b2, acts)
    from dtown import constants as C

    fov1 = np.asarray(b2[drb + sk.DR_FOV])
    assert (np.abs(fov1 - C.CAMERA_FOV_Y) <= 5.0 + 1e-5).all()
    assert (fov1 != fov0).any()
    # sticky map assignment survives DR auto-resets
    np.testing.assert_array_equal(
        np.asarray(b2[sk.F_MAPID]).astype(int), np.arange(16) % 2
    )


def test_obs_from_blob_rgb_on_stack():
    """REGRESSION (r2): obs_from_blob's rgb branch routed stacks through
    the row-fed renderer whose camera row chokes on the stacked (array)
    tile_size — fused RGB PPO on a multimap crashed at init. It must use
    the blob render plan (planes format), mirroring fused_step."""
    from dtown.ops.fused_env import obs_from_blob, template_states

    cfg = EnvConfig(obs_type="rgb", camera_width=64, camera_height=64)
    maps = map_loader.stack_maps(["small_loop", "4way"])
    B = 8
    init_blob, _, _ = make_fused_rollout(cfg, maps, B)
    blob, _ = init_blob(jax.random.PRNGKey(0))
    tmpl = template_states(cfg, maps, B)
    obs = obs_from_blob(cfg, maps, blob, tmpl)
    assert obs.shape == (B, 3, 64 * 64 // 128, 128)  # planes, not NHWC
    assert obs.dtype == jnp.uint8
    assert np.asarray(obs).std() > 5.0


def test_fused_rgb_ppo_guard_beyond_plan_budget():
    """Stacks beyond the blob-render budget fall back to an NHWC XLA
    renderer inside fused_step; fused RGB PPO must refuse them loudly
    instead of feeding mis-shaped frames to planes_to_nhwc."""
    from dtown.learn.ppo import PPOConfig, make_ppo

    cfg = EnvConfig(obs_type="rgb", camera_width=64, camera_height=64)
    maps = map_loader.stack_maps(["udem1"] * 4)  # >48 objs total
    with pytest.raises(NotImplementedError):
        make_ppo(cfg, maps, num_envs=8, ppo=PPOConfig(rollout_len=2),
                 fused=True)


def test_fused_ppo_on_stack():
    """BASELINE config 5 core: fused PPO trains on a stacked multimap
    (state obs) — finite losses, blob map assignment intact."""
    from dtown.learn.ppo import PPOConfig, make_ppo

    cfg = EnvConfig(obs_type="state")
    maps = map_loader.stack_maps(MAPS)
    init, train_step = make_ppo(cfg, maps, num_envs=24,
                                ppo=PPOConfig(rollout_len=8), fused=True)
    ts = init(jax.random.PRNGKey(0))
    step = jax.jit(lambda t: train_step(t))
    for _ in range(2):
        ts, metrics = step(ts)
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["mean_reward"]))
    blob, obs = ts.env_states
    np.testing.assert_array_equal(
        np.asarray(blob[sk.F_MAPID]).astype(int), np.arange(24) % 3
    )

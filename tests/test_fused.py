"""Fused Pallas state-step kernel vs the XLA reference step."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dtown import env as env_core, map_loader
from dtown.ops import state_kernel as sk
from dtown.ops.fused_env import make_fused_rollout, pack_blob
from dtown.types import EnvConfig


@pytest.mark.parametrize(
    "map_name",
    ["loop_obstacles", "small_loop", "loop_pedestrians",
     "loop_dyn_duckiebots"],
)
def test_fused_step_matches_xla(map_name):
    cfg = EnvConfig(obs_type="state", auto_reset=True)
    maps = map_loader.load_map(map_name)
    B = 128
    init_blob, fused_step, rollout = make_fused_rollout(cfg, maps, B)
    blob, states = init_blob(jax.random.PRNGKey(0))
    actions = jnp.tile(jnp.array([0.4, 0.1], jnp.float32), (B, 1))

    xs, b = states, blob
    alive = np.ones(B, bool)
    f_step = jax.jit(lambda b, a: fused_step(b, states, a))
    x_step = jax.jit(lambda s, a: env_core.step_batch(cfg, maps, s, a))
    for _ in range(4):
        b, out_f, obs_f = f_step(b, actions)
        xs, out_x = x_step(xs, actions)
        done_f = np.asarray(out_f.done)
        done_x = np.asarray(out_x.done)
        # identical done decisions on every env that has not auto-reset
        # yet — including scripted duckiebots: their XLA pursuit
        # (objects._pursuit_lane_query) and SAT axes mirror the kernel's
        # arithmetic op-for-op, so the two chained lane queries per
        # substep no longer drift (round 2 tolerated <=1% borderline SAT
        # flips here). Envs past their first reset are excluded: the two
        # paths draw fresh spawns from different PRNG streams by design
        # (kernel hash bank vs jax.random), so their later trajectories
        # legitimately differ.
        np.testing.assert_array_equal(done_f[alive], done_x[alive])
        alive &= ~done_x
        del done_f, done_x
    pos_f = np.stack(
        [np.asarray(b[sk.F_POS_X]), np.asarray(b[sk.F_POS_Z])], -1
    )
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
    # moving-NPC poses advanced in-kernel must track the XLA state
    # machines (duckie walk / duckiebot lane following, objects.py)
    for i, npc in enumerate(sk.moving_npcs(maps)):
        base = sk.F_NPC_BASE + sk.NPC_ROWS * i
        s = npc["slot"]
        np.testing.assert_allclose(
            np.asarray(b[base + 0])[alive],
            np.asarray(xs.dyn.pos)[alive, s, 0], atol=2e-5,
        )
        np.testing.assert_allclose(
            np.asarray(b[base + 1])[alive],
            np.asarray(xs.dyn.pos)[alive, s, 2], atol=2e-5,
        )
        np.testing.assert_allclose(
            np.asarray(b[base + 2])[alive],
            np.asarray(xs.dyn.angle)[alive, s], atol=2e-5,
        )


def test_fused_rollout_runs_and_resets():
    cfg = EnvConfig(obs_type="state", auto_reset=True, max_steps=6)
    maps = map_loader.load_map("small_loop")
    B = 64
    init_blob, fused_step, rollout = make_fused_rollout(cfg, maps, B)
    blob, states = init_blob(jax.random.PRNGKey(0))
    actions = jnp.zeros((B, 2), jnp.float32)
    blob, rsum, osum = rollout(blob, states, actions, 10)
    # after 10 steps with max_steps=6 every env has auto-reset at least once
    steps = np.asarray(blob[sk.F_STEP])
    assert (steps < 6.5).all()
    assert np.isfinite(np.asarray(rsum))


def test_fused_rgb_obs():
    cfg = EnvConfig(obs_type="rgb", camera_width=64, camera_height=64)
    maps = map_loader.load_map("loop_obstacles")
    B = 8
    init_blob, fused_step, rollout = make_fused_rollout(cfg, maps, B)
    blob, states = init_blob(jax.random.PRNGKey(0))
    actions = jnp.zeros((B, 2), jnp.float32)
    blob, out, obs = jax.jit(
        lambda b, a: fused_step(b, states, a)
    )(blob, actions)
    assert obs.shape[0] == B and obs.dtype == jnp.uint8
    assert np.asarray(obs).std() > 5.0

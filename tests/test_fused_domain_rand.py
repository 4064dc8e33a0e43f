"""Domain randomization on the fused kernel path.

The state kernel re-draws every randomization field at auto-reset with
the in-kernel hash PRNG (distribution-level parity with
randomization.draw), and the blob render kernel consumes the per-env DR
rows (camera intrinsics, lighting, colors, texture-variant seed,
optional-object visibility). Given IDENTICAL DR fields (packed from XLA
reset draws), the blob renderer must match the XLA renderer pixel-wise.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dtown import env as env_core, map_loader
from dtown.ops import state_kernel as sk
from dtown.ops.fused_env import make_fused_rollout, pack_blob
from dtown.render.blob_raster import (
    build_render_plan, render_frames_from_blob,
)
from dtown.render.pallas_raster import planes_to_nhwc
from dtown.types import EnvConfig


def _reset_batch(cfg, maps, n, seed=0):
    keys = jax.random.split(jax.random.PRNGKey(seed), n)
    idx = jnp.zeros((n,), jnp.int32)
    return jax.vmap(lambda k, i: env_core.reset(cfg, maps, k, i))(keys, idx)


def test_blob_render_domain_rand_matches_xla():
    cfg = EnvConfig(obs_type="rgb", camera_width=64, camera_height=64,
                    domain_rand=True, auto_reset=False)
    maps = map_loader.load_map("loop_obstacles")
    plan = build_render_plan(cfg, maps)
    assert plan is not None and plan["domain_rand"]
    states = _reset_batch(cfg, maps, 8, seed=4)
    blob = pack_blob(states, maps, domain_rand=True)
    planes = render_frames_from_blob(cfg, maps, blob, plan, interpret=True)
    img_b = np.asarray(planes_to_nhwc(cfg, planes)).astype(int)
    img_x = np.asarray(
        jax.vmap(lambda s: env_core.render_obs(cfg, maps, s))(states)
    ).astype(int)
    diff = np.abs(img_b - img_x)
    assert diff.mean() < 2.0, diff.mean()
    assert (diff > 10).mean() < 0.03
    # randomization must actually vary across envs
    assert np.asarray(states.cam_fov_y).std() > 0.5
    per_env = img_x.reshape(8, -1).mean(1)
    assert per_env.std() > 0.5


def test_fused_dr_redraw_at_reset():
    """Auto-reset re-draws DR fields in-kernel within reference ranges."""
    cfg = EnvConfig(obs_type="state", domain_rand=True, max_steps=4)
    maps = map_loader.load_map("small_loop")
    B = 64
    init_blob, fused_step, rollout = make_fused_rollout(cfg, maps, B)
    blob, states = init_blob(jax.random.PRNGKey(0))
    drb = sk.dr_base(0)
    fov0 = np.asarray(blob[drb + sk.DR_FOV]).copy()
    actions = jnp.zeros((B, 2), jnp.float32)
    f = jax.jit(lambda b, a: fused_step(b, states, a))
    for _ in range(6):  # max_steps=4 -> every env resets at least once
        blob, out, obs = f(blob, actions)
    fov1 = np.asarray(blob[drb + sk.DR_FOV])
    from dtown import constants as C

    assert (np.abs(fov1 - C.CAMERA_FOV_Y) <= 5.0 + 1e-5).all()
    assert (fov1 != fov0).any()  # redrawn
    rs = np.asarray(blob[sk.F_ROBOT_SPEED])
    assert (rs >= 0.9 * cfg.robot_speed - 1e-6).all()
    assert (rs <= 1.1 * cfg.robot_speed + 1e-6).all()
    assert np.std(rs) > 0.0  # per-env variation
    amb = np.asarray(blob[drb + sk.DR_AMB])
    assert (amb >= 0.35 - 1e-6).all() and (amb <= 0.7 + 1e-6).all()
    # light stays normalized
    l2 = (np.asarray(blob[drb + sk.DR_LX]) ** 2
          + np.asarray(blob[drb + sk.DR_LY]) ** 2
          + np.asarray(blob[drb + sk.DR_LZ]) ** 2)
    np.testing.assert_allclose(l2, 1.0, atol=1e-5)


def test_fused_dr_rollout_runs():
    cfg = EnvConfig(obs_type="rgb", camera_width=64, camera_height=64,
                    domain_rand=True, max_steps=8)
    maps = map_loader.load_map("loop_obstacles")
    B = 8
    init_blob, fused_step, rollout = make_fused_rollout(cfg, maps, B)
    blob, states = init_blob(jax.random.PRNGKey(1))
    actions = jnp.tile(jnp.array([0.3, 0.0], jnp.float32), (B, 1))
    blob, rsum, osum = rollout(blob, states, actions, 12)
    assert np.isfinite(np.asarray(rsum))

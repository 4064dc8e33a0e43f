"""Imitation learning pipeline (SURVEY §2.16: the fork's steering-
prediction scripts, rebuilt on-device): expert demos -> BC -> closed
loop."""
import numpy as np

import jax
import jax.numpy as jnp

from dtown import map_loader
from dtown.learn import imitation as im
from dtown.types import EnvConfig


def test_bc_state_obs_learns_and_survives():
    cfg = EnvConfig(obs_type="state")
    maps = map_loader.load_map("small_loop")
    key = jax.random.PRNGKey(0)
    k_demo, k_init, k_eval = jax.random.split(key, 3)
    obs, act = jax.jit(
        lambda k: im.collect_demos(cfg, maps, 64, 64, k)
    )(k_demo)
    assert obs.shape[:2] == (64, 64) and act.shape == (64, 64, 2)
    # expert actions are sane: forward velocity, bounded steering
    a = np.asarray(act)
    assert np.allclose(a[..., 0], im.EXPERT_VEL)
    assert np.abs(a[..., 1]).max() <= 1.0

    init, train_epoch, policy = im.make_bc(cfg, lr=1e-3, batch_size=512)
    bc = init(k_init, obs[0])
    epoch = jax.jit(train_epoch)
    losses = []
    for _ in range(6):
        bc, loss = epoch(bc, obs, act)
        losses.append(float(loss))
    assert losses[-1] < 0.3 * losses[0], losses

    surv, mean_r = jax.jit(
        lambda p, k: im.eval_closed_loop(cfg, maps, p, policy, 32, 100, k)
    )(bc.params, k_eval)
    # the expert law is linear in the state features; the clone must
    # keep (nearly) every env alive for 100 steps
    assert float(surv) > 0.9, float(surv)


def test_bc_rgb_pipeline_shapes():
    """RGB steering-prediction smoke: demos render camera frames, one
    BC epoch runs, policy maps frames -> actions."""
    cfg = EnvConfig(obs_type="rgb", camera_width=64, camera_height=64)
    maps = map_loader.load_map("small_loop")
    key = jax.random.PRNGKey(1)
    k_demo, k_init, _ = jax.random.split(key, 3)
    obs, act = jax.jit(
        lambda k: im.collect_demos(cfg, maps, 8, 4, k)
    )(k_demo)
    assert obs.shape == (4, 8, 64, 64, 3) and obs.dtype == jnp.uint8
    init, train_epoch, policy = im.make_bc(cfg, lr=1e-3, batch_size=16)
    bc = init(k_init, obs[0])
    bc, loss = jax.jit(train_epoch)(bc, obs, act)
    assert np.isfinite(float(loss))
    pred = policy(bc.params, obs[0])
    assert pred.shape == (8, 2)


def test_dagger_improves_or_matches_bc():
    """On-device DAgger: learner-driven states get expert labels and the
    aggregate retrain must not hurt closed-loop survival vs plain BC
    (state obs, tiny budget — a smoke-scale version of the PAPERS.md
    sim-to-real imitation pipeline)."""
    import jax

    from dtown import map_loader
    from dtown.learn import imitation as im
    from dtown.types import EnvConfig

    cfg = EnvConfig(obs_type="state")
    maps = map_loader.load_map("small_loop")
    params, policy, history = im.dagger_rounds(
        cfg, maps, num_envs=32, steps=40, key=jax.random.PRNGKey(0),
        rounds=2, epochs_per_round=3,
    )
    assert len(history) == 3
    assert all(np.isfinite(h) for h in history)
    surv, mean_r = im.eval_closed_loop(
        cfg, maps, params, policy, num_envs=32, steps=80,
        key=jax.random.PRNGKey(1),
    )
    # the lane-PD expert survives trivially on small_loop; the clone
    # after DAgger must keep most envs alive over 80 steps
    assert float(surv) > 0.7, float(surv)

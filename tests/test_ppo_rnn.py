"""Recurrent PPO (learn/ppo_rnn.py): LSTM policy, per-env carry,
sequential replay for the update."""
import numpy as np

import jax
import jax.numpy as jnp

from dtown import map_loader
from dtown.learn.ppo import PPOConfig
from dtown.learn.ppo_rnn import make_ppo_rnn
from dtown.types import EnvConfig


def test_rnn_replay_reproduces_rollout_logp():
    """With lr=0 (params never change) the sequential replay inside the
    update must reproduce the rollout's logp exactly: mean_ratio == 1.
    This pins the whole carry bookkeeping — rollout-start carry capture,
    done-gated resets, env-axis minibatch gathers."""
    cfg = EnvConfig(obs_type="state")
    maps = map_loader.load_map("loop_obstacles")  # dones occur -> resets
    ppo = PPOConfig(rollout_len=16, lr=0.0, epochs=2, minibatches=4)
    init, train = make_ppo_rnn(cfg, maps, 32, ppo)
    ts = init(jax.random.PRNGKey(0))
    ts, metrics = jax.jit(lambda t: train(t))(ts)
    assert float(metrics["done_frac"]) >= 0.0
    np.testing.assert_allclose(float(metrics["mean_ratio"]), 1.0,
                               atol=1e-5)


def test_rnn_train_step_rgb_finite():
    cfg = EnvConfig(obs_type="rgb", camera_width=32, camera_height=32,
                    renderer="pallas")
    maps = map_loader.load_map("small_loop")
    init, train = make_ppo_rnn(cfg, maps, 8,
                               PPOConfig(rollout_len=4, minibatches=2),
                               hidden=64)
    ts = init(jax.random.PRNGKey(0))
    ts, metrics = jax.jit(lambda t: train(t))(ts)
    assert all(np.isfinite(float(v)) for v in metrics.values())


def test_rnn_carry_resets_on_done():
    """A done step must zero that env's carry in the stored train state
    path (regression for forgetting _reset_carry in the rollout)."""
    from dtown.learn.ppo_rnn import _reset_carry

    c = (jnp.ones((4, 8)), 2.0 * jnp.ones((4, 8)))
    done = jnp.array([True, False, True, False])
    r = _reset_carry(c, done)
    assert np.asarray(r[0][0]).sum() == 0 and np.asarray(r[0][1]).sum() == 8
    assert np.asarray(r[1][2]).sum() == 0 and np.asarray(r[1][3]).sum() == 16


def test_rnn_sharded_train_step():
    """Recurrent PPO inside shard_map on the 8-device virtual mesh: the
    LSTM carry shards on the env axis, grads pmean, replay invariant
    (mean_ratio == 1 at lr=0) holds under sharding."""
    from dtown.parallel.shard import make_sharded_ppo

    cfg = EnvConfig(obs_type="state")
    maps = map_loader.load_map("small_loop")
    mesh, init, train = make_sharded_ppo(
        cfg, maps, 64, ppo=PPOConfig(rollout_len=8, minibatches=4, lr=0.0),
        rnn=True, rnn_hidden=32,
    )
    ts = init(jax.random.PRNGKey(0))
    assert "envs" in str(ts.carry[0].sharding)
    ts, metrics = train(ts)
    assert all(np.isfinite(float(v)) for v in metrics.values())
    np.testing.assert_allclose(float(metrics["mean_ratio"]), 1.0,
                               atol=1e-5)

"""Checkpoint/restore across different mesh sizes (VERDICT round-1 #8).

A training state saved from an 8-device mesh must restore and continue
training on a 4-device mesh (elastic restart after losing hosts —
SURVEY.md §5 failure-detection/checkpoint rows).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dtown import map_loader
from dtown.learn.ppo import PPOConfig, TrainState
from dtown.parallel.mesh import make_mesh
from dtown.parallel.shard import make_sharded_ppo
from dtown.types import EnvConfig
from dtown.utils import checkpoint


@pytest.mark.slow
def test_restore_onto_smaller_mesh(tmp_path):
    cfg = EnvConfig(obs_type="state")
    maps = map_loader.load_map("small_loop")
    ppo = PPOConfig(rollout_len=4, epochs=1, minibatches=2)
    num_envs = 16

    mesh8 = make_mesh(jax.devices()[:8])
    _, init8, step8 = make_sharded_ppo(cfg, maps, num_envs, ppo=ppo,
                                       mesh=mesh8)
    ts = init8(jax.random.PRNGKey(0))
    ts, m8 = step8(ts)
    jax.block_until_ready(m8)
    path = str(tmp_path / "ckpt")
    payload = {
        "params": ts.params, "opt_state": ts.opt_state,
        "env_states": ts.env_states, "key": ts.key,
    }
    checkpoint.save(path, payload)

    # fresh program on HALF the devices; same env count
    mesh4 = make_mesh(jax.devices()[:4])
    _, init4, step4 = make_sharded_ppo(cfg, maps, num_envs, ppo=ppo,
                                       mesh=mesh4)
    ts4 = init4(jax.random.PRNGKey(1))
    template = jax.device_get({
        "params": ts4.params, "opt_state": ts4.opt_state,
        "env_states": ts4.env_states, "key": ts4.key,
    })
    restored = checkpoint.restore(path, template)
    # restored params must be the mesh8-trained ones, not the fresh init
    p8 = jax.device_get(ts.params)
    for a, b in zip(jax.tree_util.tree_leaves(restored["params"]),
                    jax.tree_util.tree_leaves(p8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    ts4r = TrainState(restored["params"], restored["opt_state"],
                      restored["env_states"], jnp.asarray(restored["key"]))
    ts4r, m4 = step4(ts4r)
    jax.block_until_ready(m4)
    assert np.isfinite(float(m4["loss"]))
    assert np.isfinite(float(m4["mean_reward"]))
    # env state really lives on the 4-device mesh now
    devs = {s.device for s in ts4r.env_states.pos.addressable_shards}
    assert len(devs) == 4

"""Multi-device sharding tests on the 8-device virtual CPU mesh
(conftest sets xla_force_host_platform_device_count=8)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dtown import map_loader
from dtown.parallel.mesh import make_mesh
from dtown.parallel.shard import make_sharded_env, make_sharded_ppo
from dtown.types import EnvConfig


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_sharded_env_step():
    cfg = EnvConfig(obs_type="state")
    maps = map_loader.load_map("small_loop")
    mesh, s_reset, s_step = make_sharded_env(cfg, maps, 16)
    states = s_reset(jax.random.PRNGKey(0))
    actions = jnp.tile(jnp.array([0.3, 0.0], jnp.float32), (16, 1))
    states, outs = s_step(states, actions)
    assert outs.obs.shape == (16, 11)
    # state really is distributed over all 8 devices
    shard_devs = {s.device for s in states.pos.addressable_shards}
    assert len(shard_devs) == 8


def test_sharded_matches_single_device():
    """The sharded step must produce the same math as the local vmap."""
    from dtown import env as env_core

    cfg = EnvConfig(obs_type="state")
    maps = map_loader.load_map("small_loop")
    mesh, s_reset, s_step = make_sharded_env(cfg, maps, 8)
    states = s_reset(jax.random.PRNGKey(0))
    actions = jnp.tile(jnp.array([0.3, 0.1], jnp.float32), (8, 1))
    sh_states, sh_out = s_step(states, actions)

    local_states = jax.device_get(states)
    l_states, l_out = jax.jit(
        jax.vmap(lambda s, a: env_core.step(cfg, maps, s, a))
    )(jax.tree_util.tree_map(jnp.asarray, local_states), actions)
    np.testing.assert_allclose(
        np.asarray(sh_out.reward), np.asarray(l_out.reward), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(sh_states.pos), np.asarray(l_states.pos), rtol=1e-5
    )


@pytest.mark.slow
def test_sharded_ppo_train_step():
    from dtown.learn.ppo import PPOConfig

    cfg = EnvConfig(obs_type="rgb", camera_width=16, camera_height=16,
                    max_visible_objects=2)
    maps = map_loader.load_map("small_loop")
    mesh, s_init, s_train = make_sharded_ppo(
        cfg, maps, 16, ppo=PPOConfig(rollout_len=4, epochs=1, minibatches=2)
    )
    ts = s_init(jax.random.PRNGKey(0))
    ts, metrics = s_train(ts)
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["mean_reward"]))
    # params replicated: every device shard identical
    leaf = jax.tree_util.tree_leaves(ts.params)[0]
    shards = [np.asarray(s.data) for s in leaf.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)
    # a second step still works (state threading)
    ts, metrics2 = s_train(ts)
    assert np.isfinite(float(metrics2["loss"]))


@pytest.mark.slow
def test_graft_entry_dryrun():
    import importlib.util, pathlib

    spec = importlib.util.spec_from_file_location(
        "__graft_entry__", pathlib.Path(__file__).parent.parent / "__graft_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


@pytest.mark.slow
def test_graft_entry_single():
    import importlib.util, pathlib

    spec = importlib.util.spec_from_file_location(
        "__graft_entry__", pathlib.Path(__file__).parent.parent / "__graft_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, example_args = mod.entry()
    out = jax.jit(fn)(*example_args)
    jax.block_until_ready(out)


@pytest.mark.slow
def test_sharded_ppo_multimap_curriculum():
    """BASELINE config-5 shape: multi-map curriculum sharded over the
    mesh feeding the on-device PPO learner."""
    from dtown.learn.ppo import PPOConfig

    cfg = EnvConfig(obs_type="rgb", camera_width=16, camera_height=16,
                    max_visible_objects=2)
    maps = map_loader.stack_maps(["small_loop", "loop_empty"])
    mesh, s_init, s_train = make_sharded_ppo(
        cfg, maps, 16, ppo=PPOConfig(rollout_len=2, epochs=1, minibatches=2)
    )
    ts = s_init(jax.random.PRNGKey(0))
    ts, metrics = s_train(ts)
    assert np.isfinite(float(metrics["loss"]))
    # envs actually spread over both maps
    idx = np.asarray(ts.env_states.map_idx)
    assert set(idx) == {0, 1}


@pytest.mark.slow
def test_hierarchical_mesh_ppo_matches_flat():
    """A (hosts=2, chips=4) hierarchical mesh must train identically to
    the flat 8-device 'envs' mesh: the shard_index fold is row-major
    (matching the 1-D device order) so per-shard PRNG streams coincide;
    only collective reduction order may differ (float assoc)."""
    from dtown.learn.ppo import PPOConfig
    from dtown.parallel.mesh import make_mesh_hier

    cfg = EnvConfig(obs_type="state")
    maps = map_loader.load_map("small_loop")
    ppo = PPOConfig(rollout_len=8)

    mesh1, init1, step1 = make_sharded_ppo(cfg, maps, 32, ppo=ppo)
    mesh2 = make_mesh_hier(2)
    assert mesh2.axis_names == ("hosts", "chips")
    _, init2, step2 = make_sharded_ppo(cfg, maps, 32, ppo=ppo, mesh=mesh2)

    ts1 = init1(jax.random.PRNGKey(7))
    ts2 = init2(jax.random.PRNGKey(7))
    for _ in range(2):
        ts1, m1 = step1(ts1)
        ts2, m2 = step2(ts2)
    for k in m1:
        np.testing.assert_allclose(
            float(m1[k]), float(m2[k]), rtol=2e-4, atol=1e-5, err_msg=k
        )
    p1 = jax.tree_util.tree_leaves(ts1.params)
    p2 = jax.tree_util.tree_leaves(ts2.params)
    for a, b in zip(p1, p2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-5)


def test_hierarchical_mesh_fused_ppo_runs():
    """Fused (blob-carried) PPO on a (2, 4) hierarchical mesh: the blob
    env axis is dim 1, sharded over both mesh axes."""
    from dtown.learn.ppo import PPOConfig
    from dtown.parallel.mesh import make_mesh_hier

    cfg = EnvConfig(obs_type="state")
    maps = map_loader.load_map("small_loop")
    mesh = make_mesh_hier(2)
    _, init, step = make_sharded_ppo(
        cfg, maps, 64, ppo=PPOConfig(rollout_len=4), mesh=mesh, fused=True
    )
    ts = init(jax.random.PRNGKey(0))
    ts, metrics = step(ts)
    assert all(np.isfinite(float(v)) for v in metrics.values())

"""Sharded env stepping and PPO training over a device mesh.

Replaces the communication backend the reference never had (SURVEY.md §5
"Distributed communication backend"): env state lives sharded on the
'envs' mesh axis, the step is embarrassingly parallel (auto-reset
included — each shard resets its own envs), and the learner's gradients
are averaged with an in-graph pmean over the mesh, which XLA lowers to an
ICI all-reduce. Zero host round-trips in the loop.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
# jax>=0.8 stabilized jax.shard_map (check_rep renamed to check_vma);
# this env pins jax 0.9. The experimental alias (old kwarg) warned
# deprecated on every import and would break on the next jax upgrade.
from jax import shard_map

from dtown import env as env_core
from dtown.parallel.mesh import (
    ENVS_AXIS, env_axes, env_sharding, make_mesh, replicated,
)


def make_sharded_env(cfg, maps, num_envs: int, mesh=None):
    """(reset, step) jitted with explicit shardings over the mesh.

    num_envs must divide evenly over mesh devices.
    """
    mesh = mesh or make_mesh()
    n_dev = mesh.devices.size
    assert num_envs % n_dev == 0, (num_envs, n_dev)
    s_env = env_sharding(mesh)
    s_rep = replicated(mesh)

    @functools.partial(jax.jit, out_shardings=None)
    def sharded_reset(key):
        keys = jax.random.split(key, num_envs)
        if maps.tile_kind.ndim == 3:
            idx = jnp.arange(num_envs, dtype=jnp.int32) % maps.tile_kind.shape[0]
        else:
            idx = jnp.zeros((num_envs,), dtype=jnp.int32)
        states = jax.vmap(lambda k, i: env_core.reset(cfg, maps, k, i))(keys, idx)
        return jax.lax.with_sharding_constraint(
            states, jax.tree_util.tree_map(lambda _: s_env, states)
        )

    @jax.jit
    def sharded_step(states, actions):
        actions = jax.lax.with_sharding_constraint(actions, s_env)
        return jax.vmap(lambda s, a: env_core.step(cfg, maps, s, a))(
            states, actions
        )

    return mesh, sharded_reset, sharded_step


def make_sharded_ppo(cfg, maps, num_envs: int, ppo=None, mesh=None,
                     fused=False, rnn=False, rnn_hidden=128):
    """PPO train step partitioned with shard_map: env batch sharded over
    the full mesh, params replicated, grads pmean'd over the mesh axes.

    With a 1-D 'envs' mesh the grad all-reduce rides ICI; with a
    hierarchical (hosts, chips) mesh (mesh.make_mesh_hier) XLA lowers
    the pmean over both axes to an ICI reduce within each host and a DCN
    reduce across hosts.

    fused=True runs each shard's rollouts through the fused Pallas
    kernels (blob-carried env state; learn/ppo._make_ppo_fused).
    rnn=True shards the recurrent learner (learn/ppo_rnn): the per-env
    LSTM carry is sharded on the env axis alongside the env states."""
    from dtown.learn.ppo import PPOConfig, make_ppo

    mesh = mesh or make_mesh()
    axes = env_axes(mesh)
    n_dev = mesh.devices.size
    assert num_envs % n_dev == 0
    per_dev = num_envs // n_dev
    ppo = ppo or PPOConfig()

    if rnn:
        assert not fused, "rnn PPO uses the standard rollout path"
        return _make_sharded_ppo_rnn(cfg, maps, per_dev, ppo, mesh, axes,
                                     n_dev, rnn_hidden)
    init_local, train_step_local = make_ppo(cfg, maps, per_dev, ppo,
                                            fused=fused)

    def shard_index():
        """Flat shard id over all mesh axes (row-major, matching the
        1-D device order)."""
        idx = jax.lax.axis_index(axes[0])
        for a in axes[1:]:
            idx = idx * jax.lax.axis_size(a) + jax.lax.axis_index(a)
        return idx

    # fused TrainState.env_states is (blob [NF, B_local], obs [B_local,
    # ...]): the blob's env axis is dim 1, so it needs its own spec
    env_spec = (P(None, axes), P(axes)) if fused else P(axes)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axes),),
        out_specs=(P(), env_spec, P()),
        check_vma=False,
    )
    def _sharded_init(keys):
        # shared net key -> identical params on every shard; per-shard env
        # key (folded with the device index) -> distinct spawns
        idx = shard_index()
        ts = init_local(keys[0], env_key=jax.random.fold_in(keys[0], idx))
        return ts.params, ts.env_states, ts.opt_state

    def sharded_init(key):
        keys = jnp.tile(key[None, :], (n_dev, 1))
        params, env_states, opt_state = jax.jit(_sharded_init)(keys)
        from dtown.learn.ppo import TrainState

        return TrainState(params, opt_state, env_states, key)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(), env_spec, P()),
        out_specs=((P(), P(), env_spec, P()), P()),
        check_vma=False,
    )
    def _sharded_train_step(params, opt_state, env_states, key):
        from dtown.learn.ppo import TrainState

        # fold the shard index into the PRNG so shards act independently
        idx = shard_index()
        local_key = jax.random.fold_in(key, idx)
        ts = TrainState(params, opt_state, env_states, local_key)
        ts, metrics = train_step_local(ts, axis_name=axes)
        metrics = jax.tree_util.tree_map(
            lambda m: jax.lax.pmean(m, axes), metrics
        )
        # params/opt_state stay replicated (same pmean'd grads everywhere)
        return (ts.params, ts.opt_state, ts.env_states, key), metrics

    @jax.jit
    def sharded_train_step(ts):
        (params, opt_state, env_states, key), metrics = _sharded_train_step(
            ts.params, ts.opt_state, ts.env_states, ts.key
        )
        from dtown.learn.ppo import TrainState

        new_key = jax.random.fold_in(key, 1)
        return TrainState(params, opt_state, env_states, new_key), metrics

    return mesh, sharded_init, sharded_train_step


def _make_sharded_ppo_rnn(cfg, maps, per_dev, ppo, mesh, axes, n_dev,
                          hidden):
    """shard_map plumbing for the recurrent learner: like the standard
    path but the train state carries the per-env LSTM state, sharded on
    the env axis (a P(axes) spec applied as a pytree prefix over the
    (c, h) tuple)."""
    from dtown.learn.ppo_rnn import RNNTrainState, make_ppo_rnn

    init_local, train_step_local = make_ppo_rnn(cfg, maps, per_dev, ppo,
                                                hidden=hidden)

    def shard_index():
        idx = jax.lax.axis_index(axes[0])
        for a in axes[1:]:
            idx = idx * jax.lax.axis_size(a) + jax.lax.axis_index(a)
        return idx

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axes),),
        out_specs=(P(), P(axes), P(), P(axes)),
        check_vma=False,
    )
    def _sharded_init(keys):
        idx = shard_index()
        ts = init_local(keys[0], env_key=jax.random.fold_in(keys[0], idx))
        return ts.params, ts.env_states, ts.opt_state, ts.carry

    def sharded_init(key):
        keys = jnp.tile(key[None, :], (n_dev, 1))
        params, env_states, opt_state, carry = jax.jit(_sharded_init)(keys)
        return RNNTrainState(params, opt_state, env_states, key, carry)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(axes), P(), P(axes)),
        out_specs=((P(), P(), P(axes), P(), P(axes)), P()),
        check_vma=False,
    )
    def _sharded_train_step(params, opt_state, env_states, key, carry):
        idx = shard_index()
        local_key = jax.random.fold_in(key, idx)
        ts = RNNTrainState(params, opt_state, env_states, local_key, carry)
        ts, metrics = train_step_local(ts, axis_name=axes)
        metrics = jax.tree_util.tree_map(
            lambda m: jax.lax.pmean(m, axes), metrics
        )
        return (ts.params, ts.opt_state, ts.env_states, key,
                ts.carry), metrics

    @jax.jit
    def sharded_train_step(ts):
        (params, opt_state, env_states, key, carry), metrics = \
            _sharded_train_step(ts.params, ts.opt_state, ts.env_states,
                                ts.key, ts.carry)
        new_key = jax.random.fold_in(key, 1)
        return RNNTrainState(params, opt_state, env_states, new_key,
                             carry), metrics

    return mesh, sharded_init, sharded_train_step

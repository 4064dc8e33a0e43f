"""On-device imitation learning: privileged expert -> demos -> BC.

The reference fork's distinctive addition is imitation / steering-
prediction training driven by the simulator (SURVEY.md §2.16, torch
scripts, LOW CONFIDENCE). The TPU-native equivalent keeps the whole
pipeline on device: a privileged lane-PD expert (it reads the lane
features the simulator computes every step) drives thousands of envs
under `lax.scan`, the (obs, expert_action) pairs never leave the chip,
and a behavior-cloned student (state vector or RGB camera obs) trains
with MSE regression on the expert's actions — the fork's "steering
prediction from camera frames" task.

Everything is pure-functional: `collect_demos`, `train_bc`, and
`eval_closed_loop` compose under jit/shard_map like the PPO learner.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from dtown import env as env_core
from dtown.learn import networks


# The lane-PD law proven stable closed-loop (a full lap) at the package
# boundary: steer = 10*dist + 5*angle_rad, vel 0.55 (positive steer =
# left turn, dist > 0 = right of lane center).
EXPERT_VEL = 0.55
EXPERT_KD = 10.0
EXPERT_KA = 5.0


def expert_action(out) -> jax.Array:
    """Privileged expert from a StepOutput's lane features -> [B, 2]."""
    steer = (EXPERT_KD * out.lane_dist
             + EXPERT_KA * jnp.deg2rad(out.lane_angle_deg))
    vel = jnp.full_like(steer, EXPERT_VEL)
    return jnp.stack([vel, jnp.clip(steer, -1.0, 1.0)], axis=-1)


class BCPolicy(nn.Module):
    """Deterministic steering-prediction head on the shared trunk."""

    action_dim: int = 2
    trunk: str = "nature"

    @nn.compact
    def __call__(self, obs):
        h = networks.make_trunk(self.trunk)(obs)
        return nn.Dense(self.action_dim, dtype=jnp.float32)(
            h.astype(jnp.float32)
        )


def collect_demos(cfg, maps, num_envs: int, steps: int, key):
    """Roll the expert for `steps`; returns (obs [T,B,...], act [T,B,2]).

    The expert reads lane features from StepOutput, so this works for
    any cfg.obs_type — with "rgb" the demos are (camera frame, action)
    pairs, the fork's steering-prediction dataset.
    """
    v_reset, _ = env_core.make_vec_env(cfg, maps, num_envs)
    states = v_reset(key)
    # prime: one coasting step to obtain lane features + first obs
    # (dropped from the dataset)
    zeros = jnp.zeros((num_envs, 2), jnp.float32)
    states, out = env_core.step_batch(cfg, maps, states, zeros)

    def body(carry, _):
        states, out = carry
        act = expert_action(out)
        obs = out.obs
        states, out = env_core.step_batch(cfg, maps, states, act)
        return (states, out), (obs, act)

    (_, _), (obs, act) = jax.lax.scan(body, (states, out), None,
                                      length=steps)
    return obs, act


class BCState(NamedTuple):
    params: dict
    opt_state: optax.OptState
    key: jax.Array


def make_bc(cfg, lr: float = 1e-3, batch_size: int = 1024,
            trunk: str = "nature"):
    """(init, train_epoch, policy): MSE behavior cloning on demos."""
    net = BCPolicy(trunk=trunk)
    tx = optax.adam(lr)

    def init(key, example_obs) -> BCState:
        k_p, k_s = jax.random.split(key)
        params = net.init(k_p, example_obs[:1])
        return BCState(params, tx.init(params), k_s)

    def loss_fn(params, obs, act):
        pred = net.apply(params, obs)
        return jnp.mean(jnp.square(pred - act))

    def train_epoch(bc: BCState, obs, act):
        """One pass over the flattened demo set in shuffled minibatches."""
        n = obs.shape[0] * obs.shape[1]
        obs_f = obs.reshape((n,) + obs.shape[2:])
        act_f = act.reshape((n,) + act.shape[2:])
        key, k_perm = jax.random.split(bc.key)
        perm = jax.random.permutation(k_perm, n)
        nb = max(1, n // batch_size)
        perm = perm[: nb * batch_size].reshape(nb, batch_size)

        def mb(carry, idx):
            params, opt_state = carry
            l, g = jax.value_and_grad(loss_fn)(
                params, obs_f[idx], act_f[idx]
            )
            upd, opt_state = tx.update(g, opt_state, params)
            return (optax.apply_updates(params, upd), opt_state), l

        (params, opt_state), losses = jax.lax.scan(
            mb, (bc.params, bc.opt_state), perm
        )
        return BCState(params, opt_state, key), jnp.mean(losses)

    def policy(params, obs):
        return net.apply(params, obs)

    return init, train_epoch, policy


def eval_closed_loop(cfg, maps, params, policy, num_envs: int,
                     steps: int, key):
    """Drive the cloned policy; returns (survival_frac, mean_reward)."""
    v_reset, _ = env_core.make_vec_env(cfg, maps, num_envs)
    states = v_reset(key)
    zeros = jnp.zeros((num_envs, 2), jnp.float32)
    states, out = env_core.step_batch(cfg, maps, states, zeros)

    def body(carry, _):
        states, out, crashed = carry
        act = policy(params, out.obs)
        states, out = env_core.step_batch(cfg, maps, states, act)
        crashed = crashed | (out.done & out.collision) | (
            out.done & ~out.in_lane.astype(bool)
        )
        return (states, out, crashed), out.reward

    crashed0 = jnp.zeros((num_envs,), bool)
    (_, _, crashed), rewards = jax.lax.scan(
        body, (states, out, crashed0), None, length=steps
    )
    return 1.0 - crashed.mean(), rewards.mean()


def collect_dagger(cfg, maps, params, policy, num_envs: int, steps: int,
                   key, beta: float = 0.0):
    """DAgger rollout: the LEARNER (mixed with the expert by beta)
    drives, the EXPERT labels every visited state. Returns (obs, act)
    shaped like collect_demos — aggregate with earlier rounds and
    retrain (Ross et al.; the sim-to-real duckietown imitation pipeline
    in PAPERS.md applies exactly this loop on the reference simulator).

    beta: probability of executing the expert's action instead of the
    learner's at each step (standard beta-schedule knob; 0 = pure
    learner driving, 1 = collect_demos).
    """
    v_reset, _ = env_core.make_vec_env(cfg, maps, num_envs)
    states = v_reset(key)
    zeros = jnp.zeros((num_envs, 2), jnp.float32)
    states, out = env_core.step_batch(cfg, maps, states, zeros)

    def body(carry, k):
        states, out = carry
        label = expert_action(out)           # expert labels the state
        learner = policy(params, out.obs)    # learner (or mix) drives
        if beta > 0.0:
            pick = jax.random.bernoulli(k, beta, (learner.shape[0], 1))
            drive = jnp.where(pick, label, learner)
        else:
            drive = learner
        obs = out.obs
        states, out = env_core.step_batch(cfg, maps, states, drive)
        return (states, out), (obs, label)

    keys = jax.random.split(key, steps)
    (_, _), (obs, act) = jax.lax.scan(body, (states, out), keys)
    return obs, act


def dagger_rounds(cfg, maps, num_envs: int, steps: int, key,
                  rounds: int = 3, epochs_per_round: int = 4,
                  lr: float = 1e-3, trunk: str = "nature",
                  beta0: float = 0.5):
    """Full on-device DAgger loop: BC on expert demos, then `rounds` of
    learner-driven data collection with expert labels, aggregating the
    dataset each round (beta decays by half per round). Returns
    (params, policy, history)."""
    init, train_epoch, policy = make_bc(cfg, lr=lr, trunk=trunk)
    k_demo, k_init, key = jax.random.split(key, 3)
    obs, act = collect_demos(cfg, maps, num_envs, steps, k_demo)
    bc = init(k_init, obs.reshape((-1,) + obs.shape[2:]))
    history = []
    for _ in range(epochs_per_round):
        bc, loss = train_epoch(bc, obs, act)
    history.append(float(loss))
    beta = beta0
    for r in range(rounds):
        key, k_roll = jax.random.split(key)
        d_obs, d_act = collect_dagger(
            cfg, maps, bc.params, policy, num_envs, steps, k_roll,
            beta=beta,
        )
        obs = jnp.concatenate([obs, d_obs], axis=0)
        act = jnp.concatenate([act, d_act], axis=0)
        for _ in range(epochs_per_round):
            bc, loss = train_epoch(bc, obs, act)
        history.append(float(loss))
        beta *= 0.5
    return bc.params, policy, history

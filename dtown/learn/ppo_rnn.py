"""Recurrent PPO: LSTM policy with per-env hidden state.

Same algorithm as learn/ppo.py but the policy is ActorCriticRNN
(networks.py): the LSTM carry lives in the train state, is reset at
episode boundaries during the rollout, and the PPO update replays the
rollout sequentially per env (minibatches partition the ENV axis, not
the flattened (T*B) axis, so truncated BPTT runs over each env's
actual transition sequence from the stored rollout-start carry).

No reference counterpart (the reference has no learner at all); this is
framework surface, sized like the non-recurrent learner.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from dtown import env as env_core
from dtown.learn.networks import ActorCriticRNN
from dtown.learn.ppo import PPOConfig


class RNNTrainState(NamedTuple):
    params: dict
    opt_state: optax.OptState
    env_states: object
    key: jax.Array
    carry: tuple  # LSTM (c, h), each [B, hidden]


def _reset_carry(carry, done):
    """Zero the hidden state of envs whose episode just ended."""
    return jax.tree_util.tree_map(
        lambda c: jnp.where(done[:, None], jnp.zeros_like(c), c), carry
    )


def make_ppo_rnn(cfg, maps, num_envs: int, ppo: PPOConfig = PPOConfig(),
                 hidden: int = 128):
    """Build (init_fn, train_step_fn) for the recurrent learner."""
    assert num_envs % ppo.minibatches == 0, (
        f"num_envs={num_envs} must divide into ppo.minibatches="
        f"{ppo.minibatches} env groups"
    )
    net = ActorCriticRNN(trunk=ppo.trunk, hidden=hidden)
    tx = optax.chain(
        optax.clip_by_global_norm(ppo.max_grad_norm),
        optax.adam(ppo.lr),
    )

    def obs_of(states):
        return env_core.render_obs_batch(cfg, maps, states)

    def init(key, env_key=None):
        k_env, k_net, k_carry = jax.random.split(key, 3)
        if env_key is not None:
            k_env = env_key
            k_carry = jax.random.fold_in(env_key, 0x5EED)
        keys = jax.random.split(k_env, num_envs)
        idx = env_core.initial_map_indices(maps, num_envs)
        env_states = jax.vmap(lambda k, i: env_core.reset(cfg, maps, k, i))(
            keys, idx
        )
        sample_obs = obs_of(env_states)
        carry = net.initial_carry(num_envs)
        params = net.init(k_net, sample_obs, carry)
        return RNNTrainState(params, tx.init(params), env_states, k_carry,
                             carry)

    def rollout(ts: RNNTrainState):
        carry0 = ts.carry

        def step_fn(c, _):
            env_states, key, carry = c
            key, k_act = jax.random.split(key)
            obs = obs_of(env_states)
            mean, log_std, value, carry = net.apply(ts.params, obs, carry)
            std = jnp.exp(log_std)
            noise = jax.random.normal(k_act, mean.shape, dtype=mean.dtype)
            action = mean + std * noise
            logp = -0.5 * jnp.sum(
                ((action - mean) / std) ** 2 + 2.0 * log_std
                + jnp.log(2.0 * jnp.pi), axis=-1,
            )
            env_states, out, _ = jax.vmap(
                lambda s, a: env_core.step_physics(cfg, maps, s, a)
            )(env_states, jnp.tanh(action))
            carry = _reset_carry(carry, out.done)
            data = dict(obs=obs, action=action, logp=logp, value=value,
                        reward=out.reward, done=out.done)
            return (env_states, key, carry), data

        (env_states, key, carry), traj = jax.lax.scan(
            step_fn, (ts.env_states, ts.key, ts.carry), None,
            length=ppo.rollout_len,
        )
        last_obs = obs_of(env_states)
        _, _, last_value, _ = net.apply(ts.params, last_obs, carry)
        ts = ts._replace(env_states=env_states, key=key, carry=carry)
        return ts, traj, last_value, carry0

    def compute_gae(traj, last_value):
        def body(c, t):
            gae, next_value = c
            delta = (
                t["reward"] * ppo.reward_scale
                + ppo.gamma * next_value * (1.0 - t["done"])
                - t["value"]
            )
            gae = delta + ppo.gamma * ppo.gae_lambda * (1.0 - t["done"]) * gae
            return (gae, t["value"]), gae

        (_, _), advantages = jax.lax.scan(
            body, (jnp.zeros_like(last_value), last_value), traj,
            reverse=True,
        )
        return advantages, advantages + traj["value"]

    def loss_fn(params, seq, carry0):
        """PPO loss over one env group, replayed sequentially.

        seq leaves are [T, Bm, ...]; carry0 is the group's LSTM state at
        rollout start. The replay applies the SAME done-gated carry
        resets as the rollout, so (up to parameter staleness across
        epochs) logp/value are recomputed on-policy per time step.
        """

        def replay(carry, t):
            mean, log_std, value, carry = net.apply(params, t["obs"], carry)
            std = jnp.exp(log_std)
            logp = -0.5 * jnp.sum(
                ((t["action"] - mean) / std) ** 2 + 2.0 * log_std
                + jnp.log(2.0 * jnp.pi), axis=-1,
            )
            carry = _reset_carry(carry, t["done"])
            return carry, (logp, value, log_std)

        _, (logp, value, log_std) = jax.lax.scan(replay, carry0, seq)
        ratio = jnp.exp(logp - seq["logp"])
        adv = seq["adv"]
        adv = (adv - adv.mean()) / (adv.std() + 1e-8)
        pg1 = ratio * adv
        pg2 = jnp.clip(ratio, 1 - ppo.clip_eps, 1 + ppo.clip_eps) * adv
        pg_loss = -jnp.minimum(pg1, pg2).mean()
        v_loss = 0.5 * ((value - seq["ret"]) ** 2).mean()
        # log_std is the same [A] parameter stacked over the T scan steps
        entropy = jnp.sum(log_std[0] + 0.5 * jnp.log(2 * jnp.pi * jnp.e))
        loss = pg_loss + ppo.vf_coef * v_loss - ppo.ent_coef * entropy
        return loss, dict(pg_loss=pg_loss, v_loss=v_loss,
                          mean_ratio=ratio.mean())

    def update(ts: RNNTrainState, traj, advantages, returns, carry0,
               axis_name=None):
        B = traj["reward"].shape[1]
        group = B // ppo.minibatches
        data = dict(traj, adv=advantages, ret=returns)

        def epoch(c, _):
            params, opt_state, key = c
            key, k_perm = jax.random.split(key)
            perm = jax.random.permutation(k_perm, B)

            def minibatch(c2, m):
                params, opt_state = c2
                idx = jax.lax.dynamic_slice_in_dim(perm, m * group, group)
                seq = {k: jnp.take(v, idx, axis=1) for k, v in data.items()}
                c0 = jax.tree_util.tree_map(
                    lambda x: jnp.take(x, idx, axis=0), carry0
                )
                (loss, aux), grads = jax.value_and_grad(
                    loss_fn, has_aux=True
                )(params, seq, c0)
                if axis_name is not None:
                    grads = jax.lax.pmean(grads, axis_name)
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), (loss, aux["mean_ratio"])

            (params, opt_state), (losses, ratios) = jax.lax.scan(
                minibatch, (params, opt_state), jnp.arange(ppo.minibatches)
            )
            return (params, opt_state, key), (losses.mean(), ratios.mean())

        (params, opt_state, key), (losses, ratios) = jax.lax.scan(
            epoch, (ts.params, ts.opt_state, ts.key), None, length=ppo.epochs
        )
        return ts._replace(params=params, opt_state=opt_state, key=key), \
            losses, ratios

    def train_step(ts: RNNTrainState, axis_name=None):
        ts, traj, last_value, carry0 = rollout(ts)
        advantages, returns = compute_gae(traj, last_value)
        ts, losses, ratios = update(ts, traj, advantages, returns, carry0,
                                    axis_name)
        metrics = dict(
            loss=losses.mean(),
            mean_reward=traj["reward"].mean(),
            done_frac=traj["done"].mean(),
            # ratio == 1 exactly when the sequential replay reproduces
            # the rollout's logp (params unchanged) — the carry/done
            # bookkeeping's invariant
            mean_ratio=ratios.mean(),
        )
        return ts, metrics

    return init, train_step

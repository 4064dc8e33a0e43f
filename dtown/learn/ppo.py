"""On-device PPO: rollout scan + GAE + clipped surrogate update.

Replaces the reference's (absent) training loop with the learner from
BASELINE.json's north star: rollouts collected by a lax.scan over the
vectorized env entirely on device — observations never reach the host —
and the policy updated in place. Multi-chip: the caller shards the env
batch over the mesh's 'envs' axis; gradients are averaged with a psum
inside shard_map (see dtown/parallel/shard.py).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from dtown import env as env_core
from dtown.learn.networks import ActorCritic


class PPOConfig(NamedTuple):
    rollout_len: int = 128
    # 1e-3 over the folk-default 3e-4, from three measurements (r2/r3):
    # state-obs sweep tail reward -1.24 (3e-4) vs -0.83 (1e-3) vs +0.46
    # (5e-3); RGB 40-iter on-chip A/B +0.42 vs +0.10 at iter 39; RGB
    # 150-iter on-chip confirmation run stable at 1e-3 (plateau +0.7-0.9,
    # docs/train_rgb_small_loop_lr1e3_resumed.log) — faster early,
    # comparable tail, no conv-trunk instability.
    lr: float = 1e-3
    gamma: float = 0.99
    gae_lambda: float = 0.95
    clip_eps: float = 0.2
    vf_coef: float = 0.5
    ent_coef: float = 0.01
    # epochs=4 / minibatches=8 over the folk 2/4, from two measurements
    # (r4): CPU state-obs grid (small_loop, 256 envs, 48 iters, 2
    # seeds) — 4/8 tail reward +0.53..+0.58 across ent_coef
    # {0, .003, .01} vs -0.23 for 2/4; RGB on-chip A/B (small_loop
    # 64x64, 1024 envs, 40 iters, seed 7) — 4/8 reaches the same
    # reward ~2x earlier (iter-10 mean -0.33 vs -0.92) and ends ahead
    # (+0.687 vs +0.656) at 25% lower steps/s, a clear
    # wall-clock-to-reward win. ent_coef was flat; 0.01 retained.
    epochs: int = 4
    minibatches: int = 8
    max_grad_norm: float = 0.5
    # Rewards are scaled before GAE/returns so the -1000 crash terminal
    # doesn't dominate the value loss (metrics still report raw rewards).
    reward_scale: float = 0.02
    # Policy trunk: "nature" (NatureCNN) | "impala" (residual, deeper)
    trunk: str = "nature"


class TrainState(NamedTuple):
    params: dict
    opt_state: optax.OptState
    env_states: object  # batched EnvState
    key: jax.Array


def make_ppo(cfg, maps, num_envs: int, ppo: PPOConfig = PPOConfig(),
             fused: bool = False, nav: bool = False,
             goal_in_obs: bool = False):
    """Build (init_fn, train_step_fn) closures over static config.

    fused=True: rollouts carry the transposed state blob and advance via
    the fused Pallas state kernel + render kernel (ops/fused_env) — the
    full training loop then runs at kernel speed. Domain randomization,
    moving NPCs and stacked multimaps all run in-kernel (r2); only RGB
    stacks beyond the blob-render budget (>8 maps / >48 objects) are
    refused (see _make_ppo_fused).

    nav=True (fused only): the Nav task (in-kernel goal bonus/done/
    redraw); goal_in_obs appends the agent-frame goal offset to state
    observations — the learnable form of the task at kernel speed.
    """
    net = ActorCritic(trunk=ppo.trunk)
    tx = optax.chain(
        optax.clip_by_global_norm(ppo.max_grad_norm),
        optax.adam(ppo.lr),
    )
    if fused:
        return _make_ppo_fused(cfg, maps, num_envs, ppo, net, tx,
                               nav=nav, goal_in_obs=goal_in_obs)
    if nav:
        raise NotImplementedError(
            "nav PPO is wired through the fused path (make_ppo(..., "
            "fused=True, nav=True)); for the XLA path drive "
            "tasks.make_nav_vec with a custom loop"
        )

    def obs_of(states):
        # the ONE batched-obs path (fused Pallas renderer when cfg
        # selects it, grayscale luma included) — env.render_obs_batch
        return env_core.render_obs_batch(cfg, maps, states)

    def init(key, env_key=None):
        k_env, k_net, k_carry = jax.random.split(key, 3)
        if env_key is not None:
            # distinct env draws per shard while params stay identical
            k_env = env_key
            k_carry = jax.random.fold_in(env_key, 0x5EED)
        keys = jax.random.split(k_env, num_envs)
        if maps.tile_kind.ndim == 3:  # stacked multi-map curriculum
            idx = jnp.arange(num_envs, dtype=jnp.int32) % maps.tile_kind.shape[0]
        else:
            idx = jnp.zeros((num_envs,), dtype=jnp.int32)
        env_states = jax.vmap(lambda k, i: env_core.reset(cfg, maps, k, i))(
            keys, idx
        )
        sample_obs = obs_of(env_states)
        params = net.init(k_net, sample_obs[:2])
        opt_state = tx.init(params)
        return TrainState(params, opt_state, env_states, k_carry)

    def policy_sample(params, obs, key):
        mean, log_std, value = net.apply(params, obs)
        std = jnp.exp(log_std)
        noise = jax.random.normal(key, mean.shape, dtype=mean.dtype)
        action = mean + std * noise
        logp = -0.5 * jnp.sum(
            ((action - mean) / std) ** 2 + 2.0 * log_std
            + jnp.log(2.0 * jnp.pi),
            axis=-1,
        )
        return action, logp, value

    def rollout(ts: TrainState):
        """Collect rollout_len transitions on device."""

        def step_fn(carry, _):
            env_states, key = carry
            key, k_act = jax.random.split(key)
            obs = obs_of(env_states)
            action, logp, value = policy_sample(ts.params, obs, k_act)
            act_clip = jnp.tanh(action)
            env_states, out, _ = jax.vmap(
                lambda s, a: env_core.step_physics(cfg, maps, s, a)
            )(env_states, act_clip)
            data = dict(
                obs=obs, action=action, logp=logp, value=value,
                reward=out.reward, done=out.done,
            )
            return (env_states, key), data

        (env_states, key), traj = jax.lax.scan(
            step_fn, (ts.env_states, ts.key), None, length=ppo.rollout_len
        )
        last_obs = obs_of(env_states)
        _, _, last_value = net.apply(ts.params, last_obs)
        return ts._replace(env_states=env_states, key=key), traj, last_value

    def compute_gae(traj, last_value):
        def body(carry, t):
            gae, next_value = carry
            delta = (
                t["reward"] * ppo.reward_scale
                + ppo.gamma * next_value * (1.0 - t["done"])
                - t["value"]
            )
            gae = delta + ppo.gamma * ppo.gae_lambda * (1.0 - t["done"]) * gae
            return (gae, t["value"]), gae

        (_, _), advantages = jax.lax.scan(
            body,
            (jnp.zeros_like(last_value), last_value),
            traj,
            reverse=True,
        )
        returns = advantages + traj["value"]
        return advantages, returns

    def loss_fn(params, batch):
        mean, log_std, value = net.apply(params, batch["obs"])
        std = jnp.exp(log_std)
        logp = -0.5 * jnp.sum(
            ((batch["action"] - mean) / std) ** 2 + 2.0 * log_std
            + jnp.log(2.0 * jnp.pi),
            axis=-1,
        )
        ratio = jnp.exp(logp - batch["logp"])
        adv = batch["adv"]
        adv = (adv - adv.mean()) / (adv.std() + 1e-8)
        pg1 = ratio * adv
        pg2 = jnp.clip(ratio, 1 - ppo.clip_eps, 1 + ppo.clip_eps) * adv
        pg_loss = -jnp.minimum(pg1, pg2).mean()
        v_loss = 0.5 * ((value - batch["ret"]) ** 2).mean()
        entropy = jnp.sum(log_std + 0.5 * jnp.log(2 * jnp.pi * jnp.e))
        loss = pg_loss + ppo.vf_coef * v_loss - ppo.ent_coef * entropy
        return loss, dict(pg_loss=pg_loss, v_loss=v_loss,
                          mean_ratio=ratio.mean())

    def update(ts: TrainState, traj, advantages, returns, axis_name=None):
        T, B = traj["reward"].shape
        flat = {
            "obs": traj["obs"].reshape((T * B,) + traj["obs"].shape[2:]),
            "action": traj["action"].reshape(T * B, -1),
            "logp": traj["logp"].reshape(T * B),
            "adv": advantages.reshape(T * B),
            "ret": returns.reshape(T * B),
        }
        mb_size = (T * B) // ppo.minibatches

        def epoch(carry, _):
            params, opt_state, key = carry
            key, k_perm = jax.random.split(key)
            perm = jax.random.permutation(k_perm, T * B)

            def minibatch(carry, m):
                params, opt_state = carry
                idx = jax.lax.dynamic_slice_in_dim(perm, m * mb_size, mb_size)
                batch = {k: v[idx] for k, v in flat.items()}
                (loss, aux), grads = jax.value_and_grad(
                    loss_fn, has_aux=True
                )(params, batch)
                if axis_name is not None:
                    grads = jax.lax.pmean(grads, axis_name)
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), loss

            (params, opt_state), losses = jax.lax.scan(
                minibatch, (params, opt_state),
                jnp.arange(ppo.minibatches),
            )
            return (params, opt_state, key), losses.mean()

        (params, opt_state, key), losses = jax.lax.scan(
            epoch, (ts.params, ts.opt_state, ts.key), None, length=ppo.epochs
        )
        return ts._replace(params=params, opt_state=opt_state, key=key), losses

    def train_step(ts: TrainState, axis_name=None):
        """One PPO iteration: rollout -> GAE -> update. Jittable."""
        ts, traj, last_value = rollout(ts)
        advantages, returns = compute_gae(traj, last_value)
        ts, losses = update(ts, traj, advantages, returns, axis_name)
        metrics = dict(
            loss=losses.mean(),
            mean_reward=traj["reward"].mean(),
            done_frac=traj["done"].mean(),
        )
        return ts, metrics

    return init, train_step


def _make_ppo_fused(cfg, maps, num_envs, ppo, net, tx, nav=False,
                    goal_in_obs=False):
    """Fused-kernel PPO: TrainState.env_states is (state blob, last obs).

    The last observation is carried across train iterations so each
    rollout starts from the obs of the current blob state — no extra env
    step is taken to produce obs0 (the XLA path renders, never steps, for
    the initial obs), and restoring a TrainState from checkpoint needs no
    side-channel state.
    """
    from dtown.ops.fused_env import (
        make_fused_nav_rollout, make_fused_rollout,
        nav_goal_features_from_blob, obs_from_blob,
        template_states as make_template,
    )
    from dtown.render.pallas_raster import planes_to_nhwc

    if nav:
        init_blob, fused_step = make_fused_nav_rollout(
            cfg, maps, num_envs, goal_in_obs=goal_in_obs
        )
    else:
        init_blob, fused_step, _ = make_fused_rollout(cfg, maps, num_envs)
    if cfg.obs_type == "rgb" and maps.tile_kind.ndim == 3:
        from dtown.render.blob_raster import build_render_plan

        if build_render_plan(cfg, maps) is None:
            # beyond the blob plan budget fused_step falls back to the
            # per-env XLA renderer, which emits NHWC frames while this
            # path consumes planes — fail loudly instead of mis-shaping
            raise NotImplementedError(
                "fused RGB PPO on a stack beyond the blob-render budget "
                "(>8 maps / >48 objects) — use make_ppo(..., fused=False)"
            )

    def obs_from(blob, obs_raw):
        if cfg.obs_type == "rgb":
            if isinstance(obs_raw, tuple):
                # goal-conditioned camera obs: (planes, goal_vec)
                return (planes_to_nhwc(cfg, obs_raw[0]), obs_raw[1])
            return planes_to_nhwc(cfg, obs_raw)
        return obs_raw

    def init(key, env_key=None):
        blob, _states = init_blob(env_key if env_key is not None else key)
        tmpl = make_template(cfg, maps, num_envs)
        k_net, k_carry = jax.random.split(jax.random.fold_in(key, 7))
        obs0 = obs_from(blob, obs_from_blob(cfg, maps, blob, tmpl))
        if nav and goal_in_obs:
            # obs_from_blob is task-agnostic; append the goal features
            # the nav fused_step emits so obs0 matches rollout obs
            gfeat = jnp.stack(
                nav_goal_features_from_blob(cfg, maps, blob), axis=-1)
            if cfg.obs_type == "rgb":
                obs0 = (obs0, gfeat)
            else:
                obs0 = jnp.concatenate([obs0, gfeat], axis=-1)
        params = net.init(
            k_net, jax.tree_util.tree_map(lambda a: a[:2], obs0))
        return TrainState(params, tx.init(params), (blob, obs0), k_carry)

    def policy_sample(params, obs, key):
        mean, log_std, value = net.apply(params, obs)
        std = jnp.exp(log_std)
        noise = jax.random.normal(key, mean.shape, dtype=mean.dtype)
        action = mean + std * noise
        logp = -0.5 * jnp.sum(
            ((action - mean) / std) ** 2 + 2.0 * log_std
            + jnp.log(2.0 * jnp.pi), axis=-1,
        )
        return action, logp, value

    def train_step(ts: TrainState, axis_name=None):
        tmpl = make_template(cfg, maps, num_envs)

        def step_fn(carry, _):
            blob, key, obs = carry
            key, k_act = jax.random.split(key)
            action, logp, value = policy_sample(ts.params, obs, k_act)
            blob, out, obs_raw = fused_step(
                blob, tmpl, jnp.tanh(action)
            )
            next_obs = obs_from(blob, obs_raw)
            data = dict(obs=obs, action=action, logp=logp, value=value,
                        reward=out.reward, done=out.done)
            return (blob, key, next_obs), data

        # the carried obs describes the current blob state — no extra step
        blob0, obs0 = ts.env_states
        (blob, key, last_obs), traj = jax.lax.scan(
            step_fn, (blob0, ts.key, obs0), None, length=ppo.rollout_len
        )
        _, _, last_value = net.apply(ts.params, last_obs)

        # GAE
        def body(carry, t):
            gae, next_value = carry
            delta = (t["reward"] * ppo.reward_scale
                     + ppo.gamma * next_value * (1 - t["done"])
                     - t["value"])
            gae = delta + ppo.gamma * ppo.gae_lambda * (1 - t["done"]) * gae
            return (gae, t["value"]), gae

        (_, _), advantages = jax.lax.scan(
            body, (jnp.zeros_like(last_value), last_value), traj,
            reverse=True,
        )
        returns = advantages + traj["value"]

        # clipped-surrogate update (shared math with the XLA path)
        T_, B_ = traj["reward"].shape
        flat = {
            # tree_map: obs may be a (image, goal_vec) tuple
            "obs": jax.tree_util.tree_map(
                lambda a: a.reshape((T_ * B_,) + a.shape[2:]),
                traj["obs"]),
            "action": traj["action"].reshape(T_ * B_, -1),
            "logp": traj["logp"].reshape(T_ * B_),
            "adv": advantages.reshape(T_ * B_),
            "ret": returns.reshape(T_ * B_),
        }
        mb = (T_ * B_) // ppo.minibatches

        def loss_fn(params, batch):
            mean, log_std, value = net.apply(params, batch["obs"])
            std = jnp.exp(log_std)
            logp = -0.5 * jnp.sum(
                ((batch["action"] - mean) / std) ** 2 + 2.0 * log_std
                + jnp.log(2.0 * jnp.pi), axis=-1,
            )
            ratio = jnp.exp(logp - batch["logp"])
            adv = batch["adv"]
            adv = (adv - adv.mean()) / (adv.std() + 1e-8)
            pg = -jnp.minimum(
                ratio * adv,
                jnp.clip(ratio, 1 - ppo.clip_eps, 1 + ppo.clip_eps) * adv,
            ).mean()
            v_loss = 0.5 * ((value - batch["ret"]) ** 2).mean()
            ent = jnp.sum(log_std + 0.5 * jnp.log(2 * jnp.pi * jnp.e))
            return pg + ppo.vf_coef * v_loss - ppo.ent_coef * ent

        def epoch(carry, _):
            params, opt_state, key = carry
            key, kp = jax.random.split(key)
            perm = jax.random.permutation(kp, T_ * B_)

            def minibatch(carry, m):
                params, opt_state = carry
                idx = jax.lax.dynamic_slice_in_dim(perm, m * mb, mb)
                batch = jax.tree_util.tree_map(lambda v: v[idx], flat)
                loss, grads = jax.value_and_grad(loss_fn)(params, batch)
                if axis_name is not None:
                    grads = jax.lax.pmean(grads, axis_name)
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), loss

            (params, opt_state), losses = jax.lax.scan(
                minibatch, (params, opt_state), jnp.arange(ppo.minibatches)
            )
            return (params, opt_state, key), losses.mean()

        (params, opt_state, key), losses = jax.lax.scan(
            epoch, (ts.params, ts.opt_state, key), None, length=ppo.epochs
        )
        metrics = dict(
            loss=losses.mean(),
            mean_reward=traj["reward"].mean(),
            done_frac=traj["done"].mean(),
        )
        if nav:
            # goal reaches vs crashes: a reached step carries the +500
            # NAV_GOAL_REWARD (lane term is O(1), crash is -1000), so
            # reward > 400 identifies it unambiguously
            metrics["goal_frac"] = (traj["reward"] > 400.0).mean()
        return TrainState(params, opt_state, (blob, last_obs), key), metrics

    return init, train_step

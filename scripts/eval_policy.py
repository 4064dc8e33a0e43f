#!/usr/bin/env python3
"""Closed-loop evaluation of a trained policy checkpoint.

Loads params saved by scripts/train_ppo.py (full train state or a bare
params pytree), runs a deterministic (or stochastic) on-device rollout,
and reports episode statistics: mean return, episode length, crash
rate, survival. Optionally writes a GIF of one env driving under the
policy (the reference fork evaluates trained steering models by driving
the simulator and watching; SURVEY.md §2.16).

Usage:
  python scripts/train_ppo.py --map small_loop --obs state --iters 60 \
      --ckpt /tmp/ppo_ck
  python scripts/eval_policy.py --ckpt /tmp/ppo_ck --map small_loop \
      --obs state --envs 256 --steps 500
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if "--cpu" in sys.argv:
    # ambient env pins jax_platforms=axon; env vars can't force CPU
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from dtown import env as env_core
from dtown import map_loader
from dtown.learn.networks import ActorCritic
from dtown.types import EnvConfig
from dtown.utils import checkpoint


def load_params(path: str):
    tree = checkpoint.restore_any(os.path.abspath(path))
    return tree["params"] if isinstance(tree, dict) and "params" in tree else tree


def make_obs_fn(cfg, maps):
    multimap = maps.tile_kind.ndim == 3

    def obs_of(states):
        if cfg.obs_type == "rgb" and cfg.renderer == "pallas" and not multimap:
            from dtown.render.pallas_raster import (
                planes_to_nhwc, render_frames_pallas,
            )

            return planes_to_nhwc(cfg, render_frames_pallas(cfg, maps, states))
        return jax.vmap(lambda s: env_core.render_obs(cfg, maps, s))(states)

    return obs_of


def episode_records(rewards: np.ndarray, dones: np.ndarray):
    """Completed-episode records (length, terminal_reward, return) from
    [T, E] reward/done arrays. Episodes are spans ending at a done
    step; the trailing partial span per env is discarded, matching how
    the reference's scripts tally per-episode reward on `done`. The
    single source of episode-boundary logic for all derived stats."""
    T, E = rewards.shape
    recs = []
    for e in range(E):
        acc, n = 0.0, 0
        for t in range(T):
            acc += float(rewards[t, e])
            n += 1
            if dones[t, e]:
                recs.append((n, float(rewards[t, e]), acc))
                acc, n = 0.0, 0
    return recs


def episode_stats(rewards: np.ndarray, dones: np.ndarray, recs=None):
    """Per-episode stats derived from episode_records."""
    recs = episode_records(rewards, dones) if recs is None else recs
    n_ep = len(recs)
    # REWARD_INVALID_POSE terminal marks a crash
    crashes = sum(1 for _, tr, _ in recs if tr <= -999.0)
    survived = int((~dones.any(axis=0)).sum())
    return {
        "episodes": n_ep,
        "mean_return": (float(np.mean([r for _, _, r in recs]))
                        if n_ep else None),
        "mean_ep_len": (float(np.mean([n for n, _, _ in recs]))
                        if n_ep else None),
        "crash_rate": crashes / n_ep if n_ep else None,
        "survived_full_horizon": survived,
        "mean_step_reward": float(rewards.mean()),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--map", default="small_loop", nargs="+")
    ap.add_argument("--envs", type=int, default=256)
    ap.add_argument("--steps", type=int, default=500)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--obs", default="rgb", choices=["rgb", "state"])
    ap.add_argument("--trunk", default="nature", choices=["nature", "impala"])
    ap.add_argument("--renderer", default="pallas", choices=["xla", "pallas"])
    ap.add_argument("--domain-rand", action="store_true")
    ap.add_argument("--nav", action="store_true",
                    help="evaluate on the Nav task (tasks.nav_step): "
                         "reports goal success rate and steps-to-goal")
    ap.add_argument("--goal-in-obs", action="store_true",
                    help="policy was trained goal-conditioned (state "
                         "obs: +3 columns; rgb: (image, goal) tuple)")
    ap.add_argument("--stochastic", action="store_true",
                    help="sample actions instead of tanh(mean)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--gif", default=None,
                    help="write a GIF of env 0 driving under the policy")
    ap.add_argument("--gif-steps", type=int, default=300)
    ap.add_argument("--serve", type=int, default=None, metavar="PORT",
                    help="stream env 0 driving under the policy to a "
                         "browser (LiveViewer MJPEG; implies the "
                         "single-env drive loop after the batch eval)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    cfg = EnvConfig(
        obs_type=args.obs, camera_width=args.size, camera_height=args.size,
        domain_rand=args.domain_rand, renderer=args.renderer,
    )
    names = args.map if isinstance(args.map, list) else [args.map]
    maps = (map_loader.stack_maps(names) if len(names) > 1
            else map_loader.load_map(names[0]))
    nmaps = maps.tile_kind.shape[0] if maps.tile_kind.ndim == 3 else 1

    net = ActorCritic(trunk=args.trunk)
    params = load_params(args.ckpt)
    obs_of = make_obs_fn(cfg, maps)

    key = jax.random.PRNGKey(args.seed)
    k_env, k_act = jax.random.split(key)
    keys = jax.random.split(k_env, args.envs)
    idx = jnp.arange(args.envs, dtype=jnp.int32) % nmaps
    states0 = jax.vmap(lambda k, i: env_core.reset(cfg, maps, k, i))(keys, idx)

    def policy(obs, k):
        mean, log_std, _ = net.apply(params, obs)
        if args.stochastic:
            noise = jax.random.normal(k, mean.shape, dtype=mean.dtype)
            return jnp.tanh(mean + jnp.exp(log_std) * noise)
        return jnp.tanh(mean)

    if args.nav:
        from dtown import tasks

        def nav_states0(k):
            keys_n = jax.random.split(k, args.envs)
            return jax.vmap(
                lambda kk, i: tasks.nav_reset(cfg, maps, kk, i)
            )(keys_n, idx)

        @jax.jit
        def run_nav(k_env2, k):
            ns = nav_states0(k_env2)

            def step_fn(carry, _):
                ns_, kk = carry
                kk, ka = jax.random.split(kk)
                obs = obs_of(ns_.env)
                if args.goal_in_obs:
                    feats = jax.vmap(
                        lambda s: tasks.goal_features(maps, s))(ns_)
                    obs = (jnp.concatenate([obs, feats], axis=-1)
                           if cfg.obs_type == "state" else (obs, feats))
                act = policy(obs, ka)
                ns_, out = jax.vmap(
                    lambda s, a: tasks.nav_step(cfg, maps, s, a)
                )(ns_, act)
                return (ns_, kk), (out.reward, out.done)

            (_, _), (rew, done) = jax.lax.scan(
                step_fn, (ns, k), None, length=args.steps
            )
            return rew, done

        t0 = time.perf_counter()
        rew, done = jax.block_until_ready(run_nav(k_env, k_act))
        dt = time.perf_counter() - t0
        rew_np, done_np = np.asarray(rew), np.asarray(done)
        recs = episode_records(rew_np, done_np)
        stats = episode_stats(rew_np, done_np, recs=recs)
        # a goal step carries the +500 NAV_GOAL_REWARD (lane term O(1),
        # crash -1000) so terminal reward > 400 identifies it
        ttg = [n for n, tr, _ in recs if tr > 400.0]
        n_goals = len(ttg)
        n_eps = stats["episodes"] or 0
        stats.update({
            "goals_reached": n_goals,
            "success_rate": (n_goals / n_eps) if n_eps else None,
            "goal_steps_frac": float((rew_np > 400.0).mean()),
            "mean_steps_to_goal": float(np.mean(ttg)) if ttg else None,
        })
    else:
        @jax.jit
        def run(states, k):
            def step_fn(carry, _):
                st, kk = carry
                kk, ka = jax.random.split(kk)
                act = policy(obs_of(st), ka)
                st, out, _ = jax.vmap(
                    lambda s, a: env_core.step_physics(cfg, maps, s, a)
                )(st, act)
                return (st, kk), (out.reward, out.done)

            (_, _), (rew, done) = jax.lax.scan(
                step_fn, (states, k), None, length=args.steps
            )
            return rew, done

        t0 = time.perf_counter()
        rew, done = jax.block_until_ready(run(states0, k_act))
        dt = time.perf_counter() - t0
        stats = episode_stats(np.asarray(rew), np.asarray(done))
    stats.update({
        "envs": args.envs, "steps": args.steps,
        "map": ",".join(names), "obs": args.obs,
        "deterministic": not args.stochastic,
        "steps_per_s": round(args.envs * args.steps / dt),
    })
    print(json.dumps(stats))

    if args.gif or args.serve is not None:
        write_gif(args, cfg, maps, net, params, obs_of)


def write_gif(args, cfg, maps, net, params, obs_of):
    viewer = None
    if args.serve is not None:
        from dtown.utils.viewer import LiveViewer

        viewer = LiveViewer(port=args.serve)
        print(f"live view: {viewer.url}", file=sys.stderr)
    rgb_cfg = cfg if cfg.obs_type == "rgb" else EnvConfig(
        obs_type="rgb", camera_width=max(args.size, 128),
        camera_height=max(args.size, 128), renderer="xla",
    )
    key = jax.random.PRNGKey(args.seed + 1)
    if getattr(args, "nav", False):
        # Nav drive: episode under tasks.nav_step, captioned with the
        # goal distance; ends on goal (or crash/steps)
        from dtown import tasks

        ns = tasks.nav_reset(cfg, maps, key, jnp.int32(0))
        nav_step1 = jax.jit(
            lambda n, a: tasks.nav_step(cfg, maps, n, a))
        feat_fn = jax.jit(lambda n: tasks.goal_features(maps, n))

        def act_of(n):
            obs = (obs_of(jax.tree_util.tree_map(
                lambda x: x[None], n.env))[0]
                if cfg.obs_type == "rgb"
                else env_core.render_obs(cfg, maps, n.env))
            if args.goal_in_obs:
                f = feat_fn(n)
                obs = (jnp.concatenate([obs, f])
                       if cfg.obs_type == "state" else (obs[None], f[None]))
                if cfg.obs_type == "rgb":
                    return jnp.tanh(net.apply(params, obs)[0][0])
            return jnp.tanh(net.apply(params, obs[None])[0][0])

        frame_fn = jax.jit(
            lambda s: env_core.render_obs(rgb_cfg, maps, s))
        frames = [np.asarray(frame_fn(ns.env))]
        for t in range(args.gif_steps):
            ns, out = nav_step1(ns, act_of(ns))
            frames.append(np.asarray(frame_fn(ns.env)))
            dist = float(feat_fn(ns)[2])
            goal = float(out.reward) > 400.0
            if viewer is not None:
                viewer.update(frames[-1],
                              caption=f"step {t} dist={dist:.2f}"
                                      + (" GOAL!" if goal else ""))
            if goal:
                print(f"reached goal at step {t}")
                break
            if bool(out.done):
                break
    else:
        state = env_core.reset(cfg, maps, key, jnp.int32(0))
        step1 = jax.jit(
            lambda s, a: env_core.step_physics(cfg, maps, s, a)[:2])
        act_fn = jax.jit(
            lambda o: jnp.tanh(net.apply(params, o[None])[0][0])
        )
        frame_fn = jax.jit(lambda s: env_core.render_obs(rgb_cfg, maps, s))
        frames = [np.asarray(frame_fn(state))]
        for t in range(args.gif_steps):
            obs1 = jax.tree_util.tree_map(lambda x: x[None], state)
            obs = (obs_of(obs1)[0] if cfg.obs_type == "rgb"
                   else env_core.render_obs(cfg, maps, state))
            state, out = step1(state, act_fn(obs))
            frames.append(np.asarray(frame_fn(state)))
            if viewer is not None:
                viewer.update(frames[-1],
                              caption=f"step {t} r={float(out.reward):+.2f}")
            if bool(out.done):
                break
    if args.gif is None:
        print(f"streamed {len(frames)} frames")
        return
    try:
        from PIL import Image

        imgs = [Image.fromarray(f) for f in frames]
        imgs[0].save(args.gif, save_all=True, append_images=imgs[1:],
                     duration=33, loop=0)
        print(f"wrote {len(frames)} frames to {args.gif}")
    except ImportError:
        np.save(args.gif + ".npy", np.stack(frames))
        print(f"PIL missing; wrote raw frames to {args.gif}.npy")


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Train a PPO lane-following policy fully on device.

Single-chip or sharded over every available chip; obs never leave the
device — the host sees only scalar metrics and checkpoints
(BASELINE.json north-star training path; the reference fork's torch
scripts are SURVEY.md §2.16).

Usage:
  python scripts/train_ppo.py --map small_loop --envs 256 --iters 50
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
    # the ambient env pins jax_platforms=axon; env vars alone can't
    # force CPU (see CLAUDE.md)
    jax.config.update("jax_platforms", "cpu")

from dtown import map_loader
from dtown.learn.ppo import PPOConfig
from dtown.parallel.mesh import make_mesh
from dtown.parallel.shard import make_sharded_ppo
from dtown.types import EnvConfig
from dtown.utils.profiling import PhaseTimer


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--map", default="small_loop", nargs="+")
    ap.add_argument("--envs", type=int, default=256)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--rollout", type=int, default=64)
    ap.add_argument("--domain-rand", action="store_true")
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--renderer", default="pallas", choices=["xla", "pallas"])
    ap.add_argument("--fused", action="store_true",
                    help="single-host blob-carried rollouts through the "
                         "fused Pallas kernels")
    ap.add_argument("--obs", default="rgb", choices=["rgb", "state"])
    ap.add_argument("--log-every", type=int, default=5)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--ent-coef", type=float, default=0.01)
    ap.add_argument("--gamma", type=float, default=0.99)
    ap.add_argument("--gae-lambda", type=float, default=0.95)
    ap.add_argument("--clip-eps", type=float, default=0.2)
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--minibatches", type=int, default=4)
    ap.add_argument("--reward-scale", type=float, default=0.02)
    ap.add_argument("--trunk", default="nature",
                    choices=["nature", "impala"])
    ap.add_argument("--rnn", action="store_true",
                    help="recurrent (LSTM) policy via learn/ppo_rnn; "
                         "single-host, standard rollout path")
    ap.add_argument("--rnn-hidden", type=int, default=128)
    ap.add_argument("--cpu", action="store_true",
                    help="force the local CPU backend (handled at import)")
    args = ap.parse_args()

    cfg = EnvConfig(
        obs_type=args.obs, camera_width=args.size, camera_height=args.size,
        domain_rand=args.domain_rand, renderer=args.renderer,
    )
    maps = (
        map_loader.stack_maps(args.map)
        if isinstance(args.map, list) and len(args.map) > 1
        else map_loader.load_map(
            args.map[0] if isinstance(args.map, list) else args.map
        )
    )
    mesh = make_mesh()
    print(f"devices: {mesh.devices.size} x {jax.devices()[0].platform}")

    ppo = PPOConfig(
        rollout_len=args.rollout, lr=args.lr, ent_coef=args.ent_coef,
        gamma=args.gamma, gae_lambda=args.gae_lambda,
        clip_eps=args.clip_eps, epochs=args.epochs,
        minibatches=args.minibatches, reward_scale=args.reward_scale,
        trunk=args.trunk,
    )
    if args.rnn:
        assert not args.fused, "--rnn uses the standard rollout path"
        mesh, s_init, s_train = make_sharded_ppo(
            cfg, maps, args.envs, ppo=ppo, mesh=mesh, rnn=True,
            rnn_hidden=args.rnn_hidden,
        )
    elif args.fused:
        import functools

        from dtown.learn.ppo import make_ppo

        s_init, train_local = make_ppo(cfg, maps, args.envs, ppo, fused=True)
        s_train = jax.jit(lambda ts: train_local(ts))
    else:
        mesh, s_init, s_train = make_sharded_ppo(
            cfg, maps, args.envs, ppo=ppo, mesh=mesh
        )

    timer = PhaseTimer()
    with timer.phase("init"):
        ts = s_init(jax.random.PRNGKey(args.seed))
        jax.block_until_ready(ts.params)

    steps_per_iter = args.envs * ppo.rollout_len
    for it in range(args.iters):
        with timer.phase("train", steps=steps_per_iter):
            ts, metrics = s_train(ts)
            metrics = {k: float(v) for k, v in metrics.items()}
        if it % args.log_every == 0 or it == args.iters - 1:
            print(json.dumps({"iter": it, **{k: round(v, 4) for k, v in metrics.items()}}))

    print(timer.report())
    if args.ckpt:
        from dtown.utils import checkpoint

        # full training state: params + optimizer + vectorized env state
        # pytree + PRNG key (SURVEY.md §5 checkpoint/resume row)
        state = {
            "params": ts.params,
            "opt_state": ts.opt_state,
            "env_states": ts.env_states,
            "key": ts.key,
        }
        if hasattr(ts, "carry"):  # recurrent policy: persist LSTM state
            state["carry"] = ts.carry
        checkpoint.save(args.ckpt, state)
        print(f"saved full train state to {args.ckpt}")


if __name__ == "__main__":
    main()

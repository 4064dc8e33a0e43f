#!/usr/bin/env python3
"""Small PPO hyperparameter sweep on the fused state-obs path.

Runs a grid of short training runs sequentially on the current backend
(ONE TPU process at a time) and prints one JSON line per run with the
mean reward / done fraction over the LAST QUARTER of iterations, so
defaults can be picked from the measured surface rather than folklore.
Used for the round-2 tuning pass; results recorded in STATUS.md.

  python scripts/sweep_ppo.py --map small_loop --envs 1024 --iters 40
"""
from __future__ import annotations

import argparse
import itertools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import numpy as np

from dtown import map_loader
from dtown.learn.ppo import PPOConfig, make_ppo
from dtown.types import EnvConfig


def run_one(cfg, maps, envs, iters, rollout, seed, **ppo_kw):
    ppo = PPOConfig(rollout_len=rollout, **ppo_kw)
    s_init, train_local = make_ppo(cfg, maps, envs, ppo, fused=True)
    train = jax.jit(lambda ts: train_local(ts))
    ts = s_init(jax.random.PRNGKey(seed))
    jax.block_until_ready(ts.params)
    hist = []
    t0 = time.time()
    for _ in range(iters):
        ts, metrics = train(ts)
        hist.append({k: float(v) for k, v in metrics.items()})
    dt = time.time() - t0
    tail = hist[-max(1, len(hist) // 4):]
    return dict(
        mean_reward_tail=float(np.mean([h["mean_reward"] for h in tail])),
        done_frac_tail=float(np.mean([h["done_frac"] for h in tail])),
        mean_reward_first=hist[0]["mean_reward"],
        seconds=round(dt, 1),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--map", default="small_loop")
    ap.add_argument("--envs", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=40)
    ap.add_argument("--rollout", type=int, default=64)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--lrs", default="3e-4,1e-3")
    ap.add_argument("--ents", default="0.01,0.003")
    ap.add_argument("--epochs", default="2,4")
    ap.add_argument("--minibatches", default="4")
    ap.add_argument("--seeds", default=None,
                    help="comma list of seeds (overrides --seed; results "
                         "are printed per seed AND averaged)")
    args = ap.parse_args()

    cfg = EnvConfig(obs_type="state")
    maps = map_loader.load_map(args.map)
    grid = list(itertools.product(
        [float(x) for x in args.lrs.split(",")],
        [float(x) for x in args.ents.split(",")],
        [int(x) for x in args.epochs.split(",")],
        [int(x) for x in args.minibatches.split(",")],
    ))
    seeds = ([int(x) for x in args.seeds.split(",")] if args.seeds
             else [args.seed])
    for lr, ent, ep, mb in grid:
        tails = []
        for sd in seeds:
            res = run_one(cfg, maps, args.envs, args.iters, args.rollout,
                          sd, lr=lr, ent_coef=ent, epochs=ep,
                          minibatches=mb)
            tails.append(res["mean_reward_tail"])
            print(json.dumps({"lr": lr, "ent_coef": ent, "epochs": ep,
                              "minibatches": mb, "seed": sd, **res}),
                  flush=True)
        if len(seeds) > 1:
            print(json.dumps({"lr": lr, "ent_coef": ent, "epochs": ep,
                              "minibatches": mb,
                              "mean_reward_tail_avg":
                                  float(np.mean(tails))}), flush=True)


if __name__ == "__main__":
    main()

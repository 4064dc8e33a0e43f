#!/usr/bin/env python3
"""Imitation learning (steering prediction) fully on device.

The reference fork's torch imitation scripts, rebuilt TPU-native
(SURVEY.md §2.16): a privileged lane-PD expert collects demos under
lax.scan, a BC student (state or RGB camera obs) regresses its actions,
and closed-loop survival is evaluated on device.

  python scripts/train_imitation.py --map small_loop --envs 512 \\
      --demo-steps 128 --epochs 10 --obs rgb
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
    jax.config.update("jax_platforms", "cpu")

from dtown import map_loader
from dtown.learn import imitation as im
from dtown.types import EnvConfig


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--map", default="small_loop")
    ap.add_argument("--envs", type=int, default=512)
    ap.add_argument("--demo-steps", type=int, default=128)
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--obs", default="rgb", choices=["rgb", "state"])
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--eval-steps", type=int, default=256)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--dagger-rounds", type=int, default=0,
                    help="DAgger rounds after BC: learner drives, the "
                         "expert labels, dataset aggregates")
    ap.add_argument("--dagger-beta", type=float, default=0.5,
                    help="expert-mix probability in round 0 (halves "
                         "each round)")
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    cfg = EnvConfig(obs_type=args.obs, camera_width=args.size,
                    camera_height=args.size)
    maps = map_loader.load_map(args.map)
    key = jax.random.PRNGKey(args.seed)
    k_demo, k_init, k_eval = jax.random.split(key, 3)

    t0 = time.time()
    obs, act = jax.jit(
        lambda k: im.collect_demos(cfg, maps, args.envs, args.demo_steps, k)
    )(k_demo)
    jax.block_until_ready(act)
    n = obs.shape[0] * obs.shape[1]
    print(json.dumps({"demos": n, "collect_s": round(time.time() - t0, 1),
                      "demo_steps_per_s": round(n / (time.time() - t0))}))

    init, train_epoch, policy = im.make_bc(cfg, lr=args.lr,
                                           batch_size=args.batch)
    bc = init(k_init, obs[0])
    epoch = jax.jit(train_epoch)
    for e in range(args.epochs):
        t1 = time.time()
        bc, loss = epoch(bc, obs, act)
        print(json.dumps({"epoch": e, "bc_loss": round(float(loss), 6),
                          "seconds": round(time.time() - t1, 1)}))

    beta = args.dagger_beta
    for r in range(args.dagger_rounds):
        key, k_roll = jax.random.split(key)
        d_obs, d_act = jax.jit(
            lambda p, k, b=beta: im.collect_dagger(
                cfg, maps, p, policy, args.envs, args.demo_steps, k,
                beta=b)
        )(bc.params, k_roll)
        obs = jax.numpy.concatenate([obs, d_obs], axis=0)
        act = jax.numpy.concatenate([act, d_act], axis=0)
        for e in range(args.epochs):
            bc, loss = epoch(bc, obs, act)
        print(json.dumps({"dagger_round": r, "beta": round(beta, 3),
                          "dataset": int(obs.shape[0] * obs.shape[1]),
                          "bc_loss": round(float(loss), 6)}))
        beta *= 0.5

    surv, mr = jax.jit(
        lambda p, k: im.eval_closed_loop(
            cfg, maps, p, policy, args.envs, args.eval_steps, k)
    )(bc.params, k_eval)
    print(json.dumps({"closed_loop_survival": round(float(surv), 4),
                      "mean_reward": round(float(mr), 4),
                      "eval_steps": args.eval_steps}))
    if args.ckpt:
        from dtown.utils import checkpoint

        checkpoint.save(args.ckpt, {"params": bc.params})
        print(f"saved params to {args.ckpt}")


if __name__ == "__main__":
    main()

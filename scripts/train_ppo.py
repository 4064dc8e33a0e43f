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
    ap.add_argument("--ckpt", default=None,
                    help="checkpoint path (orbax dir); written at the "
                         "end and, with --ckpt-every, periodically")
    ap.add_argument("--ckpt-every", type=int, default=0,
                    help="save the full train state to --ckpt every N "
                         "iterations (atomic overwrite; a killed run "
                         "resumes from the last snapshot via --resume)")
    ap.add_argument("--ckpt-keep", type=int, default=2,
                    help="snapshots retained in the --ckpt rotation "
                         "(>2 allows rollback to older iterations; "
                         "see utils.checkpoint.slots)")
    ap.add_argument("--resume", default=None,
                    help="restore a --ckpt snapshot and continue from "
                         "its recorded iteration (elastic restart; "
                         "works across mesh sizes)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--renderer", default="pallas", choices=["xla", "pallas"])
    ap.add_argument("--fused", action="store_true",
                    help="single-host blob-carried rollouts through the "
                         "fused Pallas kernels")
    ap.add_argument("--obs", default="rgb", choices=["rgb", "state"])
    ap.add_argument("--log-every", type=int, default=5)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--ent-coef", type=float, default=0.01)
    ap.add_argument("--gamma", type=float, default=0.99)
    ap.add_argument("--gae-lambda", type=float, default=0.95)
    ap.add_argument("--clip-eps", type=float, default=0.2)
    ap.add_argument("--epochs", type=int, default=4)
    ap.add_argument("--minibatches", type=int, default=8)
    ap.add_argument("--reward-scale", type=float, default=0.02)
    ap.add_argument("--trunk", default="nature",
                    choices=["nature", "impala"])
    ap.add_argument("--nav", action="store_true",
                    help="Nav task (goal tiles, in-kernel bonus/done/"
                         "redraw) instead of lane following; fused only")
    ap.add_argument("--nav-shaping", type=float, default=0.0,
                    help="Nav goal-distance shaping coefficient "
                         "(potential-based EXTENSION, default off; "
                         "reference Nav pays only the terminal bonus)")
    ap.add_argument("--goal-in-obs", action="store_true",
                    help="append the agent-frame goal offset to state "
                         "observations (the learnable Nav form)")
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
        nav_shaping_coef=args.nav_shaping,
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
        from dtown.learn.ppo import make_ppo

        s_init, train_local = make_ppo(cfg, maps, args.envs, ppo,
                                       fused=True, nav=args.nav,
                                       goal_in_obs=args.goal_in_obs)
        s_train = jax.jit(lambda ts: train_local(ts))
    else:
        assert not args.nav, "--nav requires --fused"
        mesh, s_init, s_train = make_sharded_ppo(
            cfg, maps, args.envs, ppo=ppo, mesh=mesh
        )

    if args.ckpt_every and not args.ckpt:
        ap.error("--ckpt-every requires --ckpt")

    import jax.numpy as jnp

    def payload(ts, it):
        # full training state: params + optimizer + vectorized env state
        # pytree + PRNG key + iteration (SURVEY.md §5 checkpoint/resume
        # and failure-detection/elastic-recovery rows)
        state = {
            "params": ts.params,
            "opt_state": ts.opt_state,
            "env_states": ts.env_states,
            "key": ts.key,
            "it": jnp.asarray(it, jnp.int32),
        }
        if hasattr(ts, "carry"):  # recurrent policy: persist LSTM state
            state["carry"] = ts.carry
        return state

    timer = PhaseTimer()
    with timer.phase("init"):
        ts = s_init(jax.random.PRNGKey(args.seed))
        jax.block_until_ready(ts.params)

    start_iter = 0
    if args.resume:
        from dtown.utils import checkpoint

        # template from the fresh init: same pytree structure regardless
        # of the saving run's mesh size (restore-onto-smaller-mesh is
        # covered by tests/test_checkpoint_reshard.py)
        template = jax.device_get(payload(ts, 0))
        restored = checkpoint.restore(os.path.abspath(args.resume),
                                      template)
        start_iter = int(restored["it"])
        fields = dict(
            params=restored["params"], opt_state=restored["opt_state"],
            env_states=restored["env_states"],
            key=jnp.asarray(restored["key"]),
        )
        if "carry" in restored:
            fields["carry"] = restored["carry"]
        ts = type(ts)(**fields)
        print(f"resumed from {args.resume} at iter {start_iter}")
        if start_iter >= args.iters:
            print(f"checkpoint already at iter {start_iter} >= --iters "
                  f"{args.iters}; nothing to do")
            return

    def save_ckpt(ts, it):
        from dtown.utils import checkpoint

        # crash-safe overwrite: a kill at any instant leaves one intact
        # snapshot (rotating slots + atomic pointer)
        checkpoint.save_atomic(os.path.abspath(args.ckpt),
                               payload(ts, it), keep=args.ckpt_keep)
        print(f"saved full train state to {args.ckpt} (iter {it})",
              file=sys.stderr)

    steps_per_iter = args.envs * ppo.rollout_len
    for it in range(start_iter, args.iters):
        with timer.phase("train", steps=steps_per_iter):
            ts, metrics = s_train(ts)
            metrics = {k: float(v) for k, v in metrics.items()}
        if it % args.log_every == 0 or it == args.iters - 1:
            print(json.dumps({"iter": it, **{k: round(v, 4) for k, v in metrics.items()}}))
        if args.ckpt_every and (it + 1) % args.ckpt_every == 0:
            # snapshot is the state ENTERING iter it+1; --resume
            # continues there (orbax save is atomic: tmp dir + rename,
            # so a kill mid-save keeps the previous snapshot)
            save_ckpt(ts, it + 1)

    print(timer.report())
    if args.ckpt:
        save_ckpt(ts, args.iters)


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Generate a steering-prediction dataset by driving the simulator.

Mirrors the reference fork's data-generation scripts (SURVEY.md §2.16:
scripts that drive the simulator to produce torch training data). The
privileged lane-PD expert (dtown.learn.imitation) drives num_envs
parallel environments fully on device; the (observation, action) pairs
are exported as one .npz the host only touches once.

Usage:
  python scripts/gen_data.py --map small_loop --envs 64 --steps 200 \
      --obs rgb --size 64 --out /tmp/demos.npz
  # -> demos.npz with obs [N,H,W,C] uint8, act [N,2] f32, plus the
  #    flattened (T,B) provenance indices
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

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--map", default="small_loop", nargs="+")
    ap.add_argument("--envs", type=int, default=64)
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--obs", default="rgb", choices=["rgb", "state"])
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--domain-rand", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="/tmp/dtown_demos.npz")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    from dtown import map_loader
    from dtown.learn.imitation import collect_demos
    from dtown.types import EnvConfig

    cfg = EnvConfig(
        obs_type=args.obs, camera_width=args.size, camera_height=args.size,
        domain_rand=args.domain_rand,
    )
    names = args.map if isinstance(args.map, list) else [args.map]
    maps = (map_loader.stack_maps(names) if len(names) > 1
            else map_loader.load_map(names[0]))

    t0 = time.perf_counter()
    obs, act = jax.jit(
        lambda k: collect_demos(cfg, maps, args.envs, args.steps, k)
    )(jax.random.PRNGKey(args.seed))
    obs, act = jax.block_until_ready((obs, act))
    dt = time.perf_counter() - t0

    T, B = act.shape[:2]
    step_idx = np.repeat(np.arange(T), B)
    env_idx = np.tile(np.arange(B), T)
    obs_np = np.asarray(obs).reshape((T * B,) + obs.shape[2:])
    act_np = np.asarray(act).reshape(T * B, -1)
    np.savez_compressed(
        args.out, obs=obs_np, act=act_np,
        step_idx=step_idx, env_idx=env_idx,
        meta=json.dumps({
            "maps": names, "obs_type": args.obs, "size": args.size,
            "domain_rand": args.domain_rand, "seed": args.seed,
        }),
    )
    print(json.dumps({
        "samples": int(T * B),
        "obs_shape": list(obs_np.shape[1:]),
        "out": args.out,
        "bytes": os.path.getsize(args.out),
        "gen_steps_per_s": round(T * B / dt),
    }))


if __name__ == "__main__":
    main()

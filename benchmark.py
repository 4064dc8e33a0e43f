#!/usr/bin/env python3
"""Single-env frame-rate benchmark, mirroring the reference's repo-root
`benchmark.py` (wall-clock FPS of reset + step + render on one env —
SURVEY.md §2.17). For the massively-vectorized TPU harness use bench.py;
this script answers the apples-to-apples question "what does the
reference's own measurement loop report on dtown?".

Usage: python benchmark.py [--map udem1] [--steps 300] [--cpu]
"""
from __future__ import annotations

import argparse
import json
import sys
import time

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--map", default="udem1")
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import dtown

    env = dtown.make(args.map, camera_width=args.width,
                     camera_height=args.height)
    # warm the jit caches outside the timed loop (the reference's GL
    # pipeline has the same warm-up structure: first frame compiles
    # shaders / uploads textures)
    obs = env.reset()
    env.step([0.1, 0.0])
    env.reset()

    t0 = time.perf_counter()
    n = 0
    for _ in range(args.steps):
        obs, r, done, info = env.step([0.3, 0.1])
        n += 1
        if done:
            env.reset()
    dt = time.perf_counter() - t0

    fps = n / dt
    print(json.dumps({
        "metric": "single_env_fps",
        "value": round(fps, 1),
        "unit": "frames/s",
        "map": args.map,
        "resolution": f"{args.width}x{args.height}",
        "obs_dtype": str(np.asarray(obs).dtype),
        "device": jax.devices()[0].platform,
    }))


if __name__ == "__main__":
    main()

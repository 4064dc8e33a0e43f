#!/usr/bin/env python3
"""Phase bisection: time jitted sub-graphs of the env step on the chip.

Isolates where a batched step's time goes: dynamics, lane geometry,
collision, NPC updates, spawn/reset, ground render, object render.
Each phase is scanned ITERS times inside one jit (same as bench.py) so
per-call dispatch overhead is amortized identically.
"""
from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

from dtown import env as env_core
from dtown import map_loader
from dtown import objects as objlib
from dtown import physics
from dtown.dynamics import integrate, wheel_model
from dtown.geometry import get_lane_pos2
from dtown.render.raster import camera_rays, _ground_color, _render_objects
from dtown.types import EnvConfig


def timed_scan(name, fn, init, iters, results):
    """Scan fn iters times inside one jit; report per-iter ms."""

    @functools.partial(jax.jit, static_argnums=(1,))
    def run(carry, n):
        def body(c, _):
            return fn(c), ()
        c, _ = jax.lax.scan(body, carry, None, length=n)
        return c

    # warm up the SAME executable that is timed (see CLAUDE.md traps)
    jax.block_until_ready(run(init, iters))
    t0 = time.time()
    jax.block_until_ready(run(init, iters))
    dt = time.time() - t0
    ms = dt / iters * 1e3
    results[name] = round(ms, 3)
    print(f"{name:28s}: {ms:8.3f} ms/iter", file=sys.stderr)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--map", default="udem1")
    ap.add_argument("--envs", type=int, default=1024)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    cfg = EnvConfig(obs_type="rgb", camera_width=args.size,
                    camera_height=args.size)
    maps = map_loader.load_map(args.map)
    B = args.envs
    print(f"device: {jax.devices()[0]}  map={args.map} envs={B}",
          file=sys.stderr)

    keys = jax.random.split(jax.random.PRNGKey(0), B)
    idx = jnp.zeros((B,), dtype=jnp.int32)
    states = jax.jit(
        jax.vmap(lambda k, i: env_core.reset(cfg, maps, k, i))
    )(keys, idx)
    jax.block_until_ready(states)
    action = jnp.tile(jnp.array([0.4, 0.1], jnp.float32), (B, 1))
    results = {}

    # 1. dynamics only
    def dyn_only(s):
        wheels = jnp.clip(wheel_model(
            action, cfg.gain, cfg.trim, cfg.wheel_radius, cfg.k, cfg.limit,
            s.wheel_dist), -1, 1)
        pos, angle, speed, wv = jax.vmap(
            lambda p, a, w, rs, wd: integrate(
                p, a, w, rs, wd, cfg.delta_time, 1)
        )(s.pos, s.angle, wheels, s.robot_speed, s.wheel_dist)
        return s.replace(pos=pos, angle=angle, speed=speed)

    timed_scan("dynamics", dyn_only, states, args.iters, results)

    # 2. lane geometry
    def lane(s):
        lp = jax.vmap(lambda p, a: get_lane_pos2(maps, p, a))(s.pos, s.angle)
        return s.replace(speed=s.speed + 1e-9 * lp.dist)

    timed_scan("lane_pos", lane, states, args.iters, results)

    # 3. collision + proximity
    def coll(s):
        def one(p, a):
            valid, c = physics.valid_pose(
                maps, p, a, maps.obj_corners, maps.obj_norms, maps.obj_mask)
            pen = physics.proximity_penalty(
                p, a, maps.obj_pos, maps.obj_safety_rad, maps.obj_mask,
                maps.obj_is_dynamic)
            return valid, pen
        valid, pen = jax.vmap(one)(s.pos, s.angle)
        return s.replace(speed=s.speed + 1e-9 * pen)

    timed_scan("collision", coll, states, args.iters, results)

    # 4. NPC objects
    def npc(s):
        dyn = jax.vmap(lambda d: objlib.step_dynamic_objects(
            maps, d, cfg.delta_time))(s.dyn)
        return s.replace(dyn=dyn)

    timed_scan("npc_objects", npc, states, args.iters, results)

    # 5. reset (bank spawn + randomization)
    def do_reset(s):
        ns = jax.vmap(lambda k, i: env_core.reset(cfg, maps, k, i))(
            jax.vmap(jax.random.fold_in)(s.rng, s.step_count.astype(jnp.uint32)),
            s.map_idx)
        return ns

    timed_scan("reset_full", do_reset, states, args.iters, results)

    # 6. ground render only
    def ground(s):
        def one(st):
            rays, eye = camera_rays(cfg, st)
            rgb, t = _ground_color(cfg, maps, st, rays, eye)
            return rgb.sum()
        r = jax.vmap(one)(s)
        return s.replace(speed=s.speed + 1e-12 * r)

    timed_scan("render_ground", ground, states, args.iters, results)

    # 7. full render (ground + objects)
    def full_render(s):
        def one(st):
            return env_core.render_obs(cfg, maps, st).astype(jnp.float32).sum()
        r = jax.vmap(one)(s)
        return s.replace(speed=s.speed + 1e-12 * r)

    timed_scan("render_full", full_render, states, args.iters, results)

    # 8. entire step
    def full(s):
        ns, out = jax.vmap(lambda st, a: env_core.step(cfg, maps, st, a))(
            s, action)
        return ns

    timed_scan("full_step", full, states, args.iters, results)

    print(json.dumps(results))


if __name__ == "__main__":
    main()

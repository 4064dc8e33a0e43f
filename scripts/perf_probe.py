"""Perf attribution probe for the fused step (TPU).

Times, via scan-200 loops with donated carries and identical static args
for warmup and timing (CLAUDE.md measurement traps):
  state      — fused state kernel only
  render     — blob-fed render kernel only (blob constant per iter)
  full       — the production fused_step (state + render + glue)

Run: python scripts/perf_probe.py --map loop_obstacles --envs 4096
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import functools
import time

import jax
import jax.numpy as jnp

from dtown import env as env_core, map_loader
from dtown.ops import state_kernel as sk
from dtown.ops.fused_env import make_fused_rollout, pack_blob
from dtown.types import EnvConfig


def timed(fn, carry, n=3):
    outs = []
    for _ in range(n):
        t0 = time.time()
        carry = jax.block_until_ready(fn(carry))
        outs.append(time.time() - t0)
    return sorted(outs)[len(outs) // 2], carry


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--map", default="loop_obstacles")
    ap.add_argument("--envs", type=int, default=4096)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--epb", type=int, default=0)
    args = ap.parse_args()

    cfg = EnvConfig(obs_type="rgb", camera_width=args.size,
                    camera_height=args.size, renderer="pallas")
    maps = map_loader.load_map(args.map)
    B, N = args.envs, args.iters
    tables = sk.build_tables(cfg, maps)
    actions = jnp.tile(jnp.array([0.4, 0.1], jnp.float32), (B, 1))

    keys = jax.random.split(jax.random.PRNGKey(0), B)
    idx = jnp.zeros((B,), jnp.int32)
    states = jax.jit(jax.vmap(lambda k, i: env_core.reset(cfg, maps, k, i))
                     )(keys, idx)
    blob = pack_blob(states, maps, cfg.domain_rand)

    report = {}

    @functools.partial(jax.jit, donate_argnums=(0,))
    def run_state(b):
        def body(b, _):
            b = sk.state_step_pallas(cfg, maps, b, actions, tables)
            return b, ()
        b, _ = jax.lax.scan(body, b, None, length=N)
        return b

    b = run_state(jnp.array(blob))
    t, b = timed(run_state, b)
    report["state"] = t / N
    print(f"state : {t/N*1e3:8.3f} ms/iter", file=sys.stderr, flush=True)

    from dtown.render.blob_raster import (
        build_render_plan, render_frames_from_blob,
    )

    plan = build_render_plan(cfg, maps)
    if plan is not None:
        epb = args.epb or None

        @functools.partial(jax.jit, donate_argnums=(0,))
        def run_render(b):
            # vary the blob per iter WITHOUT a scalar->carry fold (trap:
            # scalar broadcasts back into the carry serialize at ~ms);
            # consume each frame through the ys reductions like bench.py
            def body(b, i):
                bb = b + i.astype(jnp.float32) * 1e-8
                obs = render_frames_from_blob(cfg, maps, bb, plan,
                                              epb=epb)
                return b, jnp.sum(obs[:, 0, 0, :], dtype=jnp.int32)
            b, s = jax.lax.scan(body, b, jnp.arange(N), unroll=4)
            return b, s[-1]

        b2, _ = run_render(jnp.array(blob))
        t, (b2, _) = timed(lambda c: run_render(c[0]),
                           (b2, None))
        report["render"] = t / N
        print(f"render: {t/N*1e3:8.3f} ms/iter", file=sys.stderr,
              flush=True)

    _, fused_step, _ = make_fused_rollout(cfg, maps, B)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def run_full(b):
        def body(b, _):
            b, out, obs = fused_step(b, states, actions)
            return b, (out.reward.sum(),
                       jnp.sum(obs[:, 0, 0, :], dtype=jnp.int32))
        b, ys = jax.lax.scan(body, b, None, length=N, unroll=4)
        # consume BOTH scan outputs: dropping the obs checksum lets XLA
        # dead-code-eliminate the entire render kernel (measured: "full"
        # reported 149us/iter == state-only, while render is ~6ms)
        return b, ys[0][-1] + ys[1][-1].astype(jnp.float32)

    b3, _ = run_full(jnp.array(blob))
    t, _ = timed(lambda c: run_full(c[0]), (b3, None))
    report["full"] = t / N
    print(f"full  : {t/N*1e3:8.3f} ms/iter", file=sys.stderr, flush=True)

    for k, v in report.items():
        print(f"{k}: {v*1e6:.1f} us/iter ({B/v/1e6:.3f} M steps/s)")


if __name__ == "__main__":
    main()

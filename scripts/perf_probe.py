"""Perf attribution probe for the fused step (TPU).

Times, via scan-200 loops with donated carries and identical static args
for warmup and timing (CLAUDE.md measurement traps):
  state      — fused state kernel only
  render     — fused render kernel only, rows precomputed outside (kernel
               cost with zero per-step XLA glue)
  glue       — the per-step XLA row preparation only (cam/words/flags
               vmaps), no pallas calls
  full       — the production fused_step (state + glue + render)

Run: python scripts/perf_probe.py --map loop_obstacles --envs 4096
"""
from __future__ import annotations

import argparse
import functools
import sys
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
    blob = pack_blob(states)

    report = {}

    # ---- state kernel only ----
    @functools.partial(jax.jit, donate_argnums=(0,))
    def run_state(b):
        def body(b, _):
            b = sk.state_step_pallas(cfg, maps, b, actions, tables)
            return b, ()
        b, _ = jax.lax.scan(body, b, None, length=N)
        return b

    b = run_state(jnp.array(blob))  # compile+warm
    t, b = timed(run_state, b)
    report["state"] = t / N
    print(f"state : {t/N*1e3:8.3f} ms/iter", file=sys.stderr, flush=True)

    # ---- production fused step ----
    _, fused_step, rollout = make_fused_rollout(cfg, maps, B)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def run_full(b):
        def body(b, _):
            b, out, obs = fused_step(b, states, actions)
            return b, ()
        b, _ = jax.lax.scan(body, b, None, length=N)
        return b

    b2 = run_full(jnp.array(blob))
    t, b2 = timed(run_full, b2)
    report["full"] = t / N
    print(f"full  : {t/N*1e3:8.3f} ms/iter", file=sys.stderr, flush=True)

    # ---- render kernel only (precomputed rows) ----
    from dtown.render import pallas_raster as pr

    scene = pr._build_static_scene(cfg, maps)
    H, W = cfg.camera_height, cfg.camera_width
    S = H * W // pr.LANE_N
    Hg, Wg = maps.grid_shape
    n_tiles = Hg * Wg
    n_words = -(-n_tiles // 4)
    import numpy as np

    try:
        present = frozenset(int(x) for x in np.unique(np.asarray(maps.tile_kind)))
    except Exception:
        present = None

    def pad_row(a):
        pad = -(-a.shape[-1] // pr.LANE_N) * pr.LANE_N - a.shape[-1]
        return jnp.pad(a, ((0, 0), (0, pad)))

    if scene is not None:
        def per_env_static(state):
            cam, eye = pr.prepare_camera_row(cfg, state)
            cam = cam.at[pr.C_TSINV].set(1.0 / maps.tile_size)
            words = pr.pack_tile_words(maps, state.tex_variant)
            flags = (pr._static_flags(cfg, maps, state, eye, scene)
                     if scene else jnp.zeros((2,), jnp.float32))
            return cam, words, flags

        cam, words, flags = jax.jit(jax.vmap(per_env_static))(states)
        cam_p = pad_row(cam)[:, None, :]
        words_p = words[:, None, :]
        flags_p = pad_row(flags)[:, None, :]
        kernel = pr._make_kernel_static(H, W, Hg, Wg, n_words, S, present,
                                        scene)
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        def row_spec(width):
            return pl.BlockSpec((1, 1, width), lambda bb: (bb, 0, 0),
                                memory_space=pltpu.VMEM)

        @functools.partial(jax.jit, donate_argnums=(0,))
        def run_render(cam_p):
            def body(c, _):
                out = pl.pallas_call(
                    kernel,
                    out_shape=jax.ShapeDtypeStruct((B, 3, S, pr.LANE_N),
                                                   jnp.uint8),
                    grid=(B,),
                    in_specs=[row_spec(cam_p.shape[2]),
                              row_spec(words_p.shape[2]),
                              row_spec(flags_p.shape[2])],
                    out_specs=pl.BlockSpec((1, 3, S, pr.LANE_N),
                                           lambda bb: (bb, 0, 0, 0),
                                           memory_space=pltpu.VMEM),
                )(c, words_p, flags_p)
                # fold a tiny function of out back into the carry so the
                # render isn't DCE'd and each iter sees distinct data
                c = c + (jnp.sum(out, dtype=jnp.int32) % 3).astype(
                    jnp.float32) * 1e-9
                return c, ()
            c, _ = jax.lax.scan(body, cam_p, None, length=N)
            return c

        c = run_render(jnp.array(cam_p))
        t, c = timed(run_render, c)
        report["render"] = t / N
        print(f"render: {t/N*1e3:8.3f} ms/iter", file=sys.stderr, flush=True)

        # ---- glue only ----
        @functools.partial(jax.jit, donate_argnums=(0,))
        def run_glue(b):
            def body(b, _):
                from dtown.ops.fused_env import update_states_from_blob

                st = update_states_from_blob(states, b)
                cam, words, flags = jax.vmap(per_env_static)(st)
                s = (cam.sum() + words.sum() + flags.sum()).astype(
                    jnp.float32)
                b = b + s * 1e-12
                return b, ()
            b, _ = jax.lax.scan(body, b, None, length=N)
            return b

        b3 = run_glue(jnp.array(blob))
        t, b3 = timed(run_glue, b3)
        report["glue"] = t / N
        print(f"glue  : {t/N*1e3:8.3f} ms/iter", file=sys.stderr, flush=True)

    for k, v in report.items():
        print(f"{k}: {v*1e6:.1f} us/iter ({B/v/1e6:.3f} M steps/s)")


if __name__ == "__main__":
    main()

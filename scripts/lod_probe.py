"""LOD adoption gate: pixel-diff of obj_lod_px vs LOD-off over random
reset states, per map/resolution (VERDICT r4 item 1: gate the semantic
cull levers on mean |diff| < 1 and frac(|diff| > 10) < 1%).

Runs the XLA reference renderer on CPU (the fused kernel implements the
identical per-prim cull — tests/test_blob_render.py holds the two
together), so the probe needs no TPU time.

    python scripts/lod_probe.py --maps udem1,loop_obstacles --q 1.0,1.5,2.0
"""
from __future__ import annotations

import argparse
import dataclasses

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from dtown import env as env_core, map_loader  # noqa: E402
from dtown.types import EnvConfig  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--maps", default="udem1,loop_obstacles,bigtown")
    ap.add_argument("--q", default="1.0,1.5,2.0")
    ap.add_argument("--sizes", default="64,96")
    ap.add_argument("--envs", type=int, default=64)
    ap.add_argument("--domain-rand", action="store_true",
                    help="gate the DR render path too (config-4 class)")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    for map_name in args.maps.split(","):
        maps = map_loader.load_map(map_name)
        for size in (int(s) for s in args.sizes.split(",")):
            base = EnvConfig(obs_type="rgb", camera_width=size,
                             camera_height=size, auto_reset=False,
                             domain_rand=args.domain_rand,
                             obj_lod_px=0.0)
            keys = jax.random.split(jax.random.PRNGKey(args.seed),
                                    args.envs)
            idx = jnp.zeros((args.envs,), jnp.int32)
            states = jax.vmap(
                lambda k, i: env_core.reset(base, maps, k, i))(keys, idx)
            render = jax.jit(jax.vmap(
                lambda s, c: env_core.render_obs(c, maps, s),
                in_axes=(0, None)), static_argnums=1)
            img0 = np.asarray(render(states, base)).astype(int)
            for q in (float(x) for x in args.q.split(",")):
                cfg = dataclasses.replace(base, obj_lod_px=q)
                img = np.asarray(render(states, cfg)).astype(int)
                d = np.abs(img - img0)
                ok = d.mean() < 1.0 and (d > 10).mean() < 0.01
                print(f"{map_name:16s} {size}x{size} q={q:3.1f}: "
                      f"mean {d.mean():.4f}  frac>10 {(d > 10).mean():.5f}"
                      f"  max {d.max():3d}  {'PASS' if ok else 'FAIL'}")


if __name__ == "__main__":
    main()

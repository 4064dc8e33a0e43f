"""Fused Pallas render kernel vs the XLA reference renderer.

Runs in interpret mode on the CPU test backend; the same comparison on
real TPU hardware is exercised by bench.py --renderer pallas.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dtown import env as env_core, map_loader
from dtown.render.pallas_raster import planes_to_nhwc, render_frames_pallas
from dtown.types import EnvConfig


@pytest.mark.parametrize("map_name", ["loop_obstacles", "udem1"])
def test_pallas_matches_xla(map_name):
    cfg = EnvConfig(obs_type="rgb", camera_width=64, camera_height=64,
                    auto_reset=False)
    maps = map_loader.load_map(map_name)
    keys = jax.random.split(jax.random.PRNGKey(1), 4)
    idx = jnp.zeros((4,), jnp.int32)
    states = jax.vmap(lambda k, i: env_core.reset(cfg, maps, k, i))(keys, idx)

    planes = render_frames_pallas(cfg, maps, states, interpret=True)
    img_p = np.asarray(planes_to_nhwc(cfg, planes)).astype(int)
    img_x = np.asarray(
        jax.vmap(lambda s: env_core.render_obs(cfg, maps, s))(states)
    ).astype(int)
    diff = np.abs(img_p - img_x)
    # identical up to the arc-dash phase approximation + rounding
    assert diff.mean() < 2.0
    assert (diff > 10).mean() < 0.03


def test_step_batch_pallas_path():
    cfg = EnvConfig(obs_type="rgb", camera_width=64, camera_height=64,
                    renderer="pallas")
    maps = map_loader.load_map("loop_obstacles")
    keys = jax.random.split(jax.random.PRNGKey(0), 8)
    idx = jnp.zeros((8,), jnp.int32)
    states = jax.vmap(lambda k, i: env_core.reset(cfg, maps, k, i))(keys, idx)
    actions = jnp.tile(jnp.array([0.3, 0.0]), (8, 1))
    states, outs = jax.jit(
        lambda s, a: env_core.step_batch(cfg, maps, s, a)
    )(states, actions)
    assert outs.obs.shape == (8, 64, 64, 3)
    assert outs.obs.dtype == jnp.uint8
    assert np.asarray(outs.obs).std() > 5.0

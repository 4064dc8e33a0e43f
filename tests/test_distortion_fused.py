"""Fused-path fisheye (permutation matmul) vs the XLA gather remap."""
import numpy as np

import jax
import jax.numpy as jnp

from dtown import env as env_core, map_loader
from dtown.render.distortion import apply_distortion, apply_distortion_planes
from dtown.render.pallas_raster import planes_to_nhwc, render_frames_pallas
from dtown.types import EnvConfig


def test_perm_matmul_matches_gather_remap():
    cfg = EnvConfig(obs_type="rgb", camera_width=64, camera_height=64,
                    distortion=True)
    cfg_plain = EnvConfig(obs_type="rgb", camera_width=64, camera_height=64)
    maps = map_loader.load_map("small_loop")
    keys = jax.random.split(jax.random.PRNGKey(0), 2)
    idx = jnp.zeros((2,), jnp.int32)
    states = jax.vmap(lambda k, i: env_core.reset(cfg_plain, maps, k, i))(
        keys, idx
    )
    planes = render_frames_pallas(cfg_plain, maps, states, interpret=True)

    warped_mm = np.asarray(
        planes_to_nhwc(cfg, apply_distortion_planes(cfg, planes))
    )
    # gather path applied to the same frames
    imgs = np.asarray(planes_to_nhwc(cfg_plain, planes))
    warped_gather = np.stack([
        np.asarray(apply_distortion(cfg, jnp.asarray(im))) for im in imgs
    ])
    diff = np.abs(warped_mm.astype(int) - warped_gather.astype(int))
    # same nearest-neighbor permutation; bf16 rounding only
    assert diff.mean() < 1.5
    assert (diff > 4).mean() < 0.01

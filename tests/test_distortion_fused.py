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


def test_ray_level_distortion_matches_legacy_remap():
    """The production ray-level fisheye (distortion baked into the
    per-pixel ray table) must agree with the recorded remap semantics
    (render rectilinear, then nearest-neighbor warp) up to the remap's
    own quantization: the remap floors the continuous source coordinate
    to a pixel, the ray table samples it exactly, so differences are
    bounded by a half-pixel ray offset — plus the frame edges, where the
    remap clamps into the rendered frame while the true ray keeps going
    (the ray-level form is strictly more faithful there)."""
    from dtown.render.distortion import (
        FX, FY, CX, CY, _undistort_coords, apply_distortion,
    )

    W = H = 64
    cfg_d = EnvConfig(obs_type="rgb", camera_width=W, camera_height=H,
                      distortion=True, auto_reset=False)
    cfg_0 = EnvConfig(obs_type="rgb", camera_width=W, camera_height=H,
                      auto_reset=False)
    maps = map_loader.load_map("loop_obstacles")
    state = env_core.reset(cfg_0, maps, jax.random.PRNGKey(4))
    ray_level = np.asarray(env_core.render_obs(cfg_d, maps, state)).astype(int)
    rect = env_core.render_obs(cfg_0, maps, state)
    remap = np.asarray(apply_distortion(cfg_d, rect)).astype(int)

    # in-frame mask: destination pixels whose continuous source
    # coordinate lies inside the rendered frame (no edge clamping)
    xu, yu = _undistort_coords(W, H)
    su = xu * (FX * W) + CX * W
    sv = yu * (FY * H) + CY * H
    inside = (su >= 0.5) & (su <= W - 0.5) & (sv >= 0.5) & (sv <= H - 0.5)
    assert inside.mean() > 0.5  # the comparison must not be vacuous

    diff = np.abs(ray_level - remap)[inside]
    # nearest-neighbor quantization: most pixels land on the same tile
    # shading; disagreements concentrate on marking/object silhouettes
    assert np.median(diff) <= 2.0, np.median(diff)
    assert (diff > 40).mean() < 0.06, (diff > 40).mean()
    # centers coincide exactly up to rounding
    c = slice(H // 2 - 2, H // 2 + 2)
    assert np.abs(ray_level[c, c] - remap[c, c]).mean() < 6.0

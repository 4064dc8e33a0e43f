"""Domain randomization as traced PRNG ops.

The reference draws randomization inline in ``Simulator.reset`` via
``np_random`` (reference: simulator.py::reset — light position, sky/ground
colors, robot speed, camera fov/height/angle, wheel_dist, per-tile texture
variants, optional-object visibility; SURVEY.md §3.4 / §5 "Domain
randomization"). Here the same fields are one batched struct produced from
a jax PRNG key so the whole reset stays in-graph.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from dtown import constants as C

N_TEX_VARIANTS = 4  # numbered texture variants per base texture
                    # (reference: graphics.py::Texture.get random variant)


def variant_hash(tile_id, seed):
    """Per-tile texture-variant pick as an integer hash of (tile, seed).

    Used identically by the XLA reset (below) and the fused render
    kernel (render/blob_raster.py), so both paths see the same variant
    field for the same seed. Plain int32 jnp ops — kernel-safe.
    """
    # Multiply-free Jenkins-style mix (same rounds as
    # shading._hash_noise): int32 multiplies are emulated multi-op on
    # the TPU VPU and this hash runs per PIXEL in the fused kernel's
    # domain-rand path. Uniformity/decorrelation checked r4 (per-variant
    # frequency 0.247-0.252, adjacent-tile agreement 0.259 ~ ideal
    # 0.25, cross-seed agreement 0.229).
    h = (tile_id ^ (seed << 13)) + seed
    h = h + (h << 10)
    h = h ^ (h >> 6)
    h = h + (h << 3)
    h = h ^ (h >> 11)
    h = h + (h << 15)
    h = h ^ (h >> 7)
    return h & (N_TEX_VARIANTS - 1)

# Nominal (no-randomization) values — numpy on purpose: module-level jnp
# constants can leak as tracers when first materialized inside a trace
import numpy as _np

NOMINAL_GROUND_COLOR = _np.array([0.15, 0.15, 0.15], dtype=_np.float32)
NOMINAL_HORIZON_COLOR = _np.array([0.45, 0.62, 0.93], dtype=_np.float32)  # blue_sky
NOMINAL_LIGHT_DIR = _np.array([-0.35, -0.82, -0.45], dtype=_np.float32)
NOMINAL_AMBIENT = 0.55


def draw(cfg, key, grid_shape, n_objects):
    """Sample all randomization fields; identity draws if not domain_rand.

    Returns a dict matching the randomization fields of EnvState.
    """
    ks = jax.random.split(key, 12)
    H, W = grid_shape

    if cfg.domain_rand:
        robot_speed = jax.random.uniform(
            ks[0], (), minval=0.9 * cfg.robot_speed, maxval=1.1 * cfg.robot_speed
        )
        cam_fov_y = C.CAMERA_FOV_Y + jax.random.uniform(
            ks[1], (), minval=-5.0, maxval=5.0
        )
        cam_height = C.CAMERA_FLOOR_DIST * jax.random.uniform(
            ks[2], (), minval=0.92, maxval=1.08
        )
        cam_angle = C.CAMERA_ANGLE + jax.random.uniform(
            ks[3], (), minval=-3.0, maxval=3.0
        )
        cam_fwd_dist = C.CAMERA_FORWARD_DIST * jax.random.uniform(
            ks[4], (), minval=0.9, maxval=1.1
        )
        wheel_dist = C.WHEEL_DIST * jax.random.uniform(
            ks[5], (), minval=0.95, maxval=1.05
        )
        light = jax.random.uniform(ks[6], (3,), minval=-1.0, maxval=-0.2)
        light = light.at[1].set(-1.0)
        light_dir = light / jnp.linalg.norm(light)
        light_ambient = jax.random.uniform(ks[7], (), minval=0.35, maxval=0.7)
        ground_color = jnp.clip(
            NOMINAL_GROUND_COLOR
            + jax.random.uniform(ks[8], (3,), minval=-0.08, maxval=0.08),
            0.0,
            1.0,
        )
        horizon_color = jnp.clip(
            NOMINAL_HORIZON_COLOR
            + jax.random.uniform(ks[9], (3,), minval=-0.2, maxval=0.2),
            0.0,
            1.0,
        )
        tex_seed = jax.random.randint(
            ks[10], (), 0, 1 << 23, dtype=jnp.int32
        )
        tile_ids = jnp.arange(H * W, dtype=jnp.int32).reshape(H, W)
        tex_variant = variant_hash(tile_ids, tex_seed)
        obj_visible = jax.random.bernoulli(ks[11], 0.5, (n_objects,))
    else:
        f32 = jnp.float32
        robot_speed = jnp.asarray(cfg.robot_speed, f32)
        cam_fov_y = jnp.asarray(C.CAMERA_FOV_Y, f32)
        cam_height = jnp.asarray(C.CAMERA_FLOOR_DIST, f32)
        cam_angle = jnp.asarray(C.CAMERA_ANGLE, f32)
        cam_fwd_dist = jnp.asarray(C.CAMERA_FORWARD_DIST, f32)
        wheel_dist = jnp.asarray(C.WHEEL_DIST, f32)
        light_dir = NOMINAL_LIGHT_DIR / jnp.linalg.norm(NOMINAL_LIGHT_DIR)
        light_ambient = jnp.asarray(NOMINAL_AMBIENT, f32)
        ground_color = NOMINAL_GROUND_COLOR
        horizon_color = NOMINAL_HORIZON_COLOR
        tex_seed = jnp.zeros((), dtype=jnp.int32)
        tex_variant = jnp.zeros((H, W), dtype=jnp.int32)
        obj_visible = jnp.ones((n_objects,), dtype=bool)

    return dict(
        robot_speed=jnp.float32(robot_speed),
        cam_fov_y=jnp.float32(cam_fov_y),
        cam_height=jnp.float32(cam_height),
        cam_angle=jnp.float32(cam_angle),
        cam_fwd_dist=jnp.float32(cam_fwd_dist),
        wheel_dist=jnp.float32(wheel_dist),
        light_dir=jnp.asarray(light_dir, jnp.float32),
        light_ambient=jnp.float32(light_ambient),
        ground_color=jnp.asarray(ground_color, jnp.float32),
        horizon_color=jnp.asarray(horizon_color, jnp.float32),
        tex_seed=tex_seed,
        tex_variant=tex_variant,
        obj_visible=obj_visible,
    )

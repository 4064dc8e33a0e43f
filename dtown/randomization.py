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

# Nominal (no-randomization) values
NOMINAL_GROUND_COLOR = jnp.array([0.15, 0.15, 0.15])
NOMINAL_HORIZON_COLOR = jnp.array([0.45, 0.62, 0.93])  # blue_sky
NOMINAL_LIGHT_DIR = jnp.array([-0.35, -0.82, -0.45])
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
        tex_variant = jax.random.randint(
            ks[10], (H, W), 0, N_TEX_VARIANTS, dtype=jnp.int32
        )
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
        tex_variant = jnp.zeros((H, W), dtype=jnp.int32)
        obj_visible = jnp.ones((n_objects,), dtype=bool)

    return dict(
        robot_speed=jnp.float32(robot_speed),
        cam_fov_y=jnp.float32(cam_fov_y),
        cam_height=jnp.float32(cam_height),
        cam_angle=jnp.float32(cam_angle),
        cam_fwd_dist=jnp.float32(cam_fwd_dist),
        wheel_dist=jnp.float32(wheel_dist),
        light_dir=light_dir.astype(jnp.float32),
        light_ambient=jnp.float32(light_ambient),
        ground_color=ground_color.astype(jnp.float32),
        horizon_color=horizon_color.astype(jnp.float32),
        tex_variant=tex_variant,
        obj_visible=obj_visible,
    )

"""Differential-drive kinematics — pure, branchless, vmappable.

TPU-native rewrite of the reference's dynamics
(reference: simulator.py::_update_pos / ::update_physics and
envs/duckietown_env.py::DuckietownEnv.step inverse kinematics — SURVEY.md
§3.2, parity-critical equations).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from dtown import constants as C
from dtown.geometry import get_dir_vec, get_right_vec, rotate_point_xz


def wheel_model(action, gain, trim, radius, k, limit, wheel_dist):
    """[velocity, steering] -> clipped wheel commands [u_l, u_r].

    reference: envs/duckietown_env.py::DuckietownEnv.step:
        k_r_inv = (gain + trim) / k ;  k_l_inv = (gain - trim) / k
        omega_r = (vel + 0.5 * steer * WHEEL_DIST) / radius
        omega_l = (vel - 0.5 * steer * WHEEL_DIST) / radius
        u_r = clip(omega_r * k_r_inv, -limit, limit)
        u_l = clip(omega_l * k_l_inv, -limit, limit)
    """
    vel = action[..., 0]
    steer = action[..., 1]
    k_r_inv = (gain + trim) / k
    k_l_inv = (gain - trim) / k
    omega_r = (vel + 0.5 * steer * wheel_dist) / radius
    omega_l = (vel - 0.5 * steer * wheel_dist) / radius
    u_r = jnp.clip(omega_r * k_r_inv, -limit, limit)
    u_l = jnp.clip(omega_l * k_l_inv, -limit, limit)
    return jnp.stack([u_l, u_r], axis=-1)


def update_pos(pos, angle, wheel_dist, wheel_vels, dt):
    """One Euler substep of the differential-drive model.

    reference: simulator.py::_update_pos:
        if Vl == Vr: pos += dt * Vl * dir_vec(angle)
        else:
            w = (Vr - Vl) / wheel_dist
            r = wheel_dist * (Vl + Vr) / (2 * (Vl - Vr))
            ICC = pos + r * right_vec(angle)
            rotate pos about ICC by w*dt;  angle += w*dt

    Implemented branch-free with lax.select semantics (jnp.where with safe
    denominators); the Vl == Vr straight-line case is taken on exact float
    equality, matching the reference's branch.
    """
    vl = wheel_vels[..., 0]
    vr = wheel_vels[..., 1]
    straight = vl == vr

    # Straight branch
    dir_vec = get_dir_vec(angle)
    pos_straight = pos + dt * vl[..., None] * dir_vec

    # Arc branch (safe denominator where vl == vr)
    denom = jnp.where(straight, jnp.ones_like(vl), vl - vr)
    w = (vr - vl) / wheel_dist
    r = wheel_dist * (vl + vr) / (2.0 * denom)
    rot = w * dt
    right = get_right_vec(angle)
    cx = pos[..., 0] + r * right[..., 0]
    cz = pos[..., 2] + r * right[..., 2]
    npx, npz = rotate_point_xz(pos[..., 0], pos[..., 2], cx, cz, rot)
    pos_arc = jnp.stack([npx, pos[..., 1], npz], axis=-1)

    new_pos = jnp.where(straight[..., None], pos_straight, pos_arc)
    new_angle = angle + jnp.where(straight, jnp.zeros_like(rot), rot)
    return new_pos, new_angle


def physics_substep(pos, angle, action, robot_speed, wheel_dist, dt):
    """One update_physics iteration (reference: simulator.py::update_physics).

    action is [u_l, u_r] in [-1, 1]; wheelVels = action * robot_speed.
    Returns (pos, angle, speed) with speed = |delta_pos| / dt.
    """
    wheel_vels = action * robot_speed[..., None]
    new_pos, new_angle = update_pos(pos, angle, wheel_dist, wheel_vels, dt)
    speed = jnp.linalg.norm(new_pos - pos, axis=-1) / dt
    return new_pos, new_angle, speed, wheel_vels


def integrate(pos, angle, action, robot_speed, wheel_dist, dt, frame_skip: int):
    """frame_skip physics substeps, unrolled (static, small trip count)."""
    speed = jnp.zeros_like(angle)
    wheel_vels = action * robot_speed[..., None]
    for _ in range(frame_skip):
        pos, angle, speed, wheel_vels = physics_substep(
            pos, angle, action, robot_speed, wheel_dist, dt
        )
    return pos, angle, speed, wheel_vels

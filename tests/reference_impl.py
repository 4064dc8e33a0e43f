"""Numpy float64 oracle of the reference simulator's equations.

The reference mount was empty (SURVEY.md provenance note), so parity is
defined against the equations and constants recorded in SURVEY.md §2.2a
and §3.2. This module implements them directly, in plain numpy float64
with the same branch structure as the reference (if/else, python loops),
to serve as the golden oracle for the JAX engine's parity tests.
"""
from __future__ import annotations

import math

import numpy as np

WHEEL_DIST = 0.102
GAIN = 1.0
TRIM = 0.0
RADIUS = 0.0318
K = 27.0
LIMIT = 1.0
ROBOT_SPEED = 1.20
CAMERA_FORWARD_DIST = 0.066
ROBOT_LENGTH = 0.18


# Same Cody-Waite + fdlibm-kernel sincos as dtown.geometry.sincos, in
# numpy float64, so the oracle and the engine share one trig definition
# (libm choice is not part of the recorded spec; see geometry.py note on
# XLA CPU trig accuracy).
_PIO2_HI = 1.57079632673412561417e+00
_PIO2_MID = 6.07710050650619224932e-11
_PIO2_LO = 2.02226624879595063154e-21
_TWO_OVER_PI = 0.636619772367581343076
_S = (-1.66666666666666324348e-01, 8.33333333332248946124e-03,
      -1.98412698298579493134e-04, 2.75573137070700676789e-06,
      -2.50507602534068634195e-08, 1.58969099521155010221e-10)
_C = (4.16666666666666019037e-02, -1.38888888888741095749e-03,
      2.48015872894767294178e-05, -2.75573143513906633035e-07,
      2.08757232129817482790e-09, -1.13596475577881948265e-11)


def sincos(x):
    x = np.float64(x)
    k = np.round(x * _TWO_OVER_PI)
    r = ((x - k * _PIO2_HI) - k * _PIO2_MID) - k * _PIO2_LO
    z = r * r
    p = _S[5]
    for s_ in (_S[4], _S[3], _S[2], _S[1], _S[0]):
        p = p * z + s_
    s = r + r * z * p
    p = _C[5]
    for c_ in (_C[4], _C[3], _C[2], _C[1], _C[0]):
        p = p * z + c_
    c = 1.0 - 0.5 * z + z * z * p
    n = np.int64(k) & 3
    sin_x = (s, c, -s, -c)[n]
    cos_x = (c, -s, -c, s)[n]
    return sin_x, cos_x


def get_dir_vec(angle):
    s, c = sincos(angle)
    return np.array([c, 0.0, -s])


def get_right_vec(angle):
    s, c = sincos(angle)
    return np.array([s, 0.0, c])


def rotate_point(px, pz, cx, cz, theta):
    dx, dz = px - cx, pz - cz
    s, c = sincos(theta)
    return cx + dx * c + dz * s, cz + dz * c - dx * s


def wheel_model(action):
    """envs/duckietown_env.py::DuckietownEnv.step inverse kinematics."""
    vel, steer = action
    k_r_inv = (GAIN + TRIM) / K
    k_l_inv = (GAIN - TRIM) / K
    omega_r = (vel + 0.5 * steer * WHEEL_DIST) / RADIUS
    omega_l = (vel - 0.5 * steer * WHEEL_DIST) / RADIUS
    u_r = max(-LIMIT, min(LIMIT, omega_r * k_r_inv))
    u_l = max(-LIMIT, min(LIMIT, omega_l * k_l_inv))
    return np.array([u_l, u_r])


def update_pos(pos, angle, wheel_dist, wheel_vels, dt):
    """simulator.py::_update_pos, reference branch structure."""
    vl, vr = wheel_vels
    if vl == vr:
        return pos + dt * vl * get_dir_vec(angle), angle
    w = (vr - vl) / wheel_dist
    r = wheel_dist * (vl + vr) / (2.0 * (vl - vr))
    rot = w * dt
    rv = get_right_vec(angle)
    cx = pos[0] + r * rv[0]
    cz = pos[2] + r * rv[2]
    npx, npz = rotate_point(pos[0], pos[2], cx, cz, rot)
    return np.array([npx, pos[1], npz]), angle + rot


def physics_substep(pos, angle, action, dt, robot_speed=ROBOT_SPEED,
                    wheel_dist=WHEEL_DIST):
    """simulator.py::update_physics body."""
    wheel_vels = np.asarray(action) * robot_speed
    new_pos, new_angle = update_pos(pos, angle, wheel_dist, wheel_vels, dt)
    speed = np.linalg.norm(new_pos - pos) / dt
    return new_pos, new_angle, speed


def bezier_point(cps, t):
    u = 1.0 - t
    return (
        u ** 3 * cps[0]
        + 3 * t * u ** 2 * cps[1]
        + 3 * t ** 2 * u * cps[2]
        + t ** 3 * cps[3]
    )


def bezier_tangent(cps, t):
    u = 1.0 - t
    d = (
        3 * u ** 2 * (cps[1] - cps[0])
        + 6 * u * t * (cps[2] - cps[1])
        + 3 * t ** 2 * (cps[3] - cps[2])
    )
    return d / np.linalg.norm(d)


def bezier_closest(cps, p, t_bot=0.0, t_top=1.0, n=8):
    """graphics.py::bezier_closest recursive bisection."""
    mid = 0.5 * (t_bot + t_top)
    if n == 0:
        return mid
    p_bot = bezier_point(cps, t_bot)
    p_top = bezier_point(cps, t_top)
    if np.linalg.norm(p_bot - p) < np.linalg.norm(p_top - p):
        return bezier_closest(cps, p, t_bot, mid, n - 1)
    return bezier_closest(cps, p, mid, t_top, n - 1)


def actual_center(pos, angle):
    return pos + (CAMERA_FORWARD_DIST - 0.5 * ROBOT_LENGTH) * get_dir_vec(angle)


class NotInLane(Exception):
    """reference: simulator.py NotInLane — no curve agrees with heading."""


def lane_pos(curves_for_tile, pos, angle):
    """simulator.py::closest_curve_point + ::get_lane_pos2 semantics.

    curves_for_tile: [n, 4, 3] baked world-space control points.
    Raises NotInLane when no curve chord has positive dot with the
    heading (SURVEY §3.2 dot>0 filter).
    """
    chords = curves_for_tile[:, -1, :] - curves_for_tile[:, 0, :]
    chords = chords / np.linalg.norm(chords, axis=-1, keepdims=True)
    dots = chords @ get_dir_vec(angle)
    if len(dots) == 0 or float(np.max(dots)) <= 0.0:
        raise NotInLane
    cps = curves_for_tile[int(np.argmax(dots))]
    t = bezier_closest(cps, pos)
    point = bezier_point(cps, t)
    tangent = bezier_tangent(cps, t)

    dir_vec = get_dir_vec(angle)
    dot_dir = max(-1.0, min(1.0, float(dir_vec @ tangent)))
    up = np.array([0.0, 1.0, 0.0])
    right_of = np.cross(tangent, up)
    signed_dist = float((pos - point) @ right_of)
    angle_rad = math.acos(dot_dir)
    if float(dir_vec @ right_of) < 0.0:
        angle_rad = -angle_rad
    return signed_dist, dot_dir, math.degrees(angle_rad)


def compute_reward(speed, dot_dir, dist, col_penalty, in_lane):
    if in_lane:
        return 1.0 * speed * dot_dir - 10.0 * abs(dist) + 40.0 * col_penalty
    return 40.0 * col_penalty


ROBOT_WIDTH = 0.13 + 0.02
AGENT_SAFETY_RAD = 0.5 * max(ROBOT_LENGTH, ROBOT_WIDTH) * 1.8


def proximity_penalty(pos, angle, static_centers, static_radii,
                      dyn_centers, dyn_radii):
    """simulator.py::_proximity_penalty2: safety-circle overlap score.

    static objects: min over scores, clipped to <= 0; dynamic objects:
    sum of per-object min(0, score). Distances from the agent's actual
    center. Returns a value <= 0.
    """
    p = actual_center(np.asarray(pos, np.float64), angle)
    static = 1e30
    for c, r in zip(static_centers, static_radii):
        d = float(np.linalg.norm(np.asarray(c, np.float64) - p))
        static = min(static, d - AGENT_SAFETY_RAD - float(r))
    total = min(0.0, static)
    for c, r in zip(dyn_centers, dyn_radii):
        d = float(np.linalg.norm(np.asarray(c, np.float64) - p))
        total += min(0.0, d - AGENT_SAFETY_RAD - float(r))
    return total

"""Collision, pose validity, proximity penalty and reward.

TPU-native rewrite of the reference's collision and reward logic
(reference: gym_duckietown/collision.py — agent_boundbox, generate_norm,
intersects, safety_circle_*; simulator.py::_valid_pose, ::_collision,
::_proximity_penalty2, ::compute_reward — SURVEY.md §2.8, §3.2).

The reference's collision.py is already vectorized numpy (einsum SAT over
all static objects); this keeps those semantics but in jnp with explicit
masking so object counts are static-shape.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from dtown import constants as C
from dtown.geometry import get_dir_vec, get_right_vec, get_grid_coords


def actual_center(pos, angle):
    """Geometric center of the agent; cur_pos is the center of rotation.

    reference: simulator.py::_actual_center:
        pos + (CAMERA_FORWARD_DIST - 0.5 * ROBOT_LENGTH) * dir_vec
    """
    return pos + (C.CAMERA_FORWARD_DIST - 0.5 * C.ROBOT_LENGTH) * get_dir_vec(angle)


def agent_boundbox(center, width, length, f_vec, r_vec):
    """Footprint corners [..., 4, 2] in (x, z).

    reference: collision.py::agent_boundbox.
    """
    p = jnp.stack([center[..., 0], center[..., 2]], axis=-1)
    f = jnp.stack([f_vec[..., 0], f_vec[..., 2]], axis=-1)
    r = jnp.stack([r_vec[..., 0], r_vec[..., 2]], axis=-1)
    hw = 0.5 * width
    hl = 0.5 * length
    return jnp.stack(
        [
            p - hl * f + hw * r,
            p + hl * f + hw * r,
            p + hl * f - hw * r,
            p - hl * f - hw * r,
        ],
        axis=-2,
    )


def get_agent_corners(pos, angle):
    """reference: simulator.py::get_agent_corners."""
    return agent_boundbox(
        actual_center(pos, angle),
        C.ROBOT_WIDTH,
        C.ROBOT_LENGTH,
        get_dir_vec(angle),
        get_right_vec(angle),
    )


def generate_norm(corners):
    """Two unit SAT axes (edge normals) of a rectangle [..., 4, 2] -> [..., 2, 2].

    reference: collision.py::generate_norm.
    """
    e0 = corners[..., 1, :] - corners[..., 0, :]
    e1 = corners[..., 2, :] - corners[..., 1, :]
    axes = jnp.stack(
        [
            jnp.stack([-e0[..., 1], e0[..., 0]], axis=-1),
            jnp.stack([-e1[..., 1], e1[..., 0]], axis=-1),
        ],
        axis=-2,
    )
    return axes / jnp.maximum(
        jnp.linalg.norm(axes, axis=-1, keepdims=True), 1e-12
    )


def tile_corners(i, j, tile_size):
    """Axis-aligned corners of tile (i, j). reference: collision.py::tile_corners."""
    x0 = i * tile_size
    z0 = j * tile_size
    x1 = x0 + tile_size
    z1 = z0 + tile_size
    return jnp.stack(
        [
            jnp.stack([x0, z0], axis=-1),
            jnp.stack([x1, z0], axis=-1),
            jnp.stack([x1, z1], axis=-1),
            jnp.stack([x0, z1], axis=-1),
        ],
        axis=-2,
    )


def _project_interval(corners, axes):
    """Project rectangle corners [..., 4, 2] on axes [..., K, 2] -> min/max [..., K]."""
    # dots[..., K, 4]
    # HIGHEST: the default-precision MXU rounds corner coordinates to
    # bf16 (~1e-3 m), flipping SAT decisions at contact boundaries vs CPU
    dots = jnp.einsum("...kd,...cd->...kc", axes, corners,
                      precision=jax.lax.Precision.HIGHEST)
    return dots.min(axis=-1), dots.max(axis=-1)


def sat_intersects(corners_a, norms_a, corners_b, norms_b):
    """Separating-axis test of one rectangle A against stacked rectangles B.

    corners_a [4, 2], norms_a [2, 2]; corners_b [M, 4, 2], norms_b [M, 2, 2].
    Returns bool [M]: True where A overlaps B_m.
    reference: collision.py::intersects (einsum-vectorized SAT).
    """
    axes = jnp.concatenate(
        [jnp.broadcast_to(norms_a, corners_b.shape[:-2] + (2, 2)), norms_b],
        axis=-2,
    )  # [M, 4, 2]
    a_min, a_max = _project_interval(
        jnp.broadcast_to(corners_a, corners_b.shape), axes
    )
    b_min, b_max = _project_interval(corners_b, axes)
    separated = (a_max < b_min) | (b_max < a_min)  # [M, 4]
    return ~jnp.any(separated, axis=-1)


def collision(agent_corners, obj_corners, obj_norms, obj_active,
              agent_norms=None):
    """True if the agent footprint hits any active collidable object.

    reference: simulator.py::_collision — SAT vs stacked static norms plus
    per-dynamic-object check; here both are one masked stacked test.

    agent_norms: pass the agent's unit facing/right vectors directly to
    skip the corner-edge reconstruction — for a rectangle built FROM
    (f, r) the normalized edge perps equal (r, -f) exactly in real
    arithmetic, but reconstructing them (subtract, perp, normalize)
    rounds differently than the fused kernel's direct (f, r) axes,
    flipping borderline SAT decisions between the two paths.
    """
    if agent_norms is None:
        agent_norms = generate_norm(agent_corners)
    hits = sat_intersects(
        agent_corners, agent_norms, obj_corners, obj_norms
    )
    return jnp.any(hits & obj_active)


def drivable_at(maps, point):
    """Is the tile under a world point drivable? reference: simulator.py::_drivable_pos."""
    H, W = maps.grid_shape
    i, j = get_grid_coords(point, maps.tile_size)
    in_grid = (i >= 0) & (i < W) & (j >= 0) & (j < H)
    ci = jnp.clip(i, 0, W - 1)
    cj = jnp.clip(j, 0, H - 1)
    return in_grid & maps.drivable[cj, ci]


def valid_pose(maps, pos, angle, obj_corners, obj_norms, obj_active,
               safety_factor=1.0):
    """reference: simulator.py::_valid_pose.

    Checks the agent center plus left/right wheel and front points are on
    drivable tiles and that the footprint does not collide with objects.
    Returns (valid, collided).
    """
    center = actual_center(pos, angle)
    f_vec = get_dir_vec(angle)
    r_vec = get_right_vec(angle)
    l_pos = center - (safety_factor * 0.5 * C.ROBOT_WIDTH) * r_vec
    r_pos = center + (safety_factor * 0.5 * C.ROBOT_WIDTH) * r_vec
    f_pos = center + (safety_factor * 0.5 * C.ROBOT_LENGTH) * f_vec
    all_drivable = (
        drivable_at(maps, center)
        & drivable_at(maps, l_pos)
        & drivable_at(maps, r_pos)
        & drivable_at(maps, f_pos)
    )
    agent_corners = get_agent_corners(pos, angle)
    # direct (f, r) SAT axes, matching the fused kernel bit-for-bit
    agent_norms = jnp.stack(
        [jnp.stack([f_vec[..., 0], f_vec[..., 2]], axis=-1),
         jnp.stack([r_vec[..., 0], r_vec[..., 2]], axis=-1)],
        axis=-2,
    )
    collided = collision(agent_corners, obj_corners, obj_norms,
                         obj_active, agent_norms=agent_norms)
    return all_drivable & ~collided, collided


def valid_pose_no_objects(maps, pos, angle, safety_factor=1.0):
    """valid_pose specialization for maps without collidable objects."""
    center = actual_center(pos, angle)
    f_vec = get_dir_vec(angle)
    r_vec = get_right_vec(angle)
    l_pos = center - (safety_factor * 0.5 * C.ROBOT_WIDTH) * r_vec
    r_pos = center + (safety_factor * 0.5 * C.ROBOT_WIDTH) * r_vec
    f_pos = center + (safety_factor * 0.5 * C.ROBOT_LENGTH) * f_vec
    all_drivable = (
        drivable_at(maps, center)
        & drivable_at(maps, l_pos)
        & drivable_at(maps, r_pos)
        & drivable_at(maps, f_pos)
    )
    return all_drivable, jnp.zeros_like(all_drivable)


def proximity_penalty(pos, angle, obj_pos, obj_safety_rad, obj_active,
                      obj_is_dynamic):
    """Safety-circle overlap penalty (<= 0).

    reference: simulator.py::_proximity_penalty2 + collision.py::
    safety_circle_overlap and objects.py::WorldObj.proximity:
      static objects: min(0, min_i(d_i - AGENT_RAD - r_i))
      dynamic objects: sum_i min(0, d_i - AGENT_RAD - r_i)
    """
    center = actual_center(pos, angle)
    d = jnp.linalg.norm(obj_pos - center, axis=-1)
    scores = d - C.AGENT_SAFETY_RAD - obj_safety_rad

    static_mask = obj_active & ~obj_is_dynamic
    static_scores = jnp.where(static_mask, scores, jnp.inf)
    static_pen = jnp.minimum(0.0, jnp.min(static_scores, initial=jnp.inf))

    dyn_mask = obj_active & obj_is_dynamic
    dyn_pen = jnp.sum(jnp.where(dyn_mask, jnp.minimum(0.0, scores), 0.0))
    return static_pen + dyn_pen


def compute_reward(speed, lane_pos, col_penalty):
    """reference: simulator.py::compute_reward:
        in lane:  +1.0*speed*dot_dir - 10*|dist| + 40*col_penalty
        NotInLane:                                 40*col_penalty
    """
    full = (
        C.REWARD_SPEED_COEF * speed * lane_pos.dot_dir
        + C.REWARD_DIST_COEF * jnp.abs(lane_pos.dist)
        + C.REWARD_COLLISION_COEF * col_penalty
    )
    return jnp.where(
        lane_pos.in_lane, full, C.REWARD_COLLISION_COEF * col_penalty
    )

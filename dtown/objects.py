"""Scripted dynamic world objects as batched state machines.

TPU-native rewrite of the reference's per-object python classes
(reference: gym_duckietown/objects.py — DuckieObj walking pedestrian,
TrafficLightObj phase swapper, DuckiebotObj scripted lane follower;
SURVEY.md §2.9). One fused, masked update over the whole object-slot axis
replaces the reference's per-object ``obj.step(dt)`` python loop.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from dtown import constants as C
from dtown import types as T
from dtown.geometry import closest_curve_point, get_dir_vec, get_right_vec
from dtown.dynamics import update_pos
from dtown.types import DynObjState

# NPC behavior constants (the reference draws some of these from np_random
# at construction; fixed here for determinism, perturbed under domain_rand
# at reset).
DUCKIE_WALK_SPEED = 0.02      # m/s (reference: DuckieObj.vel ~ N(0.02, 0.005))
DUCKIE_WALK_DISTANCE = 0.25   # m before reversing (reference: walk_distance)
DUCKIE_WIGGLE = 0.25          # rad, gait wiggle amplitude
DUCKIE_WIGGLE_FREQ = 48.0     # rad/s (reference: sin(48 * time))
TRAFFICLIGHT_PERIOD = 5.0     # s per light phase
DUCKIEBOT_VEL = 0.4           # m/s scripted bot forward speed
DUCKIEBOT_GAIN = 0.15         # pure-pursuit steering gain
DUCKIEBOT_FOLLOW_DIST = 0.30  # m lookahead along the lane curve


def init_dyn_state(maps, key=None) -> DynObjState:
    """Initial dynamic-object state from the compiled map.

    With a PRNG key, each walking duckie's speed is drawn
    ~N(0.02, 0.005) as in the reference (objects.py::DuckieObj
    ``self.vel = np.abs(np_random.normal(0.02, 0.005))``); without one,
    the nominal mean is used (deterministic tests/tools).
    """
    M = maps.max_objects
    f = lambda v: jnp.full((M,), v, dtype=jnp.float32)
    is_duckie = maps.obj_kind == T.OBJ_KIND_IDS["duckie"]
    duckie_vel = jnp.float32(DUCKIE_WALK_SPEED)
    if key is not None:
        duckie_vel = jnp.maximum(
            DUCKIE_WALK_SPEED
            + 0.005 * jax.random.normal(key, (M,), dtype=jnp.float32),
            0.001,
        )
    vel = jnp.where(
        maps.obj_is_dynamic & is_duckie, duckie_vel, DUCKIEBOT_VEL
    ).astype(jnp.float32)
    return DynObjState(
        pos=maps.obj_pos,
        angle=maps.obj_y_rot,
        vel=vel,
        walk_dist=f(0.0),
        wiggle=f(DUCKIE_WIGGLE),
        phase=jnp.zeros((M,), dtype=jnp.int32),
        time=f(0.0),
    )


def render_angles(maps, dyn: DynObjState):
    """Render-time object headings: walking duckies get the sinusoidal
    gait wiggle (reference: DuckieObj — ``angle + wiggle*sin(48*time)``;
    applied to the drawn mesh only, not the collision footprint)."""
    from dtown.geometry import sincos

    is_walk_duckie = (
        maps.obj_is_dynamic & (maps.obj_kind == T.OBJ_KIND_IDS["duckie"])
    )
    wob = dyn.wiggle * sincos(DUCKIE_WIGGLE_FREQ * dyn.time)[0]
    return jnp.where(is_walk_duckie, dyn.angle + wob, dyn.angle)


def _duckie_step(maps, dyn: DynObjState, dt):
    """Pedestrian walk: advance along heading, reverse after the slot's
    walk distance (map-suppliable via the yaml `walk_distance:` key).

    reference: objects.py::DuckieObj.step / ::finish_walk.
    """
    step_len = dyn.vel * dt
    new_pos = dyn.pos + step_len[:, None] * get_dir_vec(dyn.angle)
    new_walk = dyn.walk_dist + step_len
    reverse = new_walk > maps.obj_walk_dist
    angle = jnp.where(reverse, dyn.angle + jnp.pi, dyn.angle)
    walk = jnp.where(reverse, 0.0, new_walk)
    return new_pos, angle, walk


def _duckiebot_step(maps, dyn: DynObjState, dt):
    """Scripted lane follower: pure pursuit on the lane bezier.

    reference: objects.py::DuckiebotObj.step — project a follow point
    ``follow_dist`` ahead along the curve tangent, steer toward it with
    differential-drive kinematics.
    """
    point, tangent, valid = jax.vmap(
        lambda p, a: closest_curve_point(maps, p, a)
    )(dyn.pos, dyn.angle)
    follow = point + DUCKIEBOT_FOLLOW_DIST * tangent
    curve_point, _, valid2 = jax.vmap(
        lambda p, a: closest_curve_point(maps, p, a)
    )(follow, dyn.angle)

    point_vec = curve_point - dyn.pos
    point_vec = point_vec / jnp.maximum(
        jnp.linalg.norm(point_vec, axis=-1, keepdims=True), 1e-9
    )
    dot = jnp.sum(get_right_vec(dyn.angle) * point_vec, axis=-1)
    steering = DUCKIEBOT_GAIN * (-dot)
    steering = jnp.where(valid & valid2, steering, 0.0)
    wheel_vels = jnp.stack(
        [dyn.vel - steering, dyn.vel + steering], axis=-1
    )
    new_pos, new_angle = update_pos(
        dyn.pos, dyn.angle, C.WHEEL_DIST, wheel_vels, dt
    )
    return new_pos, new_angle


def step_dynamic_objects(maps, dyn: DynObjState, dt) -> DynObjState:
    """One masked update of every dynamic object slot. Per-species phases
    are statically dropped when the map has none of that species."""
    from dtown.utils.staticcheck import concrete_any

    is_duckie = maps.obj_kind == T.OBJ_KIND_IDS["duckie"]
    is_bot = maps.obj_kind == T.OBJ_KIND_IDS["duckiebot"]
    dyn_mask = maps.obj_is_dynamic

    pos, angle, walk = dyn.pos, dyn.angle, dyn.walk_dist
    if concrete_any(dyn_mask & is_duckie):
        d_pos, d_angle, d_walk = _duckie_step(maps, dyn, dt)
        sel = dyn_mask & is_duckie
        pos = jnp.where(sel[:, None], d_pos, pos)
        angle = jnp.where(sel, d_angle, angle)
        walk = jnp.where(sel, d_walk, walk)
    if concrete_any(dyn_mask & is_bot):
        b_pos, b_angle = _duckiebot_step(maps, dyn, dt)
        sel = dyn_mask & is_bot
        pos = jnp.where(sel[:, None], b_pos, pos)
        angle = jnp.where(sel, b_angle, angle)

    time = dyn.time + dt
    phase = jnp.floor(time / TRAFFICLIGHT_PERIOD).astype(jnp.int32) % 2

    return dyn.replace(
        pos=pos, angle=angle, walk_dist=walk, time=time, phase=phase
    )


def dynamic_corners(maps, dyn: DynObjState):
    """Current footprint corners/norms for all object slots.

    Static slots keep their precompiled corners; dynamic slots are
    recomputed from the live pose (reference: DuckieObj keeps
    ``obj_corners`` updated incrementally; here it is recomputed exactly).
    """
    hw = maps.obj_halfdims[:, 0]  # half width (along right vec)
    hl = maps.obj_halfdims[:, 1]  # half length (along facing)
    f = get_dir_vec(dyn.angle)
    r = get_right_vec(dyn.angle)
    p = jnp.stack([dyn.pos[:, 0], dyn.pos[:, 2]], axis=-1)
    fxz = jnp.stack([f[:, 0], f[:, 2]], axis=-1)
    rxz = jnp.stack([r[:, 0], r[:, 2]], axis=-1)
    corners = jnp.stack(
        [
            p - hl[:, None] * fxz - hw[:, None] * rxz,
            p + hl[:, None] * fxz - hw[:, None] * rxz,
            p + hl[:, None] * fxz + hw[:, None] * rxz,
            p - hl[:, None] * fxz + hw[:, None] * rxz,
        ],
        axis=-2,
    )  # [M, 4, 2]
    e0 = corners[:, 1] - corners[:, 0]
    e1 = corners[:, 2] - corners[:, 1]
    norms = jnp.stack(
        [
            jnp.stack([-e0[:, 1], e0[:, 0]], axis=-1),
            jnp.stack([-e1[:, 1], e1[:, 0]], axis=-1),
        ],
        axis=-2,
    )
    norms = norms / jnp.maximum(
        jnp.linalg.norm(norms, axis=-1, keepdims=True), 1e-12
    )
    sel = maps.obj_is_dynamic[:, None, None]
    return (
        jnp.where(sel, corners, maps.obj_corners),
        jnp.where(sel, norms, maps.obj_norms),
    )

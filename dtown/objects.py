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


def _pursuit_lane_query(maps, ts_inv, qx, qz, qdx, qdz):
    """closest_curve_point for the scripted duckiebot, op-for-op
    identical to the fused state kernel's lane_query
    (ops/state_kernel.py) so fused-vs-XLA NPC poses match bit-for-bit:
    2D math, rsqrt/clamp forms, -1e30 sentinel, strict-f32 chord
    normalization matching build_tables' stored constants. The generic
    geometry.closest_curve_point (3D norms, argmax, f64-free but
    differently-ordered ops) stays the agent-path form; the bot chains
    TWO queries per substep, which amplified its ulp differences into
    borderline SAT flips (round-2 tolerated ~1%; now exact).

    Returns (point_x, point_z, tan_x, tan_z, best_dot, drivable).
    """
    H, W = maps.grid_shape
    fi = jnp.floor(qx * ts_inv)
    fj = jnp.floor(qz * ts_inv)
    ing = (fi >= 0) & (fi < W) & (fj >= 0) & (fj < H)
    ii = jnp.clip(fi.astype(jnp.int32), 0, W - 1)
    jj = jnp.clip(fj.astype(jnp.int32), 0, H - 1)
    q_driv = ing & maps.drivable[jj, ii]

    curves = maps.curves[jj, ii]     # [Cmax, 4, 3]
    cmask = maps.curve_mask[jj, ii]  # [Cmax]

    best_dot = jnp.float32(-1e30)
    cps = [jnp.float32(0.0)] * 8
    for c in range(curves.shape[0]):
        # chord, normalized with the exact op sequence build_tables
        # bakes (mul, mul, add, sqrt, max, div — all f32)
        chx = curves[c, 3, 0] - curves[c, 0, 0]
        chz = curves[c, 3, 2] - curves[c, 0, 2]
        n2 = chx * chx + chz * chz
        n = jnp.maximum(jnp.sqrt(n2), jnp.float32(1e-12))
        dot = (chx / n) * qdx + (chz / n) * qdz
        dot = jnp.where(cmask[c], dot, jnp.float32(-1e30))
        better = dot > best_dot
        best_dot = jnp.where(better, dot, best_dot)
        vals = (curves[c, 0, 0], curves[c, 0, 2], curves[c, 1, 0],
                curves[c, 1, 2], curves[c, 2, 0], curves[c, 2, 2],
                curves[c, 3, 0], curves[c, 3, 2])
        cps = [jnp.where(better, v, k) for v, k in zip(vals, cps)]
    x0, z0, x1, z1, x2, z2, x3, z3 = cps

    def bz_point(t):
        u = 1.0 - t
        w0 = u * u * u
        w1 = 3.0 * t * u * u
        w2 = 3.0 * t * t * u
        w3 = t * t * t
        return (w0 * x0 + w1 * x1 + w2 * x2 + w3 * x3,
                w0 * z0 + w1 * z1 + w2 * z2 + w3 * z3)

    t_bot = jnp.float32(0.0)
    t_top = jnp.float32(1.0)
    for _ in range(C.BEZIER_CLOSEST_ITERS):
        mid = 0.5 * (t_bot + t_top)
        bx, bz_ = bz_point(t_bot)
        tx, tz = bz_point(t_top)
        db = (bx - qx) ** 2 + (bz_ - qz) ** 2
        dtp = (tx - qx) ** 2 + (tz - qz) ** 2
        keep_bot = db < dtp
        t_bot, t_top = (
            jnp.where(keep_bot, t_bot, mid),
            jnp.where(keep_bot, mid, t_top),
        )
    t_star = 0.5 * (t_bot + t_top)
    px_c, pz_c = bz_point(t_star)
    u = 1.0 - t_star
    tanx = (3 * u * u * (x1 - x0) + 6 * u * t_star * (x2 - x1)
            + 3 * t_star * t_star * (x3 - x2))
    tanz = (3 * u * u * (z1 - z0) + 6 * u * t_star * (z2 - z1)
            + 3 * t_star * t_star * (z3 - z2))
    tinv = jax.lax.rsqrt(jnp.maximum(tanx * tanx + tanz * tanz, 1e-24))
    return px_c, pz_c, tanx * tinv, tanz * tinv, best_dot, q_driv


def _duckiebot_step(maps, dyn: DynObjState, dt):
    """Scripted lane follower: pure pursuit on the lane bezier.

    reference: objects.py::DuckiebotObj.step — project a follow point
    ``follow_dist`` ahead along the curve tangent, steer toward it with
    differential-drive kinematics. Arithmetic mirrors the fused kernel's
    bot branch exactly (see _pursuit_lane_query) — the equivalence test
    asserts bit-identical done/reward between the two paths.
    """
    from dtown.geometry import sincos
    from dtown.utils.staticcheck import concrete_any  # noqa: F401

    try:
        # the f32 reciprocal the kernel table stores (f64 divide, f32
        # round) — reproducible here only when tile_size is concrete
        import numpy as _np

        ts_inv = jnp.float32(_np.float32(1.0 / float(maps.tile_size)))
    except Exception:  # traced multimap gather: f32 reciprocal
        ts_inv = (1.0 / maps.tile_size).astype(jnp.float32)

    def one(pos, angle, vel):
        nx, nz, na, nv = pos[0], pos[2], angle, vel
        s_n, c_n = sincos(na)
        bdx, bdz = c_n, -s_n
        cpx, cpz, ctx, ctz, bd1, drv1 = _pursuit_lane_query(
            maps, ts_inv, nx, nz, bdx, bdz
        )
        fpx = cpx + DUCKIEBOT_FOLLOW_DIST * ctx
        fpz = cpz + DUCKIEBOT_FOLLOW_DIST * ctz
        gpx, gpz, _, _, bd2, drv2 = _pursuit_lane_query(
            maps, ts_inv, fpx, fpz, bdx, bdz
        )
        pvx = gpx - nx
        pvz = gpz - nz
        pinv = jax.lax.rsqrt(jnp.maximum(pvx * pvx + pvz * pvz, 1e-18))
        # right_vec = (sin a, cos a) in the x-z plane
        dotr = (s_n * pvx + c_n * pvz) * pinv
        steering = DUCKIEBOT_GAIN * (-dotr)
        ok = drv1 & (bd1 > 0.0) & drv2 & (bd2 > 0.0)
        steering = jnp.where(ok, steering, 0.0)
        bvl = nv - steering
        bvr = nv + steering
        # differential drive about WHEEL_DIST, kernel op order
        straight_b = bvl == bvr
        npx_s = nx + dt * bvl * bdx
        npz_s = nz + dt * bvl * bdz
        denom_b = jnp.where(straight_b, 1.0, bvl - bvr)
        w_b = (bvr - bvl) / C.WHEEL_DIST
        r_b = C.WHEEL_DIST * (bvl + bvr) / (2.0 * denom_b)
        rot_b = w_b * dt
        cx_b = nx + r_b * s_n
        cz_b = nz + r_b * c_n
        s_rb, c_rb = sincos(rot_b)
        dx_b = nx - cx_b
        dz_b = nz - cz_b
        npx_a = cx_b + dx_b * c_rb + dz_b * s_rb
        npz_a = cz_b + dz_b * c_rb - dx_b * s_rb
        new_x = jnp.where(straight_b, npx_s, npx_a)
        new_z = jnp.where(straight_b, npz_s, npz_a)
        new_angle = na + jnp.where(straight_b, 0.0, rot_b)
        return jnp.stack([new_x, pos[1], new_z]), new_angle

    return jax.vmap(one)(dyn.pos, dyn.angle, dyn.vel)


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
    # SAT axes = the pose's unit right/facing vectors DIRECTLY (the
    # normalized edge perps of a rectangle built from (f, r) equal these
    # in exact arithmetic; reconstructing them rounds differently than
    # the fused kernel's direct axes and flipped borderline decisions)
    norms = jnp.stack([rxz, fxz], axis=-2)
    sel = maps.obj_is_dynamic[:, None, None]
    return (
        jnp.where(sel, corners, maps.obj_corners),
        jnp.where(sel, norms, maps.obj_norms),
    )

"""Fused Pallas TPU kernel for the complete state step.

One kernel advances a block of envs through the ENTIRE non-render step:
wheel model -> differential-drive integration -> drivability -> SAT
collision -> lane geometry (curve select + bezier bisection) -> reward ->
done -> in-graph auto-reset from the spawn bank. This collapses the
~2000-HLO-op XLA step (which pays a per-op dispatch tax on the target
runtime) into a single op.

Layout: the env state lives in a TRANSPOSED blob f32 [F, B] — fields are
sublanes, envs are lanes — so every per-env scalar op is one full-width
vreg op, and small-table lookups become `table_T @ onehot_T` MXU matmuls
(onehot_T [T, BB] = (iota_sublane == idx_lane)) with no cross-lane
reshapes. The rollout loop carries the blob; EnvState <-> blob conversion
happens once per rollout, not per step (dtown/ops/fused_env.py).

Scope (round 2): moving NPCs (walking duckies / scripted duckiebots —
their state machines run in-kernel in rows F_NPC_BASE..), traffic-light
phases, per-env domain randomization (DR_* rows, redrawn at in-kernel
auto-reset), and stacked multimap blobs (F_MAPID offsets every table
lookup) are all folded in.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dtown import constants as C
from dtown import types as T

# ---- blob field indices (f32 [F, B]) ---------------------------------
F_POS_X, F_POS_Y, F_POS_Z, F_ANGLE, F_SPEED = 0, 1, 2, 3, 4
F_WVL, F_WVR, F_STEP, F_RNG, F_ROBOT_SPEED, F_WHEEL_DIST = 5, 6, 7, 8, 9, 10
F_ACT0, F_ACT1 = 11, 12
# outputs
F_REWARD, F_DONE, F_LDIST, F_LDOT, F_LDEG, F_INLANE, F_COLL, F_TIME = (
    13, 14, 15, 16, 17, 18, 19, 20)
F_ENVID = 21
# post-auto-reset lane rows: on a done step the OBSERVATION must describe
# the fresh spawn (XLA path: render_obs recomputes get_lane_pos2 on the
# post-reset state) while reward/info keep the dying step's values. The
# spawn bank carries precomputed lane features per entry (build_tables),
# selected into these rows on done.
F_OLDIST, F_OLDOT, F_OLDEG, F_OINLANE = 22, 23, 24, 25
# per-env map index (stacked multimap support; constant 0 on single maps)
F_MAPID = 26
# moving-NPC state rows (walking duckies / scripted duckiebots): NPC i of
# the map occupies rows F_NPC_BASE + 5*i .. +4 = (x, z, angle, walk, vel).
# The blob height NF therefore depends on the map — use nf_for(n_npc);
# the module constant NF is the no-NPC baseline kept for static maps.
F_NPC_BASE = 27
NPC_ROWS = 5
NF = 32  # padded to a multiple of 8 sublanes (no-NPC, no-DR layout)

# Domain-randomization rows (only present when cfg.domain_rand): per-env
# reset-time draws consumed by the render kernel and redrawn in-kernel at
# auto-reset (reference: Simulator.reset randomization, SURVEY §3.4).
# Offsets are relative to dr_base(n_npc).
DR_ROWS = 16
(DR_FOV, DR_CAMH, DR_CAMA, DR_CAMF, DR_LX, DR_LY, DR_LZ, DR_AMB,
 DR_GR, DR_GG, DR_GB, DR_HR, DR_HG, DR_HB, DR_TEXSEED, DR_OBJVIS) = range(16)


def dr_base(n_npc: int) -> int:
    return F_NPC_BASE + NPC_ROWS * n_npc


# Nav-task rows (only present on the fused Nav path): goal tile (i, j)
# per env, checked in-kernel and redrawn from the drivable-tile table at
# auto-reset (gym_compat.DuckietownNav / tasks.nav_step at kernel speed).
NAV_ROWS = 2
NAV_GI, NAV_GJ = 0, 1


def nav_base(n_npc: int, domain_rand: bool = False) -> int:
    return dr_base(n_npc) + (DR_ROWS if domain_rand else 0)


def nf_for(n_npc: int, domain_rand: bool = False,
           nav: bool = False) -> int:
    """Blob sublane count for a map with n_npc moving NPCs."""
    rows = nav_base(n_npc, domain_rand) + (NAV_ROWS if nav else 0)
    return max(NF, -(-rows // 8) * 8)


def moving_npcs(maps):
    """Static per-map descriptors of moving NPCs, in object-slot order.

    reference: objects.py — DuckieObj (walking pedestrian) and
    DuckiebotObj (scripted lane follower); TrafficLightObj has a static
    pose (phase-only) and stays in the static object table.

    Stacked multimaps return the concatenation of every map's NPCs in
    map-major order; each descriptor carries `map` (its stack index) so
    blob packing and collision can gate on the env's F_MAPID. Single-map
    descriptors have map=None.
    """
    if maps.tile_kind.ndim == 3:
        out = []
        for m in range(int(maps.tile_kind.shape[0])):
            pm = jax.tree_util.tree_map(lambda a, m=m: a[m], maps)
            for npc in moving_npcs(pm):
                out.append(dict(npc, map=m))
        return out
    mask = (
        np.asarray(maps.obj_mask)
        & np.asarray(maps.obj_is_dynamic)
        & (np.asarray(maps.obj_kind) != T.OBJ_KIND_IDS["trafficlight"])
    )
    kinds = np.asarray(maps.obj_kind)
    pos = np.asarray(maps.obj_pos)
    rot = np.asarray(maps.obj_y_rot)
    hd = np.asarray(maps.obj_halfdims)
    rad = np.asarray(maps.obj_safety_rad)
    duckie_id = T.OBJ_KIND_IDS["duckie"]
    wdist = np.asarray(maps.obj_walk_dist)
    out = []
    for s in np.nonzero(mask)[0]:
        out.append(dict(
            slot=int(s),
            kind="duckie" if int(kinds[s]) == duckie_id else "duckiebot",
            x0=float(pos[s, 0]), z0=float(pos[s, 2]),
            a0=float(rot[s]),
            hw=float(hd[s, 0]), hl=float(hd[s, 1]),
            rad=float(rad[s]),
            walk_dist=float(wdist[s]),
            map=None,
        ))
    return out

BB = 512  # envs per kernel program (tunable; fewer programs = less per-program overhead)

# curve table lane layout per tile (transposed to [CT_F, T_pad]):
# 12 curves x (cps 12 floats) = 144, then 12 chord_x, 12 chord_z,
# 12 valid flags -> 180 rows
N_CURVES = 12
CT_CPS = 0            # 144 rows: curve c float k at row c*12+k
CT_CHX = 144          # 12 rows
CT_CHZ = 156          # 12 rows
CT_VALID = 168        # 12 rows
CT_F = 184            # padded rows (mult of 8)

# object table (transposed [OT_F, M]): corners(8), norms(4), pos_x, pos_z,
# safety_rad, active, is_dynamic
OT_CX = list(range(0, 8))
OT_NX = list(range(8, 12))
OT_PX, OT_PZ, OT_RAD, OT_ACT, OT_DYN = 12, 13, 14, 15, 16
OT_F = 24

# spawn bank (transposed [8, BANK_K]): x, y, z, angle + precomputed lane
# features of the spawn pose (for exact post-reset observation rows)
BK_X, BK_Y, BK_Z, BK_ANG = 0, 1, 2, 3
BK_LDIST, BK_LDOT, BK_LDEG, BK_INLANE = 4, 5, 6, 7
BANK_K = 512


def _sincos(x):
    """Polynomial sincos (geometry.sincos, kernel-safe)."""
    from dtown.geometry import sincos

    return sincos(x)


def _acos(x):
    """Polynomial arccos (Abramowitz-Stegun 4.4.45, ~7e-5 rad) — Mosaic
    has no arccos lowering."""
    ax = jnp.abs(x)
    p = -0.0187293
    for c in (0.0742610, -0.2121144, 1.5707288):
        p = p * ax + c
    r = p * jnp.sqrt(jnp.maximum(1.0 - ax, 0.0))
    return jnp.where(x < 0.0, np.pi - r, r)


def _hash_u32(a, b, salt=0):
    """Deterministic uint-ish hash of two int32 vectors -> positive int32.

    Multiply-free Jenkins-style mix (int32 vector multiplies are
    emulated multi-op on the VPU; same rounds as the render-side hashes,
    r4). Only feeds in-kernel PRNG streams (post-reset spawn/DR/goal
    draws), which are kernel-private by design — no XLA-side twin.

    salt: python-constant stream id. Each call SITE passes a distinct
    large constant so streams stay disjoint: small additive tags alone
    would let e.g. the spawn-pick stream (a=ctr) collide exactly with
    the duckie-vel stream (a=ctr+13) thirteen steps later. ctr is a
    step counter (< ~1e6), so 2^28-spaced salts cannot alias."""
    h = (a ^ (b << 13)) + b + salt
    h = h + (h << 10)
    h = h ^ (h >> 6)
    h = h + (h << 3)
    h = h ^ (h >> 11)
    h = h + (h << 15)
    h = h ^ (h >> 7)
    return h & 0x7FFFFFFF


def make_state_kernel(cfg, Hg, Wg, n_words, M, n_spawn_ok, bb=None,
                      npcs=(), moving_cols=(), opt_cols=(), multi=None,
                      nav=None):
    """Kernel factory; all map/shape facts static.

    npcs: static tuple of moving-NPC descriptors (moving_npcs()); their
    state machines (duckie walk / duckiebot lane following, reference:
    objects.py) advance inside the kernel, and collision/proximity use
    their live poses. moving_cols: (table_col, npc_idx) pairs mapping
    object-table columns to NPC indices (their static table entries are
    stale and are overridden).

    nav: Nav-task descriptor (build_goal_table() output) — the kernel
    then reads goal-tile rows, scores +NAV_GOAL_REWARD / done on goal
    entry, and redraws the goal from the drivable-tile table at
    auto-reset; the goal table rides one extra kernel operand.

    DTOWN_KERNEL_SKIP (debug): comma list in {lane,sat,reset,driv} to
    drop sections for performance attribution.
    """
    import os

    from dtown import objects as objlib

    skip = set(os.environ.get("DTOWN_KERNEL_SKIP", "").split(","))
    bb = bb or BB
    dt = float(cfg.delta_time)
    frame_skip = int(cfg.frame_skip)
    use_wm = bool(cfg.use_wheel_model)
    gain, trim = float(cfg.gain), float(cfg.trim)
    radius, k_c, limit = float(cfg.wheel_radius), float(cfg.k), float(cfg.limit)
    max_steps = float(cfg.max_steps)
    auto_reset = bool(cfg.auto_reset)
    collision_on = M > 0
    moving_of_col = dict(moving_cols)
    domain_rand = bool(cfg.domain_rand)
    opt_bit_of_col = {c: k for k, c in enumerate(opt_cols)}
    drb = dr_base(len(npcs))
    navb = nav_base(len(npcs), domain_rand)
    goal_k = nav["goal_k"] if nav else 0
    n_driv_list = nav["n_driv_list"] if nav else ()

    T_tiles = Hg * Wg
    # multimap: lookups offset by the env's map index (F_MAPID row)
    n_maps = multi["n_maps"] if multi else 1
    t_pad_m = multi["t_pad"] if multi else T_tiles
    npw_m = multi["npw"] if multi else 0
    T_lookup = n_maps * t_pad_m if multi else T_tiles
    col_maps = multi["col_maps"] if multi else ()
    n_ok_list = multi["n_ok_list"] if multi else ()

    def kernel(blob_ref, act_ref, words_ref, ct_ref, ot_ref, bank_ref,
               tsref, *rest):
        if nav:
            goal_ref, out_ref = rest
        else:
            (out_ref,) = rest
        f32 = jnp.float32
        row = lambda r: blob_ref[r, :][None, :]          # [1, BB]

        ts_inv = tsref[0, 0]

        pos_x = row(F_POS_X)
        pos_y = row(F_POS_Y)
        pos_z = row(F_POS_Z)
        angle = row(F_ANGLE)
        act0 = act_ref[0, :][None, :]
        act1 = act_ref[1, :][None, :]
        robot_speed = row(F_ROBOT_SPEED)
        wheel_dist = row(F_WHEEL_DIST)
        step_cnt = row(F_STEP)
        rng_ctr = row(F_RNG)
        env_id = row(F_ENVID)
        map_row = row(F_MAPID)
        mi = map_row.astype(jnp.int32)
        if nav:
            goal_i = row(navb + NAV_GI)
            goal_j = row(navb + NAV_GJ)
            # pre-step pose for the goal-distance shaping extension
            pos_x_pre, pos_z_pre = pos_x, pos_z
        if domain_rand:
            dr_rows = [row(drb + k) for k in range(DR_ROWS)]
            # optional-object visibility bitmask decoded once (the row
            # stores a small nonneg integer as f32)
            _objvis_i = dr_rows[DR_OBJVIS].astype(jnp.int32)

            def _u01(tag):
                """Per-(env, episode, tag) uniform in [0, 1) from the
                integer-hash PRNG (threefry is too slow per step)."""
                # stream separation by a per-(site, tag) salt: the jen
                # rounds in _hash_u32 do the mixing, so the old
                # per-call vector multiplies (emulated multi-op on the
                # VPU) are gone, and folding the tag into the salt
                # keeps draws disjoint across (env, step, tag) — tag
                # offsets cannot alias ctr/env offsets the way additive
                # tags on a/b could
                # static guard: the docstring's stream disjointness
                # relies on these salts staying below the auto-reset
                # stream's 0x20000000 base; a future tag past ~73 would
                # silently collide without this (advisor r4)
                assert 0x10000000 + tag * 0x3779B9 < 0x20000000, tag
                hv = _hash_u32(
                    rng_ctr.astype(jnp.int32),
                    env_id.astype(jnp.int32),
                    salt=0x10000000 + tag * 0x3779B9,
                )
                return (hv & 0xFFFF).astype(jnp.float32) / 65536.0

        # ---- wheel model (envs/duckietown_env.py inverse kinematics) --
        if use_wm:
            k_r_inv = (gain + trim) / k_c
            k_l_inv = (gain - trim) / k_c
            omega_r = (act0 + 0.5 * act1 * wheel_dist) / radius
            omega_l = (act0 - 0.5 * act1 * wheel_dist) / radius
            u_r = jnp.clip(omega_r * k_r_inv, -limit, limit)
            u_l = jnp.clip(omega_l * k_l_inv, -limit, limit)
        else:
            u_l, u_r = act0, act1
        u_l = jnp.clip(u_l, -1.0, 1.0)
        u_r = jnp.clip(u_r, -1.0, 1.0)
        vl = u_l * robot_speed
        vr = u_r * robot_speed

        # ---- integrate (simulator.py::_update_pos), unrolled ----------
        speed = jnp.zeros_like(angle)
        for _ in range(frame_skip):
            s_a, c_a = _sincos(angle)
            dir_x, dir_z = c_a, -s_a
            straight = vl == vr
            npx_s = pos_x + dt * vl * dir_x
            npz_s = pos_z + dt * vl * dir_z
            denom = jnp.where(straight, 1.0, vl - vr)
            w = (vr - vl) / wheel_dist
            r_icc = wheel_dist * (vl + vr) / (2.0 * denom)
            rot = w * dt
            cx_ = pos_x + r_icc * s_a
            cz_ = pos_z + r_icc * c_a
            s_r, c_r = _sincos(rot)
            dx_ = pos_x - cx_
            dz_ = pos_z - cz_
            npx_a = cx_ + dx_ * c_r + dz_ * s_r
            npz_a = cz_ + dz_ * c_r - dx_ * s_r
            new_x = jnp.where(straight, npx_s, npx_a)
            new_z = jnp.where(straight, npz_s, npz_a)
            new_angle = angle + jnp.where(straight, 0.0, rot)
            ddx = new_x - pos_x
            ddz = new_z - pos_z
            speed = jnp.sqrt(ddx * ddx + ddz * ddz) * (1.0 / dt)
            pos_x, pos_z, angle = new_x, new_z, new_angle

        step_cnt = step_cnt + frame_skip

        s_a, c_a = _sincos(angle)
        dir_x, dir_z = c_a, -s_a
        right_x, right_z = s_a, c_a

        # ---- drivability of center + wheel + front points -------------
        acx = pos_x + (C.CAMERA_FORWARD_DIST - 0.5 * C.ROBOT_LENGTH) * dir_x
        acz = pos_z + (C.CAMERA_FORWARD_DIST - 0.5 * C.ROBOT_LENGTH) * dir_z

        def drivable_at(px, pz):
            fi = jnp.floor(px * ts_inv)
            fj = jnp.floor(pz * ts_inv)
            ing = (fi >= 0) & (fi < Wg) & (fj >= 0) & (fj < Hg)
            ii = jnp.clip(fi.astype(jnp.int32), 0, Wg - 1)
            jj = jnp.clip(fj.astype(jnp.int32), 0, Hg - 1)
            tid = jj * Wg + ii
            word = jnp.zeros_like(tid)
            widx = tid >> 2
            if multi:
                widx = mi * npw_m + widx
            for wi in range(n_words):
                word = jnp.where(widx == wi, words_ref[0, wi], word)
            kind = (word >> ((tid & 3) * 8)) & 0xF
            driv = (kind >= T.TILE_STRAIGHT) & (kind <= T.TILE_4WAY)
            return ing & driv, tid, ing

        hw = 0.5 * C.ROBOT_WIDTH
        hl = 0.5 * C.ROBOT_LENGTH
        if "driv" in skip:
            tr = jnp.ones_like(pos_x) > 0.0
            d_c = tid_pos = None
            d_c, tid_pos = tr, jnp.zeros_like(pos_x).astype(jnp.int32)
            all_driv = tr
        else:
            d_c, tid_pos, _ = drivable_at(pos_x, pos_z)
            d_c2, _, _ = drivable_at(acx, acz)
            d_l, _, _ = drivable_at(acx - hw * right_x, acz - hw * right_z)
            d_r, _, _ = drivable_at(acx + hw * right_x, acz + hw * right_z)
            d_f, _, _ = drivable_at(acx + hl * dir_x, acz + hl * dir_z)
            all_driv = d_c2 & d_l & d_r & d_f

        # ---- lane query (shared: agent get_lane_pos2 + duckiebot NPCs)
        def lane_query(qx, qz, qdx, qdz):
            """closest_curve_point semantics on position (qx, qz) with
            heading (qdx, qdz): curve package of the tile fetched via
            table_T @ onehot_T, chord-dot curve select, fixed-depth
            bisection. Returns (point_x, point_z, tan_x, tan_z, best_dot,
            drivable)."""
            q_driv, tid_q, _ = drivable_at(qx, qz)
            if multi:
                tid_q = mi * t_pad_m + tid_q
            oh = (
                jax.lax.broadcasted_iota(jnp.int32, (T_lookup, bb), 0)
                == tid_q
            ).astype(f32)  # [T, BB]
            pkg = jax.lax.dot_general(
                ct_ref[:, :], oh,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=f32,
                # HIGHEST or the MXU rounds the gathered table values to
                # bf16 (~4e-3 rel): measured as a systematic ~1e-2
                # TPU-vs-interpret reward gap (r2). A one-hot gather
                # must return the stored f32 bits exactly.
                precision=jax.lax.Precision.HIGHEST,
            )  # [CT_F, BB]

            best_dot = jnp.full_like(qx, -1e30)
            cps = [jnp.zeros_like(qx) for _ in range(8)]
            for c in range(N_CURVES):
                chx = pkg[CT_CHX + c, :][None, :]
                chz = pkg[CT_CHZ + c, :][None, :]
                vld = pkg[CT_VALID + c, :][None, :]
                dot = chx * qdx + chz * qdz
                dot = jnp.where(vld > 0.5, dot, -1e30)
                better = dot > best_dot
                best_dot = jnp.where(better, dot, best_dot)
                for k in range(8):
                    val = pkg[CT_CPS + c * 12 + k, :][None, :]
                    cps[k] = jnp.where(better, val, cps[k])
            # cps rows pack x/z of the 4 control points (y=0):
            # [x0,z0,x1,z1,x2,z2,x3,z3] (build_tables)
            x0, z0, x1, z1, x2, z2, x3, z3 = cps

            def bz_point(t):
                u = 1.0 - t
                w0 = u * u * u
                w1 = 3.0 * t * u * u
                w2 = 3.0 * t * t * u
                w3 = t * t * t
                return (w0 * x0 + w1 * x1 + w2 * x2 + w3 * x3,
                        w0 * z0 + w1 * z1 + w2 * z2 + w3 * z3)

            t_bot = jnp.zeros_like(qx)
            t_top = jnp.ones_like(qx)
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
            tinv = jax.lax.rsqrt(
                jnp.maximum(tanx * tanx + tanz * tanz, 1e-24)
            )
            return px_c, pz_c, tanx * tinv, tanz * tinv, best_dot, q_driv

        # ---- moving-NPC state machines (objects.py semantics) ---------
        npc_xs, npc_zs, npc_as, npc_walks, npc_vels = [], [], [], [], []
        for i, npc in enumerate(npcs):
            base = F_NPC_BASE + NPC_ROWS * i
            npc_xs.append(row(base + 0))
            npc_zs.append(row(base + 1))
            npc_as.append(row(base + 2))
            npc_walks.append(row(base + 3))
            npc_vels.append(row(base + 4))
        for _ in range(frame_skip if npcs else 0):
            for i, npc in enumerate(npcs):
                nx, nz = npc_xs[i], npc_zs[i]
                na, nw, nv = npc_as[i], npc_walks[i], npc_vels[i]
                s_n, c_n = _sincos(na)
                if npc["kind"] == "duckie":
                    # walk along heading, reverse after walk_distance
                    step_len = nv * dt
                    nx = nx + step_len * c_n
                    nz = nz - step_len * s_n
                    nw = nw + step_len
                    rev = nw > npc["walk_dist"]
                    na = jnp.where(rev, na + np.pi, na)
                    nw = jnp.where(rev, 0.0, nw)
                else:  # scripted duckiebot lane follower
                    bdx, bdz = c_n, -s_n
                    cpx, cpz, ctx, ctz, bd1, drv1 = lane_query(
                        nx, nz, bdx, bdz
                    )
                    fpx = cpx + objlib.DUCKIEBOT_FOLLOW_DIST * ctx
                    fpz = cpz + objlib.DUCKIEBOT_FOLLOW_DIST * ctz
                    gpx, gpz, _, _, bd2, drv2 = lane_query(
                        fpx, fpz, bdx, bdz
                    )
                    pvx = gpx - nx
                    pvz = gpz - nz
                    pinv = jax.lax.rsqrt(
                        jnp.maximum(pvx * pvx + pvz * pvz, 1e-18)
                    )
                    # right_vec = (sin a, cos a) in the x-z plane
                    dotr = (s_n * pvx + c_n * pvz) * pinv
                    steering = objlib.DUCKIEBOT_GAIN * (-dotr)
                    ok = drv1 & (bd1 > 0.0) & drv2 & (bd2 > 0.0)
                    steering = jnp.where(ok, steering, 0.0)
                    bvl = nv - steering
                    bvr = nv + steering
                    # differential drive about WHEEL_DIST (update_pos)
                    straight_b = bvl == bvr
                    npx_s = nx + dt * bvl * bdx
                    npz_s = nz + dt * bvl * bdz
                    denom_b = jnp.where(straight_b, 1.0, bvl - bvr)
                    w_b = (bvr - bvl) / C.WHEEL_DIST
                    r_b = C.WHEEL_DIST * (bvl + bvr) / (2.0 * denom_b)
                    rot_b = w_b * dt
                    cx_b = nx + r_b * s_n
                    cz_b = nz + r_b * c_n
                    s_rb, c_rb = _sincos(rot_b)
                    dx_b = nx - cx_b
                    dz_b = nz - cz_b
                    npx_a = cx_b + dx_b * c_rb + dz_b * s_rb
                    npz_a = cz_b + dz_b * c_rb - dx_b * s_rb
                    nx = jnp.where(straight_b, npx_s, npx_a)
                    nz = jnp.where(straight_b, npz_s, npz_a)
                    na = na + jnp.where(straight_b, 0.0, rot_b)
                npc_xs[i], npc_zs[i] = nx, nz
                npc_as[i], npc_walks[i] = na, nw

        # ---- SAT collision + proximity (collision.py semantics) -------
        collided = jnp.zeros_like(all_driv)
        prox_static = jnp.full_like(pos_x, 1e30)
        prox_dyn = jnp.zeros_like(pos_x)
        if collision_on and "sat" not in skip:
            # agent corners about the actual center
            agc = []
            for sf, sr in ((-1, 1), (1, 1), (1, -1), (-1, -1)):
                agc.append((
                    acx + sf * hl * dir_x + sr * hw * right_x,
                    acz + sf * hl * dir_z + sr * hw * right_z,
                ))
            for m in range(M):
                if m in moving_of_col:
                    # live NPC footprint (objects.py::dynamic_corners)
                    i = moving_of_col[m]
                    npc = npcs[i]
                    nx, nz, na = npc_xs[i], npc_zs[i], npc_as[i]
                    s_n, c_n = _sincos(na)
                    fx_n, fz_n = c_n, -s_n
                    rx_n, rz_n = s_n, c_n
                    hw_n, hl_n = npc["hw"], npc["hl"]
                    ocx = [
                        nx - hl_n * fx_n - hw_n * rx_n,
                        nx + hl_n * fx_n - hw_n * rx_n,
                        nx + hl_n * fx_n + hw_n * rx_n,
                        nx - hl_n * fx_n + hw_n * rx_n,
                    ]
                    ocz = [
                        nz - hl_n * fz_n - hw_n * rz_n,
                        nz + hl_n * fz_n - hw_n * rz_n,
                        nz + hl_n * fz_n + hw_n * rz_n,
                        nz - hl_n * fz_n + hw_n * rz_n,
                    ]
                    # box SAT axes = its facing/right unit vectors
                    obj_axes = [(rx_n, rz_n), (fx_n, fz_n)]
                    o_px, o_pz = nx, nz
                    o_rad = npc["rad"]
                    # stacked multimap: this NPC exists on one map only;
                    # envs on other maps carry junk in its blob rows
                    o_act = (mi == col_maps[m]) if multi else True
                    o_dyn = True
                else:
                    ocx = [ot_ref[OT_CX[2 * i], m] for i in range(4)]
                    ocz = [ot_ref[OT_CX[2 * i + 1], m] for i in range(4)]
                    obj_axes = [
                        (jnp.full_like(pos_x, ot_ref[OT_NX[0], m]),
                         jnp.full_like(pos_x, ot_ref[OT_NX[1], m])),
                        (jnp.full_like(pos_x, ot_ref[OT_NX[2], m]),
                         jnp.full_like(pos_x, ot_ref[OT_NX[3], m])),
                    ]
                    o_px = ot_ref[OT_PX, m]
                    o_pz = ot_ref[OT_PZ, m]
                    o_rad = ot_ref[OT_RAD, m]
                    o_act = ot_ref[OT_ACT, m] > 0.5
                    o_dyn = ot_ref[OT_DYN, m] > 0.5
                    if multi:
                        # objects belong to one stacked map each
                        o_act = o_act & (mi == col_maps[m])
                    if domain_rand and m in opt_bit_of_col:
                        # optional-object visibility draw: bit m of the
                        # per-env obj_visible bitmask row (decoded to
                        # int once; shift+and per object)
                        bit = (_objvis_i >> opt_bit_of_col[m]) & 1
                        o_act = o_act & (bit > 0)
                axes = [(dir_x, dir_z), (right_x, right_z)] + obj_axes
                separated = jnp.zeros_like(all_driv)
                for ax, az in axes:
                    amin = amax = None
                    for gx, gz in agc:
                        pa = gx * ax + gz * az
                        amin = pa if amin is None else jnp.minimum(amin, pa)
                        amax = pa if amax is None else jnp.maximum(amax, pa)
                    bmin = bmax = None
                    for i in range(4):
                        pb = ocx[i] * ax + ocz[i] * az
                        bmin = pb if bmin is None else jnp.minimum(bmin, pb)
                        bmax = pb if bmax is None else jnp.maximum(bmax, pb)
                    separated = separated | (amax < bmin) | (bmax < amin)
                hit = ~separated if o_act is True else (
                    (~separated) & o_act
                )
                collided = collided | hit

                # proximity penalty (safety circles)
                dxo = o_px - acx
                dzo = o_pz - acz
                dist_o = jnp.sqrt(dxo * dxo + dzo * dzo)
                score = dist_o - C.AGENT_SAFETY_RAD - o_rad
                if o_act is True and o_dyn is True:
                    prox_dyn = prox_dyn + jnp.minimum(0.0, score)
                elif o_act is True:
                    prox_static = jnp.minimum(prox_static, score)
                elif o_dyn is True:
                    # moving NPC gated by a traced map test (multimap)
                    prox_dyn = prox_dyn + jnp.where(
                        o_act, jnp.minimum(0.0, score), 0.0
                    )
                else:
                    prox_static = jnp.where(
                        o_act & ~o_dyn, jnp.minimum(prox_static, score),
                        prox_static,
                    )
                    prox_dyn = prox_dyn + jnp.where(
                        o_act & o_dyn, jnp.minimum(0.0, score), 0.0
                    )
        col_penalty = jnp.minimum(0.0, prox_static) + prox_dyn

        valid = all_driv & ~collided

        # ---- lane position (closest_curve_point + get_lane_pos2) ------
        if "lane" in skip:
            signed_dist = jnp.zeros_like(pos_x)
            dot_dir = jnp.ones_like(pos_x)
            ang_rad = jnp.zeros_like(pos_x)
            in_lane = d_c
        else:
            px_c, pz_c, tanx, tanz, best_dot, _ = lane_query(
                pos_x, pos_z, dir_x, dir_z
            )
            dot_dir = jnp.clip(dir_x * tanx + dir_z * tanz, -1.0, 1.0)
            # right-of-curve = cross(tangent, up):
            # cross((tx,0,tz),(0,1,0)) = (-tz, 0, tx)
            rox = -tanz
            roz = tanx
            signed_dist = (pos_x - px_c) * rox + (pos_z - pz_c) * roz
            ang_rad = _acos(dot_dir)
            ang_rad = jnp.where(dir_x * rox + dir_z * roz < 0.0, -ang_rad,
                                ang_rad)
            # SURVEY §3.2: NotInLane when no curve agrees with heading
            in_lane = d_c & (best_dot > 0.0)

        # ---- reward / done (simulator.py step + compute_reward) -------
        reward_full = (
            C.REWARD_SPEED_COEF * speed * dot_dir
            + C.REWARD_DIST_COEF * jnp.abs(signed_dist)
            + C.REWARD_COLLISION_COEF * col_penalty
        )
        reward_alive = jnp.where(
            in_lane, reward_full, C.REWARD_COLLISION_COEF * col_penalty
        )
        crashed = ~valid
        truncated = step_cnt >= max_steps
        done = crashed | truncated
        reward = jnp.where(crashed, C.REWARD_INVALID_POSE, reward_alive)

        if nav:
            # Nav goal check on the post-step tile, live episodes only
            # (tasks.nav_step / gym_compat.DuckietownNav semantics).
            # floor(pos/ts) and the f32 goal rows are small exact ints.
            g_fi = jnp.floor(pos_x * ts_inv)
            g_fj = jnp.floor(pos_z * ts_inv)
            reached = (g_fi == goal_i) & (g_fj == goal_j) & ~done
            reward = jnp.where(reached, reward + C.NAV_GOAL_REWARD, reward)
            if cfg.nav_shaping_coef:
                # potential-based goal-distance shaping (EXTENSION,
                # EnvConfig.nav_shaping_coef; mirrors tasks.nav_step)
                ts_k = 1.0 / ts_inv
                gx = (goal_i + 0.5) * ts_k
                gz = (goal_j + 0.5) * ts_k
                d_prev = jnp.sqrt((gx - pos_x_pre) ** 2
                                  + (gz - pos_z_pre) ** 2)
                d_next = jnp.sqrt((gx - pos_x) ** 2 + (gz - pos_z) ** 2)
                reward = reward + cfg.nav_shaping_coef * (d_prev - d_next)
            done = done | reached

        # ---- auto-reset from the spawn bank ---------------------------
        lane_deg = ang_rad * (180.0 / np.pi)
        in_lane_f = in_lane.astype(f32)
        o_ldist, o_ldot = signed_dist, dot_dir
        o_ldeg, o_inlane = lane_deg, in_lane_f
        if auto_reset:
            h = _hash_u32(
                rng_ctr.astype(jnp.int32),
                env_id.astype(jnp.int32),
                salt=0x20000000,
            )
            if multi:
                # draw within the env's map segment of the bank
                n_ok_v = jnp.full_like(h, n_ok_list[0])
                for m_ in range(1, n_maps):
                    n_ok_v = jnp.where(mi == m_, n_ok_list[m_], n_ok_v)
                sidx = mi * BANK_K + h % jnp.maximum(n_ok_v, 1)
            else:
                sidx = h % max(n_spawn_ok, 1)
            ohb = (
                jax.lax.broadcasted_iota(
                    jnp.int32, (n_maps * BANK_K, bb), 0)
                == sidx
            ).astype(f32)
            sp = jax.lax.dot_general(
                bank_ref[:, :], ohb,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=f32,
                # exact f32 gather (see lane_query): spawn poses must
                # match the bank bits, not their bf16 rounding
                precision=jax.lax.Precision.HIGHEST,
            )  # [8, BB]
            pos_x = jnp.where(done, sp[BK_X, :][None, :], pos_x)
            pos_y = jnp.where(done, sp[BK_Y, :][None, :], pos_y)
            pos_z = jnp.where(done, sp[BK_Z, :][None, :], pos_z)
            angle = jnp.where(done, sp[BK_ANG, :][None, :], angle)
            speed = jnp.where(done, 0.0, speed)
            vl = jnp.where(done, 0.0, vl)
            vr = jnp.where(done, 0.0, vr)
            step_cnt = jnp.where(done, 0.0, step_cnt)
            # observation-side lane rows: fresh spawn's precomputed values
            o_ldist = jnp.where(done, sp[BK_LDIST, :][None, :], o_ldist)
            o_ldot = jnp.where(done, sp[BK_LDOT, :][None, :], o_ldot)
            o_ldeg = jnp.where(done, sp[BK_LDEG, :][None, :], o_ldeg)
            o_inlane = jnp.where(done, sp[BK_INLANE, :][None, :], o_inlane)
            if nav:
                # fresh goal: uniform drivable tile of the env's map
                # (tasks._draw_goal), same one-hot-matmul fetch as the
                # spawn bank, decorrelated hash stream (per-site salt)
                hg = _hash_u32(
                    rng_ctr.astype(jnp.int32),
                    env_id.astype(jnp.int32),
                    salt=0x40000000,
                )
                if multi:
                    nd_v = jnp.full_like(hg, n_driv_list[0])
                    for m_ in range(1, n_maps):
                        nd_v = jnp.where(mi == m_, n_driv_list[m_], nd_v)
                    gidx = mi * goal_k + hg % jnp.maximum(nd_v, 1)
                else:
                    gidx = hg % max(n_driv_list[0], 1)
                ohg = (
                    jax.lax.broadcasted_iota(
                        jnp.int32, (n_maps * goal_k, bb), 0)
                    == gidx
                ).astype(f32)
                gp = jax.lax.dot_general(
                    goal_ref[:, :], ohg,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=f32,
                    precision=jax.lax.Precision.HIGHEST,
                )  # [8, BB]
                goal_i = jnp.where(done, gp[0, :][None, :], goal_i)
                goal_j = jnp.where(done, gp[1, :][None, :], goal_j)
            # NPCs re-place at their initial poses on episode reset
            # (reference: Simulator.reset re-places dynamic objects);
            # duckie walk speed redrawn ~N(0.02, 0.005) via the in-kernel
            # hash PRNG (Irwin-Hall 4-uniform approximation). Spawn
            # clearance vs NPCs needs no in-kernel check BECAUSE of this
            # re-placement: every bank pose was validated against the
            # initial NPC poses at build time (spawn_bank.py), which is
            # exactly where the NPCs stand after this block.
            for i, npc in enumerate(npcs):
                npc_xs[i] = jnp.where(done, npc["x0"], npc_xs[i])
                npc_zs[i] = jnp.where(done, npc["z0"], npc_zs[i])
                npc_as[i] = jnp.where(done, npc["a0"], npc_as[i])
                npc_walks[i] = jnp.where(done, 0.0, npc_walks[i])
                if npc["kind"] == "duckie":
                    usum = jnp.zeros_like(pos_x)
                    for j in range(4):
                        hv = _hash_u32(
                            rng_ctr.astype(jnp.int32),
                            env_id.astype(jnp.int32),
                            salt=0x30000000 + j * 0x3779B9
                            + i * 0x611C9,
                        )
                        usum = usum + (hv & 0xFFFF).astype(f32) / 65536.0
                    nrm = (usum - 2.0) * 1.7320508  # ~N(0, 1)
                    fresh_vel = jnp.maximum(
                        objlib.DUCKIE_WALK_SPEED + 0.005 * nrm, 0.001
                    )
                    npc_vels[i] = jnp.where(done, fresh_vel, npc_vels[i])
            if domain_rand:
                # re-draw every randomization field for fresh episodes
                # (ranges exactly as randomization.draw, SURVEY §3.4)
                def rdw(cur, lo, hi, tag):
                    return jnp.where(done, lo + (hi - lo) * _u01(tag), cur)

                rs0 = float(cfg.robot_speed)
                robot_speed = rdw(robot_speed, 0.9 * rs0, 1.1 * rs0, 1)
                wheel_dist = rdw(wheel_dist, 0.95 * C.WHEEL_DIST,
                                 1.05 * C.WHEEL_DIST, 2)
                dr_rows[DR_FOV] = rdw(dr_rows[DR_FOV], C.CAMERA_FOV_Y - 5.0,
                                      C.CAMERA_FOV_Y + 5.0, 3)
                dr_rows[DR_CAMH] = rdw(
                    dr_rows[DR_CAMH], 0.92 * C.CAMERA_FLOOR_DIST,
                    1.08 * C.CAMERA_FLOOR_DIST, 4)
                dr_rows[DR_CAMA] = rdw(dr_rows[DR_CAMA], C.CAMERA_ANGLE - 3.0,
                                       C.CAMERA_ANGLE + 3.0, 5)
                dr_rows[DR_CAMF] = rdw(
                    dr_rows[DR_CAMF], 0.9 * C.CAMERA_FORWARD_DIST,
                    1.1 * C.CAMERA_FORWARD_DIST, 6)
                lx_n = -1.0 + 0.8 * _u01(7)
                lz_n = -1.0 + 0.8 * _u01(8)
                linv = jax.lax.rsqrt(lx_n * lx_n + 1.0 + lz_n * lz_n)
                dr_rows[DR_LX] = jnp.where(done, lx_n * linv,
                                           dr_rows[DR_LX])
                dr_rows[DR_LY] = jnp.where(done, -linv, dr_rows[DR_LY])
                dr_rows[DR_LZ] = jnp.where(done, lz_n * linv,
                                           dr_rows[DR_LZ])
                dr_rows[DR_AMB] = rdw(dr_rows[DR_AMB], 0.35, 0.7, 9)
                from dtown.randomization import (
                    NOMINAL_GROUND_COLOR as NGC,
                    NOMINAL_HORIZON_COLOR as NHC,
                )

                for ci, dri in enumerate((DR_GR, DR_GG, DR_GB)):
                    g0 = float(NGC[ci])
                    dr_rows[dri] = jnp.clip(
                        rdw(dr_rows[dri], g0 - 0.08, g0 + 0.08, 10 + ci),
                        0.0, 1.0)
                for ci, dri in enumerate((DR_HR, DR_HG, DR_HB)):
                    h0 = float(NHC[ci])
                    dr_rows[dri] = jnp.clip(
                        rdw(dr_rows[dri], h0 - 0.2, h0 + 0.2, 13 + ci),
                        0.0, 1.0)
                fresh_seed = jnp.floor(_u01(16) * (1 << 23))
                dr_rows[DR_TEXSEED] = jnp.where(done, fresh_seed,
                                                dr_rows[DR_TEXSEED])
                vis = jnp.zeros_like(pos_x)
                for kbit in range(len(opt_cols)):
                    vis = vis + jnp.where(
                        _u01(17 + kbit) < 0.5, float(1 << kbit), 0.0
                    )
                dr_rows[DR_OBJVIS] = jnp.where(done, vis,
                                               dr_rows[DR_OBJVIS])
        rng_ctr = rng_ctr + 1.0

        # ---- write back ----------------------------------------------
        z = jnp.zeros((1, bb), f32)
        rows = [
            pos_x, pos_y, pos_z, angle, speed, vl, vr, step_cnt, rng_ctr,
            robot_speed, wheel_dist, act0, act1,
            reward, done.astype(f32), signed_dist, dot_dir,
            lane_deg, in_lane_f,
            collided.astype(f32), step_cnt * dt, env_id,
            o_ldist, o_ldot, o_ldeg, o_inlane, map_row,
        ]
        for i in range(len(npcs)):
            rows.extend([npc_xs[i], npc_zs[i], npc_as[i], npc_walks[i],
                         npc_vels[i]])
        if domain_rand:
            rows.extend(dr_rows)
        if nav:
            rows.extend([goal_i, goal_j])
        nf_total = nf_for(len(npcs), domain_rand, bool(nav))
        while len(rows) < nf_total:
            rows.append(z)
        out_ref[:, :] = jnp.concatenate(rows, axis=0)

    return kernel


def build_goal_table(maps):
    """Drivable-tile table for the fused Nav path.

    Returns dict(goal=[8, n_maps*goal_k] f32 — rows 0/1 are the (i, j)
    tile coords, rest zero-padded to the 8-sublane minimum — goal_k,
    n_driv_list). The kernel draws a uniform index into the env's map
    segment and fetches via the same one-hot matmul as the spawn bank
    (tasks._draw_goal semantics: uniform over drivable tiles).
    """
    if maps.tile_kind.ndim == 3:
        grids = [np.asarray(maps.drivable[m])
                 for m in range(maps.tile_kind.shape[0])]
    else:
        grids = [np.asarray(maps.drivable)]
    coords = []
    for g in grids:
        j, i = np.nonzero(g)
        coords.append(np.stack([i, j], axis=0).astype(np.float32))
    n_driv_list = tuple(int(c.shape[1]) for c in coords)
    goal_k = max(-(-max(n_driv_list) // 128) * 128, 128)
    table = np.zeros((8, len(coords) * goal_k), dtype=np.float32)
    for m, c in enumerate(coords):
        table[:2, m * goal_k:m * goal_k + c.shape[1]] = c
    return dict(goal=table, goal_k=goal_k, n_driv_list=n_driv_list)


def build_tables(cfg, maps):
    """Static (numpy) kernel tables from a compiled map. Returns dict.

    Stacked multimaps (leading map axis) produce concatenated tables:
    curve/word/object/bank segments per map plus a `multi` descriptor;
    the kernel then offsets every lookup by the env's map index
    (F_MAPID blob row). Replaces the reference's one-Simulator-per-map
    MultiMapEnv at kernel speed.
    """
    if maps.tile_kind.ndim == 3:
        return _build_tables_multi(cfg, maps)
    return _build_tables_single(cfg, maps)


def _build_tables_multi(cfg, maps):
    import jax

    n_maps = maps.tile_kind.shape[0]
    per_map = [
        jax.tree_util.tree_map(lambda a, m=m: a[m], maps)
        for m in range(n_maps)
    ]
    tabs = [_build_tables_single(cfg, pm) for pm in per_map]
    assert len({t["ts_inv"].item() for t in tabs}) == 1, (
        "stacked maps must share tile_size"
    )
    t0 = tabs[0]
    Hg, Wg = t0["Hg"], t0["Wg"]
    T_pad = Hg * Wg
    npw = -(-T_pad // 4)

    ct = np.concatenate([t["ct"] for t in tabs], axis=1)
    # words: exact npw segment per map, then lane pad
    words = np.concatenate(
        [t["words"][0, :npw] for t in tabs]
    )
    wtot = len(words)
    wpad = max(-(-wtot // 128) * 128, 128)
    words_padded = np.zeros((1, wpad), dtype=np.int32)
    words_padded[0, :wtot] = words

    # object table: concatenated columns; per-column source map recorded.
    # Moving NPCs concatenate too (map-major, matching moving_npcs() on
    # the stacked maps): column c of map m maps to global NPC index
    # npc_off[m] + local, and the descriptor carries its map for gating.
    ots, col_maps, opt_cols, npcs_all, moving_cols = [], [], [], [], []
    col0 = 0
    for m, t in enumerate(tabs):
        npc_off = len(npcs_all)
        for npc in t["npcs"]:
            npcs_all.append(dict(npc, map=m))
        if t["M"]:
            ots.append(t["ot"][:, :t["M"]])
            col_maps.extend([m] * t["M"])
            opt_cols.extend(c + col0 for c in t["opt_cols"])
            moving_cols.extend(
                (c + col0, i + npc_off) for c, i in t["moving_cols"]
            )
            col0 += t["M"]
    M = col0
    if len(opt_cols) > 23:
        # the per-env visibility bitfield lives in one f32 blob row
        # (exact integers only up to 2^24); no shipped map comes close,
        # but a large stack of optional-heavy maps could
        raise NotImplementedError(
            f"stack has {len(opt_cols)} optional objects; the fused "
            "domain-rand visibility bitfield supports at most 23"
        )
    ot = (np.concatenate(ots, axis=1) if M
          else np.zeros((OT_F, 1), dtype=np.float32))

    bank = np.concatenate([t["bank"] for t in tabs], axis=1)
    n_ok_list = tuple(t["n_ok"] for t in tabs)

    return dict(
        ct=ct, words=words_padded, ot=ot, bank=bank,
        n_ok=max(n_ok_list), n_words=wtot, M=M, Hg=Hg, Wg=Wg,
        ts_inv=t0["ts_inv"], npcs=tuple(npcs_all),
        moving_cols=tuple(moving_cols),
        opt_cols=tuple(opt_cols),
        multi=dict(n_maps=n_maps, t_pad=T_pad, npw=npw,
                   n_ok_list=n_ok_list, col_maps=tuple(col_maps)),
    )


def _build_tables_single(cfg, maps):
    Hg, Wg = maps.grid_shape
    n_tiles = Hg * Wg
    T_pad = n_tiles  # contraction dim; MXU pads internally

    curves = np.asarray(maps.curves, dtype=np.float32).reshape(
        n_tiles, -1, 4, 3
    )
    cmask = np.asarray(maps.curve_mask).reshape(n_tiles, -1)
    nC = curves.shape[1]
    ct = np.zeros((CT_F, n_tiles), dtype=np.float32)
    for t in range(n_tiles):
        for c in range(min(nC, N_CURVES)):
            cps = curves[t, c]
            # pack x/z of the 4 control points: rows c*12 + [0..7]
            for k in range(4):
                ct[CT_CPS + c * 12 + 2 * k, t] = cps[k, 0]
                ct[CT_CPS + c * 12 + 2 * k + 1, t] = cps[k, 2]
            if cmask[t, c]:
                # strict f32 op sequence (mul, mul, add, sqrt, max, div):
                # objects._pursuit_lane_query recomputes the identical
                # sequence at runtime so the XLA duckiebot NPC sees
                # bit-identical chord values (f64 hypot here would leave
                # double-rounded constants the XLA side cannot reproduce)
                ch = (cps[3] - cps[0]).astype(np.float32)
                n2 = ch[0] * ch[0] + ch[2] * ch[2]
                n = np.maximum(np.sqrt(n2), np.float32(1e-12))
                ct[CT_CHX + c, t] = ch[0] / n
                ct[CT_CHZ + c, t] = ch[2] / n
                ct[CT_VALID + c, t] = 1.0

    # packed tile words (variant 0 — domain_rand off fast path)
    kind = np.asarray(maps.tile_kind).reshape(-1).astype(np.int64)
    ang = np.asarray(maps.tile_angle).reshape(-1).astype(np.int64)
    byte = (kind & 0xF) | ((ang & 0x3) << 4)
    n_words = -(-n_tiles // 4)
    b = np.zeros(n_words * 4, dtype=np.int64)
    b[:n_tiles] = byte
    b4 = b.reshape(n_words, 4)
    words = (
        b4[:, 0] | (b4[:, 1] << 8) | (b4[:, 2] << 16) | (b4[:, 3] << 24)
    ).astype(np.int32)
    wpad = max(-(-n_words // 128) * 128, 128)
    words_padded = np.zeros((1, wpad), dtype=np.int32)
    words_padded[0, :n_words] = words

    # object table (static poses; dynamic objects use their initial pose
    # in this fast path — exact for static maps, approximate for NPC maps)
    M = int(np.asarray(maps.obj_mask).sum())
    ot = np.zeros((OT_F, max(M, 1)), dtype=np.float32)
    if M:
        mask = np.asarray(maps.obj_mask)
        oc = np.asarray(maps.obj_corners)[mask]
        on = np.asarray(maps.obj_norms)[mask]
        op = np.asarray(maps.obj_pos)[mask]
        orad = np.asarray(maps.obj_safety_rad)[mask]
        odyn = np.asarray(maps.obj_is_dynamic)[mask]
        for m in range(M):
            for i in range(4):
                ot[OT_CX[2 * i], m] = oc[m, i, 0]
                ot[OT_CX[2 * i + 1], m] = oc[m, i, 1]
            for i in range(2):
                ot[OT_NX[2 * i], m] = on[m, i, 0]
                ot[OT_NX[2 * i + 1], m] = on[m, i, 1]
            ot[OT_PX, m] = op[m, 0]
            ot[OT_PZ, m] = op[m, 2]
            ot[OT_RAD, m] = orad[m]
            ot[OT_ACT, m] = 1.0
            ot[OT_DYN, m] = float(odyn[m])

    # spawn bank, transposed, first BANK_K entries (sorted by |lane deg|)
    sp = np.asarray(maps.spawn_pos)[:BANK_K]
    sa = np.asarray(maps.spawn_angle)[:BANK_K]
    sd = np.asarray(maps.spawn_lane_deg)[:BANK_K]
    bank = np.zeros((8, BANK_K), dtype=np.float32)
    bank[BK_X] = sp[:, 0]
    bank[BK_Y] = sp[:, 1]
    bank[BK_Z] = sp[:, 2]
    bank[BK_ANG] = sa
    # start-pose overrides pin every (re)spawn to the configured pose
    # (reference: user_tile_start / start pose skip the sampling loop)
    if cfg.start_pose is not None:
        x0, z0, a0 = cfg.start_pose
        sp = np.tile([[x0, 0.0, z0]], (BANK_K, 1))
        sa = np.full((BANK_K,), float(a0))
        bank[BK_X], bank[BK_Y], bank[BK_Z] = x0, 0.0, z0
        bank[BK_ANG] = float(a0)
    elif cfg.user_tile_start is not None:
        from dtown.spawn_bank import _bezier_closest, _bezier_tangents

        i0, j0 = cfg.user_tile_start
        ts = float(maps.tile_size)
        cx, cz = (i0 + 0.5) * ts, (j0 + 0.5) * ts
        cps0 = np.asarray(maps.curves, np.float64)[j0, i0, 0][None]
        t0 = _bezier_closest(cps0, np.array([[cx, 0.0, cz]]))
        tan0 = _bezier_tangents(cps0, t0)[0]
        a0 = float(np.arctan2(-tan0[2], tan0[0]))
        sp = np.tile([[cx, 0.0, cz]], (BANK_K, 1))
        sa = np.full((BANK_K,), a0)
        bank[BK_X], bank[BK_Y], bank[BK_Z] = cx, 0.0, cz
        bank[BK_ANG] = a0

    # precomputed lane features per spawn pose (exact post-reset obs rows)
    from dtown.spawn_bank import lane_features_np

    ldist, ldot, ldeg, inlane = lane_features_np(
        float(maps.tile_size), np.asarray(maps.drivable),
        np.asarray(maps.curves, dtype=np.float64),
        np.asarray(maps.curve_mask),
        sp.astype(np.float64), sa.astype(np.float64),
    )
    bank[BK_LDIST] = ldist
    bank[BK_LDOT] = ldot
    bank[BK_LDEG] = ldeg
    bank[BK_INLANE] = inlane.astype(np.float32)
    n_ok = int((np.abs(sd) < cfg.accept_start_angle_deg).sum())
    n_ok = max(n_ok, 1)

    # moving NPCs: their static table entries are stale; the kernel
    # overrides those columns with live poses from the blob NPC rows
    npcs = tuple(moving_npcs(maps))
    slot_to_npc = {npc["slot"]: i for i, npc in enumerate(npcs)}
    cols = np.nonzero(np.asarray(maps.obj_mask))[0]
    moving_cols = tuple(
        (int(c), slot_to_npc[int(s)])
        for c, s in enumerate(cols) if int(s) in slot_to_npc
    )
    optional = np.asarray(maps.obj_optional)
    opt_cols = tuple(
        int(c) for c, s in enumerate(cols) if bool(optional[int(s)])
    )

    return dict(
        ct=ct, words=words_padded, ot=ot, bank=bank, n_ok=n_ok,
        n_words=n_words, M=M, Hg=Hg, Wg=Wg,
        ts_inv=np.float32(1.0 / float(maps.tile_size)),
        npcs=npcs, moving_cols=moving_cols, opt_cols=opt_cols,
    )


def state_step_pallas(cfg, maps, blob, actions, tables=None,
                      interpret=None, nav_tables=None):
    """One fused state step. blob: f32 [NF, B]; actions [B, 2].

    Returns the updated blob (outputs in the F_REWARD.. rows).
    With nav_tables (build_goal_table), the blob carries goal-tile rows
    and the kernel runs the Nav task (goal bonus/done/redraw) in-graph.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if tables is None:
        tables = build_tables(cfg, maps)
    B = blob.shape[1]
    if B % 8 != 0:
        raise ValueError(
            f"fused state kernel requires num_envs divisible by 8 (the TPU "
            f"sublane width); got {B}"
        )
    bb = BB
    while B % bb != 0 or bb > B:
        bb //= 2

    # actions ride a separate tiny input (8 sublanes min) instead of
    # being written into the carried blob: the row build is then
    # loop-invariant under scan when actions are constant, and the
    # donated blob is never copied for an input-side update
    act_rows = jnp.zeros((8, B), jnp.float32)
    act_rows = act_rows.at[0].set(actions[:, 0])
    act_rows = act_rows.at[1].set(actions[:, 1])

    kern = make_state_kernel(
        cfg, tables["Hg"], tables["Wg"], tables["n_words"], tables["M"],
        tables["n_ok"], bb=bb,
        npcs=tables.get("npcs", ()),
        moving_cols=tables.get("moving_cols", ()),
        opt_cols=tables.get("opt_cols", ()),
        multi=tables.get("multi"),
        nav=nav_tables,
    )
    ct = jnp.asarray(tables["ct"])
    words = jnp.asarray(tables["words"])
    ot = jnp.asarray(tables["ot"])
    bank = jnp.asarray(tables["bank"])
    tsv = jnp.full((1, 1), tables["ts_inv"], jnp.float32)

    nf_total = nf_for(len(tables.get("npcs", ())), bool(cfg.domain_rand),
                      nav_tables is not None)
    assert blob.shape[0] == nf_total, (blob.shape, nf_total)
    grid = (B // bb,)
    in_specs = [
        pl.BlockSpec((nf_total, bb), lambda b: (0, b),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((8, bb), lambda b: (0, b),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(words.shape, lambda b: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(ct.shape, lambda b: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(ot.shape, lambda b: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(bank.shape, lambda b: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1), lambda b: (0, 0),
                     memory_space=pltpu.SMEM),
    ]
    operands = [blob, act_rows, words, ct, ot, bank, tsv]
    if nav_tables is not None:
        goal = jnp.asarray(nav_tables["goal"])
        in_specs.append(pl.BlockSpec(goal.shape, lambda b: (0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(goal)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((nf_total, B), jnp.float32),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((nf_total, bb), lambda b: (0, b),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*operands)
    return out

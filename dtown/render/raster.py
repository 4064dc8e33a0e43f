"""On-device camera renderer: analytic ground + primitive ray caster.

Replaces the reference's OpenGL render-to-FBO + glReadPixels pipeline
(reference: simulator.py::_render_img + graphics.py::create_frame_buffers,
SURVEY.md §3.3 — the per-step GPU->host readback this rebuild removes).

Design: one pure function state -> uint8 image, vmapped over envs.
 * Ground/tiles: per-pixel ray vs ground plane, tile texture gather from
   the procedural atlas (nearest sample, per-tile variant + orientation).
 * Objects: the nearest MAX_VIS objects are ray-cast against their
   primitive-soup models (render/meshes.py) with a lax.fori_loop over
   objects — keeps peak memory at one t/color buffer per pixel instead of
   materializing [H, W, K, P] candidates.
 * Lighting: per-env directional light + ambient (domain randomized).
Everything is elementwise + gathers: XLA fuses it into a few kernels; a
hand-written Pallas version of the hot path lives in pallas_ground.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from dtown import constants as C
from dtown.geometry import get_dir_vec, get_right_vec, sincos
from dtown.render import meshes as meshlib

_EPS = 1e-4

def camera_rays(cfg, state):
    """Per-pixel unit ray directions [H, W, 3] + eye position [3].

    reference: the gluPerspective / gluLookAt setup in _render_img:
    eye = pos + (0, cam_height, 0) + cam_fwd_dist * dir_vec, view pitched
    down by cam_angle, vertical fov cam_fov_y.
    """
    H, W = cfg.camera_height, cfg.camera_width
    fwd_flat = get_dir_vec(state.angle)
    right = get_right_vec(state.angle)
    up_y = jnp.array([0.0, 1.0, 0.0], dtype=jnp.float32)

    pitch = jnp.deg2rad(state.cam_angle)
    sp, cp = sincos(pitch)
    forward = cp * fwd_flat - sp * up_y
    up = cp * up_y + sp * fwd_flat

    eye = state.pos + state.cam_height * up_y + state.cam_fwd_dist * fwd_flat

    tan_half = jnp.tan(0.5 * jnp.deg2rad(state.cam_fov_y))
    aspect = W / H
    if cfg.distortion:
        # fisheye baked at ray level: per-pixel NDC factors from the
        # Newton-inverted plumb-bob model (reference distortion.py
        # applied cv2.remap AFTER rendering; sampling the distorted ray
        # directly is the exact continuous form of that remap — see
        # distortion.undistorted_ndc)
        from dtown.render.distortion import undistorted_ndc

        xb, yb = undistorted_ndc(W, H)
        xg = jnp.asarray(xb)[:, :, None]
        yg = jnp.asarray(yb)[:, :, None]
    else:
        ys = (0.5 - (jnp.arange(H, dtype=jnp.float32) + 0.5) / H) * 2.0
        xs = ((jnp.arange(W, dtype=jnp.float32) + 0.5) / W - 0.5) * 2.0
        yg = ys[:, None, None]  # +1 top
        xg = xs[None, :, None]
    d = (
        forward[None, None, :]
        + xg * (tan_half * aspect) * right[None, None, :]
        + yg * tan_half * up[None, None, :]
    )
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    return d, eye


def _ground_color(cfg, maps, state, rays, eye):
    """Procedurally shaded ground + sky background. Returns
    (rgb [H,W,3] f32, t_bg [H,W] f32).

    Tile appearance is computed analytically per pixel (render/shading.py)
    instead of sampling a texture image — no big gathers, pure VPU math;
    only the tiny [H, W] tile-property grids are indexed.
    """
    from dtown.render.shading import shade_tile

    dy = rays[..., 1]
    hits_ground = dy < -1e-6
    t = jnp.where(hits_ground, -eye[1] / jnp.where(hits_ground, dy, -1.0),
                  jnp.inf)
    px = eye[0] + t * rays[..., 0]
    pz = eye[2] + t * rays[..., 2]

    ts = maps.tile_size
    fi = jnp.floor(px / ts)
    fj = jnp.floor(pz / ts)
    Hg, Wg = maps.grid_shape
    in_grid = (fi >= 0) & (fi < Wg) & (fj >= 0) & (fj < Hg) & hits_ground
    i = jnp.clip(fi.astype(jnp.int32), 0, Wg - 1)
    j = jnp.clip(fj.astype(jnp.int32), 0, Hg - 1)

    kind = maps.tile_tex[j, i]
    variant = state.tex_variant[j, i]
    tangle = maps.tile_angle[j, i]

    u = px / ts - fi
    v = pz / ts - fj
    if getattr(cfg, "marking_aa", True):
        # analytic marking AA (shading.line_coverage): per-pixel ground
        # footprint fw = t * pixel_angle / tile_size in tile units;
        # 1/t = -dy/eye_y on ground rays, so inv_fw needs no divide.
        # Identical formula in the fused kernel (blob_raster).
        H = dy.shape[0]
        px_ang = 2.0 * jnp.tan(0.5 * jnp.deg2rad(state.cam_fov_y)) / H
        # ALONG-TRACK footprint fw = t*px_ang/|dy| (the ground-projected
        # pixel extent along the view, 1/|dy| longer than across-track
        # at grazing angles): inv_fw = |dy|/(t*px_ang) = dy^2/(eye_y*
        # px_ang). Validated against an 8x8-supersampled reference (r5):
        # edge-pixel error 13-17 vs 20-21 for the isotropic across-track
        # form and 20-27 with AA off — far horizontal bands dissolve
        # correctly instead of shimmering, near lines soften ~1 px.
        # dy^2 also needs no sign handling on sky rays.
        inv_fw = dy * dy / (eye[1] * px_ang) * ts
    else:
        inv_fw = None
    texel = shade_tile(kind, tangle, variant, u, v, inv_fw=inv_fw)

    # out-of-grid ground uses the (randomizable) ground color
    ground_rgb = jnp.where(in_grid[..., None], texel,
                           state.ground_color[None, None, :])

    # flat ground shading from the directional light
    diffuse = jnp.maximum(0.0, -state.light_dir[1])
    shade = state.light_ambient + (1.0 - state.light_ambient) * diffuse
    ground_rgb = ground_rgb * shade

    # sky: horizon color, slightly darker overhead
    sky = state.horizon_color[None, None, :] * (
        1.0 - 0.35 * jnp.maximum(0.0, dy)[..., None]
    )
    rgb = jnp.where(hits_ground[..., None], ground_rgb, sky)
    t_bg = jnp.where(hits_ground, t, jnp.inf)
    return rgb, t_bg


def _rot_xz(x, z, s, c):
    """Rotate (x, z) by the angle whose sincos is (s, c) — matches
    geometry.rotate_point_xz convention."""
    return x * c + z * s, z * c - x * s


def _intersect_prims(o, d, prim, prim_ok=None):
    """Ray vs one object's primitive set, model space.

    o, d: [H, W, 3]; prim arrays are [P, ...]. prim_ok: optional [P]
    bool extra visibility mask (per-prim LOD cull, render/lod.py).
    Returns (t [H,W], normal [H,W,3], color_idx [H,W] int32 in [0,P),
    hit [H,W]).
    """
    P = prim["type"].shape[0]
    oc = o[..., None, :] - prim["center"][None, None]      # [H,W,P,3]
    dd = d[..., None, :]                                   # [H,W,1,3]

    # sphere
    b = jnp.sum(oc * dd, axis=-1)
    cc = jnp.sum(oc * oc, axis=-1) - prim["param"][None, None, :, 0] ** 2
    disc = b * b - cc
    sph_hit = disc > 0.0
    t_sph = -b - jnp.sqrt(jnp.maximum(disc, 0.0))
    sph_hit = sph_hit & (t_sph > _EPS)

    # box (axis-aligned in model space)
    he = prim["param"][None, None]                         # [1,1,P,3]
    inv_d = 1.0 / jnp.where(jnp.abs(dd) < 1e-9,
                            jnp.where(dd >= 0, 1e-9, -1e-9), dd)
    t1 = (-he - oc) * inv_d
    t2 = (he - oc) * inv_d
    tmin_ax = jnp.minimum(t1, t2)
    tmax_ax = jnp.maximum(t1, t2)
    tmin = jnp.max(tmin_ax, axis=-1)
    tmax = jnp.min(tmax_ax, axis=-1)
    box_hit = (tmax >= jnp.maximum(tmin, _EPS))
    t_box = jnp.where(tmin > _EPS, tmin, tmax)
    box_hit = box_hit & (t_box > _EPS)

    is_box = (prim["type"] == meshlib.BOX)[None, None]
    t_p = jnp.where(is_box, t_box, t_sph)
    hit_p = jnp.where(is_box, box_hit, sph_hit) & prim["mask"][None, None]
    if prim_ok is not None:
        hit_p = hit_p & prim_ok[None, None]
    t_p = jnp.where(hit_p, t_p, jnp.inf)

    best = jnp.argmin(t_p, axis=-1)                        # [H,W]
    t_best = jnp.take_along_axis(t_p, best[..., None], axis=-1)[..., 0]
    hit = jnp.isfinite(t_best)

    # normal of the winning primitive
    oc_b = jnp.take_along_axis(oc, best[..., None, None], axis=-2)[..., 0, :]
    he_b = prim["param"][best]                              # [H,W,3]
    p_hit = o + t_best[..., None] * d
    c_b = prim["center"][best]
    rel = p_hit - c_b
    # sphere normal
    n_sph = rel / jnp.maximum(
        jnp.linalg.norm(rel, axis=-1, keepdims=True), 1e-9
    )
    # box normal: dominant axis of rel / he
    ratio = rel / jnp.maximum(he_b, 1e-9)
    ax = jnp.argmax(jnp.abs(ratio), axis=-1)
    n_box = (
        jax.nn.one_hot(ax, 3, dtype=o.dtype)
        * jnp.sign(jnp.take_along_axis(ratio, ax[..., None], axis=-1))
    )
    is_box_b = (prim["type"][best] == meshlib.BOX)[..., None]
    normal = jnp.where(is_box_b, n_box, n_sph)
    return t_best, normal, best, hit


def _render_objects(cfg, maps, state, rays, eye, rgb, t_bg,
                    exclude_slots=()):
    """Composite the nearest MAX_VIS objects over the background."""
    prim_np = meshlib.prim_tables()
    prim = {k: jnp.asarray(v) for k, v in prim_np.items()}
    Kvis = cfg.max_visible_objects
    M = maps.max_objects
    if M == 0 or Kvis == 0:
        return rgb, t_bg
    from dtown.utils.staticcheck import concrete_any

    if not concrete_any(maps.obj_mask):
        return rgb, t_bg
    Kvis = min(Kvis, M)

    from dtown.env import active_objects

    active = active_objects(maps, state)
    if exclude_slots:
        # slots drawn by the triangle-fidelity pass instead
        ex = np.zeros(M, dtype=bool)
        ex[list(exclude_slots)] = True
        active = active & ~jnp.asarray(ex)
    dist = jnp.linalg.norm(state.dyn.pos - eye[None, :], axis=-1)
    from dtown.render import lod

    # object-level cull: blanket obj_cull_dist tightened by the
    # size-aware LOD bound of the object's LARGEST prim (render/lod.py)
    # so fully-sub-pixel objects stop consuming top-K visibility slots
    kmax = lod.kind_culld_max(cfg)  # [n_kinds], +inf when LOD off
    slot_cull = jnp.minimum(
        jnp.float32(cfg.obj_cull_dist),
        jnp.asarray(kmax)[maps.obj_kind] * maps.obj_scale,
    )
    active = active & (dist < slot_cull)  # sub-pixel beyond this
    culld_base = jnp.asarray(lod.prim_culld_base(cfg))  # [n_kinds, P]
    score = jnp.where(active, -dist, -jnp.inf)
    _, top_idx = jax.lax.top_k(score, Kvis)

    from dtown.objects import render_angles

    draw_angle = render_angles(maps, state.dyn)

    def body(rgb, t_best, m):
        ok = active[m]
        opos = state.dyn.pos[m]
        oang = draw_angle[m]
        oscale = maps.obj_scale[m]
        okind = maps.obj_kind[m]
        ophase = state.dyn.phase[m]

        s_r, c_r = sincos(-oang)
        off = (eye - opos) / jnp.maximum(oscale, 1e-6)
        ox, oz = _rot_xz(off[0], off[2], s_r, c_r)
        o_model = jnp.stack([ox, off[1] / 1.0, oz])
        dx, dz = _rot_xz(rays[..., 0], rays[..., 2], s_r, c_r)
        d_model = jnp.stack([dx, rays[..., 1], dz], axis=-1)

        pk = {key: v[okind] for key, v in prim.items()}
        o_b = jnp.broadcast_to(o_model, d_model.shape)
        # per-prim LOD cull (render/lod.py): a prim whose bounding
        # radius is sub-threshold at this distance never hits — matches
        # the fused kernel's per-prim act gate
        prim_ok = dist[m] < jnp.minimum(
            jnp.float32(cfg.obj_cull_dist), culld_base[okind] * oscale)
        t_m, n_model, best_p, hit = _intersect_prims(o_b, d_model, pk,
                                                     prim_ok=prim_ok)
        t_w = t_m * oscale
        closer = hit & (t_w < t_best) & ok

        # normal back to world (inverse rotation)
        s_f, c_f = sincos(oang)
        nx, nz = _rot_xz(n_model[..., 0], n_model[..., 2], s_f, c_f)
        n_world = jnp.stack([nx, n_model[..., 1], nz], axis=-1)

        base_col = pk["color"][best_p]
        # traffic-light lamp: green on phase 1
        is_lamp = pk["phase"][best_p]
        lamp_col = jnp.where(
            ophase == 1,
            jnp.array([0.1, 0.85, 0.15], dtype=rgb.dtype),
            jnp.array([0.9, 0.1, 0.1], dtype=rgb.dtype),
        )
        base_col = jnp.where(is_lamp[..., None], lamp_col, base_col)

        diffuse = jnp.maximum(
            0.0, -jnp.sum(n_world * state.light_dir[None, None, :], axis=-1)
        )
        shade = state.light_ambient + (1.0 - state.light_ambient) * diffuse
        col = base_col * shade[..., None]

        rgb = jnp.where(closer[..., None], col, rgb)
        t_best = jnp.where(closer, t_w, t_best)
        return rgb, t_best

    # Unrolled over the K visible objects (static count): straight-line
    # code fuses far better than an XLA while-loop on TPU.
    for k in range(Kvis):
        rgb, t_bg = body(rgb, t_bg, top_idx[k])
    return rgb, t_bg


def _overlay_curves(cfg, maps, rgb, rays, eye, t_bg):
    """draw_curve debug overlay: paint ground pixels near the lane bezier
    of their tile red/blue (reference: Simulator draw_curve flag draws the
    tile's bezier as a GL line strip; here the same curves are marked on
    the ground plane)."""
    from dtown.geometry import bezier_closest, bezier_point

    hit = jnp.isfinite(t_bg)
    px = eye[0] + jnp.where(hit, t_bg, 0.0) * rays[..., 0]
    pz = eye[2] + jnp.where(hit, t_bg, 0.0) * rays[..., 2]
    ts = maps.tile_size
    Hg, Wg = maps.grid_shape
    i = jnp.clip(jnp.floor(px / ts).astype(jnp.int32), 0, Wg - 1)
    j = jnp.clip(jnp.floor(pz / ts).astype(jnp.int32), 0, Hg - 1)
    curves = maps.curves[j, i]          # [H, W, C, 4, 3]
    cmask = maps.curve_mask[j, i]       # [H, W, C]
    p = jnp.stack([px, jnp.zeros_like(px), pz], axis=-1)
    pc = jnp.broadcast_to(p[..., None, :], curves.shape[:-2] + (3,))
    t = bezier_closest(curves, pc)
    near = bezier_point(curves, t)
    d2 = jnp.sum((near - pc) ** 2, axis=-1)
    d2 = jnp.where(cmask, d2, jnp.inf)
    on_curve = hit & (jnp.min(d2, axis=-1) < (0.01) ** 2)
    red = jnp.array([0.9, 0.1, 0.1], dtype=rgb.dtype)
    return jnp.where(on_curve[..., None], red, rgb)


def _overlay_bboxes(cfg, maps, state, rgb, rays, eye, t_bg):
    """draw_bbox debug overlay: object footprint rectangles traced on the
    ground (reference: Simulator draw_bbox flag)."""
    from dtown.env import active_objects

    hit = jnp.isfinite(t_bg)
    px = eye[0] + jnp.where(hit, t_bg, 0.0) * rays[..., 0]
    pz = eye[2] + jnp.where(hit, t_bg, 0.0) * rays[..., 2]
    from dtown.objects import dynamic_corners

    corners, _ = dynamic_corners(maps, state.dyn)   # [M, 4, 2]
    active = active_objects(maps, state)
    on_edge = jnp.zeros_like(hit)
    M = corners.shape[0]
    for m in range(M):
        for a in range(4):
            c0 = corners[m, a]
            c1 = corners[m, (a + 1) % 4]
            e = c1 - c0
            L2 = jnp.maximum(jnp.sum(e * e), 1e-12)
            tt = jnp.clip(
                ((px - c0[0]) * e[0] + (pz - c0[1]) * e[1]) / L2, 0.0, 1.0
            )
            dx = px - (c0[0] + tt * e[0])
            dz = pz - (c0[1] + tt * e[1])
            on_edge = on_edge | (
                active[m] & (dx * dx + dz * dz < 0.008 ** 2)
            )
    on_edge = on_edge & hit
    red = jnp.array([1.0, 0.0, 0.0], dtype=rgb.dtype)
    return jnp.where(on_edge[..., None], red, rgb)


def _intersect_triangles(o, d, tris, cols):
    """Batched Moeller-Trumbore: rays (o [3] or [H,W,3], d [H,W,3]) vs a
    fixed triangle buffer (tris [T,3,3], cols [T,3]).

    Returns (t [H,W], normal [H,W,3], color [H,W,3], hit [H,W]).
    Degenerate (zero-area) padding triangles never hit.
    """
    v0 = tris[:, 0]                                   # [T, 3]
    e1 = tris[:, 1] - v0
    e2 = tris[:, 2] - v0
    dd = d[..., None, :]                              # [H,W,1,3]
    pvec = jnp.cross(dd, e2[None, None])              # [H,W,T,3]
    det = jnp.sum(e1[None, None] * pvec, axis=-1)     # [H,W,T]
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
    tvec = o[..., None, :] - v0[None, None]
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = jnp.cross(tvec, e1[None, None])
    v = jnp.sum(dd * qvec, axis=-1) * inv_det
    t = jnp.sum(e2[None, None] * qvec, axis=-1) * inv_det
    hit_p = (
        (jnp.abs(det) > 1e-12) & (u >= 0.0) & (v >= 0.0)
        & (u + v <= 1.0) & (t > _EPS)
    )
    t_p = jnp.where(hit_p, t, jnp.inf)
    best = jnp.argmin(t_p, axis=-1)
    t_best = jnp.take_along_axis(t_p, best[..., None], axis=-1)[..., 0]
    hit = jnp.isfinite(t_best)
    n_raw = jnp.cross(e1, e2)
    n_raw = n_raw / jnp.maximum(
        jnp.linalg.norm(n_raw, axis=-1, keepdims=True), 1e-12
    )
    normal = n_raw[best]                              # [H,W,3]
    # two-sided shading: flip the normal against the ray
    flip = jnp.sum(normal * d, axis=-1, keepdims=True) > 0.0
    normal = jnp.where(flip, -normal, normal)
    return t_best, normal, cols[best], hit


def _render_tri_objects(cfg, maps, state, rays, eye, rgb, t_bg):
    """Triangle-fidelity pass: objects whose kind has a registered OBJ
    triangle buffer (meshes.TRI_MESHES) are ray-cast at mesh fidelity,
    replacing their primitive-soup stand-in. Static per-slot unroll (the
    kind table is a compile-time constant of the map)."""
    from dtown import types as T
    from dtown.env import active_objects
    from dtown.objects import render_angles

    kinds = np.asarray(maps.obj_kind)
    mask = np.asarray(maps.obj_mask)
    tri_slots = [
        int(s) for s in np.nonzero(mask)[0]
        if T.OBJ_KINDS[int(kinds[s])] in meshlib.TRI_MESHES
    ]
    if not tri_slots:
        return rgb, t_bg
    active = active_objects(maps, state)
    draw_angle = render_angles(maps, state.dyn)
    for s in tri_slots:
        tris_np, cols_np = meshlib.TRI_MESHES[T.OBJ_KINDS[int(kinds[s])]]
        tris = jnp.asarray(tris_np)
        cols = jnp.asarray(cols_np)
        opos = state.dyn.pos[s]
        oang = draw_angle[s]
        oscale = maps.obj_scale[s]
        s_r, c_r = sincos(-oang)
        off = (eye - opos) / jnp.maximum(oscale, 1e-6)
        ox, oz = _rot_xz(off[0], off[2], s_r, c_r)
        o_model = jnp.stack([ox, off[1], oz])
        dx, dz = _rot_xz(rays[..., 0], rays[..., 2], s_r, c_r)
        d_model = jnp.stack([dx, rays[..., 1], dz], axis=-1)
        o_b = jnp.broadcast_to(o_model, d_model.shape)
        t_m, n_model, col, hit = _intersect_triangles(
            o_b, d_model, tris, cols
        )
        t_w = t_m * oscale
        closer = hit & (t_w < t_bg) & active[s]
        s_f, c_f = sincos(oang)
        nx, nz = _rot_xz(n_model[..., 0], n_model[..., 2], s_f, c_f)
        n_world = jnp.stack([nx, n_model[..., 1], nz], axis=-1)
        diffuse = jnp.maximum(
            0.0, -jnp.sum(n_world * state.light_dir[None, None, :], axis=-1)
        )
        shade = state.light_ambient + (1.0 - state.light_ambient) * diffuse
        rgb = jnp.where(closer[..., None], col * shade[..., None], rgb)
        t_bg = jnp.where(closer, t_w, t_bg)
    return rgb, t_bg


def render_frame(cfg, maps, state):
    """Render one env's camera observation -> uint8 [H, W, C]."""
    rays, eye = camera_rays(cfg, state)
    rgb, t_bg = _ground_color(cfg, maps, state, rays, eye)
    if cfg.draw_curve:
        rgb = _overlay_curves(cfg, maps, rgb, rays, eye, t_bg)
    if cfg.draw_bbox:
        rgb = _overlay_bboxes(cfg, maps, state, rgb, rays, eye, t_bg)
    if cfg.render_objects:
        tri_slots = ()
        if cfg.mesh_fidelity == "triangles":
            from dtown import types as T

            kinds = np.asarray(maps.obj_kind)
            mask = np.asarray(maps.obj_mask)
            tri_slots = tuple(
                int(s) for s in np.nonzero(mask)[0]
                if T.OBJ_KINDS[int(kinds[s])] in meshlib.TRI_MESHES
            )
        rgb, t_bg = _render_objects(cfg, maps, state, rays, eye, rgb,
                                    t_bg, exclude_slots=tri_slots)
        if tri_slots:
            rgb, t_bg = _render_tri_objects(cfg, maps, state, rays, eye,
                                            rgb, t_bg)
    # cfg.distortion is baked into camera_rays' per-pixel ray table
    rgb = jnp.clip(rgb, 0.0, 1.0)
    if cfg.grayscale:
        luma = (
            0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
        )
        rgb = luma[..., None]
    return (rgb * 255.0 + 0.5).astype(jnp.uint8)


def render_top_down(cfg, maps, state):
    """Bird's-eye view of the whole map with an agent marker.

    reference: simulator.py::render(mode='top_down') — the reference
    re-renders the scene from a camera centered above the map looking
    straight down. Here the same perspective ray-caster is reused with a
    synthetic overhead camera state (pitch 90°, fov sized to the map
    extents), then the agent bbox (physics.get_agent_corners) is painted
    on top (the reference draws the agent mesh; the marker keeps the
    debug intent: pose + heading at a glance). Returns uint8 [H, W, 3].
    """
    import dataclasses

    from dtown import physics

    # the overhead camera is ~10 m up: disable the first-person
    # distance/nearest-K object culling, the per-prim LOD cull (its
    # angular threshold is calibrated for the first-person camera — at
    # 10 m it would blank every small object; caught by
    # test_topdown.py::test_top_down_objects_visible, r5) and fisheye
    cfg = dataclasses.replace(
        cfg, obj_cull_dist=1e9, obj_lod_px=0.0,
        max_visible_objects=int(maps.obj_mask.shape[-1]),
        distortion=False,
    )
    H, W = cfg.camera_height, cfg.camera_width
    Hg, Wg = maps.grid_shape
    ts = jnp.float32(maps.tile_size)
    cx = 0.5 * Wg * ts
    cz = 0.5 * Hg * ts
    cam_h = jnp.float32(10.0)
    # fov covers the map footprint (5% margin) at this height;
    # screen up = -z (yaw pi/2), screen right = +x: matches the yaml
    # tile layout (row 0 at the top).
    half_z = 0.525 * Hg * ts
    half_x = 0.525 * Wg * ts
    aspect = W / H
    tan_half = jnp.maximum(half_z, half_x / aspect) / cam_h
    fov_y = 2.0 * jnp.rad2deg(jnp.arctan(tan_half))

    td = state.replace(
        pos=jnp.stack([cx, jnp.float32(0.0), cz]),
        angle=jnp.float32(jnp.pi / 2),
        cam_angle=jnp.float32(90.0),
        cam_height=cam_h,
        cam_fwd_dist=jnp.float32(0.0),
        cam_fov_y=fov_y,
    )
    img = render_frame(cfg, maps, td)
    if cfg.grayscale:
        img = jnp.repeat(img, 3, axis=-1)

    # agent marker: filled rotated bbox (red) + white front edge band
    rays, eye = camera_rays(cfg, td)
    dy = rays[..., 1]
    t = -eye[1] / jnp.where(dy < -1e-6, dy, -1.0)
    px = eye[0] + t * rays[..., 0]
    pz = eye[2] + t * rays[..., 2]
    center = physics.actual_center(state.pos, state.angle)
    s, c = sincos(state.angle)
    dx = px - center[0]
    dz = pz - center[2]
    u = dx * c - dz * s            # forward coordinate (dir_vec)
    v = dx * s + dz * c            # right coordinate (right_vec)
    half_l = jnp.float32(C.ROBOT_LENGTH / 2)
    half_w = jnp.float32(C.ROBOT_WIDTH / 2)
    in_box = (jnp.abs(u) <= half_l) & (jnp.abs(v) <= half_w)
    front = in_box & (u >= 0.5 * half_l)
    red = jnp.array([220, 30, 30], dtype=jnp.uint8)
    white = jnp.array([255, 255, 255], dtype=jnp.uint8)
    img = jnp.where(in_box[..., None], red[None, None, :], img)
    img = jnp.where(front[..., None], white[None, None, :], img)
    return img

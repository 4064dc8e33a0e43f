"""Fused Pallas TPU render kernel: camera + ground + objects + sky.

One kernel invocation renders one env's full camera frame; the grid runs
over the env batch. This is the speed-of-light path replacing the XLA
composition in raster.py (which remains the reference implementation for
CPU/goldens — the two are compared in tests/test_pallas_render.py).

TPU-native design notes (see /opt/skills/guides/pallas_guide.md):
 * Pixels live in a flat [HW/128, 128] layout — no cross-lane reshapes,
   every op is straight VPU vector math on aligned vregs.
 * There are NO gathers. Per-pixel tile properties (kind, orientation,
   texture variant) are packed 8-bits-per-tile into int32 words at reset
   (env.py::pack_tile_words); the kernel fetches them with a short
   select-accumulate chain over the <=64 words — O(words) vector selects
   instead of a scatter/gather unit the TPU doesn't have.
 * Road shading is analytic (render/shading.py formulas inlined,
   kernel-safe subset: no arctan2) — procedural texture == arithmetic.
 * The K nearest objects are prepared outside (top-k + one-hot matmul
   prim fetch) and passed as a dense [K, PRIM_F] block; ray/primitive
   intersection is unrolled straight-line code.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dtown import constants as Cc
from dtown import types as T
from dtown.geometry import get_dir_vec, get_right_vec, sincos
from dtown.render import meshes as meshlib
from dtown.render.shading import (
    ASPHALT, DASH_DUTY, DASH_PERIOD, EDGE_INSET, EMPTY, FLOOR, GRASS,
    LINE_W, NOISE_AMP, NOISE_CELLS, WHITE, YELLOW,
)

LANE_N = 128  # pixel lane width

# camera/scene parameter vector layout (per env)
CAM_F = 32
(C_EYE, C_FWD, C_RIGHT, C_UP, C_TANX, C_TANY, C_SHADE, C_GND, C_HOR,
 C_TSINV, C_LIGHT, C_AMB) = (0, 3, 6, 9, 12, 13, 14, 15, 18, 21, 22, 25)

# per-object feature vector: pos(3) sin cos inv_scale scale active
OBJ_F = 8
# per-prim feature vector: type cx cy cz p0 p1 p2 r g b
PRIM_F = 10
P_MAX = meshlib.P_MAX


def _select_word(words_ref, widx, n_words):
    """Select-accumulate 'gather': word value at per-pixel index widx.

    words_ref: int32 [1, 1, WORDS_PAD] VMEM row; widx int32 [S, L].
    """
    word = jnp.zeros_like(widx)
    for w in range(n_words):
        word = jnp.where(widx == w, words_ref[0, 0, w], word)
    return word


# The shade_tile clip(base*bright + noise, 0, 1) is a PROVABLE no-op for
# every texture variant (bright in [0.94, 1.06], |noise| <= amp): checked
# here once at import so the kernels can drop the 6 vector ops — if a
# color constant ever pushes past the bound this assert fires instead of
# silently wrapping the u8 output.
_MAX_AMP = max(0.03, NOISE_AMP, 0.015)
assert max(max(c) for c in (YELLOW, WHITE, ASPHALT, GRASS, FLOOR, EMPTY)) \
    * 1.06 + _MAX_AMP <= 1.0, "shade_tile clip is no longer a no-op"
assert min(min(c) for c in (YELLOW, WHITE, ASPHALT, GRASS, FLOOR, EMPTY)) \
    * 0.94 - _MAX_AMP >= 0.0, "shade_tile clip is no longer a no-op"
# The packed-ground path (blob_raster) adds quantized integer noise to
# the three u8 bytes of one packed color word; per-byte arithmetic is
# carry/borrow-free only while every byte + noise stays in [0, 255].
# The float bounds above guarantee [0, 1] pre-quantization; a >=2-LSB
# margin absorbs the independent rounding of color and noise.
assert min(min(c) for c in (YELLOW, WHITE, ASPHALT, GRASS, FLOOR, EMPTY)) \
    * 0.94 - _MAX_AMP >= 2.0 / 255.0, "packed-ground byte borrow margin"


def _tile_masks(kind, angle_idx, u, v, present=None, inv_fw=None):
    """Marking/base-kind masks in base orientation, shared by the float
    (_shade_pixels), packed-u8 and luma-constant ground shaders.

    Returns (yellow, white, is_road, is_grass, is_floor, bu, bv).
    present: optional set of tile-kind ids present in the map — marking
    math for absent kinds is statically dropped (the map is a
    compile-time constant of the kernel).
    inv_fw: optional per-pixel reciprocal ground footprint (tile units)
    — yellow/white then come back as box-filter COVERAGES in [0, 1]
    (analytic marking AA, shading.line_coverage) instead of booleans.

    Difference from shading.shade_tile, covered by the blob-vs-XLA
    tolerance: the arc dash phase uses the linear |dz|-|dx| angle proxy
    (exact at the arc endpoints and midpoint, <=4%-of-period off
    between — the XLA path keeps arctan2).
    """
    if present is None:
        present = set(range(16))
    have = lambda k_: k_ in present
    aa = inv_fw is not None
    FALSE = jnp.zeros_like(u) if aa else (jnp.zeros_like(u) > 1.0)
    # rotate uv to base orientation: angle in {0,1,2,3}
    c = jnp.where(angle_idx == 0, 1.0, jnp.where(angle_idx == 2, -1.0, 0.0))
    s = jnp.where(angle_idx == 1, 1.0, jnp.where(angle_idx == 3, -1.0, 0.0))
    du = u - 0.5
    dv = v - 0.5
    bu = du * c - dv * s + 0.5
    bv = dv * c + du * s + 0.5

    half_w = LINE_W / 2
    if aa:
        # cap = 2*half_w*inv_fw of the default line width, shared by
        # every marking band (only intersection stop bars differ)
        _cap_l = LINE_W * inv_fw

    def line(d, hw=half_w):
        if aa:
            # shading.line_coverage with the upper 1-clamp DEFERRED to
            # the per-color composite (min(mask, 1) below) — one fewer
            # op on every band (AA op-diet r5)
            cap = _cap_l if hw == half_w else (2.0 * hw) * inv_fw
            return jnp.maximum(
                jnp.minimum((hw - jnp.abs(d)) * inv_fw + 0.5, cap), 0.0)
        return jnp.abs(d) < hw

    def edge_pair(x):
        # the two white edge lines sit symmetric about 0.5 (inset and
        # 1-inset), so ONE band in |x - 0.5| covers both: half the
        # coverage calls of the naive bor(line, line) (AA op-diet r5)
        return line(jnp.abs(x - 0.5) - (0.5 - EDGE_INSET))

    def gate(cov, b):
        # coverage restricted to a boolean region (dash phase, stub
        # half-planes): region bounds run along the band, stay hard
        return cov * b if aa else (cov & b)

    def bor(a, b):
        return a + b if aa else (a | b)

    def dashed(p):
        return (p / DASH_PERIOD) % 1.0 < DASH_DUTY

    if have(T.TILE_STRAIGHT):
        straight_center = gate(line(bu - 0.5), dashed(bv))
        straight_edge = edge_pair(bu)
    else:
        straight_center = straight_edge = FALSE

    def arc(cu, cv):
        dx = bu - cu
        dz = bv - cv
        r = jnp.sqrt(dx * dx + dz * dz)
        # dash position along the quarter arc: r * theta with theta
        # approximated monotonically by (1 + (|dz|-|dx|)/r) * (pi/4) —
        # exact at the endpoints and midpoint, divide-free (the earlier
        # |dz|/(|dx|+|dz|) proxy cost a vector divide per arc)
        center = gate(line(r - 0.5), dashed(
            (r + (jnp.abs(dz) - jnp.abs(dx))) * 0.78539816
        ))
        edge = edge_pair(r)
        return center, edge

    cl_center, cl_edge = arc(1.0, 0.0) if have(T.TILE_CURVE_LEFT) else (FALSE, FALSE)
    cr_center, cr_edge = arc(0.0, 0.0) if have(T.TILE_CURVE_RIGHT) else (FALSE, FALSE)

    k = kind
    K = T
    any_x = have(K.TILE_3WAY_LEFT) or have(K.TILE_3WAY_RIGHT) or have(K.TILE_4WAY)
    if any_x:
        zm_m = gate(line(bu - 0.5), bv < 0.5)
        zp_m = gate(line(bu - 0.5), bv >= 0.5)
        xm_m = gate(line(bv - 0.5), bu < 0.5)
        xp_m = gate(line(bv - 0.5), bu >= 0.5)
        zm_s = gate(line(bv - 0.08, 0.02), (bu > 0.5) & (bu < 0.8))
        zp_s = gate(line(bv - 0.92, 0.02), (bu > 0.2) & (bu < 0.5))
        xm_s = gate(line(bu - 0.08, 0.02), (bv > 0.2) & (bv < 0.5))
        xp_s = gate(line(bu - 0.92, 0.02), (bv > 0.5) & (bv < 0.8))
        dash_uv = dashed(bu + bv)
    k3l_center = gate(bor(bor(zm_m, zp_m), xp_m), dash_uv) \
        if have(K.TILE_3WAY_LEFT) else FALSE
    k3r_center = gate(bor(bor(zm_m, zp_m), xm_m), dash_uv) \
        if have(K.TILE_3WAY_RIGHT) else FALSE
    k4_center = gate(bor(bor(zm_m, zp_m), bor(xm_m, xp_m)), dash_uv) \
        if have(K.TILE_4WAY) else FALSE
    k3l_stop = bor(bor(zm_s, zp_s), xp_s) \
        if have(K.TILE_3WAY_LEFT) else FALSE
    k3r_stop = bor(bor(zm_s, zp_s), xm_s) \
        if have(K.TILE_3WAY_RIGHT) else FALSE
    k4_stop = bor(bor(zm_s, zp_s), bor(xm_s, xp_s)) \
        if have(K.TILE_4WAY) else FALSE

    is_road = (k >= K.TILE_STRAIGHT) & (k <= K.TILE_ASPHALT)

    def orsum(terms):
        out = None
        for cond, mask in terms:
            if not have(cond):
                continue
            if aa:
                t_ = jnp.where(k == cond, mask, 0.0)
                out = t_ if out is None else (out + t_)
            else:
                t_ = (k == cond) & mask
                out = t_ if out is None else (out | t_)
        return out if out is not None else FALSE

    yellow = orsum([
        (K.TILE_STRAIGHT, straight_center), (K.TILE_CURVE_LEFT, cl_center),
        (K.TILE_CURVE_RIGHT, cr_center), (K.TILE_3WAY_LEFT, k3l_center),
        (K.TILE_3WAY_RIGHT, k3r_center), (K.TILE_4WAY, k4_center),
    ])
    white = orsum([
        (K.TILE_STRAIGHT, straight_edge), (K.TILE_CURVE_LEFT, cl_edge),
        (K.TILE_CURVE_RIGHT, cr_edge), (K.TILE_3WAY_LEFT, k3l_stop),
        (K.TILE_3WAY_RIGHT, k3r_stop), (K.TILE_4WAY, k4_stop),
    ])
    if aa:
        # white composites over yellow; sums of disjoint bands can
        # touch only in the far field where the tent ramps widen.
        # yellow/white overlap exists only on intersection tiles (stop
        # bars cross center stubs); maps without them skip the
        # compositing product
        white = jnp.minimum(white, 1.0)
        yellow = jnp.minimum(yellow, 1.0)
        if any_x:
            yellow = yellow * (1.0 - white)

    is_grass = k == K.TILE_GRASS
    is_floor = k == K.TILE_FLOOR
    return yellow, white, is_road, is_grass, is_floor, bu, bv


def _noise_h16f(bu, bv, kind, variant):
    """Hash-noise low 16 bits as f32 in [0, 65536): the shared front of
    shading._hash_noise (n = h16f/32768 - 1). bu/bv are in [0, 1] by
    construction (exact +-1/0 rotation of centered [-.5, .5) offsets),
    so only the upper lattice clamp can ever bind."""
    f32 = jnp.float32
    tx = jnp.minimum((bu * NOISE_CELLS).astype(jnp.int32), NOISE_CELLS - 1)
    ty = jnp.minimum((bv * NOISE_CELLS).astype(jnp.int32), NOISE_CELLS - 1)
    # multiply-free Jenkins-style mix, identical to shading._hash_noise
    # (int32 multiplies are emulated multi-op on the VPU: the earlier
    # 5-multiply hash cost the ground pass 11%, measured r4)
    # seed = variant + 7*kind, with the small-constant multiply written
    # as shift-sub (int32 multiplies are the expensive op being removed)
    h = tx | (ty << 7) | ((variant + ((kind << 3) - kind)) << 14)
    h = h + (h << 10)
    h = h ^ (h >> 6)
    h = h + (h << 3)
    h = h ^ (h >> 11)
    h = h + (h << 15)
    h = h ^ (h >> 7)
    return (h & 0xFFFF).astype(f32)


def _shade_pixels(kind, angle_idx, variant, u, v, present=None,
                  inv_fw=None):
    """Kernel-safe port of shading.shade_tile (no arctan2, no tables).

    present: optional set of tile-kind ids present in the map — marking
    math for absent kinds is statically dropped (the map is a compile-time
    constant of the kernel).
    variant may be a python int (texture variant fixed at compile time —
    the no-domain-rand fast path always uses variant 0): the per-pixel
    variant extraction and brightness scale then fold into constants.

    Differences from shade_tile, covered by the blob-vs-XLA tolerance:
    the arc dash phase uses the linear |dz|-|dx| angle proxy (see
    _tile_masks), and the output clip is dropped (no-op by the
    import-time bound assert above).
    """
    f32 = jnp.float32
    yellow, white, is_road, is_grass, is_floor, bu, bv = _tile_masks(
        kind, angle_idx, u, v, present, inv_fw=inv_fw)

    def chan(ci):
        base = jnp.where(
            is_road, ASPHALT[ci],
            jnp.where(is_grass, GRASS[ci],
                      jnp.where(is_floor, FLOOR[ci], EMPTY[ci])),
        )
        if inv_fw is not None:
            # AA: markings only exist on asphalt road kinds, so a
            # delta-from-asphalt blend is exact (yellow already
            # composited under white by _tile_masks)
            return (base + yellow * (YELLOW[ci] - ASPHALT[ci])
                    + white * (WHITE[ci] - ASPHALT[ci]))
        out = jnp.where(yellow, YELLOW[ci], base)
        return jnp.where(white, WHITE[ci], out)

    r_, g_, b_ = chan(0), chan(1), chan(2)

    # integer-hash noise (same as shading._hash_noise)
    n = _noise_h16f(bu, bv, kind, variant) / 32768.0 - 1.0
    amp = jnp.where(is_grass, 0.03, jnp.where(is_road, NOISE_AMP, 0.015))
    if isinstance(variant, int):
        bright = 0.94 + 0.04 * variant
    else:
        bright = 0.94 + 0.04 * variant.astype(f32)
    noise = amp * n
    # no clip: a provable no-op (import-time bound assert above)
    r_ = r_ * bright + noise
    g_ = g_ * bright + noise
    b_ = b_ * bright + noise
    return r_, g_, b_


def _ndc_planes(H, W, sublanes, fisheye):
    """Per-pixel NDC ray factor planes [S, 128] as numpy compile-time
    constants — the Newton-inverted fisheye ray table when fisheye
    (distortion.undistorted_ndc: exact ray-level distortion, no
    post-render remap), else None (kernels keep the iota ramps)."""
    if not fisheye:
        return None
    from dtown.render.distortion import undistorted_ndc

    xb, yb = undistorted_ndc(W, H)
    return (xb.reshape(sublanes, LANE_N), yb.reshape(sublanes, LANE_N))


def _make_kernel(H, W, Hg, Wg, n_words, Kvis, sublanes, present=None,
                 fisheye=False, aa=True):
    """Build the kernel fn for static image/map dims."""
    ndc = _ndc_planes(H, W, sublanes, fisheye)

    def kernel(cam_ref, words_ref, obj_ref, prim_ref, out_ref):
        f32 = jnp.float32
        S = sublanes
        # flat pixel index p = s * 128 + l;  y = p // W, x = p % W
        p = (
            jax.lax.broadcasted_iota(jnp.int32, (S, LANE_N), 0) * LANE_N
            + jax.lax.broadcasted_iota(jnp.int32, (S, LANE_N), 1)
        )
        y = p // W
        x = p - y * W

        cam = cam_ref
        eye0 = cam[0, 0, C_EYE]
        eye1 = cam[0, 0, C_EYE + 1]
        eye2 = cam[0, 0, C_EYE + 2]
        tanx = cam[0, 0, C_TANX]
        tany = cam[0, 0, C_TANY]

        # ndc in [-1, 1]; y=0 is the top row (+1). Under fisheye the
        # ramps are replaced by the baked distortion ray table.
        if ndc is None:
            xn = ((x.astype(f32) + 0.5) / W - 0.5) * 2.0 * tanx
            yn = (0.5 - (y.astype(f32) + 0.5) / H) * 2.0 * tany
        else:
            xn = jnp.asarray(ndc[0]) * tanx
            yn = jnp.asarray(ndc[1]) * tany

        dx = cam[0, 0, C_FWD] + xn * cam[0, 0, C_RIGHT] + yn * cam[0, 0, C_UP]
        dy = cam[0, 0, C_FWD + 1] + xn * cam[0, 0, C_RIGHT + 1] + yn * cam[0, 0, C_UP + 1]
        dz = cam[0, 0, C_FWD + 2] + xn * cam[0, 0, C_RIGHT + 2] + yn * cam[0, 0, C_UP + 2]
        inv_n = jax.lax.rsqrt(dx * dx + dy * dy + dz * dz)
        dx = dx * inv_n
        dy = dy * inv_n
        dz = dz * inv_n

        hits_ground = dy < -1e-6
        t_g = jnp.where(hits_ground, -eye1 / jnp.where(hits_ground, dy, -1.0),
                        jnp.float32(1e30))
        px = eye0 + t_g * dx
        pz = eye2 + t_g * dz

        ts_inv = cam[0, 0, C_TSINV]
        fx = px * ts_inv
        fz = pz * ts_inv
        ti = jnp.floor(fx)
        tj = jnp.floor(fz)
        in_grid = (
            (ti >= 0) & (ti < Wg) & (tj >= 0) & (tj < Hg) & hits_ground
        )
        ii = jnp.clip(ti.astype(jnp.int32), 0, Wg - 1)
        jj = jnp.clip(tj.astype(jnp.int32), 0, Hg - 1)
        tid = jj * Wg + ii

        # packed tile byte: kind(4) | angle(2) | variant(2)
        word = _select_word(words_ref, tid >> 2, n_words)
        shift = (tid & 3) * 8
        byte = (word >> shift) & 0xFF
        kind = byte & 0xF
        angle_idx = (byte >> 4) & 0x3
        variant = (byte >> 6) & 0x3

        u = fx - ti
        v = fz - tj
        if aa:
            # marking AA: reciprocal ground footprint (tile units);
            # 1/t = -dy/eye1 on ground rays, so no vector divide
            k_fw = H / (2.0 * cam[0, 0, C_TANY]) / ts_inv / eye1
            # along-track footprint (see raster.py): dy^2
            inv_fw = dy * dy * k_fw
        else:
            inv_fw = None
        r_, g_, b_ = _shade_pixels(kind, angle_idx, variant, u, v,
                                   present=present, inv_fw=inv_fw)

        # out-of-grid ground -> env ground color; shade by light
        shade = cam[0, 0, C_SHADE]
        r_ = jnp.where(in_grid, r_, cam[0, 0, C_GND]) * shade
        g_ = jnp.where(in_grid, g_, cam[0, 0, C_GND + 1]) * shade
        b_ = jnp.where(in_grid, b_, cam[0, 0, C_GND + 2]) * shade

        # sky
        sky_f = 1.0 - 0.35 * jnp.maximum(0.0, dy)
        r_ = jnp.where(hits_ground, r_, cam[0, 0, C_HOR] * sky_f)
        g_ = jnp.where(hits_ground, g_, cam[0, 0, C_HOR + 1] * sky_f)
        b_ = jnp.where(hits_ground, b_, cam[0, 0, C_HOR + 2] * sky_f)

        # ---- objects: unrolled K nearest, P prims each ---------------
        lx = cam[0, 0, C_LIGHT]
        ly = cam[0, 0, C_LIGHT + 1]
        lz = cam[0, 0, C_LIGHT + 2]
        amb = cam[0, 0, C_AMB]
        t_best = jnp.where(hits_ground, t_g, jnp.float32(1e30))

        for k in range(Kvis):
            ox = obj_ref[0, 0, k * OBJ_F + 0]
            oy = obj_ref[0, 0, k * OBJ_F + 1]
            oz = obj_ref[0, 0, k * OBJ_F + 2]
            s_r = obj_ref[0, 0, k * OBJ_F + 3]
            c_r = obj_ref[0, 0, k * OBJ_F + 4]
            inv_s = obj_ref[0, 0, k * OBJ_F + 5]
            scale = obj_ref[0, 0, k * OBJ_F + 6]
            o_act = obj_ref[0, 0, k * OBJ_F + 7]

            # ray into model space: rotate by -y_rot (s_r, c_r are
            # sincos(-rot)), scale by 1/s
            ex = (eye0 - ox) * inv_s
            ey = (eye1 - oy) * inv_s
            ez = (eye2 - oz) * inv_s
            emx = ex * c_r + ez * s_r
            emz = ez * c_r - ex * s_r
            dmx = dx * c_r + dz * s_r
            dmz = dz * c_r - dx * s_r

            for pi in range(P_MAX):
                base = (k * P_MAX + pi) * PRIM_F
                ptype = prim_ref[0, 0, base + 0]
                cx = prim_ref[0, 0, base + 1]
                cy = prim_ref[0, 0, base + 2]
                cz = prim_ref[0, 0, base + 3]
                p0 = prim_ref[0, 0, base + 4]
                p1 = prim_ref[0, 0, base + 5]
                p2 = prim_ref[0, 0, base + 6]
                pr = prim_ref[0, 0, base + 7]
                pg = prim_ref[0, 0, base + 8]
                pb = prim_ref[0, 0, base + 9]

                ocx = emx - cx
                ocy = ey - cy
                ocz = emz - cz

                # sphere (ptype < 0.5): |oc + t d|^2 = p0^2
                bq = ocx * dmx + ocy * dy + ocz * dmz
                cq = ocx * ocx + ocy * ocy + ocz * ocz - p0 * p0
                disc = bq * bq - cq
                t_sph = -bq - jnp.sqrt(jnp.maximum(disc, 0.0))
                sph_hit = (disc > 0.0) & (t_sph > 1e-4)

                # box slab test (half extents p0, p1, p2)
                def slab(oc, dm, he):
                    inv = 1.0 / jnp.where(jnp.abs(dm) < 1e-9,
                                          jnp.where(dm >= 0, 1e-9, -1e-9),
                                          dm)
                    t1 = (-he - oc) * inv
                    t2 = (he - oc) * inv
                    return jnp.minimum(t1, t2), jnp.maximum(t1, t2)

                n1, x1 = slab(ocx, dmx, p0)
                n2, x2 = slab(ocy, dy, p1)
                n3, x3 = slab(ocz, dmz, p2)
                tmin = jnp.maximum(jnp.maximum(n1, n2), n3)
                tmax = jnp.minimum(jnp.minimum(x1, x2), x3)
                t_box = jnp.where(tmin > 1e-4, tmin, tmax)
                box_hit = (tmax >= jnp.maximum(tmin, 1e-4)) & (t_box > 1e-4)

                is_box = ptype > 0.5
                t_m = jnp.where(is_box, t_box, t_sph)
                # NOTE: select on i1 vectors doesn't legalize in Mosaic;
                # use boolean algebra instead of jnp.where
                hit = (is_box & box_hit) | (~is_box & sph_hit)
                t_w = t_m * scale
                closer = hit & (t_w < t_best) & (o_act > 0.5)

                # normal (model space)
                hx = emx + t_m * dmx - cx
                hy = ey + t_m * dy - cy
                hz = emz + t_m * dmz - cz
                # sphere: normalized rel; box: dominant-axis sign
                rinv = jax.lax.rsqrt(
                    jnp.maximum(hx * hx + hy * hy + hz * hz, 1e-12)
                )
                sx, sy, sz = hx * rinv, hy * rinv, hz * rinv
                ax_ = jnp.abs(hx) / jnp.maximum(p0, 1e-9)
                ay_ = jnp.abs(hy) / jnp.maximum(p1, 1e-9)
                az_ = jnp.abs(hz) / jnp.maximum(p2, 1e-9)
                xb = (ax_ >= ay_) & (ax_ >= az_)
                yb = (~xb) & (ay_ >= az_)
                sgn = lambda q: jnp.where(q >= 0.0, 1.0, -1.0)
                bx = jnp.where(xb, sgn(hx), 0.0)
                by = jnp.where(yb, sgn(hy), 0.0)
                bz = jnp.where(xb | yb, 0.0, sgn(hz))
                nmx = jnp.where(is_box, bx, sx)
                nmy = jnp.where(is_box, by, sy)
                nmz = jnp.where(is_box, bz, sz)
                # back to world: rotate by +rot (inverse of (s_r, c_r))
                nwx = nmx * c_r - nmz * s_r
                nwz = nmz * c_r + nmx * s_r

                diff = jnp.maximum(0.0, -(nwx * lx + nmy * ly + nwz * lz))
                sh = amb + (1.0 - amb) * diff
                r_ = jnp.where(closer, pr * sh, r_)
                g_ = jnp.where(closer, pg * sh, g_)
                b_ = jnp.where(closer, pb * sh, b_)
                t_best = jnp.where(closer, t_w, t_best)

        # Mosaic has no direct f32->u8 cast; go through int32
        def to_u8(x):
            return (jnp.clip(x, 0.0, 1.0) * 255.0 + 0.5).astype(
                jnp.int32
            ).astype(jnp.uint8)

        out_ref[0, 0] = to_u8(r_)
        out_ref[0, 1] = to_u8(g_)
        out_ref[0, 2] = to_u8(b_)

    return kernel


def pack_tile_words(maps, tex_variant):
    """Pack per-tile (kind, angle, variant) into int32 words, 4 tiles per
    word, 8 bits per tile: kind | angle<<4 | variant<<6. [W_WORDS_PAD]"""
    kind = maps.tile_kind.reshape(-1).astype(jnp.int32)
    angle = maps.tile_angle.reshape(-1).astype(jnp.int32)
    var = tex_variant.reshape(-1).astype(jnp.int32)
    byte = (kind & 0xF) | ((angle & 0x3) << 4) | ((var & 0x3) << 6)
    n = byte.shape[0]
    n_words = -(-n // 4)
    pad = n_words * 4 - n
    byte = jnp.pad(byte, (0, pad))
    b4 = byte.reshape(n_words, 4)
    words = (
        b4[:, 0] | (b4[:, 1] << 8) | (b4[:, 2] << 16) | (b4[:, 3] << 24)
    )
    # pad lane dim to 128 for a clean VMEM row
    wpad = -(-n_words // LANE_N) * LANE_N - n_words
    return jnp.pad(words, (0, wpad))


def _prim_matrix():
    """[n_kinds, P_MAX * PRIM_F] flat prim features per object kind."""
    t = meshlib.prim_tables()
    Kn = t["type"].shape[0]
    out = np.zeros((Kn, P_MAX * PRIM_F), dtype=np.float32)
    for k in range(Kn):
        for p in range(P_MAX):
            base = p * PRIM_F
            if not t["mask"][k, p]:
                out[k, base + 4:base + 7] = 0.0  # zero extents: no hit
                continue
            out[k, base + 0] = float(t["type"][k, p])
            out[k, base + 1:base + 4] = t["center"][k, p]
            out[k, base + 4:base + 7] = t["param"][k, p]
            out[k, base + 7:base + 10] = t["color"][k, p]
    return out


def prepare_object_blocks(cfg, maps, state, eye):
    """Per-env dense object/prim feature rows for the kernel.

    Returns (obj [K*OBJ_F], prim [K*P_MAX*PRIM_F]). Uses one-hot matmuls
    (not gathers) to fetch per-object prim features by kind.
    """
    from dtown.env import active_objects

    Kvis = min(cfg.max_visible_objects, maps.max_objects)
    active = active_objects(maps, state)
    dist = jnp.linalg.norm(state.dyn.pos - eye[None, :], axis=-1)
    # distance culling: objects beyond obj_cull_dist are sub-pixel at the
    # RL resolutions; keeps the act flags meaningful for the kernel.
    # The size-aware LOD bound (render/lod.py) tightens it per object —
    # this row-fed path culls at OBJECT granularity only (the fused and
    # XLA renderers additionally gate per prim; the residue is detail
    # prims between their own and the object's cull distance, well
    # inside the renderer-equivalence tolerances).
    from dtown.render import lod

    kmax = jnp.asarray(lod.kind_culld_max(cfg))
    slot_cull = jnp.minimum(jnp.float32(cfg.obj_cull_dist),
                            kmax[maps.obj_kind] * maps.obj_scale)
    active = active & (dist < slot_cull)
    score = jnp.where(active, -dist, -jnp.inf)
    _, top = jax.lax.top_k(score, Kvis)

    from dtown.objects import render_angles

    oh = (top[:, None] == jnp.arange(maps.max_objects)[None, :]).astype(
        jnp.float32
    )  # [K, M]
    # HIGHEST: one-hot gathers must return stored f32 bits exactly; the
    # default-precision MXU rounds the gathered values to bf16
    hi = jax.lax.Precision.HIGHEST
    pos = jnp.matmul(oh, state.dyn.pos, precision=hi)
    ang = jnp.matmul(oh, render_angles(maps, state.dyn), precision=hi)
    scale = jnp.matmul(oh, maps.obj_scale, precision=hi)
    kind = jnp.matmul(oh, maps.obj_kind.astype(jnp.float32), precision=hi)
    act = jnp.matmul(oh, active.astype(jnp.float32), precision=hi)
    phase = jnp.matmul(oh, state.dyn.phase.astype(jnp.float32), precision=hi)

    s_r, c_r = sincos(-ang)
    inv_s = 1.0 / jnp.maximum(scale, 1e-6)
    obj = jnp.stack(
        [pos[:, 0], pos[:, 1], pos[:, 2], s_r, c_r, inv_s, scale, act],
        axis=-1,
    ).reshape(-1)

    prim_mat = jnp.asarray(_prim_matrix())  # [n_kinds, P*F]
    koh = (
        kind.astype(jnp.int32)[:, None]
        == jnp.arange(prim_mat.shape[0])[None, :]
    ).astype(jnp.float32)
    prim = jnp.matmul(koh, prim_mat, precision=hi)  # [K, P*F]
    # traffic-light lamp color by phase (at the kind's phase-flagged slot)
    is_lamp_kind = kind.astype(jnp.int32) == T.OBJ_KIND_IDS["trafficlight"]
    tl_phase_flags = meshlib.prim_tables()["phase"][
        T.OBJ_KIND_IDS["trafficlight"]]
    lamp_base = int(np.argmax(tl_phase_flags)) * PRIM_F
    green = phase >= 0.5
    lamp_rgb = jnp.where(
        green[:, None],
        jnp.array([0.1, 0.85, 0.15]),
        jnp.array([0.9, 0.1, 0.1]),
    )
    prim = prim.at[:, lamp_base + 7:lamp_base + 10].set(
        jnp.where(is_lamp_kind[:, None], lamp_rgb,
                  prim[:, lamp_base + 7:lamp_base + 10])
    )
    return obj, prim.reshape(-1)


def prepare_camera_row(cfg, state):
    """[CAM_F] f32 camera/scene parameters for one env."""
    fwd_flat = get_dir_vec(state.angle)
    right = get_right_vec(state.angle)
    up_y = jnp.array([0.0, 1.0, 0.0], dtype=jnp.float32)
    pitch = jnp.deg2rad(state.cam_angle)
    sp, cp = sincos(pitch)
    forward = cp * fwd_flat - sp * up_y
    up = cp * up_y + sp * fwd_flat
    eye = state.pos + state.cam_height * up_y + state.cam_fwd_dist * fwd_flat
    tan_half = jnp.tan(0.5 * jnp.deg2rad(state.cam_fov_y))
    aspect = cfg.camera_width / cfg.camera_height
    diffuse = jnp.maximum(0.0, -state.light_dir[1])
    shade = state.light_ambient + (1.0 - state.light_ambient) * diffuse

    row = jnp.zeros((CAM_F,), jnp.float32)
    row = row.at[C_EYE:C_EYE + 3].set(eye)
    row = row.at[C_FWD:C_FWD + 3].set(forward)
    row = row.at[C_RIGHT:C_RIGHT + 3].set(right)
    row = row.at[C_UP:C_UP + 3].set(up)
    row = row.at[C_TANX].set(tan_half * aspect)
    row = row.at[C_TANY].set(tan_half)
    row = row.at[C_SHADE].set(shade)
    row = row.at[C_GND:C_GND + 3].set(state.ground_color)
    row = row.at[C_HOR:C_HOR + 3].set(state.horizon_color)
    # C_TSINV is filled by the caller (needs maps.tile_size)
    row = row.at[C_LIGHT:C_LIGHT + 3].set(state.light_dir)
    row = row.at[C_AMB].set(state.light_ambient)
    return row, eye


def render_frames_pallas(cfg, maps, states, interpret=None):
    """Batched render via the fused kernel. states: vmapped EnvState [B].

    Returns uint8 [B, 3, H*W/128, 128] channel-plane frames; use
    planes_to_nhwc() for the gym-facing [B, H, W, C] layout.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    H, W = cfg.camera_height, cfg.camera_width
    HW = H * W
    assert HW % LANE_N == 0, (H, W)
    S = HW // LANE_N
    Hg, Wg = maps.grid_shape
    n_tiles = Hg * Wg
    n_words = -(-n_tiles // 4)
    words_pad = -(-n_words // LANE_N) * LANE_N
    Kvis = min(cfg.max_visible_objects, maps.max_objects)
    B = states.pos.shape[0]

    scene = _build_static_scene(cfg, maps) if cfg.render_objects else None

    def pad_row(a):
        pad = -(-a.shape[-1] // LANE_N) * LANE_N - a.shape[-1]
        return jnp.pad(a, ((0, 0), (0, pad)))

    if scene is not None:
        def per_env_static(state):
            cam, eye = prepare_camera_row(cfg, state)
            cam = cam.at[C_TSINV].set(1.0 / maps.tile_size)
            words = pack_tile_words(maps, state.tex_variant)
            if scene:
                flags = _static_flags(cfg, maps, state, eye, scene)
            else:
                flags = jnp.zeros((2,), jnp.float32)
            return cam, words, flags

        cam, words, flags = jax.vmap(per_env_static)(states)
        cam = pad_row(cam)[:, None, :]
        words = words[:, None, :]
        flags = pad_row(flags)[:, None, :]
    else:
        def per_env(state):
            cam, eye = prepare_camera_row(cfg, state)
            cam = cam.at[C_TSINV].set(1.0 / maps.tile_size)
            words = pack_tile_words(maps, state.tex_variant)
            obj, prim = prepare_object_blocks(cfg, maps, state, eye)
            return cam, words, obj, prim

        cam, words, obj, prim = jax.vmap(per_env)(states)
        cam = pad_row(cam)[:, None, :]
        words = words[:, None, :]
        obj = pad_row(obj)[:, None, :]
        prim = pad_row(prim)[:, None, :]

    from dtown.utils.staticcheck import concrete_any as _ca

    try:
        present = frozenset(
            int(x) for x in np.unique(np.asarray(maps.tile_kind))
        )
    except Exception:  # traced multimap gather: keep all kinds
        present = None
    grid = (B,)

    def row_spec(width):
        # [B, 1, width] rows; block (1, 1, width) satisfies the TPU rule
        # that the last two block dims divide (8, 128) or equal the array
        return pl.BlockSpec((1, 1, width), lambda b: (b, 0, 0),
                            memory_space=pltpu.VMEM)

    if scene is not None:
        kernel = _make_kernel_static(H, W, Hg, Wg, n_words, S, present,
                                     scene, fisheye=cfg.distortion,
                                     aa=bool(getattr(cfg, "marking_aa",
                                                     True)))
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((B, 3, S, LANE_N), jnp.uint8),
            grid=grid,
            in_specs=[
                row_spec(cam.shape[2]),
                row_spec(words.shape[2]),
                row_spec(flags.shape[2]),
            ],
            out_specs=pl.BlockSpec((1, 3, S, LANE_N),
                                   lambda b: (b, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(cam, words, flags)
    else:
        kernel = _make_kernel(H, W, Hg, Wg, n_words, Kvis, S,
                              aa=bool(getattr(cfg, "marking_aa", True)),
                              present=present, fisheye=cfg.distortion)
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((B, 3, S, LANE_N), jnp.uint8),
            grid=grid,
            in_specs=[
                row_spec(cam.shape[2]),
                row_spec(words.shape[2]),
                row_spec(obj.shape[2]),
                row_spec(prim.shape[2]),
            ],
            out_specs=pl.BlockSpec((1, 3, S, LANE_N),
                                   lambda b: (b, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(cam, words, obj, prim)
    # cfg.distortion is baked into the kernels' ray tables above
    return out


def planes_to_nhwc(cfg, planes):
    """uint8 [B, C, S, 128] -> [B, H, W, C] (C=3 RGB or 1 luma)."""
    H, W = cfg.camera_height, cfg.camera_width
    B, C = planes.shape[:2]
    flat = planes.reshape(B, C, H * W)
    return jnp.moveaxis(flat, 1, -1).reshape(B, H, W, C)

# ---------------------------------------------------------------------
# Static-scene specialization: for concrete single maps with immobile
# objects (static poses; traffic lights allowed — only their lamp color
# is dynamic), ALL object geometry, transforms and colors are baked into
# the kernel as python constants. Per step only two dynamic scalars per
# object remain: the distance-cull flag and the lamp phase. Each prim is
# statically sphere OR box, halving the intersection math.
# ---------------------------------------------------------------------

def _build_static_scene(cfg, maps):
    """None if ineligible, else a list of per-object dicts of python
    floats (pos, rot sincos, scale, prims with type/center/param/color,
    lamp flag)."""
    try:
        obj_mask = np.asarray(maps.obj_mask)
    except Exception:
        return None  # traced (multimap) — dynamic path
    if cfg.domain_rand:
        return None
    kinds = np.asarray(maps.obj_kind)
    dyn = np.asarray(maps.obj_is_dynamic)
    tl_id = T.OBJ_KIND_IDS["trafficlight"]
    # moving NPCs -> ineligible (their pos changes per step)
    moving = obj_mask & dyn & (kinds != tl_id)
    if moving.any():
        return None
    M = int(obj_mask.sum())
    if M == 0 or M > 16:
        return None if M else []
    pos = np.asarray(maps.obj_pos)
    rot = np.asarray(maps.obj_y_rot)
    scale = np.asarray(maps.obj_scale)
    tables = meshlib.prim_tables()
    scene = []
    for m in np.nonzero(obj_mask)[0]:
        k = int(kinds[m])
        prims = []
        for p in range(meshlib.P_MAX):
            if not tables["mask"][k, p]:
                continue
            prims.append(dict(
                is_box=int(tables["type"][k, p]) == meshlib.BOX,
                center=tuple(float(x) for x in tables["center"][k, p]),
                param=tuple(float(x) for x in tables["param"][k, p]),
                color=tuple(float(x) for x in tables["color"][k, p]),
                lamp=bool(tables["phase"][k, p]),
            ))
        import math

        sc = float(scale[m])
        scene.append(dict(
            pos=tuple(float(x) for x in pos[m]),
            s_r=math.sin(-float(rot[m])),
            c_r=math.cos(-float(rot[m])),
            inv_s=1.0 / max(sc, 1e-6),
            scale=sc,
            prims=prims,
            slot=int(m),
        ))
    return scene


def _make_kernel_static(H, W, Hg, Wg, n_words, sublanes, present, scene,
                        aa=True,
                        fisheye=False):
    """Kernel with the object scene baked in (see _build_static_scene)."""
    ndc = _ndc_planes(H, W, sublanes, fisheye)

    def kernel(cam_ref, words_ref, flags_ref, out_ref):
        f32 = jnp.float32
        S = sublanes
        p = (
            jax.lax.broadcasted_iota(jnp.int32, (S, LANE_N), 0) * LANE_N
            + jax.lax.broadcasted_iota(jnp.int32, (S, LANE_N), 1)
        )
        y = p // W
        x = p - y * W

        cam = cam_ref
        eye0 = cam[0, 0, C_EYE]
        eye1 = cam[0, 0, C_EYE + 1]
        eye2 = cam[0, 0, C_EYE + 2]

        if ndc is None:
            xn = ((x.astype(f32) + 0.5) / W - 0.5) * 2.0 \
                * cam[0, 0, C_TANX]
            yn = (0.5 - (y.astype(f32) + 0.5) / H) * 2.0 \
                * cam[0, 0, C_TANY]
        else:
            # baked fisheye ray table (exact ray-level distortion)
            xn = jnp.asarray(ndc[0]) * cam[0, 0, C_TANX]
            yn = jnp.asarray(ndc[1]) * cam[0, 0, C_TANY]
        dx = cam[0, 0, C_FWD] + xn * cam[0, 0, C_RIGHT] + yn * cam[0, 0, C_UP]
        dy = cam[0, 0, C_FWD + 1] + xn * cam[0, 0, C_RIGHT + 1] \
            + yn * cam[0, 0, C_UP + 1]
        dz = cam[0, 0, C_FWD + 2] + xn * cam[0, 0, C_RIGHT + 2] \
            + yn * cam[0, 0, C_UP + 2]
        inv_n = jax.lax.rsqrt(dx * dx + dy * dy + dz * dz)
        dx, dy, dz = dx * inv_n, dy * inv_n, dz * inv_n

        hits_ground = dy < -1e-6
        t_g = jnp.where(hits_ground, -eye1 / jnp.where(hits_ground, dy, -1.0),
                        jnp.float32(1e30))
        px = eye0 + t_g * dx
        pz = eye2 + t_g * dz

        ts_inv = cam[0, 0, C_TSINV]
        fx = px * ts_inv
        fz = pz * ts_inv
        ti = jnp.floor(fx)
        tj = jnp.floor(fz)
        in_grid = (ti >= 0) & (ti < Wg) & (tj >= 0) & (tj < Hg) & hits_ground
        ii = jnp.clip(ti.astype(jnp.int32), 0, Wg - 1)
        jj = jnp.clip(tj.astype(jnp.int32), 0, Hg - 1)
        tid = jj * Wg + ii
        word = _select_word(words_ref, tid >> 2, n_words)
        byte = (word >> ((tid & 3) * 8)) & 0xFF
        kind = byte & 0xF
        angle_idx = (byte >> 4) & 0x3
        variant = (byte >> 6) & 0x3

        if aa:
            k_fw = H / (2.0 * cam[0, 0, C_TANY]) / ts_inv / eye1
            # along-track footprint (see raster.py): dy^2
            inv_fw = dy * dy * k_fw
        else:
            inv_fw = None
        r_, g_, b_ = _shade_pixels(kind, angle_idx, variant, fx - ti,
                                   fz - tj, present=present,
                                   inv_fw=inv_fw)
        shade = cam[0, 0, C_SHADE]
        r_ = jnp.where(in_grid, r_, cam[0, 0, C_GND]) * shade
        g_ = jnp.where(in_grid, g_, cam[0, 0, C_GND + 1]) * shade
        b_ = jnp.where(in_grid, b_, cam[0, 0, C_GND + 2]) * shade
        sky_f = 1.0 - 0.35 * jnp.maximum(0.0, dy)
        r_ = jnp.where(hits_ground, r_, cam[0, 0, C_HOR] * sky_f)
        g_ = jnp.where(hits_ground, g_, cam[0, 0, C_HOR + 1] * sky_f)
        b_ = jnp.where(hits_ground, b_, cam[0, 0, C_HOR + 2] * sky_f)

        lx = cam[0, 0, C_LIGHT]
        ly = cam[0, 0, C_LIGHT + 1]
        lz = cam[0, 0, C_LIGHT + 2]
        amb = cam[0, 0, C_AMB]
        t_best = jnp.where(hits_ground, t_g, jnp.float32(1e30))

        for i_obj, ob in enumerate(scene):
            o_act = flags_ref[0, 0, 2 * i_obj]
            phase = flags_ref[0, 0, 2 * i_obj + 1]
            ox, oy, oz = ob["pos"]
            s_r, c_r, inv_s, sc = ob["s_r"], ob["c_r"], ob["inv_s"], ob["scale"]
            ex = (eye0 - ox) * inv_s
            ey = (eye1 - oy) * inv_s
            ez = (eye2 - oz) * inv_s
            emx = ex * c_r + ez * s_r
            emz = ez * c_r - ex * s_r
            dmx = dx * c_r + dz * s_r
            dmz = dz * c_r - dx * s_r

            for pr_ in ob["prims"]:
                cx, cy, cz = pr_["center"]
                p0, p1, p2 = pr_["param"]
                ocx = emx - cx
                ocy = ey - cy
                ocz = emz - cz
                if pr_["is_box"]:
                    def slab(oc, dm, he):
                        inv = 1.0 / jnp.where(
                            jnp.abs(dm) < 1e-9,
                            jnp.where(dm >= 0, 1e-9, -1e-9), dm)
                        t1 = (-he - oc) * inv
                        t2 = (he - oc) * inv
                        return jnp.minimum(t1, t2), jnp.maximum(t1, t2)

                    n1, x1 = slab(ocx, dmx, p0)
                    n2, x2 = slab(ocy, dy, p1)
                    n3, x3 = slab(ocz, dmz, p2)
                    tmin = jnp.maximum(jnp.maximum(n1, n2), n3)
                    tmax = jnp.minimum(jnp.minimum(x1, x2), x3)
                    t_m = jnp.where(tmin > 1e-4, tmin, tmax)
                    hit = (tmax >= jnp.maximum(tmin, 1e-4)) & (t_m > 1e-4)
                else:
                    bq = ocx * dmx + ocy * dy + ocz * dmz
                    cq = ocx * ocx + ocy * ocy + ocz * ocz - p0 * p0
                    disc = bq * bq - cq
                    t_m = -bq - jnp.sqrt(jnp.maximum(disc, 0.0))
                    hit = (disc > 0.0) & (t_m > 1e-4)

                t_w = t_m * sc
                closer = hit & (t_w < t_best) & (o_act > 0.5)

                hx = emx + t_m * dmx - cx
                hy = ey + t_m * dy - cy
                hz = emz + t_m * dmz - cz
                if pr_["is_box"]:
                    ax_ = jnp.abs(hx) * (1.0 / max(p0, 1e-9))
                    ay_ = jnp.abs(hy) * (1.0 / max(p1, 1e-9))
                    az_ = jnp.abs(hz) * (1.0 / max(p2, 1e-9))
                    xb = (ax_ >= ay_) & (ax_ >= az_)
                    yb = (~xb) & (ay_ >= az_)
                    sgn = lambda q: jnp.where(q >= 0.0, 1.0, -1.0)
                    nmx = jnp.where(xb, sgn(hx), 0.0)
                    nmy = jnp.where(yb, sgn(hy), 0.0)
                    nmz = jnp.where(xb | yb, 0.0, sgn(hz))
                else:
                    rinv = jax.lax.rsqrt(
                        jnp.maximum(hx * hx + hy * hy + hz * hz, 1e-12))
                    nmx, nmy, nmz = hx * rinv, hy * rinv, hz * rinv
                nwx = nmx * c_r - nmz * s_r
                nwz = nmz * c_r + nmx * s_r
                diff = jnp.maximum(0.0, -(nwx * lx + nmy * ly + nwz * lz))
                sh = amb + (1.0 - amb) * diff
                if pr_["lamp"]:
                    # traffic-light lamp: red phase 0, green phase 1
                    cr_l = jnp.where(phase > 0.5, 0.1, 0.9)
                    cg_l = jnp.where(phase > 0.5, 0.85, 0.1)
                    cb_l = jnp.where(phase > 0.5, 0.15, 0.1)
                    r_ = jnp.where(closer, cr_l * sh, r_)
                    g_ = jnp.where(closer, cg_l * sh, g_)
                    b_ = jnp.where(closer, cb_l * sh, b_)
                else:
                    pcr, pcg, pcb = pr_["color"]
                    r_ = jnp.where(closer, pcr * sh, r_)
                    g_ = jnp.where(closer, pcg * sh, g_)
                    b_ = jnp.where(closer, pcb * sh, b_)
                t_best = jnp.where(closer, t_w, t_best)

        def to_u8(xv):
            return (jnp.clip(xv, 0.0, 1.0) * 255.0 + 0.5).astype(
                jnp.int32).astype(jnp.uint8)

        out_ref[0, 0] = to_u8(r_)
        out_ref[0, 1] = to_u8(g_)
        out_ref[0, 2] = to_u8(b_)

    return kernel


def _static_flags(cfg, maps, state, eye, scene):
    """[2M] per-env dynamic scalars: cull flag + lamp phase per object."""
    slots = jnp.asarray([ob["slot"] for ob in scene], jnp.int32)
    pos = maps.obj_pos[slots]
    dist = jnp.linalg.norm(pos - eye[None, :], axis=-1)
    # object-level size-aware cull (render/lod.py); see
    # prepare_object_blocks for the granularity note
    from dtown.render import lod

    # jnp (not numpy) indexing: maps arrays are traced under jit in the
    # step_batch pallas path
    kmax = jnp.asarray(lod.kind_culld_max(cfg))
    slot_cull = jnp.minimum(
        jnp.float32(cfg.obj_cull_dist),
        kmax[maps.obj_kind[slots]] * maps.obj_scale[slots])
    act = (dist < slot_cull).astype(jnp.float32)
    phase = state.dyn.phase[slots].astype(jnp.float32)
    return jnp.stack([act, phase], axis=-1).reshape(-1)

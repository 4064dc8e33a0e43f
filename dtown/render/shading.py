"""Analytic per-pixel tile shading — the TPU-native texture system.

The reference samples PNG textures (reference: textures/*.png via
graphics.py::Texture); texture lookups are random gathers, which TPUs
hate. Instead the road surface is shaded *procedurally*: lane markings
are analytic functions of the in-tile (u, v) coordinate (lines and arcs
matching the lane geometry in curves.py), and surface noise comes from an
integer hash of the texel coordinate. Everything is straight-line VPU
arithmetic + selects, so it fuses into the renderer and runs identically
inside Pallas kernels and plain XLA.

Variant-based domain randomization (reference: numbered texture variants)
is preserved: the per-tile variant id seeds the noise hash and a
brightness factor.
"""
from __future__ import annotations

import jax.numpy as jnp

from dtown import types as T

# Marking geometry (tile fractions) — must match curves.py lane layout
EDGE_INSET = 0.035
LINE_W = 0.025
DASH_PERIOD = 0.125
DASH_DUTY = 0.5

# Colors (f32, 0..1)
YELLOW = (0.82, 0.68, 0.10)
WHITE = (0.88, 0.88, 0.88)
ASPHALT = (0.155, 0.155, 0.16)
GRASS = (0.22, 0.46, 0.18)
FLOOR = (0.62, 0.60, 0.58)
EMPTY = (0.13, 0.28, 0.11)

NOISE_AMP = 0.012
NOISE_CELLS = 128  # hash lattice per tile edge (matches old atlas texels)


def _hash_noise(ix, iy, seed):
    """Deterministic per-texel noise in [-1, 1] from an integer hash.

    Multiply-free Jenkins-style mix (3 rounds of add-shift + xor-shift):
    int32 multiplies are emulated multi-op on the TPU VPU — swapping the
    earlier 5-multiply hash for this one measured the render kernel's
    ground pass 11% faster (r4) at equivalent noise statistics (lag-1
    autocorrelation < 0.02, seed decorrelation 0.67 ~ ideal 2/3).
    ix, iy must be < 128 (the NOISE_CELLS lattice); int32 wraparound and
    arithmetic >> are part of the definition (identical in jnp/Mosaic).
    """
    h = ix | (iy << 7) | (seed << 14)
    h = h + (h << 10)
    h = h ^ (h >> 6)
    h = h + (h << 3)
    h = h ^ (h >> 11)
    h = h + (h << 15)
    h = h ^ (h >> 7)
    return (h & 0xFFFF).astype(jnp.float32) / 32768.0 - 1.0


def _dashed(arc_pos):
    return (arc_pos / DASH_PERIOD) % 1.0 < DASH_DUTY


def _line(d, half_w=LINE_W / 2):
    return jnp.abs(d) < half_w


def line_coverage(d, inv_fw, half_w=LINE_W / 2, cap=None):
    """Analytic anti-aliasing of a marking band edge — the TPU-native
    counterpart of the reference's multisample FBO resolve (reference:
    graphics.py::create_frame_buffers(w, h, samples), SURVEY §2.6).

    EXACT box-filter coverage of the band |d| < half_w under a pixel
    footprint of width fw = 1/inv_fw (tile units):

        overlap(d) = clamp(min((half_w - |d|)/fw + 0.5,  # edge tent
                               2*half_w/fw),             # band < box
                           0, 1)

    (the min's second arm caps a sub-footprint band at its area
    fraction — the piecewise algebra of [min(hw-d, fw/2) +
    min(hw+d, fw/2)]/fw collapses to exactly min(tent, cap, 1)).
    Reduces to the hard compare as fw -> 0; converges to what an
    n-sample MSAA resolve measures as n grows. The caller derives fw
    from the ray distance (t * pixel_angle / tile_size), so near
    markings keep crisp ~1-px ramps while distant ones dissolve into
    the road instead of shimmering.
    """
    tent = (half_w - jnp.abs(d)) * inv_fw + 0.5
    if cap is None:
        cap = (2.0 * half_w) * inv_fw
    return jnp.clip(jnp.minimum(tent, cap), 0.0, 1.0)


def shade_tile(kind, angle_idx, variant, u, v, inv_fw=None):
    """RGB [.., 3] for in-tile coordinates.

    kind/angle_idx/variant: int32 arrays broadcastable with u, v in [0,1).
    u is the x fraction, v the z fraction, in WORLD orientation; markings
    are drawn in the tile's base orientation by rotating (u, v) back by
    -angle_idx * 90 deg about the tile center (same convention as
    curves.py::rotate_curves).

    inv_fw: optional per-pixel reciprocal footprint (tile units) for
    analytic marking anti-aliasing (line_coverage); None keeps the
    original hard-thresholded edges (texture-atlas previews, AA off).
    """
    # rotate uv back to base orientation
    ctab = jnp.array([1.0, 0.0, -1.0, 0.0], dtype=jnp.float32)
    stab = jnp.array([0.0, 1.0, 0.0, -1.0], dtype=jnp.float32)
    c = ctab[angle_idx]
    s = stab[angle_idx]
    du = u - 0.5
    dv = v - 0.5
    bu = du * c - dv * s + 0.5
    bv = dv * c + du * s + 0.5

    aa = inv_fw is not None

    def line(d, half_w=LINE_W / 2):
        return line_coverage(d, inv_fw, half_w) if aa else _line(d, half_w)

    def edge_pair(x):
        # both white edge lines sit symmetric about 0.5 (inset and
        # 1-inset): ONE band in |x - 0.5| covers both exactly
        return line(jnp.abs(x - 0.5) - (0.5 - EDGE_INSET))

    def gate(cov, b):
        # coverage restricted to a boolean region (dash phase, stub
        # half-planes) — region boundaries run ALONG the band, so they
        # stay hard without reintroducing edge staircase
        return cov * b if aa else (cov & b)

    def bor(a, b):
        # union of disjoint bands (clipped to 1 at the end for the far
        # -field case where widened tent ramps start to touch)
        return a + b if aa else (a | b)

    # --- marking masks in base orientation ---------------------------
    # straight (road along z): center dashed at u=0.5, edges at inset
    straight_center = gate(line(bu - 0.5), _dashed(bv))
    straight_edge = edge_pair(bu)

    # curve_left: rings centered at corner (1, 0); curve_right: (0, 0)
    def arc(cu, cv):
        r = jnp.hypot(bu - cu, bv - cv)
        theta = jnp.arctan2(bv - cv, bu - cu)
        center = gate(line(r - 0.5), _dashed(r * jnp.abs(theta)))
        edge = edge_pair(r)
        return center, edge

    cl_center, cl_edge = arc(1.0, 0.0)
    cr_center, cr_edge = arc(0.0, 0.0)

    # intersections: center dashed stubs toward connected edges + stop bars
    zm_m = gate(line(bu - 0.5), bv < 0.5)
    zp_m = gate(line(bu - 0.5), bv >= 0.5)
    xm_m = gate(line(bv - 0.5), bu < 0.5)
    xp_m = gate(line(bv - 0.5), bu >= 0.5)
    zm_s = gate(line(bv - 0.08, 0.02), (bu > 0.5) & (bu < 0.8))
    zp_s = gate(line(bv - 0.92, 0.02), (bu > 0.2) & (bu < 0.5))
    xm_s = gate(line(bu - 0.08, 0.02), (bv > 0.2) & (bv < 0.5))
    xp_s = gate(line(bu - 0.92, 0.02), (bv > 0.5) & (bv < 0.8))
    dash_uv = _dashed(bu + bv)

    k3l_center = gate(bor(bor(zm_m, zp_m), xp_m), dash_uv)
    k3l_stop = bor(bor(zm_s, zp_s), xp_s)
    k3r_center = gate(bor(bor(zm_m, zp_m), xm_m), dash_uv)
    k3r_stop = bor(bor(zm_s, zp_s), xm_s)
    k4_center = gate(bor(bor(zm_m, zp_m), bor(xm_m, xp_m)), dash_uv)
    k4_stop = bor(bor(zm_s, zp_s), bor(xm_s, xp_s))

    is_road = (
        (kind == T.TILE_STRAIGHT) | (kind == T.TILE_CURVE_LEFT)
        | (kind == T.TILE_CURVE_RIGHT) | (kind == T.TILE_3WAY_LEFT)
        | (kind == T.TILE_3WAY_RIGHT) | (kind == T.TILE_4WAY)
        | (kind == T.TILE_ASPHALT)
    )

    def ksel(pairs):
        # per-kind marking select: kinds are mutually exclusive, so a
        # where-chain (coverage) / or-chain (boolean) are equivalent
        if aa:
            out = jnp.zeros_like(bu)
            for kk, cv in pairs:
                out = jnp.where(kind == kk, cv, out)
            return out
        out = None
        for kk, cv in pairs:
            t_ = (kind == kk) & cv
            out = t_ if out is None else out | t_
        return out

    yellow_mask = ksel([
        (T.TILE_STRAIGHT, straight_center),
        (T.TILE_CURVE_LEFT, cl_center),
        (T.TILE_CURVE_RIGHT, cr_center),
        (T.TILE_3WAY_LEFT, k3l_center),
        (T.TILE_3WAY_RIGHT, k3r_center),
        (T.TILE_4WAY, k4_center),
    ])
    white_mask = ksel([
        (T.TILE_STRAIGHT, straight_edge),
        (T.TILE_CURVE_LEFT, cl_edge),
        (T.TILE_CURVE_RIGHT, cr_edge),
        (T.TILE_3WAY_LEFT, k3l_stop),
        (T.TILE_3WAY_RIGHT, k3r_stop),
        (T.TILE_4WAY, k4_stop),
    ])

    # --- base colors -------------------------------------------------
    def col(c3):
        return jnp.array(c3, dtype=jnp.float32)

    base = jnp.where(
        is_road[..., None], col(ASPHALT),
        jnp.where(
            (kind == T.TILE_GRASS)[..., None], col(GRASS),
            jnp.where((kind == T.TILE_FLOOR)[..., None], col(FLOOR),
                      col(EMPTY)),
        ),
    )
    if aa:
        # markings only exist on asphalt-based road kinds, so blending
        # deltas FROM asphalt is exact; white composites over yellow
        wcov = jnp.clip(white_mask, 0.0, 1.0)
        ycov = jnp.clip(yellow_mask, 0.0, 1.0) * (1.0 - wcov)
        rgb = (base
               + ycov[..., None] * (col(YELLOW) - col(ASPHALT))
               + wcov[..., None] * (col(WHITE) - col(ASPHALT)))
    else:
        rgb = jnp.where(yellow_mask[..., None], col(YELLOW), base)
        rgb = jnp.where(white_mask[..., None], col(WHITE), rgb)

    # --- noise + variant brightness ----------------------------------
    tx = jnp.clip((bu * NOISE_CELLS).astype(jnp.int32), 0, NOISE_CELLS - 1)
    ty = jnp.clip((bv * NOISE_CELLS).astype(jnp.int32), 0, NOISE_CELLS - 1)
    amp = jnp.where(kind == T.TILE_GRASS, 0.03,
                    jnp.where(is_road, NOISE_AMP, 0.015)).astype(jnp.float32)
    n = _hash_noise(tx, ty, variant + 7 * kind)
    brightness = 0.94 + 0.04 * variant.astype(jnp.float32)
    rgb = rgb * brightness[..., None] + (amp * n)[..., None]
    return jnp.clip(rgb, 0.0, 1.0)

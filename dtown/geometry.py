"""Bezier lane geometry and direction-vector helpers.

TPU-native rewrite of the reference's curve math
(reference: gym_duckietown/graphics.py::bezier_point / bezier_tangent /
bezier_closest and simulator.py::get_dir_vec / get_right_vec /
closest_curve_point / get_lane_pos2 — per SURVEY.md §3.2).

Everything here is pure, branch-free (fixed iteration counts) and vmappable.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from dtown import constants as C
from dtown.types import LanePosition


# --- Backend-independent trig ------------------------------------------
# XLA CPU's f64 sin/cos are only float32-accurate on some code paths
# (observed: cos(0.3) off by 1.5e-8 on 0-d/1-element arrays), which breaks
# trajectory parity with the float64 numpy oracle. We therefore evaluate
# sin/cos ourselves: Cody-Waite 3-part pi/2 argument reduction + the
# public-domain fdlibm kernel polynomials (~1 ulp on |r| <= pi/4). This
# also makes results identical across CPU/TPU backends.

_PIO2_HI = 1.57079632673412561417e+00  # first 33 bits of pi/2
_PIO2_MID = 6.07710050650619224932e-11
_PIO2_LO = 2.02226624879595063154e-21
_TWO_OVER_PI = 0.636619772367581343076

_S = (-1.66666666666666324348e-01, 8.33333333332248946124e-03,
      -1.98412698298579493134e-04, 2.75573137070700676789e-06,
      -2.50507602534068634195e-08, 1.58969099521155010221e-10)
_C = (4.16666666666666019037e-02, -1.38888888888741095749e-03,
      2.48015872894767294178e-05, -2.75573143513906633035e-07,
      2.08757232129817482790e-09, -1.13596475577881948265e-11)


def _kernel_sin(r, z):
    p = _S[5]
    for s in (_S[4], _S[3], _S[2], _S[1], _S[0]):
        p = p * z + s
    return r + r * z * p


def _kernel_cos(z):
    p = _C[5]
    for c in (_C[4], _C[3], _C[2], _C[1], _C[0]):
        p = p * z + c
    return 1.0 - 0.5 * z + z * z * p


def sincos(x):
    """(sin x, cos x) with ~1 ulp accuracy, identical on all backends."""
    x = jnp.asarray(x)
    k = jnp.round(x * _TWO_OVER_PI)
    r = ((x - k * _PIO2_HI) - k * _PIO2_MID) - k * _PIO2_LO
    z = r * r
    s = _kernel_sin(r, z)
    c = _kernel_cos(z)
    n = k.astype(jnp.int32) & 3
    sin_x = jnp.where(
        n == 0, s, jnp.where(n == 1, c, jnp.where(n == 2, -s, -c))
    )
    cos_x = jnp.where(
        n == 0, c, jnp.where(n == 1, -s, jnp.where(n == 2, -c, s))
    )
    return sin_x, cos_x


def _sin(x):
    return sincos(x)[0]


def _cos(x):
    return sincos(x)[1]


def get_dir_vec(angle):
    """Heading unit vector: (cos a, 0, -sin a). reference: simulator.py::get_dir_vec."""
    s, c = sincos(angle)
    return jnp.stack([c, jnp.zeros_like(angle), -s], axis=-1)


def get_right_vec(angle):
    """Right-pointing unit vector: (sin a, 0, cos a). reference: simulator.py::get_right_vec."""
    s, c = sincos(angle)
    return jnp.stack([s, jnp.zeros_like(angle), c], axis=-1)


def rotate_point_xz(px, pz, cx, cz, theta):
    """Rotate point (px, pz) about center (cx, cz) by +theta about the +y axis.

    With y-up and dir_vec = (cos a, 0, -sin a), a +theta rotation in the
    x-z plane is (dx, dz) -> (dx cos + dz sin, dz cos - dx sin)
    (reference: graphics.py::rotate_point).
    """
    dx = px - cx
    dz = pz - cz
    s, c = sincos(theta)
    return cx + dx * c + dz * s, cz + dz * c - dx * s


def rot_y_matrix(theta):
    """3x3 rotation about +y consistent with rotate_point_xz / dir_vec."""
    s, c = sincos(theta)
    z = jnp.zeros_like(theta)
    o = jnp.ones_like(theta)
    return jnp.stack(
        [
            jnp.stack([c, z, s], axis=-1),
            jnp.stack([z, o, z], axis=-1),
            jnp.stack([-s, z, c], axis=-1),
        ],
        axis=-2,
    )


# --- Cubic bezier ------------------------------------------------------

def bezier_point(cps, t):
    """Evaluate a cubic bezier at t. cps: [..., 4, 3], t: [...]."""
    t = t[..., None]
    u = 1.0 - t
    return (
        (u ** 3) * cps[..., 0, :]
        + 3.0 * t * (u ** 2) * cps[..., 1, :]
        + 3.0 * (t ** 2) * u * cps[..., 2, :]
        + (t ** 3) * cps[..., 3, :]
    )


def bezier_tangent(cps, t):
    """Normalized tangent of a cubic bezier at t."""
    t = t[..., None]
    u = 1.0 - t
    d = (
        3.0 * (u ** 2) * (cps[..., 1, :] - cps[..., 0, :])
        + 6.0 * u * t * (cps[..., 2, :] - cps[..., 1, :])
        + 3.0 * (t ** 2) * (cps[..., 3, :] - cps[..., 2, :])
    )
    norm = jnp.linalg.norm(d, axis=-1, keepdims=True)
    return d / jnp.maximum(norm, 1e-12)


def bezier_closest(cps, p, n_iters: int = C.BEZIER_CLOSEST_ITERS):
    """Closest-parameter search by fixed-depth interval bisection.

    Exactly mirrors the reference's recursive bisection
    (graphics.py::bezier_closest with n=8): at each level keep the half
    whose endpoint is closer to p; return the midpoint of the final
    interval. Fixed iteration count -> jittable fori_loop.

    cps: [..., 4, 3]; p: [..., 3]  ->  t: [...]
    """
    t_bot = jnp.zeros(p.shape[:-1], dtype=cps.dtype)
    t_top = jnp.ones(p.shape[:-1], dtype=cps.dtype)

    # Unrolled (static 8 iterations): avoids an XLA while-loop, letting
    # the whole search fuse into straight-line vector code.
    for _ in range(n_iters):
        mid = 0.5 * (t_bot + t_top)
        d_bot = jnp.sum((bezier_point(cps, t_bot) - p) ** 2, axis=-1)
        d_top = jnp.sum((bezier_point(cps, t_top) - p) ** 2, axis=-1)
        keep_bot = d_bot < d_top
        t_bot, t_top = (
            jnp.where(keep_bot, t_bot, mid),
            jnp.where(keep_bot, mid, t_top),
        )
    return 0.5 * (t_bot + t_top)


# --- Tile / lane queries ----------------------------------------------

def get_grid_coords(pos, tile_size):
    """World position -> integer tile coords (i along x, j along z).

    reference: simulator.py::get_grid_coords.
    """
    i = jnp.floor(pos[..., 0] / tile_size).astype(jnp.int32)
    j = jnp.floor(pos[..., 2] / tile_size).astype(jnp.int32)
    return i, j


def closest_curve_point(maps, pos, angle):
    """Point + tangent of the lane curve best aligned with the heading.

    reference: simulator.py::closest_curve_point — keeps only the tile's
    curves whose chord direction agrees with the agent heading (dot > 0,
    SURVEY.md §3.2), picks the one with the largest dot product, then runs
    bezier_closest on it.

    Returns (point [3], tangent [3], valid bool). valid is False when the
    tile under pos is not drivable, out of the grid, or no curve agrees
    with the heading (the reference returns (None, None) there, which
    get_lane_pos2 turns into NotInLane).
    """
    H, W = maps.grid_shape
    i, j = get_grid_coords(pos, maps.tile_size)
    in_grid = (i >= 0) & (i < W) & (j >= 0) & (j < H)
    ci = jnp.clip(i, 0, W - 1)
    cj = jnp.clip(j, 0, H - 1)
    valid = in_grid & maps.drivable[cj, ci]

    curves = maps.curves[cj, ci]        # [Cmax, 4, 3]
    cmask = maps.curve_mask[cj, ci]     # [Cmax]

    chord = curves[:, -1, :] - curves[:, 0, :]
    chord = chord / jnp.maximum(
        jnp.linalg.norm(chord, axis=-1, keepdims=True), 1e-12
    )
    # elementwise form, NOT a matmul: the default-precision MXU would
    # round operands to bf16 and flip near-tie curve selections vs CPU
    dv = get_dir_vec(angle)
    dots = chord[..., 0] * dv[0] + chord[..., 1] * dv[1] + chord[..., 2] * dv[2]
    dots = jnp.where(cmask, dots, -jnp.inf)
    best = jnp.argmax(dots)
    # SURVEY §3.2 dot>0 filter: a heading opposing every lane direction
    # (e.g. driving against traffic at an intersection) is NotInLane.
    valid = valid & (dots[best] > 0.0)

    cps = curves[best]
    t = bezier_closest(cps, pos)
    point = bezier_point(cps, t)
    tangent = bezier_tangent(cps, t)
    return point, tangent, valid


def get_lane_pos2(maps, pos, angle):
    """Lane-relative position (reference: simulator.py::get_lane_pos2).

    signed dist = dot(pos - point, cross(tangent, up));  right of the
    curve is negative, left positive.  NotInLane -> in_lane=False flag.
    """
    point, tangent, valid = closest_curve_point(maps, pos, angle)
    dir_vec = get_dir_vec(angle)
    dot_dir = jnp.clip(jnp.sum(dir_vec * tangent, axis=-1), -1.0, 1.0)

    up = jnp.array([0.0, 1.0, 0.0], dtype=pos.dtype)
    right_of_curve = jnp.cross(tangent, up)
    signed_dist = jnp.sum((pos - point) * right_of_curve, axis=-1)

    angle_rad = jnp.arccos(dot_dir)
    angle_rad = jnp.where(
        jnp.sum(dir_vec * right_of_curve, axis=-1) < 0.0, -angle_rad, angle_rad
    )
    return LanePosition(
        dist=signed_dist,
        dot_dir=dot_dir,
        angle_deg=jnp.rad2deg(angle_rad),
        angle_rad=angle_rad,
        in_lane=valid,
    )

"""Per-tile-kind lane centerline control points.

The reference hardcodes cubic-bezier control-point tables per tile kind
(reference: simulator.py::_get_curve). Here the same curves are *generated*
from a port/maneuver model: each tile edge carries one lane port per travel
direction at ``LANE_OFFSET`` (0.20 tile fractions) right of the road
center, and each maneuver (straight / left turn / right turn) is a cubic
bezier between an entry port and an exit port with heading-aligned interior
control points. Right-hand traffic: the lane center is 0.2 tile-fractions
to the right of the direction of travel.

All curves are produced in tile-local fraction units (tile center at the
origin, edges at +-0.5) and then rotated / scaled / translated by the map
compiler. Units: (x, z) ground plane, y = 0.

Tile-kind base orientations (angle index 0; rotations by 90 deg multiples
cover the yaml ``/S /E /N /W`` orientations):

* ``straight``    — road along z (connects the z=-0.5 and z=+0.5 edges)
* ``curve_left``  — connects z=-0.5 and x=+0.5 edges
* ``curve_right`` — connects z=-0.5 and x=-0.5 edges
* ``3way_left``   — T junction, edges z=-0.5, z=+0.5, x=+0.5
* ``3way_right``  — T junction, edges z=-0.5, z=+0.5, x=-0.5
* ``4way``        — all four edges
"""
from __future__ import annotations

import numpy as np

from dtown import constants as C
from dtown import types as T

LANE = C.LANE_OFFSET  # 0.20


def _right(d):
    """Right-hand vector of travel direction d in the (x, z) plane.

    Consistent with geometry.get_right_vec: for d = +z (= dir at
    theta=-pi/2), right = -x.
    """
    dx, dz = d
    return np.array([-dz, dx], dtype=np.float64)


def _left(d):
    return -_right(d)


def _entry(d):
    d = np.asarray(d, dtype=np.float64)
    return -0.5 * d + LANE * _right(d)


def _straight_cps(d):
    d = np.asarray(d, dtype=np.float64)
    p0 = _entry(d)
    p3 = 0.5 * d + LANE * _right(d)
    return np.stack([p0, p0 + 0.25 * d, p3 - 0.25 * d, p3])


def _left_cps(d):
    d = np.asarray(d, dtype=np.float64)
    l = _left(d)
    p0 = _entry(d)
    p3 = 0.5 * l + LANE * d  # exit port on the left edge (right(l) == d)
    return np.stack([p0, p0 + 0.5 * d, p3 - 0.5 * l, p3])


def _right_cps(d):
    d = np.asarray(d, dtype=np.float64)
    r = _right(d)
    p0 = _entry(d)
    p3 = 0.5 * r - LANE * d  # exit port on the right edge (right(r) == -d)
    return np.stack([p0, p0 + 0.3 * d, p3 - 0.2 * r, p3])


_ZP = (0.0, 1.0)   # travel +z (enters through the z=-0.5 edge)
_ZM = (0.0, -1.0)  # travel -z
_XP = (1.0, 0.0)   # travel +x
_XM = (-1.0, 0.0)  # travel -x


def _lift(cps_xz):
    """[4, 2] (x, z) -> [4, 3] (x, 0, z)."""
    out = np.zeros((4, 3), dtype=np.float64)
    out[:, 0] = cps_xz[:, 0]
    out[:, 2] = cps_xz[:, 1]
    return out


def tile_curves(kind: int) -> np.ndarray:
    """Base-orientation curves for a tile kind -> [n_curves, 4, 3]."""
    if kind == T.TILE_STRAIGHT:
        sets = [_straight_cps(_ZP), _straight_cps(_ZM)]
    elif kind == T.TILE_CURVE_LEFT:
        # connects z=-0.5 <-> x=+0.5: left turn entering +z, right turn
        # entering -x
        sets = [_left_cps(_ZP), _right_cps(_XM)]
    elif kind == T.TILE_CURVE_RIGHT:
        # connects z=-0.5 <-> x=-0.5
        sets = [_right_cps(_ZP), _left_cps(_XP)]
    elif kind == T.TILE_3WAY_LEFT:
        # edges z=-0.5, z=+0.5, x=+0.5
        sets = [
            _straight_cps(_ZP), _left_cps(_ZP),
            _straight_cps(_ZM), _right_cps(_ZM),
            _left_cps(_XM), _right_cps(_XM),
        ]
    elif kind == T.TILE_3WAY_RIGHT:
        # edges z=-0.5, z=+0.5, x=-0.5
        sets = [
            _straight_cps(_ZP), _right_cps(_ZP),
            _straight_cps(_ZM), _left_cps(_ZM),
            _left_cps(_XP), _right_cps(_XP),
        ]
    elif kind == T.TILE_4WAY:
        sets = []
        for d in (_ZP, _ZM, _XP, _XM):
            sets += [_straight_cps(d), _left_cps(d), _right_cps(d)]
    else:
        return np.zeros((0, 4, 3), dtype=np.float64)
    return np.stack([_lift(s) for s in sets])


MAX_CURVES = 12  # 4way has 4 entries x 3 maneuvers


def rotate_curves(cps: np.ndarray, angle_idx: int) -> np.ndarray:
    """Rotate tile-local curves by angle_idx * 90 deg about +y.

    Uses the same rotation convention as geometry.rotate_point_xz:
    (x, z) -> (x cos + z sin, z cos - x sin).
    """
    theta = angle_idx * np.pi / 2.0
    c, s = np.cos(theta), np.sin(theta)
    x = cps[..., 0]
    z = cps[..., 2]
    out = cps.copy()
    out[..., 0] = x * c + z * s
    out[..., 2] = z * c - x * s
    return out

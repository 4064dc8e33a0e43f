"""Procedural texture atlas generation (host-side, init-time).

The reference ships PNG textures with numbered variants picked per reset
for domain randomization (reference: textures/*.png +
graphics.py::Texture.get). This rebuild generates an equivalent atlas
procedurally in numpy: per tile kind, N_TEX_VARIANTS variants of a
TEX x TEX RGB texture, drawn in the tile's BASE orientation (angle 0 as
defined in curves.py); the renderer rotates texture coordinates per tile
angle at sample time.

Atlas layout: uint8 [N_KINDS, N_VARIANTS, TEX, TEX, 3]; row index = z
fraction within the tile (v), column index = x fraction (u).
"""
from __future__ import annotations

import functools

import numpy as np

from dtown import types as T
from dtown.randomization import N_TEX_VARIANTS

TEX = 128  # texels per tile edge

# Road marking geometry (tile fractions), matched to curves.py: lanes at
# +-0.20 from road center, road spans the full tile.
_EDGE_INSET = 0.035   # white edge line center distance from tile border
_LINE_W = 0.025       # line half... full width of lane lines
_YELLOW = np.array([0.82, 0.68, 0.10])
_WHITE = np.array([0.88, 0.88, 0.88])
_ASPHALT = np.array([0.155, 0.155, 0.16])
_GRASS = np.array([0.22, 0.46, 0.18])
_FLOOR = np.array([0.62, 0.60, 0.58])


def _noise(rng, shape, amp):
    return rng.normal(0.0, amp, size=shape)


def _base(color, rng, amp=0.012):
    img = np.ones((TEX, TEX, 3)) * color
    img += _noise(rng, (TEX, TEX, 1), amp)
    img += _noise(rng, (TEX, TEX, 3), amp * 0.5)
    return img


def _uv_grids():
    # u = x fraction (column), v = z fraction (row)
    v, u = np.meshgrid(
        (np.arange(TEX) + 0.5) / TEX, (np.arange(TEX) + 0.5) / TEX,
        indexing="ij",
    )
    return u, v


def _paint(img, mask, color):
    img[mask] = color + 0.0


def _dashed(coord_along, period=0.125, duty=0.5):
    return (coord_along / period) % 1.0 < duty


def _straight_markings(img):
    """Road along z (base orientation): center yellow dashed at x=0.5,
    white edge lines near x=0 and x=1."""
    u, v = _uv_grids()
    center = np.abs(u - 0.5) < _LINE_W / 2
    _paint(img, center & _dashed(v), _YELLOW)
    for edge in (_EDGE_INSET, 1.0 - _EDGE_INSET):
        _paint(img, np.abs(u - edge) < _LINE_W / 2, _WHITE)
    return img


def _arc_markings(img, corner_u, corner_v):
    """Quarter-turn road: rings centered at a tile corner.

    Center dashed line at radius 0.5, edge lines at radius _EDGE_INSET
    and 1 - _EDGE_INSET.
    """
    u, v = _uv_grids()
    r = np.hypot(u - corner_u, v - corner_v)
    theta = np.arctan2(v - corner_v, u - corner_u)
    arc_len = r * np.abs(theta)  # approx position along arc for dashing
    _paint(img, (np.abs(r - 0.5) < _LINE_W / 2) & _dashed(arc_len), _YELLOW)
    for edge in (_EDGE_INSET, 1.0 - _EDGE_INSET):
        _paint(img, np.abs(r - edge) < _LINE_W / 2, _WHITE)
    return img


def _cross_markings(img, stubs):
    """Intersection: center dashed lines of each connected stub.

    stubs: iterable of edges from {'zm','zp','xm','xp'} that carry roads;
    draws each stub's center line from the tile edge to the center, plus
    white stop lines across entries.
    """
    u, v = _uv_grids()
    for stub in stubs:
        if stub == "zm":
            m = (np.abs(u - 0.5) < _LINE_W / 2) & (v < 0.5)
            stop = (np.abs(v - 0.08) < 0.02) & (u > 0.5) & (u < 0.8)
        elif stub == "zp":
            m = (np.abs(u - 0.5) < _LINE_W / 2) & (v >= 0.5)
            stop = (np.abs(v - 0.92) < 0.02) & (u > 0.2) & (u < 0.5)
        elif stub == "xm":
            m = (np.abs(v - 0.5) < _LINE_W / 2) & (u < 0.5)
            stop = (np.abs(u - 0.08) < 0.02) & (v > 0.2) & (v < 0.5)
        else:  # xp
            m = (np.abs(v - 0.5) < _LINE_W / 2) & (u >= 0.5)
            stop = (np.abs(u - 0.92) < 0.02) & (v > 0.5) & (v < 0.8)
        _paint(img, m & _dashed(np.where(m, u + v, 0.0)), _YELLOW)
        _paint(img, stop, _WHITE)
    return img


def _tile_texture(kind: int, rng) -> np.ndarray:
    if kind == T.TILE_GRASS:
        img = _base(_GRASS, rng, amp=0.03)
    elif kind == T.TILE_FLOOR:
        img = _base(_FLOOR, rng, amp=0.015)
    elif kind == T.TILE_EMPTY:
        img = _base(_GRASS * 0.6, rng, amp=0.02)
    else:
        img = _base(_ASPHALT, rng)
        if kind == T.TILE_STRAIGHT:
            _straight_markings(img)
        elif kind == T.TILE_CURVE_LEFT:
            # base: connects z=-0.5 (v=0) and x=+0.5 (u=1) -> corner (1, 0)
            _arc_markings(img, 1.0, 0.0)
        elif kind == T.TILE_CURVE_RIGHT:
            # base: connects z=-0.5 (v=0) and x=-0.5 (u=0) -> corner (0, 0)
            _arc_markings(img, 0.0, 0.0)
        elif kind == T.TILE_3WAY_LEFT:
            _cross_markings(img, ("zm", "zp", "xp"))
        elif kind == T.TILE_3WAY_RIGHT:
            _cross_markings(img, ("zm", "zp", "xm"))
        elif kind == T.TILE_4WAY:
            _cross_markings(img, ("zm", "zp", "xm", "xp"))
    return np.clip(img, 0.0, 1.0)


@functools.lru_cache(maxsize=1)
def tile_atlas() -> np.ndarray:
    """uint8 [N_KINDS, N_VARIANTS, TEX, TEX, 3] texture atlas."""
    n_kinds = max(T.TILE_KINDS.values()) + 1
    atlas = np.zeros((n_kinds, N_TEX_VARIANTS, TEX, TEX, 3), dtype=np.uint8)
    for kind in range(n_kinds):
        for var in range(N_TEX_VARIANTS):
            rng = np.random.default_rng(1000 * kind + var)
            img = _tile_texture(kind, rng)
            # variants differ in noise draw and slight brightness
            img = np.clip(img * (0.94 + 0.04 * var), 0.0, 1.0)
            atlas[kind, var] = (img * 255.0 + 0.5).astype(np.uint8)
    return atlas

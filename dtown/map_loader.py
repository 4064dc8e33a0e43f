"""Map compiler: YAML -> static MapArrays (host-side, init-time).

Replaces the reference's runtime map loading
(reference: simulator.py::_load_map + ::_get_curve + per-object
construction in objects.py) with an offline compilation to fixed-shape
arrays, so the whole map is a pytree constant baked into the jitted step.

Yaml schema (reference: maps/*.yaml, SURVEY.md §2.10):

    tiles: 2-D array of tokens ``kind[/orient]``, kinds in
        {straight, curve_left, curve_right, 3way_left, 3way_right, 4way,
         asphalt, grass, floor}; orient in {S, E, N, W} -> 90 deg multiples
        (angle index = ['S','E','N','W'].index(orient)).
    objects: list of {kind, pos: [i, j] (tile units, float), rotate: deg,
        height: m | scale: x, optional: bool, static: bool}
    tile_size: 0.585
"""
from __future__ import annotations

import functools
import os
from typing import Optional

import numpy as np
import yaml

import jax.numpy as jnp

from dtown import assets
from dtown import constants as C
from dtown import curves as curves_lib
from dtown import types as T
from dtown.types import MapArrays

MAPS_DIR = os.path.join(os.path.dirname(__file__), "maps")

# Object budgets are rounded up to a multiple of this (static shape;
# padded with masked slots). Small multiples keep the masked SAT /
# proximity math cheap on object-light maps.
OBJECT_BUDGET_QUANTUM = 8


def list_maps():
    return sorted(
        f[:-5] for f in os.listdir(MAPS_DIR) if f.endswith(".yaml")
    )


def _parse_tile(token: str):
    token = token.strip()
    if "/" in token:
        kind, orient = token.split("/")
        angle = ["S", "E", "N", "W"].index(orient.strip())
    else:
        kind, angle = token, 0
    kind = kind.strip()
    return T.TILE_KINDS[kind], angle


def _footprint_corners(pos_xz, y_rot, width, length):
    """Rectangle corners (x, z) for an object footprint, rotated by y_rot.

    At y_rot=0 the object faces +x (dir_vec(0)); length runs along the
    facing axis (local x), width along the right axis (local z). Uses the
    same +theta y-rotation convention as geometry.rotate_point_xz.
    """
    hw, hl = 0.5 * width, 0.5 * length
    local = np.array(
        [[-hl, -hw], [hl, -hw], [hl, hw], [-hl, hw]], dtype=np.float64
    )
    c, s = np.cos(y_rot), np.sin(y_rot)
    # (x, z) -> (x c + z s, z c - x s): row-vector times [[c,-s],[s,c]]^T
    world = local @ np.array([[c, s], [-s, c]]).T
    return world + np.asarray(pos_xz, dtype=np.float64)


def _norms_from_corners(corners):
    e0 = corners[1] - corners[0]
    e1 = corners[2] - corners[1]
    n = np.stack([[-e0[1], e0[0]], [-e1[1], e1[0]]])
    return n / np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-12)


DYNAMIC_KINDS = ("duckie", "duckiebot", "trafficlight")


@functools.lru_cache(maxsize=None)
def load_map(map_name: str, max_objects: Optional[int] = None) -> MapArrays:
    """Compile a map yaml into MapArrays (cached)."""
    path = os.path.join(MAPS_DIR, map_name + ".yaml")
    with open(path) as f:
        data = yaml.safe_load(f)
    return compile_map(data, max_objects=max_objects)


def compile_map(data: dict, max_objects: Optional[int] = None) -> MapArrays:
    tile_size = float(data.get("tile_size", C.DEFAULT_TILE_SIZE))
    rows = data["tiles"]
    H = len(rows)
    W = len(rows[0])

    tile_kind = np.zeros((H, W), dtype=np.int32)
    tile_angle = np.zeros((H, W), dtype=np.int32)
    drivable = np.zeros((H, W), dtype=bool)
    curves = np.zeros((H, W, curves_lib.MAX_CURVES, 4, 3), dtype=np.float64)
    curve_mask = np.zeros((H, W, curves_lib.MAX_CURVES), dtype=bool)

    for j, row in enumerate(rows):
        assert len(row) == W, "ragged tile rows"
        for i, token in enumerate(row):
            kind, angle = _parse_tile(str(token))
            tile_kind[j, i] = kind
            tile_angle[j, i] = angle
            if kind in T.DRIVABLE_KINDS:
                drivable[j, i] = True
                base = curves_lib.tile_curves(kind)
                rot = curves_lib.rotate_curves(base, angle)
                world = rot * tile_size
                world[..., 0] += (i + 0.5) * tile_size
                world[..., 2] += (j + 0.5) * tile_size
                n = world.shape[0]
                curves[j, i, :n] = world
                curve_mask[j, i, :n] = True

    # Texture id per tile: base texture index = tile kind (the texture
    # atlas in render/textures.py is indexed by tile kind).
    tile_tex = tile_kind.copy()

    # --- Objects -------------------------------------------------------
    objs = data.get("objects", []) or []
    q = OBJECT_BUDGET_QUANTUM
    M = max_objects or max(q, -(-len(objs) // q) * q)
    if len(objs) > M:
        raise ValueError(f"map has {len(objs)} objects > budget {M}")

    obj_pos = np.zeros((M, 3), dtype=np.float64)
    obj_y_rot = np.zeros((M,), dtype=np.float64)
    obj_scale = np.ones((M,), dtype=np.float64)
    obj_kind = np.zeros((M,), dtype=np.int32)
    obj_corners = np.zeros((M, 4, 2), dtype=np.float64)
    obj_norms = np.tile(
        np.array([[1.0, 0.0], [0.0, 1.0]]), (M, 1, 1)
    )
    obj_safety_rad = np.zeros((M,), dtype=np.float64)
    obj_height = np.zeros((M,), dtype=np.float64)
    obj_halfdims = np.zeros((M, 2), dtype=np.float64)
    obj_mask = np.zeros((M,), dtype=bool)
    obj_optional = np.zeros((M,), dtype=bool)
    obj_is_dynamic = np.zeros((M,), dtype=bool)
    from dtown.objects import DUCKIE_WALK_DISTANCE

    obj_walk_dist = np.full((M,), DUCKIE_WALK_DISTANCE, dtype=np.float64)

    for m, ob in enumerate(objs):
        kind = ob["kind"]
        pos = list(ob["pos"])
        x = float(pos[0]) * tile_size
        z = float(pos[1]) * tile_size
        y = float(pos[2]) if len(pos) > 2 else 0.0
        y_rot = np.deg2rad(float(ob.get("rotate", 0.0)))
        if "height" in ob:
            scale = float(ob["height"]) / assets.natural_height(kind)
        else:
            scale = float(ob.get("scale", 1.0))
        ow, oh, ol = assets.object_extents(kind, scale)
        static = bool(ob.get("static", kind not in ("duckie", "duckiebot")))
        is_dynamic = (not static) and kind in DYNAMIC_KINDS
        if kind == "trafficlight":
            is_dynamic = True  # animated phase, immobile

        obj_pos[m] = (x, y, z)
        obj_y_rot[m] = y_rot
        obj_scale[m] = scale
        obj_kind[m] = T.OBJ_KIND_IDS[kind]
        obj_corners[m] = _footprint_corners((x, z), y_rot, ow, ol)
        obj_norms[m] = _norms_from_corners(obj_corners[m])
        obj_safety_rad[m] = assets.safety_radius(kind, scale)
        obj_height[m] = oh
        obj_halfdims[m] = (0.5 * ow, 0.5 * ol)  # (half width, half length)
        obj_mask[m] = True
        obj_optional[m] = bool(ob.get("optional", False))
        obj_is_dynamic[m] = is_dynamic
        obj_walk_dist[m] = float(
            ob.get("walk_distance", obj_walk_dist[m])
        )

    driv_flat = drivable.reshape(-1).astype(np.float64)
    total = max(driv_flat.sum(), 1.0)

    from dtown.spawn_bank import compute_spawn_bank

    sp_pos, sp_angle, sp_deg, sp_mask = compute_spawn_bank(
        tile_size, drivable, curves, curve_mask, obj_corners, obj_norms,
        obj_pos, obj_safety_rad, obj_mask,
    )

    f32 = lambda a: jnp.asarray(a, dtype=jnp.float32)
    return MapArrays(
        tile_kind=jnp.asarray(tile_kind),
        tile_angle=jnp.asarray(tile_angle),
        drivable=jnp.asarray(drivable),
        tile_tex=jnp.asarray(tile_tex),
        curves=f32(curves),
        curve_mask=jnp.asarray(curve_mask),
        obj_pos=f32(obj_pos),
        obj_y_rot=f32(obj_y_rot),
        obj_scale=f32(obj_scale),
        obj_kind=jnp.asarray(obj_kind),
        obj_corners=f32(obj_corners),
        obj_norms=f32(obj_norms),
        obj_safety_rad=f32(obj_safety_rad),
        obj_height=f32(obj_height),
        obj_halfdims=f32(obj_halfdims),
        obj_mask=jnp.asarray(obj_mask),
        obj_optional=jnp.asarray(obj_optional),
        obj_is_dynamic=jnp.asarray(obj_is_dynamic),
        obj_walk_dist=f32(obj_walk_dist),
        tile_size=f32(tile_size),
        drivable_frac=f32(driv_flat / total),
        spawn_pos=f32(sp_pos),
        spawn_angle=f32(sp_angle),
        spawn_lane_deg=f32(sp_deg),
        spawn_mask=jnp.asarray(sp_mask),
    )


def stack_maps(map_names, max_objects: Optional[int] = None):
    """Stack several compiled maps along a leading axis for multi-map envs.

    All maps are padded to a common grid and object budget. Replaces the
    reference's MultiMapEnv (one Simulator per map) with a single gather
    on a per-env map index (SURVEY.md §7 item 2).
    """
    import jax

    compiled = [load_map(n, max_objects=None) for n in map_names]
    H = max(m.tile_kind.shape[0] for m in compiled)
    W = max(m.tile_kind.shape[1] for m in compiled)
    M = max_objects or max(m.obj_pos.shape[0] for m in compiled)

    def pad_map(m: MapArrays) -> MapArrays:
        h, w = m.tile_kind.shape
        ph, pw = H - h, W - w
        pm = M - m.obj_pos.shape[0]

        def pad(arr, grid_dims, obj_dim=None):
            pads = [(0, 0)] * arr.ndim
            if grid_dims:
                pads[0] = (0, ph)
                pads[1] = (0, pw)
            if obj_dim is not None:
                pads[obj_dim] = (0, pm)
            return jnp.pad(arr, pads)

        driv = pad(m.drivable_frac.reshape(h, w), True).reshape(-1)
        return MapArrays(
            tile_kind=pad(m.tile_kind, True),
            tile_angle=pad(m.tile_angle, True),
            drivable=pad(m.drivable, True),
            tile_tex=pad(m.tile_tex, True),
            curves=pad(m.curves, True),
            curve_mask=pad(m.curve_mask, True),
            obj_pos=pad(m.obj_pos, False, 0),
            obj_y_rot=pad(m.obj_y_rot, False, 0),
            obj_scale=pad(m.obj_scale, False, 0),
            obj_kind=pad(m.obj_kind, False, 0),
            obj_corners=pad(m.obj_corners, False, 0),
            obj_norms=pad(m.obj_norms, False, 0),
            obj_safety_rad=pad(m.obj_safety_rad, False, 0),
            obj_height=pad(m.obj_height, False, 0),
            obj_halfdims=pad(m.obj_halfdims, False, 0),
            obj_mask=pad(m.obj_mask, False, 0),
            obj_optional=pad(m.obj_optional, False, 0),
            obj_is_dynamic=pad(m.obj_is_dynamic, False, 0),
            obj_walk_dist=pad(m.obj_walk_dist, False, 0),
            tile_size=m.tile_size,
            drivable_frac=driv,
            spawn_pos=m.spawn_pos,
            spawn_angle=m.spawn_angle,
            spawn_lane_deg=m.spawn_lane_deg,
            spawn_mask=m.spawn_mask,
        )

    padded = [pad_map(m) for m in compiled]
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *padded)

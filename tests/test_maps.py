"""Map compilation and road-network connectivity validation.

Map-as-fixture idiom from the reference (SURVEY.md §4: regress_* maps);
here every shipped map is validated structurally: all lane curves must
enter/exit through tile edges and connect continuously to the neighbor
tile's curves (C0 continuity of the lane graph).
"""
import numpy as np
import pytest

from dtown import map_loader
from dtown import types as T

ALL_MAPS = map_loader.list_maps()


def test_expected_maps_ship():
    expected = {
        "udem1", "straight_road", "small_loop", "small_loop_cw",
        "loop_empty", "loop_obstacles", "loop_pedestrians",
        "loop_dyn_duckiebots", "zigzag_dists", "4way",
        "regress_4way_bbox", "regress_4way_drivable",
    }
    assert expected.issubset(set(ALL_MAPS))


@pytest.mark.parametrize("name", ALL_MAPS)
def test_map_compiles(name):
    m = map_loader.load_map(name)
    H, W = m.grid_shape
    assert H > 0 and W > 0
    assert bool(np.asarray(m.drivable).any())
    assert np.isclose(np.asarray(m.drivable_frac).sum(), 1.0, atol=1e-5)
    # curves present exactly on drivable tiles
    has_curves = np.asarray(m.curve_mask).any(axis=-1)
    np.testing.assert_array_equal(has_curves, np.asarray(m.drivable))


@pytest.mark.parametrize("name", ALL_MAPS)
def test_lane_graph_connectivity(name):
    m = map_loader.load_map(name)
    H, W = m.grid_shape
    ts = float(m.tile_size)
    curves = np.asarray(m.curves)
    cmask = np.asarray(m.curve_mask)
    drivable = np.asarray(m.drivable)

    eps = 1e-4 * ts

    def tile_of(p):
        return int(np.floor(p[0] / ts)), int(np.floor(p[2] / ts))

    for j in range(H):
        for i in range(W):
            if not drivable[j, i]:
                continue
            x0, x1 = i * ts, (i + 1) * ts
            z0, z1 = j * ts, (j + 1) * ts
            for c in range(curves.shape[2]):
                if not cmask[j, i, c]:
                    continue
                p0 = curves[j, i, c, 0]
                p3 = curves[j, i, c, 3]
                # endpoints sit exactly on a tile edge
                for p in (p0, p3):
                    on_edge = (
                        abs(p[0] - x0) < eps or abs(p[0] - x1) < eps
                        or abs(p[2] - z0) < eps or abs(p[2] - z1) < eps
                    )
                    assert on_edge, (name, i, j, c, p)
                # the exit point must be continued by a neighbor curve's
                # entry point (or leave the road network entirely)
                d = p3 - curves[j, i, c, 2]
                d = d / np.linalg.norm(d)
                nxt = p3 + 1e-3 * ts * d
                ni, nj = tile_of(nxt)
                if 0 <= ni < W and 0 <= nj < H and drivable[nj, ni]:
                    starts = curves[nj, ni][cmask[nj, ni]][:, 0]
                    dist = np.linalg.norm(starts - p3, axis=1).min()
                    assert dist < 1e-6, (
                        f"{name}: curve exit at tile ({i},{j}) not continued "
                        f"in ({ni},{nj}); min dist {dist}"
                    )


def test_objects_compiled():
    m = map_loader.load_map("loop_obstacles")
    mask = np.asarray(m.obj_mask)
    assert mask.sum() == 6
    kinds = np.asarray(m.obj_kind)[mask]
    assert T.OBJ_KIND_IDS["duckie"] in kinds
    assert T.OBJ_KIND_IDS["cone"] in kinds
    # static map: no dynamic objects
    assert not np.asarray(m.obj_is_dynamic)[mask].any()

    m2 = map_loader.load_map("loop_pedestrians")
    assert np.asarray(m2.obj_is_dynamic)[np.asarray(m2.obj_mask)].all()


def test_stack_maps_pads_to_common_shape():
    stacked = map_loader.stack_maps(["small_loop", "udem1"])
    assert stacked.tile_kind.ndim == 3
    assert stacked.tile_kind.shape[0] == 2
    assert stacked.curves.shape[1:3] == stacked.tile_kind.shape[1:3]


def test_multimap_registry():
    import dtown

    ids = dtown.registered_ids()
    assert "Duckietown-udem1-v0" in ids
    assert "MultiMap-v0" in ids

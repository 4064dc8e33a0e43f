"""Cross-check the native (C++) map compiler against the python one.

Tiles/curves/objects must match bit-for-bit; the spawn bank is
property-checked (different RNG stream, same acceptance test).
"""
import numpy as np
import pytest

from dtown import map_loader
from dtown import physics
from dtown.geometry import get_lane_pos2

native = pytest.importorskip("dtown.native")

if not native.available():
    pytest.skip("native toolchain unavailable", allow_module_level=True)

MAPS = ["small_loop", "udem1", "loop_obstacles", "4way", "zigzag_dists",
        "loop_pedestrians", "straight_road"]


@pytest.mark.parametrize("name", MAPS)
def test_native_matches_python(name):
    nat = native.compile_map_native(f"dtown/maps/{name}.yaml")
    py = map_loader.load_map(name)
    np.testing.assert_array_equal(nat["tile_kind"], np.asarray(py.tile_kind))
    np.testing.assert_array_equal(nat["tile_angle"], np.asarray(py.tile_angle))
    np.testing.assert_array_equal(nat["drivable"], np.asarray(py.drivable))
    np.testing.assert_array_equal(nat["curve_mask"], np.asarray(py.curve_mask))
    np.testing.assert_allclose(nat["curves"], np.asarray(py.curves), atol=1e-6)
    # compare real object slots only (padding conventions differ: python
    # pads scale with 1 / identity norms, native zeros)
    M = int(nat["n_objects"])
    for f, pyf in [
        ("obj_pos", py.obj_pos), ("obj_y_rot", py.obj_y_rot),
        ("obj_scale", py.obj_scale), ("obj_corners", py.obj_corners),
        ("obj_norms", py.obj_norms), ("obj_safety_rad", py.obj_safety_rad),
        ("obj_halfdims", py.obj_halfdims), ("obj_height", py.obj_height),
        ("obj_walk_dist", py.obj_walk_dist),
    ]:
        np.testing.assert_allclose(
            nat[f][:M], np.asarray(pyf)[:M], atol=1e-6, err_msg=f
        )
    np.testing.assert_array_equal(
        nat["obj_kind"][:M], np.asarray(py.obj_kind)[:M]
    )
    np.testing.assert_array_equal(
        nat["obj_dynamic"][:M], np.asarray(py.obj_is_dynamic)[:M]
    )
    # packed render-kernel tile words match the python packing exactly
    from dtown.render.blob_raster import pack_tile_words

    words_py = pack_tile_words(py.tile_kind, py.tile_angle)
    assert nat["n_words"] == len(words_py)
    np.testing.assert_array_equal(
        nat["tile_words"], np.asarray(words_py, np.int64).astype(np.int32)
    )


@pytest.mark.parametrize("name", ["small_loop", "udem1"])
def test_native_spawn_bank_properties(name):
    """Every native bank pose must pass the python acceptance test."""
    import jax.numpy as jnp

    nat = native.compile_map_native(f"dtown/maps/{name}.yaml")
    py = map_loader.load_map(name)
    assert nat["spawn_mask"].all()
    # sorted by |lane angle|
    deg = np.abs(nat["spawn_lane_deg"])
    assert (np.diff(deg) >= -1e-9).all()

    sel = np.linspace(0, 2047, 32).astype(int)
    for k in sel:
        pos = jnp.asarray(nat["spawn_pos"][k], jnp.float32)
        ang = jnp.float32(nat["spawn_angle"][k])
        valid, _ = physics.valid_pose(
            py, pos, ang, py.obj_corners, py.obj_norms, py.obj_mask,
            safety_factor=1.3,
        )
        assert bool(valid), (name, k)
        lp = get_lane_pos2(py, pos, ang)
        assert bool(lp.in_lane)
        # native lane angle agrees with python computation
        assert abs(float(lp.angle_deg) - nat["spawn_lane_deg"][k]) < 0.5


def test_native_prim_tables_match_meshes():
    """The native prim-model bake (mapc.cpp::kind_prims) must equal the
    python render tables (render/meshes.py::prim_tables) float-for-float
    — both are consumed as float32."""
    from dtown.render import meshes

    nat = native.prim_tables_native()
    py = meshes.prim_tables()
    for f in ("type", "mask", "phase"):
        np.testing.assert_array_equal(nat[f], py[f], err_msg=f)
    for f in ("center", "param", "color"):
        np.testing.assert_array_equal(
            nat[f].astype(np.float32), py[f], err_msg=f
        )


@pytest.mark.parametrize("name", ["udem1", "loop_obstacles", "4way"])
def test_native_scene_bake_matches_render_plan(name):
    """Per-object scene constants baked natively (rotation sin/cos,
    model-space light, prim bound radius) must match what
    blob_raster.build_render_plan computes for the render kernel."""
    from dtown.render.blob_raster import build_render_plan, _bound_radius
    from dtown.types import EnvConfig

    nat = native.compile_map_native(f"dtown/maps/{name}.yaml")
    maps = map_loader.load_map(name)
    plan = build_render_plan(EnvConfig(obs_type="rgb"), maps)
    assert plan is not None and plan["objs"]
    # LOD band-splitting (render/lod.py) maps one map slot to several
    # pseudo-objects holding prim subsets; the native bake is per slot,
    # so compare against the max bound over a slot's pseudo-objects
    # (bound radius is a max over prims, so the split maxes compose).
    by_slot = {}
    for ob in plan["objs"]:
        by_slot.setdefault(ob["slot"], []).append(ob)
    for s, obs_s in by_slot.items():
        ob = obs_s[0]
        assert abs(nat["obj_sincos"][s, 0] - ob["s_r"]) < 1e-15
        assert abs(nat["obj_sincos"][s, 1] - ob["c_r"]) < 1e-15
        np.testing.assert_allclose(
            nat["obj_lmodel"][s], ob["l_model"], atol=1e-15
        )
        rad = max(_bound_radius(o) for o in obs_s)
        assert abs(nat["obj_bound_rad"][s] - rad) < 1e-12

"""OBJ mesh loader (reference: objmesh.py::ObjMesh parity)."""
import numpy as np
import pytest


def _write_sample(tmp_path):
    obj = tmp_path / "duckhouse.obj"
    mtl = tmp_path / "duckhouse.mtl"
    obj.write_text("""mtllib duckhouse.mtl
v -1 0 -1
v  1 0 -1
v  1 2 -1
v -1 2 -1
v -1 0 1
v  1 0 1
v  1 2 1
v -1 2 1
usemtl walls
f 1 2 3 4
f 5 6 7 8
v -1.2 2 -1.2
v  1.2 2 -1.2
v  0 3 0
usemtl roof
f 9 10 11
""")
    mtl.write_text("""newmtl walls
Kd 0.7 0.5 0.3
newmtl roof
Kd 0.8 0.1 0.1
""")
    return str(obj)


def test_objmesh_parse_and_extents(tmp_path):
    from dtown.render.objmesh import ObjMesh

    path = _write_sample(tmp_path)
    mesh = ObjMesh.get(path)
    np.testing.assert_allclose(mesh.min_coords, [-1.2, 0, -1.2])
    np.testing.assert_allclose(mesh.max_coords, [1.2, 3, 1.0])
    assert len(mesh.group_boxes) == 2
    # cache returns the same object
    assert ObjMesh.get(path) is mesh
    prims = mesh.to_prims()
    assert 1 <= len(prims) <= 3


def test_register_custom_object(tmp_path):
    from dtown import assets, types as T
    from dtown.render import meshes as meshlib
    from dtown.render.objmesh import register_custom_object

    path = _write_sample(tmp_path)
    register_custom_object("duckhouse", path)
    assert "duckhouse" in T.OBJ_KIND_IDS
    assert "duckhouse" in assets.OBJECT_DIMS
    tables = meshlib.prim_tables()
    kid = T.OBJ_KIND_IDS["duckhouse"]
    assert tables["mask"][kid].any()


def test_triangle_buffer(tmp_path):
    from dtown.render.objmesh import ObjMesh

    mesh = ObjMesh.get(_write_sample(tmp_path))
    tris, cols = mesh.to_triangles(max_tris=16)
    assert tris.shape == (16, 3, 3) and cols.shape == (16, 3)
    # two quads fan into 2 tris each + 1 roof tri = 5 real triangles
    areas = 0.5 * np.linalg.norm(
        np.cross(tris[:, 1] - tris[:, 0], tris[:, 2] - tris[:, 0]), axis=-1
    )
    assert (areas > 1e-9).sum() == 5
    # ground-normalized: min y is 0
    assert abs(tris[areas > 1e-9][:, :, 1].min()) < 1e-9


def test_triangle_fidelity_render(tmp_path):
    """mesh_fidelity='triangles' ray-casts the registered OBJ mesh; the
    rendered silhouette differs from the box stand-in and shows the
    roof's red material (SURVEY §7 hard-part 1b)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from dtown import env as env_core, map_loader
    from dtown.render.objmesh import register_custom_object
    from dtown.types import EnvConfig

    register_custom_object("duckhouse", _write_sample(tmp_path))
    data = {
        "tiles": [["straight/W", "straight/W", "straight/W"]],
        "objects": [
            # rotate 90: the sample mesh's wall quads face the camera;
            # height keeps the roof apex inside the pitched-down fov
            {"kind": "duckhouse", "pos": [1.0, 0.3], "rotate": 90,
             "height": 0.1, "static": True},
        ],
        "tile_size": 0.585,
    }
    maps = map_loader.compile_map(data)
    base = EnvConfig(obs_type="rgb", camera_width=64, camera_height=64,
                     start_pose=(0.3, 0.15, 0.0))
    tri = dataclasses.replace(base, mesh_fidelity="triangles")
    s = env_core.reset(base, maps, jax.random.PRNGKey(0))
    img_p = np.asarray(env_core.render_obs(base, maps, s)).astype(int)
    img_t = np.asarray(env_core.render_obs(tri, maps, s)).astype(int)
    diff = np.abs(img_p - img_t)
    assert diff.mean() > 0.5, "triangle pass must change the image"
    # the pyramid roof (red Kd) must be visible in the triangle render
    red = (img_t[:, :, 0] > 90) & (img_t[:, :, 0] > 1.5 * img_t[:, :, 1]) \
        & (img_t[:, :, 0] > 1.5 * img_t[:, :, 2])
    assert red.sum() > 3, red.sum()


@pytest.mark.slow
def test_triangle_fidelity_fused_matches_xla(tmp_path):
    """Triangle-fidelity objects render on the FUSED path too (decimated
    Moeller-Trumbore baked into the blob kernel, KERNEL_TRI_BUDGET): the
    sample mesh has 5 triangles <= the 8-tri budget, so the fused and
    XLA triangle passes see identical geometry and must agree to the
    usual kernel tolerance."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from dtown import env as env_core, map_loader
    from dtown.ops.fused_env import pack_blob
    from dtown.render.blob_raster import (
        build_render_plan, render_frames_from_blob,
    )
    from dtown.render.objmesh import register_custom_object
    from dtown.render.pallas_raster import planes_to_nhwc
    from dtown.types import EnvConfig

    register_custom_object("duckhouse", _write_sample(tmp_path))
    data = {
        "tiles": [["straight/W", "straight/W", "straight/W"]],
        "objects": [
            {"kind": "duckhouse", "pos": [1.0, 0.3], "rotate": 90,
             "height": 0.1, "static": True},
        ],
        "tile_size": 0.585,
    }
    maps = map_loader.compile_map(data)
    cfg = EnvConfig(obs_type="rgb", camera_width=64, camera_height=64,
                    start_pose=(0.3, 0.15, 0.0),
                    mesh_fidelity="triangles", auto_reset=False)
    plan = build_render_plan(cfg, maps)
    assert plan is not None
    assert any(p.get("is_tri") for ob in plan["objs"]
               for p in ob["prims"])
    keys = jax.random.split(jax.random.PRNGKey(6), 8)
    idx = jnp.zeros((8,), jnp.int32)
    states = jax.vmap(lambda k, i: env_core.reset(cfg, maps, k, i))(
        keys, idx
    )
    blob = pack_blob(states, maps)
    planes = render_frames_from_blob(cfg, maps, blob, plan,
                                     interpret=True)
    img_b = np.asarray(planes_to_nhwc(cfg, planes)).astype(int)
    img_x = np.asarray(
        jax.vmap(lambda s: env_core.render_obs(cfg, maps, s))(states)
    ).astype(int)
    diff = np.abs(img_b - img_x)
    assert diff.mean() < 2.0, diff.mean()
    assert (diff > 10).mean() < 0.03

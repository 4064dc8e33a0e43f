"""OBJ mesh loader (reference: objmesh.py::ObjMesh parity)."""
import numpy as np


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

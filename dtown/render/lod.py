"""Size-aware primitive LOD culling, shared by every renderer.

The reference draws each object's full mesh at any distance; its only
distance control is the scene graph frustum (SURVEY §2.6/§3.3). At RL
resolutions most detail primitives (duckie eyes/beak, sign poles,
traffic-light lamps) are sub-pixel beyond 1-3 m, yet the fused object
pass is measured LINEAR at ~0.118 ms/prim (STATUS r4 roofline) — so
every invisible prim costs exactly what a visible one does.

This module defines the single source of truth for the cull geometry so
the XLA reference renderer (raster.py), the fused blob kernel
(blob_raster.py) and the row-fed kernel (pallas_raster.py) agree:

    cull_dist(prim) = min(cfg.obj_cull_dist,
                          r_model * scale / tan(q * fov_y / H))

with q = cfg.obj_lod_px (the pixel count the prim's bounding RADIUS may
subtend before it is dropped; 0 disables LOD and every prim keeps the
blanket obj_cull_dist). r_model is the prim's own half-extent radius
(box: |half_extents|, sphere: radius) — NOT its offset from the object
origin: a small prim far from the origin is still small on screen, and
its camera distance is within r_bound of the object distance, which the
threshold's conservatism absorbs.

The angular threshold uses the NOMINAL vertical fov (constants
CAMERA_FOV_Y) even under domain randomization — the table must be a
compile-time constant, and the DR fov jitter is only a few degrees.

Triangle-fidelity prims (mesh_fidelity="triangles") are EXEMPT: the tri
pass is bit-exactness-tested between renderers at differing triangle
budgets, and custom OBJ objects are rare; they keep the blanket cull.

Adoption gate (r5): pixel diff vs lod off, measured by
scripts/lod_probe.py over random reset states — mean |diff| < 1 and
frac(|diff| > 10) < 1% at the default q.
"""
from __future__ import annotations

import math

import numpy as np

from dtown import constants as C


def lod_tan(cfg) -> float:
    """tan of the angular cull threshold; 0.0 when LOD is disabled."""
    q = float(getattr(cfg, "obj_lod_px", 0.0) or 0.0)
    if q <= 0.0:
        return 0.0
    return math.tan(q * math.radians(float(C.CAMERA_FOV_Y))
                    / float(cfg.camera_height))


def prim_radii() -> np.ndarray:
    """[n_kinds, P_MAX] model-space bounding radius of each prim-soup
    primitive (0 where the prim slot is unused)."""
    from dtown.render import meshes as meshlib

    t = meshlib.prim_tables()
    Kn, P = t["mask"].shape
    r = np.zeros((Kn, P), dtype=np.float64)
    for k in range(Kn):
        for p in range(P):
            if not t["mask"][k, p]:
                continue
            if int(t["type"][k, p]) == meshlib.BOX:
                r[k, p] = float(np.linalg.norm(t["param"][k, p]))
            else:
                r[k, p] = float(t["param"][k, p][0])
    return r


def prim_culld_base(cfg) -> np.ndarray:
    """[n_kinds, P_MAX] f32 base cull distances (model units — multiply
    by the object scale for world distance, then clamp by
    cfg.obj_cull_dist). +inf where LOD is off or the slot is unused
    (unused slots never hit anyway; inf keeps min() semantics clean)."""
    tq = lod_tan(cfg)
    if tq <= 0.0:
        from dtown.render import meshes as meshlib

        shape = meshlib.prim_tables()["mask"].shape
        return np.full(shape, np.inf, dtype=np.float32)
    r = prim_radii()
    with np.errstate(divide="ignore"):
        base = np.where(r > 0.0, r / tq, np.inf)
    return base.astype(np.float32)


def kind_culld_max(cfg) -> np.ndarray:
    """[n_kinds] f32 max base cull distance over a kind's prims — the
    distance beyond which the WHOLE object is invisible (object-level
    `active` tightening in the XLA / row-fed renderers). +inf when LOD
    is off."""
    base = prim_culld_base(cfg)
    from dtown.render import meshes as meshlib

    mask = meshlib.prim_tables()["mask"]
    b = np.where(mask, base, 0.0)
    out = b.max(axis=1)
    return np.where(out > 0.0, out, np.inf).astype(np.float32)


def prim_culld(cfg, kind: int, p: int, scale: float) -> float:
    """Effective world-space cull distance of one baked prim (python
    float for the fused plan): min(obj_cull_dist, base * scale)."""
    base = float(prim_culld_base(cfg)[kind, p])
    return min(float(cfg.obj_cull_dist), base * float(scale))

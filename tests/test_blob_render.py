"""Blob-fed fused render kernel vs the XLA reference renderer.

The blob renderer (render/blob_raster.py) computes camera basis, tile
lookup, object transforms, culling and traffic-light phase in-kernel from
the state blob; it must agree with the XLA ray-caster on the same poses.
Runs in interpret mode on the CPU test backend.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dtown import env as env_core, map_loader
from dtown.ops.fused_env import pack_blob
from dtown.render.blob_raster import (
    build_render_plan, render_frames_from_blob,
)
from dtown.render.pallas_raster import planes_to_nhwc
from dtown.types import EnvConfig


@pytest.mark.parametrize(
    "map_name",
    ["loop_obstacles", "small_loop", "4way", "loop_pedestrians",
     "bigtown"],
)
def test_blob_render_matches_xla(map_name):
    cfg = EnvConfig(obs_type="rgb", camera_width=64, camera_height=64,
                    auto_reset=False)
    maps = map_loader.load_map(map_name)
    plan = build_render_plan(cfg, maps)
    assert plan is not None, "single-map scenes must be blob-render eligible"
    keys = jax.random.split(jax.random.PRNGKey(1), 8)
    idx = jnp.zeros((8,), jnp.int32)
    states = jax.vmap(lambda k, i: env_core.reset(cfg, maps, k, i))(keys, idx)
    blob = pack_blob(states, maps)

    planes = render_frames_from_blob(cfg, maps, blob, plan, interpret=True)
    img_b = np.asarray(planes_to_nhwc(cfg, planes)).astype(int)
    img_x = np.asarray(
        jax.vmap(lambda s: env_core.render_obs(cfg, maps, s))(states)
    ).astype(int)
    diff = np.abs(img_b - img_x)
    # identical up to the arc-dash phase approximation, the cheapened
    # (mathematically equivalent) shading formulation and rounding
    assert diff.mean() < 2.0, diff.mean()
    assert (diff > 10).mean() < 0.03


def test_packed_ground_matches_float_path(monkeypatch):
    """The packed-u8 ground path (r4 diet: colors x brightness x shade
    folded to packed int constants, achromatic-noise packed add, baked
    sky plane, ground riding the pk_ carry) must agree with the float
    reference path to quantization: each side rounds color and noise
    independently, so <= ~2 u8 counts per channel, no structural
    drift."""
    cfg = EnvConfig(obs_type="rgb", camera_width=64, camera_height=64,
                    auto_reset=False)
    maps = map_loader.load_map("loop_obstacles")
    plan = build_render_plan(cfg, maps)
    keys = jax.random.split(jax.random.PRNGKey(5), 8)
    idx = jnp.zeros((8,), jnp.int32)
    states = jax.vmap(lambda k, i: env_core.reset(cfg, maps, k, i))(keys,
                                                                    idx)
    blob = pack_blob(states, maps)
    monkeypatch.setenv("DTOWN_PACKED_GROUND", "1")
    f1 = np.asarray(render_frames_from_blob(cfg, maps, blob, plan,
                                            interpret=True)).astype(int)
    monkeypatch.setenv("DTOWN_PACKED_GROUND", "0")
    f0 = np.asarray(render_frames_from_blob(cfg, maps, blob, plan,
                                            interpret=True)).astype(int)
    diff = np.abs(f1 - f0)
    assert diff.max() <= 3, diff.max()
    assert diff.mean() < 0.5, diff.mean()


def test_gray_dr_luma_direct_matches_xla():
    """The DR grayscale luma-direct ground path (r4: luma constants
    selected directly, no RGB materialization) must match the XLA
    renderer's rgb->luma within quantization."""
    cfg = EnvConfig(obs_type="rgb", camera_width=64, camera_height=64,
                    grayscale=True, domain_rand=True, auto_reset=False)
    maps = map_loader.load_map("udem1")
    plan = build_render_plan(cfg, maps)
    keys = jax.random.split(jax.random.PRNGKey(3), 8)
    idx = jnp.zeros((8,), jnp.int32)
    states = jax.vmap(lambda k, i: env_core.reset(cfg, maps, k, i))(keys,
                                                                    idx)
    blob = pack_blob(states, maps, True)
    planes = render_frames_from_blob(cfg, maps, blob, plan,
                                     interpret=True)
    img_b = np.asarray(planes_to_nhwc(cfg, planes)).astype(int)
    img_x = np.asarray(
        jax.vmap(lambda s: env_core.render_obs(cfg, maps, s))(states)
    ).astype(int)
    diff = np.abs(img_b - img_x)
    assert diff.mean() < 2.0, diff.mean()
    assert (diff > 10).mean() < 0.03


@pytest.mark.parametrize("map_name", ["udem1", "loop_pedestrians",
                                      "bigtown"])
def test_cluster_predication_matches_straightline(map_name, monkeypatch):
    """DTOWN_RENDER_CLUSTER must not change the rendering: the cluster
    visibility test (cull range + view half-plane) is conservative, so
    on/off differ only by FMA-reassociation pixel flips at prim
    silhouettes (lax.cond branches contract mul+add differently)."""
    cfg = EnvConfig(obs_type="rgb", camera_width=64, camera_height=64,
                    auto_reset=False)
    maps = map_loader.load_map(map_name)
    plan = build_render_plan(cfg, maps)
    keys = jax.random.split(jax.random.PRNGKey(5), 16)
    idx = jnp.zeros((16,), jnp.int32)
    states = jax.vmap(lambda k, i: env_core.reset(cfg, maps, k, i))(keys, idx)
    blob = pack_blob(states, maps)

    # an ambient DTOWN_RENDER_PRED=1 would zero cluster_sz and make the
    # comparison vacuous (two identical pred-path renders)
    monkeypatch.delenv("DTOWN_RENDER_PRED", raising=False)
    monkeypatch.delenv("DTOWN_RENDER_CLUSTER", raising=False)
    f0 = np.asarray(
        render_frames_from_blob(cfg, maps, blob, plan, interpret=True)
    ).astype(int)
    monkeypatch.setenv("DTOWN_RENDER_CLUSTER", "4")
    f1 = np.asarray(
        render_frames_from_blob(cfg, maps, blob, plan, interpret=True)
    ).astype(int)
    diff = np.abs(f0 - f1)
    # a cull miss erases whole object regions; ulp flips touch isolated
    # silhouette pixels only
    assert (diff > 1).mean() < 1e-4, (diff > 1).mean()
    assert (diff > 0).mean() < 1e-3, (diff > 0).mean()


def test_stack_map_clusters_match_straightline(monkeypatch):
    """Stacked maps default to per-map cluster predication (the map-id
    gate is exact); forcing it off must render identically up to
    cond-boundary FMA reassociation flips."""
    cfg = EnvConfig(obs_type="rgb", camera_width=64, camera_height=64,
                    auto_reset=False)
    # two maps keep interpret-mode cost bounded; udem1 supplies the tall
    # cross-map objects that exposed the finite-fold sky bleed
    maps = map_loader.stack_maps(["zigzag_dists", "udem1"])
    plan = build_render_plan(cfg, maps)
    assert plan is not None and plan.get("cluster", 0) > 0
    keys = jax.random.split(jax.random.PRNGKey(9), 8)
    idx = jnp.arange(8, dtype=jnp.int32) % 2
    states = jax.vmap(lambda k, i: env_core.reset(cfg, maps, k, i))(keys, idx)
    blob = pack_blob(states, maps)

    monkeypatch.delenv("DTOWN_RENDER_PRED", raising=False)
    monkeypatch.setenv("DTOWN_RENDER_CLUSTER", "0")
    f0 = np.asarray(
        render_frames_from_blob(cfg, maps, blob, plan, interpret=True)
    ).astype(int)
    monkeypatch.delenv("DTOWN_RENDER_CLUSTER", raising=False)
    f1 = np.asarray(
        render_frames_from_blob(cfg, maps, blob, plan, interpret=True)
    ).astype(int)
    diff = np.abs(f0 - f1)
    assert (diff > 1).mean() < 1e-4, (diff > 1).mean()
    assert (diff > 0).mean() < 1e-3, (diff > 0).mean()


def test_blob_render_ineligible_cases():
    # a 3x-udem1 stack (45 objects) is eligible now that the straight-
    # line budget is per map (map-gated cluster predication); beyond the
    # 48-object TOTAL program-size budget falls to the top-K path
    stacked3 = map_loader.stack_maps(["udem1", "udem1", "udem1"])
    assert build_render_plan(EnvConfig(obs_type="rgb"), stacked3) is not None
    stacked4 = map_loader.stack_maps(["udem1"] * 4)
    assert build_render_plan(EnvConfig(obs_type="rgb"), stacked4) is None
    # 25..48 objects on a single map: eligible with spatial cluster
    # predication (bigtown, 32 objects)
    plan = build_render_plan(EnvConfig(obs_type="rgb"),
                             map_loader.load_map("bigtown"))
    assert plan is not None and plan["cluster"] == 2


def test_stack_with_clustered_member_matches_xla():
    """A stack containing a >24-object (spatially clustered) member map
    keeps the finer cluster granularity (map-gated AND geometric) and
    still matches the XLA renderer."""
    cfg = EnvConfig(obs_type="rgb", camera_width=64, camera_height=64,
                    auto_reset=False)
    maps = map_loader.stack_maps(["bigtown", "small_loop"])
    plan = build_render_plan(cfg, maps)
    assert plan is not None and plan["cluster"] == 2
    assert sum(len(o["prims"]) for o in plan["objs"]) > 60
    keys = jax.random.split(jax.random.PRNGKey(7), 8)
    idx = jnp.arange(8, dtype=jnp.int32) % 2
    states = jax.vmap(lambda k, i: env_core.reset(cfg, maps, k, i))(keys, idx)
    blob = pack_blob(states, maps)
    planes = render_frames_from_blob(cfg, maps, blob, plan, interpret=True)
    img_b = np.asarray(planes_to_nhwc(cfg, planes)).astype(int)
    img_x = np.asarray(
        jax.vmap(lambda s: env_core.render_obs(cfg, maps, s))(states)
    ).astype(int)
    diff = np.abs(img_b - img_x)
    assert diff.mean() < 2.0, diff.mean()
    assert (diff > 10).mean() < 0.03


def test_fused_distortion_blob_path():
    """Fisheye distortion (baked into the kernel ray table) changes the
    fused observation stream."""
    from dtown.ops.fused_env import make_fused_rollout

    cfg = EnvConfig(obs_type="rgb", camera_width=64, camera_height=64,
                    distortion=True)
    maps = map_loader.load_map("small_loop")
    B = 8
    init_blob, fused_step, _ = make_fused_rollout(cfg, maps, B)
    blob, states = init_blob(jax.random.PRNGKey(0))
    actions = jnp.zeros((B, 2), jnp.float32)
    blob2, out, obs = jax.jit(fused_step)(blob, states, actions)
    assert obs.dtype == jnp.uint8
    # distorted output must differ from the undistorted render
    cfg0 = EnvConfig(obs_type="rgb", camera_width=64, camera_height=64)
    init0, step0, _ = make_fused_rollout(cfg0, maps, B)
    blob0, states0 = init0(jax.random.PRNGKey(0))
    blob02, out0, obs0 = jax.jit(step0)(blob0, states0, actions)
    assert np.abs(np.asarray(obs).astype(int)
                  - np.asarray(obs0).astype(int)).mean() > 1.0


@pytest.mark.parametrize("grayscale", [False, True])
def test_blob_render_fisheye_matches_xla(grayscale):
    """Ray-level fisheye: the blob kernel's baked NDC table must agree
    with the XLA renderer's (both sample the identical distorted rays —
    same tolerance as the undistorted equivalence test). grayscale=True
    also pins the C=1 path that crashed the legacy post-render warp."""
    cfg = EnvConfig(obs_type="rgb", camera_width=64, camera_height=64,
                    distortion=True, grayscale=grayscale,
                    auto_reset=False)
    maps = map_loader.load_map("loop_obstacles")
    plan = build_render_plan(cfg, maps)
    assert plan is not None
    keys = jax.random.split(jax.random.PRNGKey(3), 8)
    idx = jnp.zeros((8,), jnp.int32)
    states = jax.vmap(lambda k, i: env_core.reset(cfg, maps, k, i))(keys, idx)
    blob = pack_blob(states, maps)

    planes = render_frames_from_blob(cfg, maps, blob, plan, interpret=True)
    img_b = np.asarray(planes_to_nhwc(cfg, planes)).astype(int)
    img_x = np.asarray(
        jax.vmap(lambda s: env_core.render_obs(cfg, maps, s))(states)
    ).astype(int)
    diff = np.abs(img_b - img_x)
    assert diff.mean() < 2.0, diff.mean()
    assert (diff > 10).mean() < 0.03


def test_fused_step_uses_blob_renderer():
    from dtown.ops.fused_env import make_fused_rollout

    cfg = EnvConfig(obs_type="rgb", camera_width=64, camera_height=64)
    maps = map_loader.load_map("loop_obstacles")
    B = 8
    init_blob, fused_step, _ = make_fused_rollout(cfg, maps, B)
    blob, states = init_blob(jax.random.PRNGKey(0))
    actions = jnp.tile(jnp.array([0.4, 0.1], jnp.float32), (B, 1))
    blob2, out, obs = jax.jit(fused_step)(blob, states, actions)
    assert obs.shape == (B, 3, 64 * 64 // 128, 128)
    assert obs.dtype == jnp.uint8
    img = np.asarray(planes_to_nhwc(cfg, obs))
    assert img.std() > 5.0
    # frames must track the post-step pose: compare against the XLA
    # renderer on the unpacked post-step states
    from dtown.ops.fused_env import update_states_from_blob

    st2 = update_states_from_blob(states, blob2)
    img_x = np.asarray(
        jax.vmap(lambda s: env_core.render_obs(cfg, maps, s))(st2)
    ).astype(int)
    diff = np.abs(img.astype(int) - img_x)
    assert diff.mean() < 2.0


def test_blob_render_grayscale():
    """cfg.grayscale renders a single in-kernel luma plane matching the
    XLA grayscale path."""
    cfg = EnvConfig(obs_type="rgb", camera_width=64, camera_height=64,
                    grayscale=True, auto_reset=False)
    maps = map_loader.load_map("small_loop")
    plan = build_render_plan(cfg, maps)
    keys = jax.random.split(jax.random.PRNGKey(6), 8)
    idx = jnp.zeros((8,), jnp.int32)
    states = jax.vmap(lambda k, i: env_core.reset(cfg, maps, k, i))(keys, idx)
    blob = pack_blob(states, maps)
    planes = render_frames_from_blob(cfg, maps, blob, plan, interpret=True)
    assert planes.shape == (8, 1, 64 * 64 // 128, 128)
    img_b = np.asarray(planes_to_nhwc(cfg, planes)).astype(int)
    img_x = np.asarray(
        jax.vmap(lambda s: env_core.render_obs(cfg, maps, s))(states)
    ).astype(int)
    assert img_x.shape == img_b.shape == (8, 64, 64, 1)
    assert np.abs(img_b - img_x).mean() < 2.0


def test_blob_render_row_tiled():
    """Resolutions with S > 256 sublane rows split the frame over a
    second grid dimension (VMEM-bounded path to the reference's native
    640x480); the tiled result must match the XLA renderer like any
    other shape."""
    cfg = EnvConfig(obs_type="rgb", camera_width=256, camera_height=192,
                    auto_reset=False)
    maps = map_loader.load_map("small_loop")
    plan = build_render_plan(cfg, maps)
    assert plan is not None
    S = 256 * 192 // 128
    assert S > 256  # actually exercises the tiled path
    keys = jax.random.split(jax.random.PRNGKey(9), 8)
    idx = jnp.zeros((8,), jnp.int32)
    states = jax.vmap(lambda k, i: env_core.reset(cfg, maps, k, i))(keys, idx)
    blob = pack_blob(states, maps)
    planes = render_frames_from_blob(cfg, maps, blob, plan, interpret=True)
    assert planes.shape == (8, 3, S, 128)
    img_b = np.asarray(planes_to_nhwc(cfg, planes)).astype(int)
    img_x = np.asarray(
        jax.vmap(lambda s: env_core.render_obs(cfg, maps, s))(states)
    ).astype(int)
    assert np.abs(img_b - img_x).mean() < 2.0


def test_culled_object_never_wins_sky_pixels():
    """Single-map regression for the finite t-scale fold: an object
    beyond obj_cull_dist whose geometry rises above the horizon must NOT
    be painted into sky pixels (its gated t_w used to be t_m * 1e30,
    which still beat the 1e30 sky init whenever model t < 1)."""
    data = dict(
        tile_size=0.585,
        tiles=[["straight/W"] * 12],
        objects=[
            # tall building ~6 m east of the spawn tile, past the 4 m cull
            dict(kind="building", pos=[10.5, 0.5], rotate=0, scale=3.0),
        ],
    )
    maps = map_loader.compile_map(data)
    cfg = EnvConfig(obs_type="rgb", camera_width=64, camera_height=64,
                    auto_reset=False,
                    start_pose=(0.5 * 0.585, 0.5 * 0.585, 0.0))
    plan = build_render_plan(cfg, maps)
    assert plan is not None and plan["objs"]
    keys = jax.random.split(jax.random.PRNGKey(0), 8)
    idx = jnp.zeros((8,), jnp.int32)
    states = jax.vmap(lambda k, i: env_core.reset(cfg, maps, k, i))(keys, idx)
    blob = pack_blob(states, maps)
    planes = render_frames_from_blob(cfg, maps, blob, plan, interpret=True)
    img = np.asarray(planes_to_nhwc(cfg, planes))
    # facing east (+x) toward the culled building: the sky band must be
    # the horizon color (blue-ish: b > r), not building grey
    sky = img[:, :3, :, :].astype(int)  # top rows, all envs
    assert (sky[..., 2] > sky[..., 0]).mean() > 0.99, "sky is not sky-colored"


def test_build_clusters_partition_properties():
    """_build_clusters must partition the object list exactly (every
    object in exactly one group), never mix map ids within a group, and
    keep moving NPCs as singletons."""
    from dtown.render.blob_raster import _build_clusters

    objs = []
    for i in range(11):
        objs.append(dict(pos=(i * 0.7, 0.0, (i * 13 % 7) * 0.5),
                         npc_idx=None, map=i % 3, prims=[], scale=1.0))
    objs.append(dict(pos=(1.0, 0.0, 1.0), npc_idx=0, map=1, prims=[],
                     scale=1.0))
    objs.append(dict(pos=(2.0, 0.0, 2.0), npc_idx=1, map=2, prims=[],
                     scale=1.0))
    for max_per in (1, 2, 4, 16):
        groups = _build_clusters(objs, max_per)
        flat = [id(o) for g in groups for o in g]
        assert sorted(flat) == sorted(id(o) for o in objs)
        for g in groups:
            assert len({o["map"] for o in g}) == 1
            statics = [o for o in g if o["npc_idx"] is None]
            assert len(statics) in (0, len(g))
            if statics:
                assert len(g) <= max_per
            else:
                assert len(g) == 1  # NPC singleton

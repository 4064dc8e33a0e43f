"""Opt-in real-TPU test: the Mosaic-compiled fused rollout must agree
with CPU interpret mode (VERDICT round-1 #4c — CI otherwise never
compares TPU numerics against the interpreted kernels).

Run manually on the TPU machine (NOT under the CPU-pinned conftest):
    DTOWN_TPU_TEST=1 python tests/test_tpu_vs_interpret.py
Writes a verdict line; exits nonzero on mismatch.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def run_rollout(backend_cpu: bool, n_steps=50, B=64,
                map_name="loop_obstacles"):
    import numpy as np

    import jax
    import jax.numpy as jnp

    from dtown import map_loader
    from dtown.ops import state_kernel as sk
    from dtown.ops.fused_env import make_fused_rollout
    from dtown.types import EnvConfig

    cfg = EnvConfig(obs_type="state", auto_reset=True)
    maps = map_loader.load_map(map_name)
    init_blob, fused_step, rollout = make_fused_rollout(cfg, maps, B)
    blob, states = init_blob(jax.random.PRNGKey(0))
    actions = jnp.tile(jnp.array([0.4, 0.1], jnp.float32), (B, 1))
    f = jax.jit(lambda b, a: fused_step(b, states, a))
    outs = []
    for _ in range(n_steps):
        blob, out, obs = f(blob, actions)
        outs.append((np.asarray(out.reward), np.asarray(out.done)))
    return np.asarray(blob), outs


def run_nav_rollout(n_steps=10, B=64, map_name="small_loop"):
    """Fused Nav rollout (in-kernel goal bonus/done/redraw) — the nav
    table gather mirrors the proven spawn-bank one-hot matmul, but this
    is its first Mosaic build (the CI suite runs it in interpret only).
    On CPU this runs interpret mode; on TPU the real Mosaic kernel."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from dtown import map_loader
    from dtown.ops.fused_env import make_fused_nav_rollout, template_states
    from dtown.types import EnvConfig

    cfg = EnvConfig(obs_type="state", auto_reset=True)
    maps = map_loader.load_map(map_name)
    init_blob, fused_step = make_fused_nav_rollout(cfg, maps, B)
    blob, _ = init_blob(jax.random.PRNGKey(3))
    tmpl = template_states(cfg, maps, B)
    actions = jnp.tile(jnp.array([0.5, 0.2], jnp.float32), (B, 1))
    f = jax.jit(lambda b, a: fused_step(b, tmpl, a))
    rews, dones = [], []
    for _ in range(n_steps):
        blob, out, obs = f(blob, actions)
        rews.append(np.asarray(out.reward))
        dones.append(np.asarray(out.done))
    return np.asarray(rews), np.asarray(dones)


def run_render(interpret: bool, map_name="loop_obstacles", B=64,
               **cfg_kw):
    """Render B deterministic poses through the blob kernel.

    Exercises the WORLD-SPACE sphere path's NaN-propagation miss
    handling and the packed-color carry on the real Mosaic build —
    sqrt(negative) must produce a NaN whose comparisons are false, or
    every sphere miss would paint the frame (CPU interpret cannot see
    that class of bug)."""
    import numpy as np

    import jax

    from dtown import env as env_core, map_loader
    from dtown.ops.fused_env import pack_blob
    from dtown.render.blob_raster import (
        build_render_plan, render_frames_from_blob,
    )
    from dtown.types import EnvConfig

    w = cfg_kw.pop("camera_width", 64)
    h = cfg_kw.pop("camera_height", 64)
    cfg = EnvConfig(obs_type="rgb", camera_width=w, camera_height=h,
                    auto_reset=False, **cfg_kw)
    maps = map_loader.load_map(map_name)
    plan = build_render_plan(cfg, maps)
    keys = jax.random.split(jax.random.PRNGKey(11), B)
    states = jax.vmap(lambda k: env_core.reset(cfg, maps, k))(keys)
    blob = pack_blob(states, maps)
    return np.asarray(
        render_frames_from_blob(cfg, maps, blob, plan,
                                interpret=interpret)
    )


def _write_tri_sample():
    """Tiny OBJ/MTL mesh for the fused triangle path's Mosaic build."""
    obj = """mtllib dtown_tri_sample.mtl
v 0 0 0.2
v 0.4 0 0.2
v 0.4 0.3 0.2
v 0 0.3 0.2
v 0 0 -0.2
v 0.4 0 -0.2
v 0.4 0.3 -0.2
v 0 0.3 -0.2
v 0.2 0.55 0
usemtl wall
f 1 2 3 4
f 5 6 7 8
usemtl roof
f 3 4 9
"""
    mtl = """newmtl wall
Kd 0.7 0.7 0.65
newmtl roof
Kd 0.85 0.1 0.1
"""
    with open("/tmp/dtown_tri_sample.obj", "w") as f:
        f.write(obj)
    with open("/tmp/dtown_tri_sample.mtl", "w") as f:
        f.write(mtl)
    return "/tmp/dtown_tri_sample.obj"


def run_render_tri(interpret: bool, B=16):
    """Triangle-fidelity custom object through the blob kernel — the
    decimated Moeller-Trumbore pass's first Mosaic build (guarded
    inv_det division, scalar tvec/qvec chains)."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from dtown import env as env_core, map_loader
    from dtown.ops.fused_env import pack_blob
    from dtown.render.blob_raster import (
        build_render_plan, render_frames_from_blob,
    )
    from dtown.render.objmesh import register_custom_object
    from dtown.types import EnvConfig

    register_custom_object("tpu_tri_house", _write_tri_sample())
    maps = map_loader.compile_map({
        "tiles": [["straight/W", "straight/W", "straight/W"]],
        "objects": [{"kind": "tpu_tri_house", "pos": [1.0, 0.3],
                     "rotate": 90, "height": 0.1, "static": True}],
        "tile_size": 0.585,
    })
    cfg = EnvConfig(obs_type="rgb", camera_width=64, camera_height=64,
                    start_pose=(0.3, 0.15, 0.0),
                    mesh_fidelity="triangles", auto_reset=False)
    plan = build_render_plan(cfg, maps)
    keys = jax.random.split(jax.random.PRNGKey(13), B)
    idx = jnp.zeros((B,), jnp.int32)
    states = jax.vmap(lambda k, i: env_core.reset(cfg, maps, k, i))(
        keys, idx
    )
    blob = pack_blob(states, maps)
    return np.asarray(
        render_frames_from_blob(cfg, maps, blob, plan,
                                interpret=interpret)
    )


# round-3 render cases beyond the plain ones: baked-ray-table fisheye
# and the >24-object clustered plan (bigtown)
R3_RENDER_CASES = (
    ("loop_obstacles", {"distortion": True}, "fisheye"),
    ("bigtown", {}, "bigtown"),
    # r4: moving NPCs x cluster predication at town scale — the only
    # config combining blob NPC pose reads with per-cluster lax.cond
    ("bigtown_pedestrians", {}, "bigtown_peds"),
    ("town_dyn_duckiebots", {}, "town_dyn"),
    # r4: the reference's NATIVE resolution through the row-tiled path
    # (s_blk=32 after the vreg sweep) — hardware parity at 640x480 was
    # previously only asserted at CPU-testable shapes
    ("loop_obstacles",
     {"camera_width": 640, "camera_height": 480, "B": 8}, "native_res"),
)


def main():
    import subprocess

    import numpy as np

    # child runs: TPU in THIS process, CPU interpret in a subprocess
    nav_only = os.environ.get("DTOWN_TPU_NAV_ONLY") == "1"
    r3_only = os.environ.get("DTOWN_TPU_R3_ONLY") == "1"
    if os.environ.get("DTOWN_TPU_CHILD") == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
        if r3_only:
            for m, kw, tag in R3_RENDER_CASES:
                np.save(f"/tmp/dtown_interp_frames_{tag}.npy",
                        run_render(True, m, **kw))
            np.save("/tmp/dtown_interp_frames_tri.npy",
                    run_render_tri(True))
            return
        rew_n, done_n = run_nav_rollout()
        np.save("/tmp/dtown_interp_nav_rew.npy", rew_n)
        np.save("/tmp/dtown_interp_nav_done.npy", done_n)
        if nav_only:
            return
        blob, outs = run_rollout(True)
        np.save("/tmp/dtown_interp_blob.npy", blob)
        np.save("/tmp/dtown_interp_rew.npy",
                np.asarray([r for r, d in outs]))
        np.save("/tmp/dtown_interp_done.npy",
                np.asarray([d for r, d in outs]))
        _, outs_s = run_rollout(True, n_steps=1,
                                map_name="straight_road")
        np.save("/tmp/dtown_interp_rew_straight.npy",
                np.asarray([r for r, d in outs_s]))
        if os.environ.get("DTOWN_TPU_R3_ONLY") != "1":
            for m in ("loop_obstacles", "udem1"):
                np.save(f"/tmp/dtown_interp_frames_{m}.npy",
                        run_render(True, m))
        for m, kw, tag in R3_RENDER_CASES:
            np.save(f"/tmp/dtown_interp_frames_{tag}.npy",
                    run_render(True, m, **kw))
        np.save("/tmp/dtown_interp_frames_tri.npy", run_render_tri(True))
        return

    env = dict(os.environ)
    env["DTOWN_TPU_CHILD"] = "cpu"
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))
    subprocess.run([sys.executable, os.path.abspath(__file__)], env=env,
                   check=True, timeout=1800)

    def compare_r3_renders():
        for m, kw, tag in R3_RENDER_CASES:
            f_t = run_render(False, m, **kw).astype(int)
            f_c = np.load(f"/tmp/dtown_interp_frames_{tag}.npy").astype(int)
            dpx = np.abs(f_t - f_c)
            print(f"render {tag}: mean {dpx.mean():.3f} max {dpx.max()} "
                  f"frac>10 {(dpx > 10).mean():.5f}")
            assert dpx.mean() < 1.0, f"{tag}: Mosaic render diverges"
            assert (dpx > 10).mean() < 0.01, f"{tag}: flipped pixels"
        f_t = run_render_tri(False).astype(int)
        f_c = np.load("/tmp/dtown_interp_frames_tri.npy").astype(int)
        dpx = np.abs(f_t - f_c)
        print(f"render tri: mean {dpx.mean():.3f} max {dpx.max()} "
              f"frac>10 {(dpx > 10).mean():.5f}")
        assert dpx.mean() < 1.0, "tri: Mosaic render diverges"
        assert (dpx > 10).mean() < 0.01, "tri: flipped pixels"

    if r3_only:
        compare_r3_renders()
        print("TPU_VS_INTERPRET (r3 renders only): OK")
        return

    # fused Nav kernel: first Mosaic build (STATUS TPU-queue item 6)
    rew_nt, done_nt = run_nav_rollout()
    rew_nc = np.load("/tmp/dtown_interp_nav_rew.npy")
    done_nc = np.load("/tmp/dtown_interp_nav_done.npy")
    dn = np.abs(rew_nt - rew_nc)
    nav_done_mm = (done_nt != done_nc).mean()
    print(f"nav reward diff: median {np.median(dn):.2e} "
          f"max {dn.max():.2e}; done mismatch {nav_done_mm:.4f}")
    assert np.median(dn) < 1e-4, "nav kernel TPU-vs-interpret gap"
    assert nav_done_mm < 0.01, "nav done divergence"
    if nav_only:
        print("TPU_VS_INTERPRET (nav only): OK")
        return

    blob_t, outs_t = run_rollout(False)
    blob_c = np.load("/tmp/dtown_interp_blob.npy")
    rew_c = np.load("/tmp/dtown_interp_rew.npy")
    done_c = np.load("/tmp/dtown_interp_done.npy")
    rew_t = np.asarray([r for r, d in outs_t])
    done_t = np.asarray([d for r, d in outs_t])

    done_mismatch = (done_t != done_c).mean()
    # HISTORY (r2): a systematic median 3.3e-3 gap here (1.2e-2 on
    # straight_road) was traced to DEFAULT MXU PRECISION rounding the
    # one-hot-gathered curve-table/spawn-bank values to bf16; with
    # precision=HIGHEST on those dot_generals the gap is ulp-level
    # (measured median 1.2e-6, done mismatch 0.0000 over 50 steps).
    d1 = np.abs(rew_t[0] - rew_c[0])
    print(f"step-1 reward diff (loop_obstacles): median "
          f"{np.median(d1):.2e} p90 {np.quantile(d1, 0.9):.2e} "
          f"max {d1.max():.2e}")
    print(f"done mismatch rate over {len(done_t)} steps: "
          f"{done_mismatch:.4f}")
    print(f"mean reward t/c: {rew_t.mean():.4f} / {rew_c.mean():.4f}")
    assert np.median(d1) < 1e-4, "systematic TPU-vs-interpret reward gap"
    assert done_mismatch < 0.005, "TPU vs interpret done divergence"
    assert abs(rew_t.mean() - rew_c.mean()) < 0.1

    # STRAIGHT tiles are the strict probe: the tangent is constant along
    # the curve and dist is a point-to-line distance, both t*-insensitive
    # — any systematic Mosaic numeric bug shows here undamped.
    _, outs_s = run_rollout(False, n_steps=1, map_name="straight_road")
    rew_st = np.asarray([r for r, d in outs_s])
    rew_sc = np.load("/tmp/dtown_interp_rew_straight.npy")
    ds = np.abs(rew_st[0] - rew_sc[0])
    frac_big = (ds > 1e-3).mean()
    print(f"step-1 reward diff (straight_road): median "
          f"{np.median(ds):.2e} max {ds.max():.2e} "
          f"frac>1e-3 {frac_big:.3f}")
    assert np.median(ds) < 1e-4, "systematic TPU-vs-interpret reward gap"
    assert frac_big <= 0.05, f"too many diverging envs: {frac_big}"

    for m in ("loop_obstacles", "udem1"):
        f_t = run_render(False, m).astype(int)
        f_c = np.load(f"/tmp/dtown_interp_frames_{m}.npy").astype(int)
        dpx = np.abs(f_t - f_c)
        print(f"render {m}: mean {dpx.mean():.3f} max {dpx.max()} "
              f"frac>10 {(dpx > 10).mean():.5f}")
        # same algorithm on both sides: only fma/rsqrt-contraction pixel
        # flips at prim silhouettes / dash boundaries are tolerable
        assert dpx.mean() < 1.0, f"{m}: Mosaic render diverges"
        assert (dpx > 10).mean() < 0.01, f"{m}: too many flipped pixels"
    compare_r3_renders()
    print("TPU_VS_INTERPRET: OK")


if __name__ == "__main__":
    if os.environ.get("DTOWN_TPU_TEST") != "1" and \
            os.environ.get("DTOWN_TPU_CHILD") != "cpu":
        print("set DTOWN_TPU_TEST=1 to run (needs the real TPU)")
        sys.exit(0)
    main()

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


def run_rollout(backend_cpu: bool, n_steps=50, B=64):
    import numpy as np

    import jax
    import jax.numpy as jnp

    from dtown import map_loader
    from dtown.ops import state_kernel as sk
    from dtown.ops.fused_env import make_fused_rollout
    from dtown.types import EnvConfig

    cfg = EnvConfig(obs_type="state", auto_reset=True)
    maps = map_loader.load_map("loop_obstacles")
    init_blob, fused_step, rollout = make_fused_rollout(cfg, maps, B)
    blob, states = init_blob(jax.random.PRNGKey(0))
    actions = jnp.tile(jnp.array([0.4, 0.1], jnp.float32), (B, 1))
    f = jax.jit(lambda b, a: fused_step(b, states, a))
    outs = []
    for _ in range(n_steps):
        blob, out, obs = f(blob, actions)
        outs.append((np.asarray(out.reward), np.asarray(out.done)))
    return np.asarray(blob), outs


def main():
    import subprocess

    import numpy as np

    # child runs: TPU in THIS process, CPU interpret in a subprocess
    if os.environ.get("DTOWN_TPU_CHILD") == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
        blob, outs = run_rollout(True)
        np.save("/tmp/dtown_interp_blob.npy", blob)
        np.save("/tmp/dtown_interp_rew.npy",
                np.asarray([r for r, d in outs]))
        np.save("/tmp/dtown_interp_done.npy",
                np.asarray([d for r, d in outs]))
        return

    env = dict(os.environ)
    env["DTOWN_TPU_CHILD"] = "cpu"
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))
    subprocess.run([sys.executable, os.path.abspath(__file__)], env=env,
                   check=True, timeout=1800)

    blob_t, outs_t = run_rollout(False)
    blob_c = np.load("/tmp/dtown_interp_blob.npy")
    rew_c = np.load("/tmp/dtown_interp_rew.npy")
    done_c = np.load("/tmp/dtown_interp_done.npy")
    rew_t = np.asarray([r for r, d in outs_t])
    done_t = np.asarray([d for r, d in outs_t])

    done_mismatch = (done_t != done_c).mean()
    # Step 1 starts from an identical blob: any gap here is a real
    # Mosaic-vs-interpret numeric divergence. Later steps accumulate f32
    # ulp differences chaotically (bisection branch flips, SAT
    # boundaries), so the long horizon is held to statistical agreement.
    d1 = np.abs(rew_t[0] - rew_c[0])
    frac_big = (d1 > 1e-3).mean()
    print(f"step-1 reward diff: median {np.median(d1):.2e} "
          f"p90 {np.quantile(d1, 0.9):.2e} max {d1.max():.2e} "
          f"frac>1e-3 {frac_big:.3f}")
    print(f"done mismatch rate over {len(done_t)} steps: "
          f"{done_mismatch:.4f}")
    print(f"mean reward t/c: {rew_t.mean():.4f} / {rew_c.mean():.4f}")
    # The bezier bisection takes a branch per iteration on a float
    # compare; near-ties flip between the Mosaic and interpret builds
    # (fma/rsqrt contraction), moving lane_dist by the interval
    # resolution for THAT env. The bulk of envs must agree tightly; a
    # small fraction of tie-flips is inherent to f32 branchy code.
    assert np.median(d1) < 1e-4, "systematic TPU-vs-interpret reward gap"
    assert frac_big <= 0.1, f"too many diverging envs: {frac_big}"
    assert done_mismatch < 0.01, "TPU vs interpret done divergence"
    assert abs(rew_t.mean() - rew_c.mean()) < 0.5
    print("TPU_VS_INTERPRET: OK")


if __name__ == "__main__":
    if os.environ.get("DTOWN_TPU_TEST") != "1" and \
            os.environ.get("DTOWN_TPU_CHILD") != "cpu":
        print("set DTOWN_TPU_TEST=1 to run (needs the real TPU)")
        sys.exit(0)
    main()

"""End-to-end golden-trajectory parity — BASELINE.md config 1.

straight_road, state obs, fixed start pose, fixed action sequence: the
full step chain (wheel model -> integration -> lane position -> reward)
must match the numpy float64 oracle (tests/reference_impl.py, which
implements the equations recorded in SURVEY.md §3.2) step for step.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dtown import constants as C
from dtown import env as env_core, map_loader
from dtown.types import EnvConfig

import reference_impl as ref


def test_full_step_chain_parity_straight_road():
    maps = map_loader.load_map("straight_road")
    cfg = EnvConfig(obs_type="state", auto_reset=False)

    # fixed start pose on the road (row j=1), heading +x
    start_pos = np.array([0.8, 0.0, 1.5 * float(maps.tile_size)])
    start_angle = 0.05

    state = env_core.reset(cfg, maps, jax.random.PRNGKey(0))
    state = state.replace(
        pos=jnp.asarray(start_pos, jnp.float32),
        angle=jnp.float32(start_angle),
    )
    step = jax.jit(lambda s, a: env_core.step(cfg, maps, s, a))

    rng = np.random.default_rng(11)
    actions = rng.uniform(-0.6, 0.6, size=(120, 2))
    actions[:, 0] = np.abs(actions[:, 0]) * 0.5 + 0.1  # keep moving forward

    # oracle state
    rp, ra = start_pos.copy(), start_angle
    curves_np = np.asarray(maps.curves, dtype=np.float64)
    cmask_np = np.asarray(maps.curve_mask)
    ts = float(maps.tile_size)

    for t, act in enumerate(actions):
        state, out = step(state, jnp.asarray(act, jnp.float32))

        wheels = ref.wheel_model(act)
        wheels = np.clip(wheels, -1, 1)
        rp, ra, speed = ref.physics_substep(rp, ra, wheels, 1.0 / 30)

        if bool(out.done):
            break

        np.testing.assert_allclose(
            np.asarray(state.pos), rp, atol=5e-4,
            err_msg=f"pos diverged at step {t}",
        )
        # oracle lane position on the tile under pos
        i = int(rp[0] // ts)
        j = int(rp[2] // ts)
        tile_curves = curves_np[j, i][cmask_np[j, i]]
        dist, dot_dir, ang_deg = ref.lane_pos(tile_curves, rp, ra)
        assert float(out.lane_dist) == pytest.approx(dist, abs=2e-4), t
        assert float(out.lane_dot_dir) == pytest.approx(dot_dir, abs=2e-4), t
        assert float(out.lane_angle_deg) == pytest.approx(ang_deg, abs=0.05), t

        reward_ref = ref.compute_reward(speed, dot_dir, dist, 0.0, True)
        assert float(out.reward) == pytest.approx(reward_ref, abs=5e-3), t

    assert t > 40, "trajectory ended too early to be meaningful"

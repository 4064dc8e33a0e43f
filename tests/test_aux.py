"""Aux subsystems: checkpoint round-trip, nav task, profiling."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.mark.slow
def test_checkpoint_roundtrip(tmp_path):
    from dtown import env as env_core, map_loader
    from dtown.types import EnvConfig
    from dtown.utils import checkpoint

    cfg = EnvConfig(obs_type="state")
    maps = map_loader.load_map("small_loop")
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    idx = jnp.zeros((4,), jnp.int32)
    states = jax.vmap(lambda k, i: env_core.reset(cfg, maps, k, i))(keys, idx)

    path = str(tmp_path / "ckpt")
    payload = {"env_states": states, "marker": jnp.arange(3.0)}
    checkpoint.save(path, payload)
    restored = checkpoint.restore(path, payload)
    np.testing.assert_array_equal(
        np.asarray(restored["env_states"].pos), np.asarray(states.pos)
    )
    np.testing.assert_array_equal(
        np.asarray(restored["marker"]), np.arange(3.0)
    )
    # resumed state steps identically
    a = jnp.tile(jnp.array([0.3, 0.0]), (4, 1))
    s1, o1 = env_core.step_batch(cfg, maps, states, a)
    s2, o2 = env_core.step_batch(cfg, maps, restored["env_states"], a)
    np.testing.assert_array_equal(np.asarray(o1.reward), np.asarray(o2.reward))


def test_nav_task_goal():
    import dtown
    from dtown.gym_compat import DuckietownNav

    env = DuckietownNav(map_name="small_loop", obs_type="state", seed=3)
    env.reset()
    assert env._goal is not None
    obs, r, done, info = env.step([0.3, 0.0])
    assert "goal_tile" in info


def test_phase_timer():
    from dtown.utils.profiling import PhaseTimer

    t = PhaseTimer()
    with t.phase("a", steps=100):
        pass
    rep = t.report()
    assert "a" in rep and "steps_per_s" in rep

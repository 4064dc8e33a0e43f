"""Gymnasium registration surface (reference registers with classic gym
at import; dtown mirrors the ids into gymnasium — SURVEY.md §2.1)."""
import numpy as np
import pytest

gymnasium = pytest.importorskip("gymnasium")


def test_gymnasium_make_and_step():
    import dtown

    ids = dtown.register_gymnasium()
    assert "Duckietown-small_loop-v0" in ids

    env = gymnasium.make("Duckietown-small_loop-v0", obs_type="state",
                         camera_width=64, camera_height=64)
    obs, info = env.reset(seed=3)
    assert env.observation_space.contains(np.asarray(obs))
    for _ in range(10):
        obs, r, term, trunc, info = env.step(np.array([0.5, 0.0], np.float32))
        assert np.isfinite(r)
        assert isinstance(term, bool) and isinstance(trunc, bool)
        if term or trunc:
            obs, info = env.reset()
    assert "Simulator" in info


def test_gymnasium_terminated_vs_truncated():
    import dtown.gymnasium_compat as gc

    env = gc.DuckietownGymnasiumEnv(map_name="straight_road",
                                    obs_type="state", max_steps=6,
                                    auto_reset=False)
    env.reset(seed=0)
    results = []
    for _ in range(6):
        _, _, term, trunc, _ = env.step([0.3, 0.0])
        results.append((term, trunc))
    # straight road at low speed: no crash; the horizon truncates
    assert results[-1] == (False, True)
    assert all(t == (False, False) for t in results[:-1])


def test_gymnasium_crash_is_terminated_not_truncated():
    import dtown.gymnasium_compat as gc

    env = gc.DuckietownGymnasiumEnv(map_name="small_loop",
                                    obs_type="state")
    env.reset(seed=0)
    term = trunc = False
    for _ in range(200):  # drive hard right: leaves the lane quickly
        _, r, term, trunc, _ = env.step([1.0, -1.0])
        if term or trunc:
            break
    assert term and not trunc
    assert r <= -999.0


def test_gymnasium_rejects_auto_reset():
    import pytest as _pytest

    import dtown.gymnasium_compat as gc

    with _pytest.raises(ValueError):
        gc.DuckietownGymnasiumEnv(map_name="small_loop", obs_type="state",
                                  auto_reset=True)


def test_gymnasium_vector_env():
    import numpy as np

    from dtown.gymnasium_compat import DuckietownVectorEnv

    envs = DuckietownVectorEnv("small_loop", num_envs=16, obs_type="state")
    assert envs.metadata["autoreset_mode"] == \
        gymnasium.vector.AutoresetMode.SAME_STEP
    obs, info = envs.reset(seed=0)
    assert envs.observation_space.contains(np.asarray(obs))
    acts = np.tile(np.array([0.8, -0.5], np.float32), (16, 1))
    saw_done = False
    for _ in range(60):  # hard right turn: guaranteed crashes
        obs, rew, term, trunc, info = envs.step(acts)
        assert obs.shape == (16, 11)
        assert rew.shape == term.shape == trunc.shape == (16,)
        if term.any():
            saw_done = True
            assert (rew[term] <= -999.0).all()
    assert saw_done
    # SAME_STEP autoreset: stepping continues without an explicit reset
    obs, rew, term, trunc, info = envs.step(acts)
    assert np.isfinite(rew).all()

"""Action/observation wrappers (reference: gym_duckietown/wrappers.py
and the common downstream resize/normalize wrappers)."""
import numpy as np

import jax

from dtown import gym_compat
from dtown.wrappers import (
    DISCRETE_ACTIONS, DiscreteWrapper, NormalizeWrapper, ResizeWrapper,
    SteeringToWheelVelWrapper,
)


def _make(**kw):
    kw.setdefault("obs_type", "state")
    return gym_compat.DuckietownEnv("small_loop", **kw)


def test_discrete_wrapper_action_table():
    env = DiscreteWrapper(_make())
    env.reset()
    for idx in range(len(DISCRETE_ACTIONS)):
        obs, r, done, info = env.step(idx)
        assert np.isfinite(float(r))


def test_steering_to_wheel_vel_wrapper():
    env = SteeringToWheelVelWrapper(_make())
    assert env.cfg.use_wheel_model is False
    env.reset()
    obs, r, done, info = env.step(np.array([0.4, 0.4], np.float32))
    assert np.isfinite(float(r))
    # equal wheel velocities must drive ~straight (raw [u_l, u_r]
    # semantics; under the wheel model [vel, steer]=[0.4, 0.4] would
    # turn hard left)
    a0 = float(env.state.angle)
    for _ in range(10):
        env.step(np.array([0.4, 0.4], np.float32))
    assert abs(float(env.state.angle) - a0) < 1e-3


def test_steering_wrapper_rejits_every_cfg_closure():
    """The r4 latent trap: the wrapper replaced env.cfg and re-jitted
    _step only, leaving _reset/_render closed over the OLD config. All
    cfg-closures must agree after wrapping."""
    env = SteeringToWheelVelWrapper(_make())
    inner = env.env
    for name in ("_step", "_reset", "_render"):
        fn = getattr(inner, name)
        closed_cfg = fn.__wrapped__.args[0]
        assert closed_cfg is inner.cfg, name
        assert closed_cfg.use_wheel_model is False, name
    # reset still functions through the rebuilt closure
    obs = env.reset()
    assert np.asarray(obs).shape == (11,)


def test_resize_and_normalize_wrappers():
    env = ResizeWrapper(
        NormalizeWrapper(
            _make(obs_type="rgb", camera_width=64, camera_height=64)
        ),
        shape=(32, 32),
    )
    obs = env.reset()
    assert obs.shape[:2] == (32, 32)
    assert 0.0 <= float(np.asarray(obs).min()) \
        and float(np.asarray(obs).max()) <= 1.0

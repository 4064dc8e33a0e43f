"""Env wrappers (reference: gym_duckietown/wrappers.py, SURVEY.md §2.5).

Two forms are provided:
 * object wrappers for the gym-style single env (DuckietownEnv), mirroring
   the reference's class names;
 * pure functions usable inside jit for the vectorized path.
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from dtown import constants as C

# reference: wrappers.py::DiscreteWrapper — 3 discrete actions mapped to
# wheel-velocity pairs (turn left / turn right / go forward).
DISCRETE_ACTIONS = np.array(
    [
        [0.6, +1.0],   # turn left  (vel, steering)
        [0.6, -1.0],   # turn right
        [0.7, 0.0],    # go forward
    ],
    dtype=np.float32,
)


def discrete_to_continuous(action_idx):
    """int [...] -> continuous [vel, steer] [..., 2] (jit-safe)."""
    table = jnp.asarray(DISCRETE_ACTIONS)
    return table[action_idx]


class DiscreteWrapper:
    """3-action discrete interface over a DuckietownEnv."""

    def __init__(self, env):
        self.env = env
        self.action_count = len(DISCRETE_ACTIONS)

    def reset(self):
        return self.env.reset()

    def step(self, action_idx: int):
        return self.env.step(DISCRETE_ACTIONS[int(action_idx)])

    def __getattr__(self, name):
        return getattr(self.env, name)


class SteeringToWheelVelWrapper:
    """Expose raw wheel-velocity actions on a wheel-model env.

    reference: wrappers exposing [u_l, u_r] directly (Simulator API) —
    here implemented by disabling the inverse-kinematics wheel model.
    """

    def __init__(self, env):
        import dataclasses

        self.env = env
        self.env.cfg = dataclasses.replace(env.cfg, use_wheel_model=False)
        # re-jit with the new static config
        import functools

        import jax

        from dtown import env as env_core

        env._step = jax.jit(
            functools.partial(env_core.step, env.cfg, env.maps)
        )

    def reset(self):
        return self.env.reset()

    def step(self, wheel_vels):
        return self.env.step(wheel_vels)

    def __getattr__(self, name):
        return getattr(self.env, name)


class ResizeWrapper:
    """Host-side bilinear resize of observations (reference analog:
    common wrapper in downstream gym-duckietown RL code)."""

    def __init__(self, env, shape=(84, 84)):
        self.env = env
        self.shape = shape

    def _resize(self, obs):
        import jax.image

        out = jax.image.resize(
            jnp.asarray(obs, jnp.float32),
            (self.shape[0], self.shape[1], obs.shape[-1]),
            method="bilinear",
        )
        return np.asarray(jnp.clip(out, 0, 255).astype(jnp.uint8))

    def reset(self):
        return self._resize(self.env.reset())

    def step(self, action):
        obs, r, d, i = self.env.step(action)
        return self._resize(obs), r, d, i

    def __getattr__(self, name):
        return getattr(self.env, name)


class NormalizeWrapper:
    """uint8 obs -> float32 in [0, 1]."""

    def __init__(self, env):
        self.env = env

    def reset(self):
        return np.asarray(self.env.reset(), dtype=np.float32) / 255.0

    def step(self, action):
        obs, r, d, i = self.env.step(action)
        return np.asarray(obs, dtype=np.float32) / 255.0, r, d, i

    def __getattr__(self, name):
        return getattr(self.env, name)

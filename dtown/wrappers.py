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
        import functools

        import jax

        from dtown import env as env_core

        self.env = env
        env.cfg = dataclasses.replace(env.cfg, use_wheel_model=False)
        # re-jit EVERY cfg-closure, not just _step: _reset/_render_obs
        # keeping the pre-replace cfg was a latent inconsistency
        # (harmless while use_wheel_model didn't touch reset, but a trap
        # for the next cfg-dependent wrapper — advisor/VERDICT r4)
        env._step = jax.jit(
            functools.partial(env_core.step, env.cfg, env.maps)
        )
        env._reset = jax.jit(
            functools.partial(env_core.reset, env.cfg, env.maps)
        )
        if hasattr(env, "_render"):
            env._render = jax.jit(functools.partial(
                env_core.render_obs, env.cfg, env.maps))

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


class FrameStackWrapper:
    """Stack the last k observations along the channel axis (gym-style
    host wrapper; no reference counterpart — standard RL tooling for
    velocity-unobservable pixel tasks)."""

    def __init__(self, env, k: int = 4):
        self.env = env
        self.k = k
        self._frames = None

    def _stacked(self):
        return np.concatenate(self._frames, axis=-1)

    def reset(self):
        obs = np.asarray(self.env.reset())
        self._frames = [obs] * self.k
        return self._stacked()

    def step(self, action):
        obs, r, d, i = self.env.step(action)
        self._frames = self._frames[1:] + [np.asarray(obs)]
        return self._stacked(), r, d, i

    def __getattr__(self, name):
        return getattr(self.env, name)


def make_frame_stack_vec(cfg, maps, num_envs: int, k: int = 4):
    """Jit-safe vectorized frame stack: (reset, step) whose carried
    state is (env_states, frame buffer [k, B, ...]) and whose obs is the
    last-axis concatenation of the k most recent frames. On an env's
    done (in-graph auto-reset) its whole stack restarts from the new
    episode's first observation — no cross-episode leakage."""
    import jax

    from dtown import env as env_core

    v_reset, v_step = env_core.make_vec_env(cfg, maps, num_envs)

    def _stack(buf):
        return jnp.concatenate([buf[i] for i in range(k)], axis=-1)

    @jax.jit
    def fs_reset(key):
        states = v_reset(key)
        obs0 = env_core.render_obs_batch(cfg, maps, states)
        buf = jnp.repeat(obs0[None], k, axis=0)
        return (states, buf), _stack(buf)

    @jax.jit
    def fs_step(carry, actions):
        states, buf = carry
        states, out = v_step(states, actions)
        buf = jnp.concatenate([buf[1:], out.obs[None]], axis=0)
        dmask = out.done.reshape((1, -1) + (1,) * (out.obs.ndim - 1))
        buf = jnp.where(dmask, out.obs[None], buf)
        return (states, buf), out.replace(obs=_stack(buf))

    return fs_reset, fs_step

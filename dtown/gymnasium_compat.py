"""Gymnasium adapter: the reference registers its envs with classic gym
(`gym_duckietown/__init__.py` — SURVEY.md §2.1) so users write
``gym.make("Duckietown-udem1-v0")``. Classic gym is dead upstream; the
modern equivalent is gymnasium, so dtown exposes the same ids there:

    import dtown.gymnasium_compat  # or dtown.register_gymnasium()
    import gymnasium
    env = gymnasium.make("Duckietown-udem1-v0")
    obs, info = env.reset(seed=0)
    obs, reward, terminated, truncated, info = env.step([0.5, 0.0])

The adapter maps the classic 4-tuple step to gymnasium's 5-tuple:
`terminated` = crash/out-of-lane (REWARD_INVALID_POSE terminal),
`truncated` = the max_steps horizon.
"""
from __future__ import annotations

import numpy as np

try:
    import gymnasium
    from gymnasium import spaces
except ImportError:  # pragma: no cover - gymnasium is an optional extra
    gymnasium = None
    spaces = None

from dtown import constants as C


class DuckietownGymnasiumEnv(gymnasium.Env if gymnasium else object):
    """gymnasium.Env over dtown's gym-style DuckietownEnv."""

    metadata = {"render_modes": ["rgb_array", "human", "top_down"],
                "render_fps": C.DEFAULT_FRAMERATE}

    def __init__(self, map_name: str = C.DEFAULT_MAP_NAME,
                 render_mode: str = "rgb_array", **cfg_kwargs):
        assert gymnasium is not None, "gymnasium is not installed"
        from dtown.gym_compat import DuckietownEnv

        if cfg_kwargs.get("auto_reset"):
            # gymnasium semantics: the USER resets after termination; an
            # in-graph auto-reset would also zero step_count and break
            # the terminated/truncated split below
            raise ValueError(
                "auto_reset is not supported on the gymnasium surface; "
                "use dtown.make_vec / gymnasium's AutoResetWrapper"
            )
        self._env = DuckietownEnv(map_name=map_name, **cfg_kwargs)
        self.render_mode = render_mode
        if self._env.cfg.obs_type == "rgb":
            self.observation_space = spaces.Box(
                0, 255, self._env.observation_shape, dtype=np.uint8
            )
        else:
            self.observation_space = spaces.Box(
                -np.inf, np.inf, self._env.observation_shape,
                dtype=np.float32,
            )
        self.action_space = spaces.Box(-1.0, 1.0, (2,), dtype=np.float32)

    @property
    def unwrapped_dtown(self):
        return self._env

    def reset(self, *, seed=None, options=None):
        if seed is not None:
            self._env.seed(seed)
        obs = self._env.reset()
        return obs, {}

    def step(self, action):
        obs, reward, done, info = self._env.step(action)
        # terminated = the MDP terminal (crash/out-of-lane, identified
        # by the REWARD_INVALID_POSE payout); truncated = any other end
        # (the max_steps horizon). A crash exactly on the horizon step
        # reports terminated.
        terminated = bool(done) and reward <= C.REWARD_INVALID_POSE + 1.0
        truncated = bool(done) and not terminated
        return obs, reward, terminated, truncated, info

    def render(self):
        return self._env.render(self.render_mode)

    def close(self):
        self._env.close()


def register_gymnasium():
    """Register every `Duckietown-<map>-v0` id with gymnasium (idempotent).

    reference: gym_duckietown/__init__.py registers one id per maps/*.yaml
    with classic gym at import time.
    """
    assert gymnasium is not None, "gymnasium is not installed"
    from dtown import map_loader

    for m in map_loader.list_maps():
        env_id = f"Duckietown-{m}-v0"
        if env_id not in gymnasium.registry:
            gymnasium.register(
                id=env_id,
                entry_point="dtown.gymnasium_compat:DuckietownGymnasiumEnv",
                kwargs={"map_name": m},
            )
    return sorted(
        k for k in gymnasium.registry if k.startswith("Duckietown-")
    )


if gymnasium is not None:
    register_gymnasium()

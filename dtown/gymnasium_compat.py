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


class DuckietownVectorEnv(gymnasium.vector.VectorEnv if gymnasium
                          else object):
    """gymnasium.vector.VectorEnv over dtown's jit/vmap batch core.

    The reference has no vectorization at all (SURVEY.md §2
    "Parallelism: none exist"); this adapter exposes dtown's on-device
    batch — thousands of envs stepping in one XLA/Pallas program — to
    gymnasium-API training stacks (CleanRL-style loops). Autoreset is
    SAME_STEP: the in-graph auto-reset means a done step already
    returns the NEW episode's first observation.

        envs = dtown.gymnasium_compat.DuckietownVectorEnv(
            "small_loop", num_envs=1024, obs_type="rgb")
        obs, info = envs.reset(seed=0)
        obs, rew, term, trunc, info = envs.step(actions)  # all [1024,...]
    """

    def __init__(self, map_name="small_loop", num_envs: int = 64,
                 **cfg_kwargs):
        assert gymnasium is not None, "gymnasium is not installed"
        import jax

        from dtown import env as env_core
        from dtown import map_loader
        from dtown.types import EnvConfig

        cfg_kwargs.setdefault("auto_reset", True)
        if not cfg_kwargs["auto_reset"]:
            raise ValueError("DuckietownVectorEnv requires auto_reset")
        self.cfg = EnvConfig(**cfg_kwargs)
        self.maps = (
            map_loader.stack_maps(list(map_name))
            if isinstance(map_name, (list, tuple))
            else map_loader.load_map(map_name)
        )
        self._v_reset, self._v_step = env_core.make_vec_env(
            self.cfg, self.maps, num_envs
        )
        self.num_envs = num_envs
        self.metadata = {"autoreset_mode":
                         gymnasium.vector.AutoresetMode.SAME_STEP}
        if self.cfg.obs_type == "rgb":
            shape = (self.cfg.camera_height, self.cfg.camera_width,
                     self.cfg.obs_channels)
            self.single_observation_space = spaces.Box(
                0, 255, shape, dtype=np.uint8)
        else:
            self.single_observation_space = spaces.Box(
                -np.inf, np.inf, (11,), dtype=np.float32)
        self.single_action_space = spaces.Box(-1.0, 1.0, (2,),
                                              dtype=np.float32)
        self.observation_space = gymnasium.vector.utils.batch_space(
            self.single_observation_space, num_envs)
        self.action_space = gymnasium.vector.utils.batch_space(
            self.single_action_space, num_envs)
        self._jax = jax
        self._states = None

    def reset(self, *, seed=None, options=None):
        key = self._jax.random.PRNGKey(0 if seed is None else seed)
        self._states = self._v_reset(key)
        # first obs without advancing time: render on the fresh states
        from dtown import env as env_core

        obs = env_core.render_obs_batch(self.cfg, self.maps, self._states)
        return np.asarray(obs), {}

    def step(self, actions):
        import jax.numpy as jnp

        assert self._states is not None, "call reset() first"
        self._states, out = self._v_step(
            self._states, jnp.asarray(np.asarray(actions, np.float32))
        )
        rewards = np.asarray(out.reward)
        done = np.asarray(out.done)
        terminations = done & (rewards <= C.REWARD_INVALID_POSE + 1.0)
        truncations = done & ~terminations
        info = {
            "lane_dist": np.asarray(out.lane_dist),
            "in_lane": np.asarray(out.in_lane),
            "collision": np.asarray(out.collision),
        }
        return (np.asarray(out.obs), rewards, terminations, truncations,
                info)

    def close_extras(self, **kwargs):
        pass

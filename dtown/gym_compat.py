"""Thin host-side single-env wrapper with the classic Gym API.

Lets a user of the reference (`gym.make("Duckietown-<map>-v0")`,
reference: gym_duckietown/__init__.py registration + simulator.py Gym
surface) switch over with minimal changes. The wrapper owns one EnvState
and calls the jitted functional core; all compute stays on device, only
the returned obs/reward cross to host.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from dtown import constants as C
from dtown import env as env_core
from dtown import map_loader
from dtown.types import EnvConfig


class DuckietownEnv:
    """Single-env, gym-style API over the functional core.

    reference: envs/duckietown_env.py::DuckietownEnv (action
    [velocity, steering]) on top of simulator.py::Simulator.
    """

    metadata = {"render.modes": ["rgb_array", "human", "top_down"]}

    def __init__(self, map_name: str = C.DEFAULT_MAP_NAME, seed: int = 0,
                 randomize_maps_on_reset: bool = False, **cfg_kwargs):
        cfg_kwargs.setdefault("auto_reset", False)
        if cfg_kwargs.get("obs_type", "rgb") == "rgb":
            # the reference gym surface observes at 640x480
            # (simulator.py DEFAULT_CAMERA_WIDTH/HEIGHT, SURVEY §2.2a);
            # the vectorized/TPU API keeps its own RL-sized default
            cfg_kwargs.setdefault("camera_width", C.DEFAULT_CAMERA_WIDTH)
            cfg_kwargs.setdefault("camera_height", C.DEFAULT_CAMERA_HEIGHT)
        self.cfg = EnvConfig(**cfg_kwargs)
        self.map_name = map_name
        self.maps = map_loader.load_map(map_name)
        # reference: randomize_maps_on_reset kwarg — reload a random map
        # on every reset()
        self._randomize_maps = randomize_maps_on_reset
        self._map_pool = map_loader.list_maps() if randomize_maps_on_reset \
            else None
        self._np_random_maps = np.random.default_rng(seed)
        self._reset = jax.jit(functools.partial(env_core.reset, self.cfg, self.maps))
        self._step = jax.jit(functools.partial(env_core.step, self.cfg, self.maps))
        self._render = jax.jit(
            functools.partial(env_core.render_obs, self.cfg, self.maps)
        )
        self._key = jax.random.PRNGKey(seed)
        self.state = None

        h, w, c = self.cfg.camera_height, self.cfg.camera_width, self.cfg.obs_channels
        if self.cfg.obs_type == "rgb":
            self.observation_shape = (h, w, c)
        else:
            self.observation_shape = (11,)
        self.action_shape = (2,)

    # -- gym surface ---------------------------------------------------
    def seed(self, seed: int = 0):
        self._key = jax.random.PRNGKey(seed)
        return [seed]

    def reset(self):
        if self._randomize_maps:
            new_map = self._map_pool[
                self._np_random_maps.integers(0, len(self._map_pool))
            ]
            if new_map != self.map_name:
                self.map_name = new_map
                self.maps = map_loader.load_map(new_map)
                self._reset = jax.jit(functools.partial(
                    env_core.reset, self.cfg, self.maps))
                self._step = jax.jit(functools.partial(
                    env_core.step, self.cfg, self.maps))
                self._render = jax.jit(functools.partial(
                    env_core.render_obs, self.cfg, self.maps))
                if hasattr(self, "_render_td"):
                    del self._render_td  # re-jit on the new map
        self._key, sub = jax.random.split(self._key)
        self.state = self._reset(sub)
        return np.asarray(self._render(self.state))

    def step(self, action):
        assert self.state is not None, "call reset() first"
        action = jnp.asarray(np.asarray(action, dtype=np.float32))
        self.state, out = self._step(self.state, action)
        info = {
            "Simulator": {
                "action": np.asarray(action),
                "lane_position": {
                    "dist": float(out.lane_dist),
                    "dot_dir": float(out.lane_dot_dir),
                    "angle_deg": float(out.lane_angle_deg),
                },
                "robot_speed": float(self.state.speed),
                "cur_pos": np.asarray(self.state.pos),
                "cur_angle": float(self.state.angle),
                "wheel_velocities": np.asarray(self.state.wheel_vels),
                "tile_coords": [
                    int(self.state.pos[0] // float(self.maps.tile_size)),
                    int(self.state.pos[2] // float(self.maps.tile_size)),
                ],
                "timestamp": float(out.timestamp),
                "msg": "",
            }
        }
        if self.cfg.full_transparency:
            # reference: full_transparency includes the complete simulator
            # state in info every step (get_agent_info)
            info["Simulator"].update({
                "map_name": self.map_name,
                "in_lane": bool(out.in_lane),
                "lane_angle_rad": float(
                    np.deg2rad(np.asarray(out.lane_angle_deg))
                ),
                "collision": bool(out.collision),
                "step_count": int(self.state.step_count),
                "domain_rand_params": {
                    "robot_speed": float(self.state.robot_speed),
                    "cam_fov_y": float(self.state.cam_fov_y),
                    "cam_height": float(self.state.cam_height),
                    "cam_angle": float(self.state.cam_angle),
                    "wheel_dist": float(self.state.wheel_dist),
                },
            })
        return (
            np.asarray(out.obs),
            float(out.reward),
            bool(out.done),
            info,
        )

    def render(self, mode: str = "rgb_array"):
        """rgb_array returns the frame; 'human' additionally paints it
        into the terminal as ANSI truecolor half-blocks (the reference
        opens a pyglet GL window — this environment is headless, so the
        live view is the terminal; see also manual_control.py);
        'top_down' renders the bird's-eye map view with an agent marker
        (reference: simulator.py render(mode='top_down'))."""
        if mode == "top_down":
            if not hasattr(self, "_render_td"):
                from dtown.render.raster import render_top_down

                import dataclasses

                rgb_cfg = self.cfg if self.cfg.obs_type == "rgb" else \
                    dataclasses.replace(self.cfg, obs_type="rgb")
                self._render_td = jax.jit(functools.partial(
                    render_top_down, rgb_cfg, self.maps))
            return np.asarray(self._render_td(self.state))
        img = np.asarray(self._render(self.state))
        if mode == "human":
            _print_ansi_frame(img)
        return img

    def close(self):
        pass


def _print_ansi_frame(img, max_cols: int = 64, out=None):
    """Paint an RGB uint8 frame into a terminal with 24-bit half-blocks
    (two pixel rows per text row)."""
    import sys

    out = out or sys.stdout
    h, w = img.shape[:2]
    step = max(1, w // max_cols)
    small = img[::step * 2, ::step]  # two vertical pixels per char
    small_lo = img[step::step * 2, ::step]
    rows = min(len(small), len(small_lo))
    lines = []
    for r in range(rows):
        line = []
        for c in range(small.shape[1]):
            tr, tg, tb = (int(x) for x in small[r, c][:3])
            br, bg_, bb = (int(x) for x in small_lo[r, c][:3])
            line.append(
                f"\x1b[38;2;{tr};{tg};{tb}m\x1b[48;2;{br};{bg_};{bb}m▀"
            )
        lines.append("".join(line) + "\x1b[0m")
    out.write("\n".join(lines) + "\n")
    out.flush()


class DuckietownLF(DuckietownEnv):
    """Lane-following task: the base env's reward already encodes lane
    following (reference: envs/duckietown_env.py::DuckietownLF)."""


class DuckietownNav(DuckietownEnv):
    """Navigation task: reach a randomly drawn drivable goal tile.

    reference: envs/duckietown_env.py::DuckietownNav — on reset a goal
    tile is chosen; reaching it ends the episode with a bonus reward.
    """

    # single source of truth lives with the vectorized Nav task
    from dtown.tasks import GOAL_REWARD

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        import numpy as np

        self._drivable = np.argwhere(np.asarray(self.maps.drivable))
        self._goal = None
        self._np_random = np.random.default_rng(0)

    def seed(self, seed: int = 0):
        import numpy as np

        self._np_random = np.random.default_rng(seed)
        return super().seed(seed)

    def reset(self):
        obs = super().reset()
        j, i = self._drivable[
            self._np_random.integers(0, len(self._drivable))
        ]
        self._goal = (int(i), int(j))
        return obs

    def step(self, action):
        obs, reward, done, info = super().step(action)
        info["goal_tile"] = self._goal
        if not done and tuple(info["Simulator"]["tile_coords"]) == self._goal:
            reward += self.GOAL_REWARD
            done = True
            info["Simulator"]["msg"] = "goal-reached"
        return obs, reward, done, info


class MultiMapEnv:
    """Cycles to the next map on every reset.

    reference: envs/multimap_env.py::MultiMapEnv — owns one Simulator per
    map yaml and advances on reset(); here each map is a DuckietownEnv
    (jit caches are per-map, so switching is cheap after first use).
    """

    def __init__(self, map_names=None, seed: int = 0, **cfg_kwargs):
        from dtown import map_loader

        names = list(map_names) if map_names else map_loader.list_maps()
        assert names, "no maps"
        self.envs = [
            DuckietownEnv(map_name=n, seed=seed + i, **cfg_kwargs)
            for i, n in enumerate(names)
        ]
        self._idx = -1
        self.env = self.envs[0]

    def reset(self):
        self._idx = (self._idx + 1) % len(self.envs)
        self.env = self.envs[self._idx]
        return self.env.reset()

    def step(self, action):
        return self.env.step(action)

    def render(self, mode: str = "rgb_array"):
        return self.env.render(mode)

    def seed(self, seed: int = 0):
        for i, e in enumerate(self.envs):
            e.seed(seed + i)
        return [seed]

    def close(self):
        pass

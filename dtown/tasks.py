"""Vectorized task layers over the functional env core.

The reference ships two task subclasses of DuckietownEnv
(envs/duckietown_env.py): DuckietownLF (lane following — the base
reward already encodes it) and DuckietownNav (reach a randomly drawn
goal tile for a bonus). The gym surface mirrors both host-side
(gym_compat.DuckietownLF / DuckietownNav); this module is the
TPU-native counterpart — the Nav goal lives IN the jitted state pytree
so thousands of Nav envs run per chip with in-graph goal redraws at
auto-reset.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from dtown import env as env_core
from dtown.types import EnvConfig, EnvState, MapArrays

from dtown import constants as C

GOAL_REWARD = C.NAV_GOAL_REWARD  # shared with gym_compat.DuckietownNav


class NavState(NamedTuple):
    env: EnvState
    goal: jax.Array   # [2] int32 (i, j) goal tile
    rng: jax.Array    # goal-redraw key (separate from env rng)


def _draw_goal(maps: MapArrays, map_idx, key):
    """Uniform drivable tile -> (i, j) int32."""
    m = env_core.select_map(maps, map_idx)
    Hg, Wg = m.grid_shape
    driv = m.drivable.reshape(-1)
    logits = jnp.where(driv, 0.0, -jnp.inf)
    flat = jax.random.categorical(key, logits)
    return jnp.stack([(flat % Wg).astype(jnp.int32),
                      (flat // Wg).astype(jnp.int32)])


def nav_reset(cfg: EnvConfig, maps: MapArrays, key, map_idx=None) -> NavState:
    k_env, k_goal, k_carry = jax.random.split(key, 3)
    st = env_core.reset(cfg, maps, k_env, map_idx)
    return NavState(st, _draw_goal(maps, st.map_idx, k_goal), k_carry)


def nav_step(cfg: EnvConfig, maps: MapArrays, ns: NavState, action):
    """Env step + goal check: entering the goal tile ends the episode
    with +GOAL_REWARD (reference: DuckietownNav.step). Under
    cfg.auto_reset a new goal is drawn in-graph for the fresh episode.

    The base step runs with auto_reset OFF so the whole Nav step pays
    exactly ONE reset graph, selected on the combined done (crash |
    truncation | goal) — not one inside step_physics plus another here.
    """
    base_cfg = dataclasses.replace(cfg, auto_reset=False)
    st, out, lp = env_core.step_physics(base_cfg, maps, ns.env, action)
    m = env_core.select_map(maps, st.map_idx)
    ts = m.tile_size
    # only score a goal on a live episode — the host wrapper's `if not
    # done` (gym_compat.DuckietownNav.step)
    tile_i = jnp.floor(st.pos[0] / ts).astype(jnp.int32)
    tile_j = jnp.floor(st.pos[2] / ts).astype(jnp.int32)
    reached = (
        (tile_i == ns.goal[0]) & (tile_j == ns.goal[1]) & ~out.done
    )
    reward = out.reward + jnp.where(reached, jnp.float32(GOAL_REWARD), 0.0)
    if cfg.nav_shaping_coef:
        # potential-based goal-distance shaping (EXTENSION knob, see
        # EnvConfig.nav_shaping_coef; mirrored op-for-op in the fused
        # state kernel's nav block)
        gx = (ns.goal[0].astype(jnp.float32) + 0.5) * ts
        gz = (ns.goal[1].astype(jnp.float32) + 0.5) * ts
        d_prev = jnp.sqrt((gx - ns.env.pos[0]) ** 2
                          + (gz - ns.env.pos[2]) ** 2)
        d_next = jnp.sqrt((gx - st.pos[0]) ** 2 + (gz - st.pos[2]) ** 2)
        reward = reward + cfg.nav_shaping_coef * (d_prev - d_next)
    done = out.done | reached

    rng, k_goal, k_respawn = jax.random.split(ns.rng, 3)
    if cfg.auto_reset:
        fresh = env_core.reset(cfg, maps, k_respawn, map_idx=st.map_idx)
        # nav_step operates on ONE env (vmapped by make_nav_vec), so
        # `done` is a scalar and broadcasts over every state leaf
        st = jax.tree_util.tree_map(
            lambda new, cur: jnp.where(done, new, cur), fresh, st,
        )
        goal = jnp.where(done, _draw_goal(maps, st.map_idx, k_goal),
                         ns.goal)
    else:
        goal = ns.goal
    out = out.replace(reward=reward, done=done)
    return NavState(st, goal, rng), out


def goal_features(maps: MapArrays, ns: NavState):
    """Per-env goal descriptor [B, 3]: the goal-tile center offset in
    the agent frame (forward, right), plus its distance — appended to
    state observations when goal_in_obs is set, making the task
    goal-conditioned (the reference's Nav obs carries no goal, which
    leaves its task unlearnable from observations; this is the rebuild's
    extension)."""
    st = ns.env
    m = env_core.select_map(maps, st.map_idx)  # vmapped: one env
    ts = m.tile_size
    gx = (ns.goal[0].astype(jnp.float32) + 0.5) * ts
    gz = (ns.goal[1].astype(jnp.float32) + 0.5) * ts
    dx = gx - st.pos[0]
    dz = gz - st.pos[2]
    c = jnp.cos(st.angle)
    s = jnp.sin(st.angle)
    fwd = dx * c - dz * s      # dir_vec = (cos, 0, -sin)
    right = dx * s + dz * c    # right_vec = (sin, 0, cos)
    return jnp.stack([fwd, right, jnp.sqrt(dx * dx + dz * dz)])


def make_nav_vec(cfg: EnvConfig, maps: MapArrays, num_envs: int,
                 goal_in_obs: bool = False):
    """Jitted, vmapped (reset, step) for the Nav task — the vectorized
    equivalent of gym_compat.DuckietownNav. goal_in_obs appends the
    agent-frame goal offset (goal_features) to state observations; for
    image observations (where the goal tile has no visual marker) the
    step returns obs as a TUPLE (image, goal_vec[B, 3]) for the
    learner's vector side-channel (learn/networks.ActorCritic)."""

    @jax.jit
    def v_reset(key):
        keys = jax.random.split(key, num_envs)
        idx = env_core.initial_map_indices(maps, num_envs)
        return jax.vmap(lambda k, i: nav_reset(cfg, maps, k, i))(keys, idx)

    @jax.jit
    def v_step(states, actions):
        ns, out = jax.vmap(
            lambda s, a: nav_step(cfg, maps, s, a)
        )(states, actions)
        # same batched-obs path as step_batch (fused Pallas renderer
        # when cfg selects it)
        obs = env_core.render_obs_batch(cfg, maps, ns.env)
        if goal_in_obs:
            feats = jax.vmap(lambda s: goal_features(maps, s))(ns)
            if cfg.obs_type == "state":
                obs = jnp.concatenate([obs, feats], axis=-1)
            else:
                obs = (obs, feats)
        return ns, out.replace(obs=obs)

    return v_reset, v_step

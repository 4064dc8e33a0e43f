"""Fused fast path: blob-state rollouts driven by the Pallas kernels.

The rollout loop carries the transposed state blob [NF, B] (see
state_kernel.py); EnvState <-> blob conversion happens once at the rollout
boundary. Per step: one state kernel + (rgb mode) one render kernel +
a thin XLA glue layer.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from dtown import constants as C
from dtown.ops import state_kernel as sk
from dtown.types import EnvConfig, StepOutput


def pack_blob(states) -> jnp.ndarray:
    """Vmapped EnvState [B] -> blob f32 [NF, B]."""
    B = states.pos.shape[0]
    rows = jnp.zeros((sk.NF, B), jnp.float32)
    rows = rows.at[sk.F_POS_X].set(states.pos[:, 0])
    rows = rows.at[sk.F_POS_Y].set(states.pos[:, 1])
    rows = rows.at[sk.F_POS_Z].set(states.pos[:, 2])
    rows = rows.at[sk.F_ANGLE].set(states.angle)
    rows = rows.at[sk.F_SPEED].set(states.speed)
    rows = rows.at[sk.F_WVL].set(states.wheel_vels[:, 0])
    rows = rows.at[sk.F_WVR].set(states.wheel_vels[:, 1])
    rows = rows.at[sk.F_STEP].set(states.step_count.astype(jnp.float32))
    rows = rows.at[sk.F_RNG].set(
        states.rng[:, 0].astype(jnp.float32) % 65536.0
    )
    rows = rows.at[sk.F_ROBOT_SPEED].set(states.robot_speed)
    rows = rows.at[sk.F_WHEEL_DIST].set(states.wheel_dist)
    rows = rows.at[sk.F_ENVID].set(jnp.arange(B, dtype=jnp.float32))
    return rows


def unpack_outputs(blob) -> StepOutput:
    return StepOutput(
        obs=(),
        reward=blob[sk.F_REWARD],
        done=blob[sk.F_DONE] > 0.5,
        lane_dist=blob[sk.F_LDIST],
        lane_dot_dir=blob[sk.F_LDOT],
        lane_angle_deg=blob[sk.F_LDEG],
        in_lane=blob[sk.F_INLANE] > 0.5,
        collision=blob[sk.F_COLL] > 0.5,
        timestamp=blob[sk.F_TIME],
    )


def update_states_from_blob(states, blob):
    """Write the blob's pose fields back into an EnvState pytree."""
    return states.replace(
        pos=jnp.stack(
            [blob[sk.F_POS_X], blob[sk.F_POS_Y], blob[sk.F_POS_Z]], axis=-1
        ),
        angle=blob[sk.F_ANGLE],
        speed=blob[sk.F_SPEED],
        wheel_vels=jnp.stack([blob[sk.F_WVL], blob[sk.F_WVR]], axis=-1),
        step_count=blob[sk.F_STEP].astype(jnp.int32),
    )


def make_fused_rollout(cfg: EnvConfig, maps, num_envs: int):
    """(init_blob_fn, rollout_fn): rollout_fn scans n fused steps.

    rollout(blob, actions, n) -> (blob, reward_sum, obs_checksum).
    rgb mode renders every step through the fused Pallas kernel.
    """
    from dtown import env as env_core

    if cfg.domain_rand:
        raise NotImplementedError(
            "the fused kernel path does not re-draw domain randomization "
            "at auto-reset yet; use the XLA path (renderer='pallas' still "
            "works there) for domain_rand=True"
        )
    tables = sk.build_tables(cfg, maps)

    def init_blob(key):
        keys = jax.random.split(key, num_envs)
        idx = jnp.zeros((num_envs,), jnp.int32)
        states = jax.vmap(lambda k, i: env_core.reset(cfg, maps, k, i))(
            keys, idx
        )
        return pack_blob(states), states

    def fused_step(blob, states_template, actions):
        blob = sk.state_step_pallas(cfg, maps, blob, actions, tables)
        out = unpack_outputs(blob)
        if cfg.obs_type == "rgb":
            from dtown.render.pallas_raster import render_frames_pallas

            states = update_states_from_blob(states_template, blob)
            planes = render_frames_pallas(cfg, maps, states)
            obs = planes
        else:
            obs = jnp.stack(
                [
                    blob[sk.F_POS_X], blob[sk.F_POS_Z],
                    jnp.cos(blob[sk.F_ANGLE]), jnp.sin(blob[sk.F_ANGLE]),
                    blob[sk.F_SPEED], blob[sk.F_LDIST], blob[sk.F_LDOT],
                    jnp.deg2rad(blob[sk.F_LDEG]),
                    blob[sk.F_INLANE], blob[sk.F_WVL], blob[sk.F_WVR],
                ],
                axis=-1,
            )
        return blob, out, obs

    @functools.partial(jax.jit, static_argnums=(3,), donate_argnums=(0,))
    def rollout(blob, states_template, actions, n_iters, unroll=1):
        def body(b, _):
            b, out, obs = fused_step(b, states_template, actions)
            return b, (out.reward.sum(), jnp.sum(obs, dtype=jnp.int32)
                       if cfg.obs_type == "rgb" else obs.sum().astype(jnp.int32))

        blob, (rsum, osum) = jax.lax.scan(
            body, blob, None, length=n_iters
        )
        return blob, rsum[-1], osum[-1]

    return init_blob, fused_step, rollout

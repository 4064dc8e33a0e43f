"""Actor-critic networks for the on-device PPO learner.

The reference fork carries torch imitation-learning scripts (SURVEY.md
§2.16, LOW CONFIDENCE); the rebuild's learner is the on-device PPO from
BASELINE.json's north star. Conv trunk sized for 64x64-96x96 obs; compute
runs in bfloat16 on the MXU with float32 params/outputs.
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn


class ConvTrunk(nn.Module):
    """NatureCNN-style trunk, bf16 compute."""

    features: Sequence[int] = (32, 64, 64)

    @nn.compact
    def __call__(self, x):
        # x: uint8 [B, H, W, C] or f32 state vector [B, D]
        if x.ndim == 2:
            h = x.astype(jnp.bfloat16)
            h = nn.Dense(256, dtype=jnp.bfloat16)(h)
            h = nn.relu(h)
            h = nn.Dense(256, dtype=jnp.bfloat16)(h)
            return nn.relu(h)
        h = x.astype(jnp.bfloat16) / 255.0
        kernels = [(8, 4), (4, 2), (3, 1)]
        for f, (k, s) in zip(self.features, kernels):
            h = nn.Conv(f, (k, k), strides=(s, s), dtype=jnp.bfloat16)(h)
            h = nn.relu(h)
        h = h.reshape(h.shape[0], -1)
        h = nn.Dense(512, dtype=jnp.bfloat16)(h)
        return nn.relu(h)


class ActorCritic(nn.Module):
    """Gaussian policy over the 2-d action + value head.

    obs may be a single array (image or state vector) or a tuple
    (image, vec): the vector side-channel (e.g. the three agent-frame
    Nav goal features, ops/fused_env.nav_goal_features_from_blob) is
    embedded and concatenated after the conv flatten — goal-conditioned
    camera policies, which the pixels alone cannot express (the goal
    tile is not visually marked).
    """

    action_dim: int = 2
    trunk: str = "nature"

    @nn.compact
    def __call__(self, obs):
        if isinstance(obs, (tuple, list)):
            x, vec = obs
            h = make_trunk(self.trunk)(x)
            g = nn.Dense(64, dtype=jnp.bfloat16)(
                vec.astype(jnp.bfloat16))
            g = nn.relu(g)
            h = jnp.concatenate([h, g], axis=-1)
            h = nn.Dense(256, dtype=jnp.bfloat16)(h)
            h = nn.relu(h)
        else:
            h = make_trunk(self.trunk)(obs)
        mean = nn.Dense(self.action_dim, dtype=jnp.float32,
                        kernel_init=nn.initializers.orthogonal(0.01))(
            h.astype(jnp.float32)
        )
        log_std = self.param(
            "log_std", nn.initializers.constant(-0.5), (self.action_dim,)
        )
        value = nn.Dense(1, dtype=jnp.float32,
                         kernel_init=nn.initializers.orthogonal(1.0))(
            h.astype(jnp.float32)
        )
        return mean, log_std, value[..., 0]


class ImpalaTrunk(nn.Module):
    """IMPALA-style residual conv trunk (Espeholt et al. 2018), bf16.

    Deeper than the NatureCNN ConvTrunk; trains better on visually
    cluttered maps at the cost of ~2x forward FLOPs. Selected with
    trunk="impala" on ActorCritic / the imitation BCPolicy.
    """

    features: Sequence[int] = (16, 32, 32)

    @nn.compact
    def __call__(self, x):
        if x.ndim == 2:  # state vector: same MLP as ConvTrunk
            h = x.astype(jnp.bfloat16)
            h = nn.Dense(256, dtype=jnp.bfloat16)(h)
            h = nn.relu(h)
            h = nn.Dense(256, dtype=jnp.bfloat16)(h)
            return nn.relu(h)
        h = x.astype(jnp.bfloat16) / 255.0
        for f in self.features:
            h = nn.Conv(f, (3, 3), dtype=jnp.bfloat16)(h)
            h = nn.max_pool(h, (3, 3), strides=(2, 2), padding="SAME")
            for _ in range(2):
                r = nn.relu(h)
                r = nn.Conv(f, (3, 3), dtype=jnp.bfloat16)(r)
                r = nn.relu(r)
                r = nn.Conv(f, (3, 3), dtype=jnp.bfloat16)(r)
                h = h + r
        h = nn.relu(h).reshape(h.shape[0], -1)
        h = nn.Dense(256, dtype=jnp.bfloat16)(h)
        return nn.relu(h)


def make_trunk(name: str = "nature") -> nn.Module:
    if name == "nature":
        return ConvTrunk()
    if name == "impala":
        return ImpalaTrunk()
    raise ValueError(f"unknown trunk {name!r} (nature | impala)")


class ActorCriticRNN(nn.Module):
    """Recurrent actor-critic: trunk -> LSTM -> Gaussian policy + value.

    Third policy-network family (after NatureCNN and IMPALA): an LSTM
    over the trunk features gives the policy memory for the partially
    observed pixels task (the camera can't see behind the robot). The
    cell state is carried per env and reset at episode boundaries by
    the learner (learn/ppo_rnn.py).
    """

    action_dim: int = 2
    trunk: str = "nature"
    hidden: int = 128

    @nn.compact
    def __call__(self, obs, carry):
        h = make_trunk(self.trunk)(obs).astype(jnp.float32)
        carry, h = nn.OptimizedLSTMCell(self.hidden)(carry, h)
        mean = nn.Dense(self.action_dim, dtype=jnp.float32,
                        kernel_init=nn.initializers.orthogonal(0.01))(h)
        log_std = self.param(
            "log_std", nn.initializers.constant(-0.5), (self.action_dim,)
        )
        value = nn.Dense(1, dtype=jnp.float32,
                         kernel_init=nn.initializers.orthogonal(1.0))(h)
        return mean, log_std, value[..., 0], carry

    def initial_carry(self, batch: int):
        z = jnp.zeros((batch, self.hidden), jnp.float32)
        return (z, z)

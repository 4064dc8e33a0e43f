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
    """Gaussian policy over the 2-d action + value head."""

    action_dim: int = 2

    @nn.compact
    def __call__(self, obs):
        h = ConvTrunk()(obs)
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

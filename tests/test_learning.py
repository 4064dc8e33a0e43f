"""PPO actually learns, not just runs (VERDICT round-1 weak #7).

Short state-obs training on small_loop: mean reward must clearly improve
and the crash rate must drop. CPU, single device, ~30 s.
"""
import numpy as np
import pytest

import jax

from dtown import map_loader
from dtown.learn.ppo import PPOConfig, make_ppo
from dtown.types import EnvConfig
from dtown.utils.metrics import MetricSink


@pytest.mark.slow
def test_ppo_learns_small_loop_state():
    cfg = EnvConfig(obs_type="state")
    maps = map_loader.load_map("small_loop")
    ppo = PPOConfig(rollout_len=32)
    init, train_step = make_ppo(cfg, maps, num_envs=128, ppo=ppo)
    ts = init(jax.random.PRNGKey(0))
    step = jax.jit(lambda t: train_step(t))

    sink = MetricSink()
    for it in range(30):
        ts, metrics = step(ts)
        sink.log(it, metrics)

    head = np.mean([h["mean_reward"] for h in sink.history[:5]])
    tail = np.mean([h["mean_reward"] for h in sink.history[-5:]])
    assert tail > head + 1.0, (head, tail)
    assert sink.improved("mean_reward")
    head_d = np.mean([h["done_frac"] for h in sink.history[:5]])
    tail_d = np.mean([h["done_frac"] for h in sink.history[-5:]])
    assert tail_d < head_d, (head_d, tail_d)

"""Jit-safe vectorized frame stacking (wrappers.make_frame_stack_vec)."""
import numpy as np

import jax
import jax.numpy as jnp

from dtown import map_loader, wrappers
from dtown.types import EnvConfig


def test_frame_stack_shapes_and_reset_fill():
    cfg = EnvConfig(obs_type="rgb", camera_width=32, camera_height=32)
    maps = map_loader.load_map("small_loop")
    fs_reset, fs_step = wrappers.make_frame_stack_vec(cfg, maps, 8, k=4)
    carry, obs = fs_reset(jax.random.PRNGKey(0))
    assert obs.shape == (8, 32, 32, 12)
    o = np.asarray(obs)
    assert (o[..., :3] == o[..., 9:12]).all()  # filled with first frame
    act = jnp.tile(jnp.array([[0.5, 0.0]], jnp.float32), (8, 1))
    for _ in range(3):
        carry, out = fs_step(carry, act)
    o = np.asarray(out.obs)
    assert not (o[..., :3] == o[..., 9:12]).all()  # frames now differ


def test_frame_stack_resets_on_done():
    """After an in-graph auto-reset the done env's stack must hold ONLY
    the new episode's first observation (no cross-episode leakage)."""
    cfg = EnvConfig(obs_type="state")
    maps = map_loader.load_map("small_loop")
    fs_reset, fs_step = wrappers.make_frame_stack_vec(cfg, maps, 16, k=3)
    carry, obs = fs_reset(jax.random.PRNGKey(1))
    act = jnp.tile(jnp.array([[1.0, -1.0]], jnp.float32), (16, 1))
    saw = False
    for _ in range(80):
        carry, out = fs_step(carry, act)
        done = np.asarray(out.done)
        if done.any():
            saw = True
            o = np.asarray(out.obs)[done]  # [n, 33] = 3 stacked states
            assert (o[:, :11] == o[:, 11:22]).all()
            assert (o[:, :11] == o[:, 22:]).all()
    assert saw


def test_frame_stack_host_wrapper():
    import dtown
    from dtown.wrappers import FrameStackWrapper

    env = FrameStackWrapper(
        dtown.make("small_loop", obs_type="rgb", camera_width=32,
                   camera_height=32), k=2)
    obs = env.reset()
    assert obs.shape == (32, 32, 6)
    obs, r, d, i = env.step([0.5, 0.0])
    assert obs.shape == (32, 32, 6)

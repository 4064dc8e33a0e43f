"""Analytic marking anti-aliasing (render/shading.py::line_coverage —
the TPU-native counterpart of the reference's multisample FBO resolve,
SURVEY §2.6 create_frame_buffers(samples)).

The load-bearing test renders a supersampled hard-threshold frame, box-
downsamples it (= what an n-sample MSAA resolve measures), and asserts
the analytic-coverage render is strictly closer to that ground truth
than the 1-sample hard render — i.e. marking_aa is real anti-aliasing,
not just blur.
"""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dtown import env as env_core, map_loader
from dtown.types import EnvConfig


def test_line_coverage_limits():
    from dtown.render.shading import LINE_W, line_coverage

    d = jnp.linspace(-0.1, 0.1, 2001)
    hw = LINE_W / 2
    # fw -> 0: reduces to the hard compare
    cov = np.asarray(line_coverage(d, jnp.full_like(d, 1e6)))
    hard = np.abs(np.asarray(d)) < hw
    assert np.abs(cov - hard).mean() < 1e-3
    # fw >> band: coverage ~= area fraction 2*hw/fw everywhere inside
    fw = 0.5
    cov = np.asarray(line_coverage(jnp.zeros(()), jnp.float32(1.0 / fw)))
    assert abs(float(cov) - 2 * hw / fw) < 1e-6
    # integral over d equals the band width for any fw (coverage is a
    # box-filter: it redistributes, never creates or destroys, marking)
    for fwv in (0.001, 0.01, 0.1):
        cov = np.asarray(line_coverage(d, jnp.full_like(d, 1.0 / fwv)))
        integ = cov.sum() * (0.2 / 2000)
        assert abs(integ - LINE_W) < 1e-3, (fwv, integ)


@pytest.mark.parametrize(
    "pos_t,angle",
    [((1.5, 2.25), 1.5707964), ((0.65, 2.5), 1.5707964)],
)
def test_aa_closer_to_supersampled_truth(pos_t, angle):
    maps = map_loader.load_map("4way")
    ts = float(maps.tile_size)
    base = EnvConfig(obs_type="rgb", camera_width=64, camera_height=64,
                     auto_reset=False, render_objects=False)
    s = env_core.reset(base, maps, jax.random.PRNGKey(3))
    s = s.replace(
        pos=jnp.asarray([pos_t[0] * ts, 0.0, pos_t[1] * ts], jnp.float32),
        angle=jnp.float32(angle))
    hi = dataclasses.replace(base, camera_width=256, camera_height=256,
                             marking_aa=False)
    img_hi = np.asarray(env_core.render_obs(hi, maps, s)).astype(float)
    ssaa = img_hi.reshape(64, 4, 64, 4, 3).mean(axis=(1, 3))
    img_aa = np.asarray(env_core.render_obs(base, maps, s)).astype(float)
    img_hd = np.asarray(env_core.render_obs(
        dataclasses.replace(base, marking_aa=False), maps, s)).astype(float)
    # restrict to fractional-coverage pixels (the 4x4 subpixel block
    # spans marking AND road); elsewhere all three agree up to noise
    blk = img_hi.reshape(64, 4, 64, 4, 3)
    edge = (blk.max(axis=(1, 3)) - blk.min(axis=(1, 3))).max(-1) > 60
    assert edge.sum() > 50, "pose sees too few marking edges"
    e_aa = np.abs(img_aa - ssaa).max(-1)[edge].mean()
    e_hd = np.abs(img_hd - ssaa).max(-1)[edge].mean()
    assert e_aa < 0.85 * e_hd, (e_aa, e_hd)

"""Golden-image render regression tests (SURVEY §4: deterministic
rasterizer -> golden images are meaningful, unlike the reference's
driver-dependent GL output).

Goldens live in tests/goldens/<map>_<pose>.png, rendered by the XLA
ray-caster on the CPU backend at fixed poses. The XLA renderer must match
them near-exactly; the Pallas renderers are compared against the XLA
output elsewhere (test_pallas_render / test_blob_render).

Regenerate after INTENTIONAL visual changes with:
    python tests/test_golden_images.py --regen
"""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")

# (name, map, pos(x, z) in tile units, angle)
POSES = [
    ("small_loop_straight", "small_loop", (0.6, 0.35), 0.0),
    ("small_loop_curve", "small_loop", (2.6, 0.5), 0.8),
    ("obstacles_duckie", "loop_obstacles", (2.0, 0.6), 0.0),
    ("udem1_town", "udem1", (1.5, 1.35), 0.0),
    ("4way_center", "4way", (1.5, 2.25), 1.5707964),
    ("bigtown_street", "bigtown", (2.0, 1.35), 0.0),
    ("s_bend_entry", "s_bend", (0.35, 1.3), 1.5707964),
    ("warehouse_aisle", "warehouse", (2.0, 1.35), 0.0),
    ("town_dyn_main", "town_dyn_duckiebots", (2.5, 1.35), 0.0),
    ("mini_ring_curve", "regress_mini_ring", (0.65, 0.35), 0.0),
]


def _render(name, map_name, pos_t, angle):
    from dtown import env as env_core, map_loader
    from dtown.types import EnvConfig

    cfg = EnvConfig(obs_type="rgb", camera_width=64, camera_height=64,
                    auto_reset=False)
    maps = map_loader.load_map(map_name)
    ts = float(maps.tile_size)
    state = env_core.reset(cfg, maps, jax.random.PRNGKey(0))
    state = state.replace(
        pos=jnp.asarray([pos_t[0] * ts, 0.0, pos_t[1] * ts], jnp.float32),
        angle=jnp.float32(angle),
    )
    return np.asarray(env_core.render_obs(cfg, maps, state))


@pytest.mark.parametrize("name,map_name,pos_t,angle", POSES)
def test_golden_image(name, map_name, pos_t, angle):
    from PIL import Image

    path = os.path.join(GOLDEN_DIR, f"{name}.png")
    assert os.path.exists(path), (
        f"golden missing: {path} — run python tests/test_golden_images.py "
        f"--regen"
    )
    golden = np.asarray(Image.open(path)).astype(int)
    img = _render(name, map_name, pos_t, angle).astype(int)
    assert img.shape == golden.shape
    diff = np.abs(img - golden)
    # CPU backend renders are deterministic; allow 1-count rounding slack
    assert diff.max() <= 1, (
        f"{name}: max diff {diff.max()}, mean {diff.mean():.3f} — renderer "
        f"output changed; if intentional, regenerate goldens"
    )


def _regen():
    from PIL import Image

    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for name, map_name, pos_t, angle in POSES:
        img = _render(name, map_name, pos_t, angle)
        Image.fromarray(img).save(os.path.join(GOLDEN_DIR, f"{name}.png"))
        print(f"wrote {name}.png std={img.std():.1f}")


if __name__ == "__main__":
    import sys

    jax.config.update("jax_platforms", "cpu")
    if "--regen" in sys.argv:
        _regen()

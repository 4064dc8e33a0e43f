"""Config-combination smoke matrix for the fused path.

Individual features (grayscale, domain_rand, NPCs, multimap stacks,
distortion) each have dedicated equivalence tests; this matrix pins the
CROSS products, which historically hide wiring bugs (e.g. the r2
obs_from_blob multimap crash escaped because stacks were only ever
tested with state obs).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dtown import map_loader
from dtown.ops.fused_env import make_fused_rollout, template_states
from dtown.types import EnvConfig

CASES = [
    # (name, maps, cfg kwargs)
    ("gray_dr", "udem1", dict(grayscale=True, domain_rand=True)),
    ("gray_npc", "loop_pedestrians", dict(grayscale=True)),
    ("dr_npc", "loop_pedestrians", dict(domain_rand=True)),
    ("gray_stack", ["small_loop", "4way"], dict(grayscale=True)),
    ("dr_stack", ["small_loop", "4way"], dict(domain_rand=True)),
    ("npc_stack", ["loop_pedestrians", "4way"], dict()),
    ("distortion_dr", "small_loop", dict(distortion=True,
                                         domain_rand=True)),
]


@pytest.mark.parametrize("name,map_spec,kw", CASES,
                         ids=[c[0] for c in CASES])
def test_fused_config_matrix(name, map_spec, kw):
    cfg = EnvConfig(obs_type="rgb", camera_width=64, camera_height=64,
                    **kw)
    maps = (map_loader.stack_maps(map_spec)
            if isinstance(map_spec, list)
            else map_loader.load_map(map_spec))
    B = 8
    init_blob, fused_step, _ = make_fused_rollout(cfg, maps, B)
    blob, states = init_blob(jax.random.PRNGKey(0))
    actions = jnp.tile(jnp.array([0.4, 0.1], jnp.float32), (B, 1))
    step = jax.jit(lambda b, a: fused_step(b, states, a))
    for _ in range(3):
        blob, out, obs = step(blob, actions)
    assert np.isfinite(np.asarray(out.reward)).all()
    assert obs.dtype == jnp.uint8
    img = np.asarray(obs)
    assert img.std() > 1.0, f"{name}: degenerate frames"
    C = 1 if kw.get("grayscale") else 3
    assert obs.shape == (B, C, 64 * 64 // 128, 128)

    # the no-step observation helper must accept every combo too
    from dtown.ops.fused_env import obs_from_blob

    tmpl = template_states(cfg, maps, B)
    obs0 = obs_from_blob(cfg, maps, blob, tmpl)
    assert obs0.shape == obs.shape and obs0.dtype == jnp.uint8

"""Test harness config: force CPU backend with 8 virtual devices so
sharding tests run without TPU hardware (SURVEY.md §7 build notes).

The environment boots every interpreter with the axon TPU plugin
(sitecustomize imports jax and sets jax_platforms="axon,cpu"), so the
env-var route is not enough: override through jax.config after import
and make sure the XLA flag is present before the CPU client is created.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", jax.default_backend()


# ---------------------------------------------------------------------
# Suite tiering (VERDICT r4 weak #7): the full suite is ~50 min on the
# 8-virtual-device CPU mesh — far too slow to run per change. Files
# dominated by interpret-mode kernel renders or multi-iteration
# training loops are marked `slow` wholesale here (plus the explicit
# per-test marks inside files), so
#     pytest -m "not slow"          # smoke tier, target < 10 min
#     pytest tests/                 # full tier (CI / round end)
# are the two documented invocations (see CLAUDE.md).
import pytest as _pytest  # noqa: E402

_SLOW_FILES = {
    "test_blob_render.py",        # interpret-mode fused renders
    "test_fused_matrix.py",       # full fused-vs-XLA config matrix
    "test_fused_multimap.py",     # stacked-map interpret renders
    "test_fused_domain_rand.py",  # DR interpret renders
    "test_fused_nav.py",          # nav rollouts + renders
    "test_distortion_fused.py",   # fisheye interpret renders
    "test_imitation.py",          # BC/DAgger training loops
    "test_torch_bc.py",           # torch interop training
    "test_parity_e2e.py",         # long oracle trajectories
    "test_ppo_rnn.py",            # recurrent PPO training
}


def pytest_collection_modifyitems(config, items):
    import os as _os

    for it in items:
        if _os.path.basename(str(it.fspath)) in _SLOW_FILES:
            it.add_marker(_pytest.mark.slow)

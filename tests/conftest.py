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

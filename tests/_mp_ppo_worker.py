"""Worker for tests/test_multiprocess.py: one controller process of a
two-process jax.distributed CPU run (4 virtual devices per process,
8-device global mesh — the same global shape as the in-process suite).

Usage: python tests/_mp_ppo_worker.py <rank> <coordinator_port> <outdir>

Writes <outdir>/rank<rank>.npz with the flattened replicated params and
the step metrics, and (rank 0) a real utils.checkpoint save_atomic
checkpoint at <outdir>/ckpt for the cross-process-count restore leg.
"""
import os
import sys

rank = int(sys.argv[1])
port = sys.argv[2]
outdir = sys.argv[3]

# 4 virtual CPU devices per process, CPU backend (the ambient env pins
# the axon TPU plugin; jax.config.update after import is the only
# reliable override — see tests/conftest.py)
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=4"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}",
    num_processes=2,
    process_id=rank,
    # default 300 s covers loaded-machine startup skew; the ~30 s gloo
    # COLLECTIVE timeout later is not configurable from here — the
    # parent test retries on it instead
    initialization_timeout=600,
)
assert jax.default_backend() == "cpu", jax.default_backend()
assert len(jax.local_devices()) == 4, jax.local_devices()
assert len(jax.devices()) == 8, jax.devices()

import numpy as np  # noqa: E402

from dtown import map_loader  # noqa: E402
from dtown.learn.ppo import PPOConfig  # noqa: E402
from dtown.parallel.shard import make_sharded_ppo  # noqa: E402
from dtown.types import EnvConfig  # noqa: E402

cfg = EnvConfig(obs_type="state")
maps = map_loader.load_map("small_loop")
mesh, s_init, s_train = make_sharded_ppo(
    cfg, maps, 16,
    ppo=PPOConfig(rollout_len=8, epochs=1, minibatches=2),
)
ts = s_init(jax.random.PRNGKey(0))
metrics = None
for _ in range(3):
    ts, metrics = s_train(ts)


def local_np(a):
    """Host copy of a replicated global array (its local shard holds the
    full value; np.asarray on a cross-process array would raise)."""
    if hasattr(a, "addressable_shards"):
        return np.asarray(jax.device_get(a.addressable_shards[0].data))
    return np.asarray(a)


params_flat, _ = jax.tree_util.tree_flatten(ts.params)
out = {f"p{i}": local_np(p) for i, p in enumerate(params_flat)}
for k, v in metrics.items():
    out[f"m_{k}"] = local_np(v)
np.savez(os.path.join(outdir, f"rank{rank}.npz"), **out)

# Real checkpoint machinery on the host copy of the replicated train
# state, restored later by the single-process parent — the
# cross-process-count leg of BASELINE config 5. orbax under an
# initialized jax.distributed runtime is COLLECTIVE (the primary writes,
# every process joins the commit barrier), so all ranks must call it —
# a rank-0-only call deadlocks the barrier and times out gloo (hit when
# this worker was first written).
from dtown.utils import checkpoint as ckpt  # noqa: E402

ckpt.save_atomic(
    os.path.join(outdir, "ckpt"),
    {"params": jax.tree_util.tree_map(local_np, ts.params),
     "opt_state": jax.tree_util.tree_map(local_np, ts.opt_state)},
)
# all processes must stay alive until the coordinator's peers finish
jax.distributed.shutdown()
print(f"rank {rank} ok")

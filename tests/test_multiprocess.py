"""Two-process jax.distributed training on CPU (BASELINE config 5's
multi-host leg, VERDICT r4 item 3).

Every other shard test runs one process with 8 virtual devices; this one
spawns TWO controller processes (4 virtual CPU devices each) joined via
jax.distributed.initialize on localhost, runs the real
make_sharded_ppo train loop across them, and asserts:

  (a) params end bit-identical across the two processes (the pmean'd
      update is replicated through cross-process collectives),
  (b) metrics and params match the single-process 8-device run of the
      identical config (same global mesh shape -> same shard streams;
      tolerance covers cross-process reduction-order float drift),
  (c) the checkpoint written under the 2-process run restores into this
      single-process suite (cross-process-count restore).
"""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax

from dtown import map_loader
from dtown.learn.ppo import PPOConfig
from dtown.parallel.shard import make_sharded_ppo
from dtown.types import EnvConfig

_WORKER = os.path.join(os.path.dirname(__file__), "_mp_ppo_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_distributed_ppo(tmp_path):
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(_WORKER))
    # the workers set their own XLA_FLAGS/JAX_PLATFORMS; drop the
    # suite's 8-device flag so each worker gets its own 4-device value
    env.pop("XLA_FLAGS", None)

    def run_once():
        port = _free_port()
        procs = [
            subprocess.Popen(
                [sys.executable, _WORKER, str(r), str(port),
                 str(tmp_path)],
                env=env, stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
            )
            for r in range(2)
        ]
        outs = []
        for p in procs:
            try:
                out, _ = p.communicate(timeout=900)
            except subprocess.TimeoutExpired:
                for q in procs:
                    q.kill()
                raise
            outs.append(out.decode(errors="replace"))
        return procs, outs

    # gloo's cross-process collectives run a fixed ~30 s handshake
    # timeout; when the suite machine is saturated one worker can reach
    # a barrier >30 s after the other and fail spuriously (observed
    # twice under the full 50-min tier, never standalone). Retries
    # distinguish that scheduling flake from a real protocol bug.
    for attempt in range(3):
        procs, outs = run_once()
        if all(p.returncode == 0 for p in procs):
            break
    for r, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {r} failed:\n{out[-3000:]}"

    r0 = np.load(tmp_path / "rank0.npz")
    r1 = np.load(tmp_path / "rank1.npz")
    # (a) replicated params bit-identical across processes
    for k in r0.files:
        if k.startswith("p"):
            np.testing.assert_array_equal(r0[k], r1[k], err_msg=k)

    # (b) the same config in THIS process (8 virtual devices, one
    # controller) — same global mesh shape, same per-shard PRNG streams
    cfg = EnvConfig(obs_type="state")
    maps = map_loader.load_map("small_loop")
    mesh, s_init, s_train = make_sharded_ppo(
        cfg, maps, 16, ppo=PPOConfig(rollout_len=8, epochs=1,
                                     minibatches=2),
    )
    ts = s_init(jax.random.PRNGKey(0))
    metrics = None
    for _ in range(3):
        ts, metrics = s_train(ts)
    for k in metrics:
        np.testing.assert_allclose(
            float(r0[f"m_{k}"]), float(metrics[k]), rtol=1e-4, atol=1e-5,
            err_msg=f"metric {k}")
    params_flat, _ = jax.tree_util.tree_flatten(ts.params)
    for i, p in enumerate(params_flat):
        np.testing.assert_allclose(
            r0[f"p{i}"], np.asarray(p), rtol=1e-4, atol=1e-6,
            err_msg=f"param leaf {i}")

    # (c) the 2-process checkpoint restores into this single process
    from dtown.utils import checkpoint as ckpt

    state = ckpt.restore_any(str(tmp_path / "ckpt"))
    re_flat, _ = jax.tree_util.tree_flatten(state["params"])
    for i, p in enumerate(re_flat):
        np.testing.assert_array_equal(np.asarray(p), r0[f"p{i}"])

"""Elastic training: periodic checkpoints + --resume in train_ppo.py
(SURVEY.md §5 failure-detection/elastic-recovery row — a long run must
survive a mid-run kill, not just write one checkpoint at the end).

Drives scripts/train_ppo.py as a subprocess (the real harness surface):
train, SIGKILL mid-run, resume from the last periodic snapshot, and
assert the resumed run reaches the SAME final state as an uninterrupted
run (everything that evolves — params, optimizer, env states, PRNG key —
is in the snapshot, so kill+resume is bit-deterministic).
"""
import json
import os
import signal
import subprocess
import sys
import time  # noqa: F401  (kept for ad-hoc debugging)

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(ROOT, "scripts", "train_ppo.py")

BASE = ["--map", "small_loop", "--obs", "state", "--envs", "16",
        "--rollout", "4", "--epochs", "1", "--minibatches", "2",
        "--seed", "3", "--log-every", "1", "--cpu"]


def _env(n_devices=8):
    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={n_devices}"
    ).strip()
    env["JAX_PLATFORMS"] = "cpu"
    return env


def _run(args, n_devices=8, timeout=600):
    r = subprocess.run(
        [sys.executable, SCRIPT, *BASE, *args],
        capture_output=True, text=True, timeout=timeout, env=_env(n_devices),
    )
    assert r.returncode == 0, r.stdout + r.stderr
    return r


def _iters_logged(stdout):
    its = []
    for line in stdout.splitlines():
        if line.startswith("{"):
            d = json.loads(line)
            if "iter" in d:
                its.append(d["iter"])
    return its


def _params(ckpt):
    from dtown.utils import checkpoint

    return checkpoint.restore_any(ckpt)


@pytest.mark.slow
def test_kill_resume_matches_uninterrupted(tmp_path):
    ck_a = str(tmp_path / "ck_a")
    ck_c = str(tmp_path / "ck_c")

    # A: train with periodic snapshots, SIGKILL once a snapshot lands
    proc = subprocess.Popen(
        [sys.executable, SCRIPT, *BASE, "--iters", "99",
         "--ckpt", ck_a, "--ckpt-every", "2"],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        env=_env(),
    )
    killed = False
    for line in proc.stderr:
        if "saved full train state" in line:
            # no grace period: the checkpointer must be crash-safe at
            # ANY instant (the next overwrite may already be in flight)
            proc.send_signal(signal.SIGKILL)
            killed = True
            break
    proc.wait(timeout=60)
    assert killed, "never saw a periodic snapshot before EOF"
    snap = _params(ck_a)
    k = int(snap["it"])
    assert 0 < k < 99 and k % 2 == 0

    # B: resume the killed run and finish at --iters 8
    total = max(8, k + 2)
    r_b = _run(["--iters", str(total), "--ckpt", ck_a, "--resume", ck_a])
    assert f"resumed from {ck_a} at iter {k}" in r_b.stdout
    its = _iters_logged(r_b.stdout)
    assert its[0] == k and its[-1] == total - 1, its

    # C: uninterrupted run to the same horizon, same seed
    r_c = _run(["--iters", str(total), "--ckpt", ck_c])
    fa, fc = _params(ck_a), _params(ck_c)
    assert int(fa["it"]) == int(fc["it"]) == total
    for a, c in zip(_leaves(fa["params"]), _leaves(fc["params"])):
        np.testing.assert_allclose(a, c, rtol=0, atol=0)
    np.testing.assert_array_equal(np.asarray(fa["key"]),
                                  np.asarray(fc["key"]))


def _leaves(tree):
    import jax

    return [np.asarray(x) for x in jax.tree_util.tree_leaves(tree)]


@pytest.mark.slow
def test_resume_onto_smaller_mesh(tmp_path):
    """Elastic restart across mesh sizes: snapshot from an 8-device run
    restores and continues on 4 devices (the script-level form of
    test_checkpoint_reshard)."""
    ck = str(tmp_path / "ck")
    _run(["--iters", "2", "--ckpt", ck, "--ckpt-every", "2"], n_devices=8)
    snap = _params(ck)
    assert int(snap["it"]) == 2
    r = _run(["--iters", "4", "--ckpt", ck, "--resume", ck], n_devices=4)
    assert f"resumed from {ck} at iter 2" in r.stdout
    its = _iters_logged(r.stdout)
    assert its[0] == 2 and its[-1] == 3
    assert int(_params(ck)["it"]) == 4


@pytest.mark.slow
def test_resume_noop_when_complete(tmp_path):
    ck = str(tmp_path / "ck")
    _run(["--iters", "2", "--ckpt", ck])
    r = _run(["--iters", "2", "--ckpt", ck, "--resume", ck])
    assert "nothing to do" in r.stdout
    assert _iters_logged(r.stdout) == []


def test_save_atomic_keep_rotation(tmp_path):
    """keep=N retains the newest N snapshots (oldest-first in slots());
    every retained slot restores directly, enabling rollback."""
    from dtown.utils import checkpoint

    base = str(tmp_path / "ck")
    for i in range(5):
        checkpoint.save_atomic(base, {"it": np.asarray(i)}, keep=3)
    kept = checkpoint.slots(base)
    assert len(kept) == 3
    # newest via the pointer
    assert int(checkpoint.restore_any(base)["it"]) == 4
    # rollback: each retained slot restores to its own iteration
    vals = [int(checkpoint.restore_any(d)["it"]) for d in kept]
    assert vals == [2, 3, 4], vals


def test_save_atomic_legacy_ab_migrates(tmp_path):
    """A directory written by the old two-slot (A/B) scheme keeps
    working: the next save rotates into the numbered sequence and the
    pointer still resolves."""
    import shutil

    from dtown.utils import checkpoint

    base = str(tmp_path / "ck")
    # fabricate a legacy layout: orbax slot "A" + LATEST -> A
    checkpoint.save_atomic(base, {"it": np.asarray(7)})
    new = checkpoint.resolve(base)
    legacy = os.path.join(base, "A")
    shutil.move(new, legacy)
    with open(os.path.join(base, "LATEST"), "w") as f:
        f.write("A")
    assert int(checkpoint.restore_any(base)["it"]) == 7
    checkpoint.save_atomic(base, {"it": np.asarray(8)}, keep=2)
    assert int(checkpoint.restore_any(base)["it"]) == 8
    names = [os.path.basename(d) for d in checkpoint.slots(base)]
    assert names == ["A", "s000001"], names

"""Torch interop trainer (scripts/train_torch_bc.py — the fork's
steering-prediction pipeline, SURVEY §2.16): trains on a dtown-format
.npz and reduces validation MSE. Synthetic data keeps it fast; the
sim-driven end of the pipeline is covered by test_imitation /
scripts/gen_data.py."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

# torch is an optional interop dependency (not in pyproject.toml); skip
# cleanly where absent instead of an opaque subprocess ModuleNotFoundError
pytest.importorskip("torch")

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(npz, *extra, allow_no_improve=False):
    r = subprocess.run(
        [sys.executable, os.path.join(ROOT, "scripts", "train_torch_bc.py"),
         "--data", npz, "--epochs", "3", "--batch", "64", *extra],
        capture_output=True, text=True, timeout=300,
    )
    # rc 1 = ran fine but val MSE did not improve — acceptable for smoke
    # tests on random targets (init RNG streams differ across torch
    # releases); anything else is a real failure
    ok = (0, 1) if allow_no_improve else (0,)
    assert r.returncode in ok, r.stdout + r.stderr
    return json.loads(r.stdout.strip().splitlines()[-1])


def test_torch_bc_state_learns(tmp_path):
    rng = np.random.default_rng(0)
    obs = rng.normal(size=(512, 11)).astype(np.float32)
    # learnable mapping: action = linear(obs) squashed
    w = rng.normal(size=(11, 2)).astype(np.float32)
    act = np.tanh(obs @ w)
    p = str(tmp_path / "d.npz")
    np.savez(p, obs=obs, act=act)
    out = _run(p)
    assert out["improved"]
    assert out["final_val_mse"] < 0.5 * out["first_val_mse"]


def test_torch_bc_rgb_runs_and_saves(tmp_path):
    rng = np.random.default_rng(1)
    obs = rng.integers(0, 255, size=(48, 64, 64, 3), dtype=np.uint8)
    act = rng.normal(size=(48, 2)).astype(np.float32) * 0.1
    p = str(tmp_path / "d.npz")
    pt = str(tmp_path / "m.pt")
    np.savez(p, obs=obs, act=act)
    out = _run(p, "--out", pt, allow_no_improve=True)
    assert out["saved"] == pt and os.path.exists(pt)

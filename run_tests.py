#!/usr/bin/env python3
"""Smoke tests over every registered map (reference: run_tests.py —
iterate maps, reset + N random steps, assert obs dtype/shape/range,
exercise wrappers, survive episode end; SURVEY.md §4).

The real suite is `pytest tests/`; this mirrors the reference's quick
CI entry point.
"""
from __future__ import annotations

import numpy as np

import dtown
from dtown import map_loader
from dtown.wrappers import DiscreteWrapper


def main():
    rng = np.random.default_rng(0)
    for name in map_loader.list_maps():
        env = dtown.make(name, camera_width=32, camera_height=32, seed=1)
        obs = env.reset()
        assert obs.shape == (32, 32, 3) and obs.dtype == np.uint8, name
        for _ in range(10):
            a = rng.uniform(-1, 1, size=2)
            obs, r, done, info = env.step(a)
            assert obs.shape == (32, 32, 3)
            assert np.isfinite(r)
            if done:
                env.reset()
        print(f"[ok] {name}")

    env = DiscreteWrapper(dtown.make("small_loop", camera_width=32,
                                     camera_height=32))
    env.reset()
    for a in (0, 1, 2):
        obs, r, done, info = env.step(a)
    print("[ok] DiscreteWrapper")
    print("all smoke tests passed")


if __name__ == "__main__":
    main()

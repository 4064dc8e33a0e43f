"""Golden-trajectory parity of the JAX dynamics against the numpy oracle
(reference equations per SURVEY.md §3.2; BASELINE.md config 1)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dtown import constants as C
from dtown.dynamics import physics_substep, update_pos, wheel_model

import reference_impl as ref


def test_wheel_model_matches_reference():
    rng = np.random.default_rng(0)
    for _ in range(50):
        action = rng.uniform(-1.5, 1.5, size=2)
        ours = np.asarray(
            wheel_model(
                jnp.asarray(action, jnp.float32),
                C.DEFAULT_GAIN, C.DEFAULT_TRIM, C.DEFAULT_WHEEL_RADIUS,
                C.DEFAULT_K, C.DEFAULT_LIMIT, C.WHEEL_DIST,
            )
        )
        theirs = ref.wheel_model(action)
        np.testing.assert_allclose(ours, theirs, rtol=1e-6, atol=1e-6)


def test_update_pos_straight_exact():
    pos = jnp.array([1.0, 0.0, 2.0], jnp.float32)
    angle = jnp.asarray(0.7, jnp.float32)
    wv = jnp.array([0.5, 0.5], jnp.float32)
    new_pos, new_angle = update_pos(pos, angle, C.WHEEL_DIST, wv, 1.0 / 30)
    rp, ra = ref.update_pos(
        np.array([1.0, 0.0, 2.0]), 0.7, C.WHEEL_DIST, np.array([0.5, 0.5]),
        1.0 / 30,
    )
    np.testing.assert_allclose(np.asarray(new_pos), rp, rtol=1e-6)
    assert float(new_angle) == pytest.approx(ra)


def test_update_pos_arc_matches_reference():
    rng = np.random.default_rng(1)
    for _ in range(100):
        pos = rng.uniform(-3, 3, size=3)
        pos[1] = 0.0
        angle = rng.uniform(-np.pi, np.pi)
        wv = rng.uniform(-1.2, 1.2, size=2)
        dt = 1.0 / 30
        ours_pos, ours_angle = update_pos(
            jnp.asarray(pos, jnp.float32), jnp.float32(angle),
            C.WHEEL_DIST, jnp.asarray(wv, jnp.float32), dt,
        )
        rp, ra = ref.update_pos(pos, angle, C.WHEEL_DIST, wv, dt)
        np.testing.assert_allclose(np.asarray(ours_pos), rp, rtol=2e-4, atol=2e-5)
        assert float(ours_angle) == pytest.approx(ra, rel=2e-4, abs=2e-5)


def test_pivot_about_stationary_wheel():
    """Vl = 0: robot pivots about the left wheel; it must stay in place."""
    pos = jnp.array([0.0, 0.0, 0.0], jnp.float32)
    angle = jnp.float32(0.0)
    wv = jnp.array([0.0, 0.8], jnp.float32)
    # left wheel position = pos - (WHEEL_DIST/2) * right_vec... (right_vec(0)=+z)
    left_wheel = np.array([0.0, 0.0, -C.WHEEL_DIST / 2])
    p, a = pos, angle
    for _ in range(40):
        p, a = update_pos(p, a, C.WHEEL_DIST, wv, 1.0 / 30)
    # The left wheel (center of rotation) should not move
    from dtown.geometry import get_right_vec

    lw = np.asarray(p - (C.WHEEL_DIST / 2) * get_right_vec(a))
    np.testing.assert_allclose(lw, left_wheel, atol=1e-5)
    assert float(a) > 0.0  # turning left increases the heading


def test_trajectory_parity_500_steps():
    """Full 500-step action-sequence trajectory parity (milestone A)."""
    rng = np.random.default_rng(42)
    actions = rng.uniform(-1.0, 1.0, size=(500, 2))

    # oracle
    rp = np.array([1.0, 0.0, 1.0])
    ra = 0.3
    ref_traj = []
    for act in actions:
        wheels = ref.wheel_model(act)
        rp, ra, _ = ref.physics_substep(rp, ra, wheels, 1.0 / 30)
        ref_traj.append((rp.copy(), ra))

    # jax engine, scanned
    def step_fn(carry, act):
        p, a = carry
        wheels = wheel_model(
            act, C.DEFAULT_GAIN, C.DEFAULT_TRIM, C.DEFAULT_WHEEL_RADIUS,
            C.DEFAULT_K, C.DEFAULT_LIMIT, C.WHEEL_DIST,
        )
        wheels = jnp.clip(wheels, -1, 1)
        p, a, speed, _ = physics_substep(
            p, a, wheels, jnp.float32(C.DEFAULT_ROBOT_SPEED),
            C.WHEEL_DIST, 1.0 / 30,
        )
        return (p, a), (p, a)

    (_, _), (traj_p, traj_a) = jax.lax.scan(
        step_fn,
        (jnp.array([1.0, 0.0, 1.0], jnp.float32), jnp.float32(0.3)),
        jnp.asarray(actions, jnp.float32),
    )
    ref_p = np.stack([p for p, _ in ref_traj])
    ref_a = np.array([a for _, a in ref_traj])
    np.testing.assert_allclose(np.asarray(traj_p), ref_p, atol=2e-3)
    np.testing.assert_allclose(np.asarray(traj_a), ref_a, atol=2e-3)


def test_trajectory_parity_float64_bit_level():
    """With x64 enabled the engine matches the oracle to ~1e-12 over 200
    steps (bit-for-bit up to transcendental libm differences)."""
    from jax import config as jax_config

    try:
        jax_config.update("jax_enable_x64", True)
        rng = np.random.default_rng(7)
        actions = rng.uniform(-1.0, 1.0, size=(200, 2))
        rp = np.array([1.0, 0.0, 1.0])
        ra = 0.3
        p = jnp.asarray(rp)
        a = jnp.asarray(ra)
        for act in actions:
            wheels = ref.wheel_model(act)
            rp, ra, _ = ref.physics_substep(rp, ra, wheels, 1.0 / 30)
            jw = jnp.clip(
                wheel_model(
                    jnp.asarray(act), C.DEFAULT_GAIN, C.DEFAULT_TRIM,
                    C.DEFAULT_WHEEL_RADIUS, C.DEFAULT_K, C.DEFAULT_LIMIT,
                    C.WHEEL_DIST,
                ), -1, 1,
            )
            p, a, _, _ = physics_substep(
                p, a, jw, jnp.asarray(C.DEFAULT_ROBOT_SPEED), C.WHEEL_DIST,
                1.0 / 30,
            )
        np.testing.assert_allclose(np.asarray(p), rp, atol=1e-11)
        assert float(a) == pytest.approx(ra, abs=1e-11)
    finally:
        jax_config.update("jax_enable_x64", False)

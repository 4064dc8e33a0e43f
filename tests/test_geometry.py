"""Bezier / lane-geometry unit + property tests (SURVEY.md §4: the pure
JAX core admits real unit tests the reference never had)."""
import numpy as np

import jax.numpy as jnp

from dtown import curves as curves_lib
from dtown import types as T
from dtown.geometry import (
    bezier_closest,
    bezier_point,
    bezier_tangent,
    get_dir_vec,
    get_right_vec,
    rotate_point_xz,
)

import reference_impl as ref


def test_dir_right_vec_convention():
    for a in np.linspace(-np.pi, np.pi, 17):
        np.testing.assert_allclose(
            np.asarray(get_dir_vec(jnp.float32(a))), ref.get_dir_vec(a),
            atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(get_right_vec(jnp.float32(a))), ref.get_right_vec(a),
            atol=1e-6,
        )


def test_rotate_point_matches_reference():
    rng = np.random.default_rng(3)
    for _ in range(50):
        px, pz, cx, cz, th = rng.uniform(-2, 2, size=5)
        ours = rotate_point_xz(
            jnp.float32(px), jnp.float32(pz), jnp.float32(cx),
            jnp.float32(cz), jnp.float32(th),
        )
        theirs = ref.rotate_point(px, pz, cx, cz, th)
        np.testing.assert_allclose(
            [float(ours[0]), float(ours[1])], theirs, atol=1e-5
        )


def test_bezier_point_tangent_match_reference():
    rng = np.random.default_rng(4)
    cps = rng.uniform(-1, 1, size=(4, 3))
    for t in np.linspace(0, 1, 11):
        np.testing.assert_allclose(
            np.asarray(bezier_point(jnp.asarray(cps, jnp.float32), jnp.float32(t))),
            ref.bezier_point(cps, t), atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(bezier_tangent(jnp.asarray(cps, jnp.float32), jnp.float32(t))),
            ref.bezier_tangent(cps, t), atol=1e-5,
        )


def test_bezier_closest_matches_reference_bisection():
    """Same fixed-depth bisection -> same t, for random query points."""
    rng = np.random.default_rng(5)
    cps = np.array(
        [[-0.2, 0, -0.5], [-0.2, 0, -0.25], [-0.2, 0, 0.25], [-0.2, 0, 0.5]]
    )
    for _ in range(30):
        p = rng.uniform(-0.6, 0.6, size=3)
        p[1] = 0.0
        t_ours = float(
            bezier_closest(jnp.asarray(cps, jnp.float32), jnp.asarray(p, jnp.float32))
        )
        t_ref = ref.bezier_closest(cps, p)
        assert abs(t_ours - t_ref) < 1e-6


def test_bezier_closest_near_optimal():
    """Property: the bisection result is within 2/2^8 of the true argmin."""
    rng = np.random.default_rng(6)
    for _ in range(20):
        cps = rng.uniform(-1, 1, size=(4, 3))
        cps[:, 1] = 0
        p = rng.uniform(-1, 1, size=3)
        p[1] = 0
        t = float(bezier_closest(jnp.asarray(cps, jnp.float32), jnp.asarray(p, jnp.float32)))
        ts = np.linspace(0, 1, 2001)
        dists = np.linalg.norm(
            np.stack([ref.bezier_point(cps, tt) for tt in ts]) - p, axis=1
        )
        t_best = ts[np.argmin(dists)]
        d_t = np.linalg.norm(ref.bezier_point(cps, t) - p)
        d_best = dists.min()
        # bisection on a possibly multi-modal distance need not find the
        # global optimum, but must match the reference's answer (above)
        # and be locally sensible on lane-like curves
        assert d_t <= d_best + 0.15


def test_curve_generator_reproduces_reference_tables():
    """The port/maneuver generator must reproduce the reference's
    hardcoded straight/curve control points (simulator.py::_get_curve)."""
    straight = curves_lib.tile_curves(T.TILE_STRAIGHT)
    expected_0 = np.array(
        [[-0.2, 0, -0.5], [-0.2, 0, -0.25], [-0.2, 0, 0.25], [-0.2, 0, 0.5]]
    )
    expected_1 = np.array(
        [[0.2, 0, 0.5], [0.2, 0, 0.25], [0.2, 0, -0.25], [0.2, 0, -0.5]]
    )
    got = {tuple(np.round(c[0], 3)) for c in straight}
    np.testing.assert_allclose(straight[0], expected_0, atol=1e-9)
    np.testing.assert_allclose(straight[1], expected_1, atol=1e-9)

    left = curves_lib.tile_curves(T.TILE_CURVE_LEFT)
    expected_left0 = np.array(
        [[-0.2, 0, -0.5], [-0.2, 0, 0.0], [0.0, 0, 0.2], [0.5, 0, 0.2]]
    )
    np.testing.assert_allclose(left[0], expected_left0, atol=1e-9)

    right = curves_lib.tile_curves(T.TILE_CURVE_RIGHT)
    expected_right0 = np.array(
        [[-0.2, 0, -0.5], [-0.2, 0, -0.2], [-0.3, 0, -0.2], [-0.5, 0, -0.2]]
    )
    np.testing.assert_allclose(right[0], expected_right0, atol=1e-9)


def test_curve_counts():
    assert curves_lib.tile_curves(T.TILE_STRAIGHT).shape[0] == 2
    assert curves_lib.tile_curves(T.TILE_CURVE_LEFT).shape[0] == 2
    assert curves_lib.tile_curves(T.TILE_3WAY_LEFT).shape[0] == 6
    assert curves_lib.tile_curves(T.TILE_4WAY).shape[0] == 12
    assert curves_lib.tile_curves(T.TILE_GRASS).shape[0] == 0

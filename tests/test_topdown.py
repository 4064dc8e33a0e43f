"""render(mode='top_down') — bird's-eye map view with an agent marker
(reference: simulator.py render(mode='top_down'), SURVEY.md §3.5)."""
import numpy as np

import dtown


def _red_centroid(img):
    red = (img[..., 0] > 180) & (img[..., 1] < 90) & (img[..., 2] < 90)
    assert red.sum() > 3, "agent marker missing"
    ys, xs = np.nonzero(red)
    return ys.mean(), xs.mean()


def test_top_down_shape_and_marker():
    env = dtown.make("Duckietown-loop_obstacles-v0", camera_width=128,
                     camera_height=128, obs_type="state")
    env.reset()
    img = env.render("top_down")
    assert img.shape == (128, 128, 3) and img.dtype == np.uint8
    assert img.std() > 10.0  # a real scene, not a flat fill
    _red_centroid(img)


def test_top_down_marker_tracks_agent():
    """Marker position maps world x -> columns, world z -> rows
    (screen up = -z, screen right = +x: the yaml tile layout)."""
    ys, xs = [], []
    for tile in [(1, 1), (5, 1), (1, 5)]:
        env = dtown.make("Duckietown-udem1-v0", camera_width=128,
                         camera_height=96, obs_type="state",
                         user_tile_start=tile, start_pose=None)
        env.reset()
        y, x = _red_centroid(env.render("top_down"))
        ys.append(y)
        xs.append(x)
    assert xs[1] > xs[0] + 10   # +i tiles -> right
    assert abs(ys[1] - ys[0]) < 6
    assert ys[2] > ys[0] + 10   # +j tiles -> down
    assert abs(xs[2] - xs[0]) < 6


def test_top_down_objects_visible():
    """Distance culling must be disabled for the overhead camera:
    loop_obstacles duckies (yellow) are visible from 10 m up."""
    env = dtown.make("Duckietown-loop_obstacles-v0", camera_width=160,
                     camera_height=160, obs_type="state")
    env.reset()
    img = env.render("top_down").astype(np.int32)
    yellow = (img[..., 0] > 150) & (img[..., 1] > 120) & (img[..., 2] < 100)
    assert yellow.sum() > 10

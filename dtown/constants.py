"""Physical and simulation constants for the Duckietown engine.

Parity-critical values recorded from the reference simulator's module-level
constants (reference: gym_duckietown/simulator.py ~L40-110, per SURVEY.md
§2.2a; the reference mount was empty, so SURVEY.md is the authoritative spec).

Coordinate convention (matches the reference): y-up, ground is the x-z plane,
heading ``angle`` is about +y with

    dir_vec(theta)   = ( cos(theta), 0, -sin(theta))
    right_vec(theta) = ( sin(theta), 0,  cos(theta))

(reference: simulator.py::get_dir_vec / ::get_right_vec).
"""

# --- Camera ------------------------------------------------------------
DEFAULT_CAMERA_WIDTH = 640
DEFAULT_CAMERA_HEIGHT = 480
CAMERA_FOV_Y = 42.0          # degrees, vertical FOV (randomized +-5 deg)
CAMERA_FLOOR_DIST = 0.108    # m, camera height above ground
CAMERA_FORWARD_DIST = 0.066  # m, camera forward offset from axle center
CAMERA_ANGLE = 19.15         # degrees, downward pitch
CAMERA_NEAR = 0.04           # m, near clip plane
CAMERA_FAR = 100.0           # m, far clip plane

# --- Robot body --------------------------------------------------------
WHEEL_DIST = 0.102           # m, distance between the two drive wheels
ROBOT_WIDTH = 0.13 + 0.02    # m, with wheel protrusion (bbox width)
ROBOT_LENGTH = 0.18          # m
ROBOT_HEIGHT = 0.12          # m
SAFETY_RAD_MULT = 1.8
AGENT_SAFETY_RAD = (max(ROBOT_LENGTH, ROBOT_WIDTH) / 2.0) * SAFETY_RAD_MULT
MIN_SPAWN_OBJ_DIST = 0.25    # m, spawn clearance from objects

# --- Dynamics ----------------------------------------------------------
DEFAULT_ROBOT_SPEED = 1.20   # m/s, wheel-velocity scale
DEFAULT_FRAMERATE = 30       # Hz; integration step dt = 1/30 s
DEFAULT_FRAME_SKIP = 1
DEFAULT_MAX_STEPS = 1500     # truncation horizon
DEFAULT_ACCEPT_START_ANGLE_DEG = 60.0  # spawn heading tolerance vs lane tangent
MAX_SPAWN_ATTEMPTS = 5000

# --- Wheel-model (DuckietownEnv) inverse-kinematics defaults -----------
# (reference: envs/duckietown_env.py::DuckietownEnv.__init__)
DEFAULT_GAIN = 1.0
DEFAULT_TRIM = 0.0
DEFAULT_WHEEL_RADIUS = 0.0318  # m
DEFAULT_K = 27.0
DEFAULT_LIMIT = 1.0

# --- Reward ------------------------------------------------------------
REWARD_INVALID_POSE = -1000.0
# compute_reward coefficients (reference: simulator.py::compute_reward):
#   reward = +1.0 * speed * dot_dir - 10 * |dist| + 40 * col_penalty
REWARD_SPEED_COEF = 1.0
REWARD_DIST_COEF = -10.0
REWARD_COLLISION_COEF = 40.0
# Nav task goal-tile bonus (reference: envs/duckietown_env.py::
# DuckietownNav ends the episode on the goal tile; the bonus magnitude
# is ours — the reference mount was empty, SURVEY records no value)
NAV_GOAL_REWARD = 500.0

# --- Map ---------------------------------------------------------------
DEFAULT_TILE_SIZE = 0.585    # m (map yaml `tile_size`)
DEFAULT_MAP_NAME = "udem1"

# --- Bezier lane geometry ----------------------------------------------
BEZIER_CLOSEST_ITERS = 8     # recursive-bisection depth in bezier_closest
                             # (reference: graphics.py::bezier_closest n=8)

# Lane centerline offsets in tile-fraction units
# (reference: simulator.py::_get_curve control-point tables).
LANE_OFFSET = 0.20           # lane center is 0.20*tile_size from road center

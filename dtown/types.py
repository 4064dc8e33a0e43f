"""Core datatypes: static config, map arrays, env state.

Design (SURVEY.md §7): every reference Simulator method becomes a pure
function ``f(cfg, maps, state, ...) -> (state, out)``.

* ``EnvConfig`` is a frozen, hashable stdlib dataclass — it is a *static*
  argument to jit and therefore part of the compilation cache key (the
  reference's constructor kwargs, simulator.py::Simulator.__init__).
* ``MapArrays`` is the compiled, array-only form of a map yaml — the
  reference's ``_load_map`` products (tile dicts, baked bezier curves,
  stacked object corners/norms) flattened into static-shape jnp arrays.
* ``EnvState`` is the full per-env simulation state as a pytree of arrays;
  batching over envs is a ``vmap`` over this pytree.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax.numpy as jnp
from flax import struct

from dtown import constants as C

Array = Any  # jax array alias for annotations


# --- Tile kind enumeration (reference: map yaml tokens, SURVEY §2.10) ----
TILE_EMPTY = 0        # non-road, non-drivable, no texture (out of grid)
TILE_STRAIGHT = 1
TILE_CURVE_LEFT = 2
TILE_CURVE_RIGHT = 3
TILE_3WAY_LEFT = 4
TILE_3WAY_RIGHT = 5
TILE_4WAY = 6
TILE_ASPHALT = 7
TILE_GRASS = 8
TILE_FLOOR = 9

TILE_KINDS = {
    "empty": TILE_EMPTY,
    "straight": TILE_STRAIGHT,
    "curve_left": TILE_CURVE_LEFT,
    "curve_right": TILE_CURVE_RIGHT,
    "3way_left": TILE_3WAY_LEFT,
    "3way_right": TILE_3WAY_RIGHT,
    "4way": TILE_4WAY,
    "asphalt": TILE_ASPHALT,
    "grass": TILE_GRASS,
    "floor": TILE_FLOOR,
}
TILE_KIND_NAMES = {v: k for k, v in TILE_KINDS.items()}
DRIVABLE_KINDS = (
    TILE_STRAIGHT,
    TILE_CURVE_LEFT,
    TILE_CURVE_RIGHT,
    TILE_3WAY_LEFT,
    TILE_3WAY_RIGHT,
    TILE_4WAY,
)

# --- Object kind enumeration (reference: map yaml `objects:` kinds) -----
OBJ_KINDS = [
    "duckie",
    "duckiebot",
    "cone",
    "barrier",
    "tree",
    "house",
    "truck",
    "bus",
    "building",
    "sign_stop",
    "sign_T_intersect",
    "sign_yield",
    "sign_left_T_intersect",
    "sign_right_T_intersect",
    "sign_4_way_intersect",
    "sign_do_not_enter",
    "sign_oneway_left",
    "sign_oneway_right",
    "sign_duck_crossing",
    "sign_pedestrian",
    "trafficlight",
]
OBJ_KIND_IDS = {k: i for i, k in enumerate(OBJ_KINDS)}


@dataclasses.dataclass(frozen=True)
class EnvConfig:
    """Static environment configuration — hashable jit cache key.

    Mirrors the reference's constructor kwargs
    (simulator.py::Simulator.__init__ + envs/duckietown_env.py).
    """

    # Observation
    obs_type: str = "rgb"  # "rgb" (on-device camera) | "state" (pose vector)
    camera_width: int = 64
    camera_height: int = 64
    grayscale: bool = False
    render_objects: bool = True
    max_visible_objects: int = 8  # nearest-K object culling in the renderer
    obj_cull_dist: float = 4.0  # m; objects farther than this are sub-pixel
    # Size-aware per-primitive LOD cull (EXTENSION; the reference renders
    # every mesh at full fidelity at any distance): a primitive whose
    # model bounding radius subtends fewer than obj_lod_px PIXELS of
    # vertical resolution is dropped, i.e. its cull distance is
    # min(obj_cull_dist, r_world / tan(obj_lod_px * fov_y / camera_height))
    # — resolution-aware, so native 640x480 keeps near-full fidelity
    # while 64x64 RL frames skip sub-pixel detail prims (duckie eyes,
    # sign poles) early. The angular threshold uses the NOMINAL fov even
    # under domain rand (the cull table must be static). 0 disables.
    # Default 2.0 adopted r5: every probe row (scripts/lod_probe.py,
    # udem1/loop_obstacles/bigtown x 64/96) passes the gate (mean
    # |diff| < 1, frac>10 < 1%) with >=10x margin, and it carries the
    # throughput wins (udem1 +15%, config-4 +21%, driver config +3.4%).
    obj_lod_px: float = 2.0
    # Analytic anti-aliasing of lane-marking edges — the TPU-native
    # counterpart of the reference's multisample FBO resolve (SURVEY
    # §2.6 create_frame_buffers(w, h, samples)): marking masks become
    # exact box-filter coverages over the per-pixel ground footprint
    # (render/shading.py::line_coverage), so one-pixel markings ramp
    # instead of staircasing/shimmering at RL resolutions. Applied by
    # every renderer; object silhouettes stay 1-sample (the reference's
    # MSAA also mattered most on the high-contrast road markings).
    marking_aa: bool = True
    renderer: str = "xla"  # "xla" (vmapped, reference) | "pallas" (fused kernel)
    distortion: bool = False
    # Object mesh fidelity in the XLA renderer: "prims" ray-casts the
    # primitive-soup models (fast path); "triangles" ray-casts the
    # fixed-budget triangle buffers of OBJ-registered kinds
    # (objmesh.register_custom_object) at reference mesh fidelity.
    mesh_fidelity: str = "prims"

    # Episode handling
    auto_reset: bool = True  # in-graph reset when done (vectorized idiom)

    # Dynamics
    frame_skip: int = C.DEFAULT_FRAME_SKIP
    frame_rate: int = C.DEFAULT_FRAMERATE
    max_steps: int = C.DEFAULT_MAX_STEPS
    robot_speed: float = C.DEFAULT_ROBOT_SPEED

    # Wheel-model inverse kinematics (DuckietownEnv); if use_wheel_model is
    # False the action is raw [u_l, u_r] wheel commands (Simulator API).
    use_wheel_model: bool = True
    gain: float = C.DEFAULT_GAIN
    trim: float = C.DEFAULT_TRIM
    wheel_radius: float = C.DEFAULT_WHEEL_RADIUS
    k: float = C.DEFAULT_K
    limit: float = C.DEFAULT_LIMIT

    # Reset / spawn
    domain_rand: bool = False
    accept_start_angle_deg: float = C.DEFAULT_ACCEPT_START_ANGLE_DEG
    # "bank": draw from the precomputed spawn bank (fast path; host-side
    # rejection sampling at map-compile time, spawn_bank.py).
    # "rejection": full in-graph rejection loop, semantically closest to
    # the reference but far slower under vmapped auto-reset.
    spawn_mode: str = "bank"
    spawn_attempts: int = 32  # in-graph loop budget for "rejection" mode
    # Start-pose overrides (reference: Simulator.__init__ kwargs
    # user_tile_start + the fork's start-pose path — both skip the spawn
    # sampling loop, SURVEY §3.4). user_tile_start: (i, j) tile coords;
    # the agent starts at that tile's center heading along its lane.
    # start_pose: (x, z, angle) exact world pose (takes precedence).
    user_tile_start: tuple | None = None
    start_pose: tuple | None = None

    # Debug overlays (reference: Simulator draw_curve / draw_bbox flags,
    # SURVEY §3.3) — ground-plane overlays in the XLA renderer.
    draw_curve: bool = False
    draw_bbox: bool = False

    # Extended per-step info (reference: full_transparency kwarg —
    # get_agent_info returns the full simulator state every step).
    full_transparency: bool = False

    # Reward
    collision_termination: bool = True
    # Nav-task goal-distance shaping (EXTENSION, default off — the
    # reference's DuckietownNav pays only the terminal goal bonus):
    # potential-based term coef * (d_prev - d_next) on the euclidean
    # goal distance each step, which preserves optimal policies (Ng et
    # al. 1999) while giving the sparse goal a dense gradient. Applied
    # identically by tasks.nav_step and the fused state kernel.
    nav_shaping_coef: float = 0.0

    @property
    def delta_time(self) -> float:
        return 1.0 / self.frame_rate

    @property
    def obs_channels(self) -> int:
        return 1 if self.grayscale else 3


@struct.dataclass
class MapArrays:
    """Compiled static map data. All arrays; leading map-stack axis optional.

    Replaces the reference's per-tile dict grid + per-object python objects
    (simulator.py::_load_map, ::_get_curve, objects.py, collision.py
    precomputation) with fixed-shape arrays.
    """

    # Tile grid [H, W] (H rows along z, W cols along x; tiles[j][i] like the
    # reference's yaml ordering)
    tile_kind: Array       # int32 [H, W]
    tile_angle: Array      # int32 [H, W], 0..3 (multiples of 90 deg)
    drivable: Array        # bool  [H, W]
    tile_tex: Array        # int32 [H, W] base texture id for the renderer

    # Baked bezier lane curves per tile, world-space control points
    # (reference: simulator.py::_get_curve). C = max curves per tile.
    curves: Array          # f32 [H, W, C, 4, 3]
    curve_mask: Array      # bool [H, W, C]

    # Static objects, stacked (reference: collision.py precompute)
    obj_pos: Array         # f32 [M, 3]
    obj_y_rot: Array       # f32 [M] radians
    obj_scale: Array       # f32 [M]
    obj_kind: Array        # int32 [M]
    obj_corners: Array     # f32 [M, 4, 2] footprint corners in (x, z)
    obj_norms: Array       # f32 [M, 2, 2] SAT axes per obj
    obj_safety_rad: Array  # f32 [M]
    obj_height: Array      # f32 [M]
    obj_halfdims: Array    # f32 [M, 2] half (width_x, depth_z) footprint
    obj_mask: Array        # bool [M] (False = padding slot)
    obj_optional: Array    # bool [M]
    obj_is_dynamic: Array  # bool [M] (duckie pedestrians / duckiebots / lights)
    obj_walk_dist: Array   # f32 [M] duckie walk distance before reversing
                           # (reference: DuckieObj walk_distance; map yaml
                           # `walk_distance:` override, default 0.25 m)

    # Spawn support
    tile_size: Array       # f32 scalar
    drivable_frac: Array   # f32 [H*W] normalized probability over drivable tiles
    # Precomputed spawn bank (host-side rejection sampling; spawn_bank.py)
    spawn_pos: Array       # f32 [K, 3]
    spawn_angle: Array     # f32 [K]
    spawn_lane_deg: Array  # f32 [K] lane angle of each pose (runtime filter)
    spawn_mask: Array      # bool [K]

    @property
    def grid_shape(self):
        return self.tile_kind.shape[-2], self.tile_kind.shape[-1]

    @property
    def max_curves(self):
        return self.curves.shape[-3]

    @property
    def max_objects(self):
        return self.obj_pos.shape[-2]


@struct.dataclass
class DynObjState:
    """Per-map dynamic-object state, batched over the object slot axis [M].

    Covers the reference's DuckieObj (walking pedestrian), TrafficLightObj
    (phase timer) and DuckiebotObj (scripted lane follower) — objects.py.
    Slots that are not dynamic are masked by MapArrays.obj_is_dynamic.
    """

    pos: Array        # f32 [M, 3] current position
    angle: Array      # f32 [M]   current heading (y-rot, radians)
    vel: Array        # f32 [M]   walk / drive speed (m/s)
    walk_dist: Array  # f32 [M]   distance walked along current leg (DuckieObj)
    wiggle: Array     # f32 [M]   gait wiggle amplitude (rad)
    phase: Array      # int32 [M] traffic-light phase
    time: Array       # f32 [M]   accumulated object time


@struct.dataclass
class LanePosition:
    """Lane-relative pose (reference: simulator.py::get_lane_pos2)."""

    dist: Array      # signed distance to lane centerline (left +, right -)
    dot_dir: Array   # alignment of heading with curve tangent, clipped [-1,1]
    angle_deg: Array
    angle_rad: Array
    in_lane: Array   # bool; replaces the reference's NotInLane exception


@struct.dataclass
class EnvState:
    """Complete per-env simulation state (pytree; vmap over leading axis)."""

    pos: Array           # f32 [3]
    angle: Array         # f32 []
    step_count: Array    # int32 []
    speed: Array         # f32 [] |delta_pos|/dt of last physics substep
    wheel_vels: Array    # f32 [2] last wheel velocities (m/s)
    last_action: Array   # f32 [2]
    rng: Array           # jax PRNG key
    map_idx: Array       # int32 [] index into a stacked MapArrays

    # Domain-randomization draws (reference: Simulator.reset, SURVEY §3.4);
    # identity values when domain_rand=False.
    robot_speed: Array   # f32 []
    cam_fov_y: Array     # f32 [] degrees
    cam_height: Array    # f32 []
    cam_angle: Array     # f32 [] degrees (downward pitch)
    cam_fwd_dist: Array  # f32 []
    wheel_dist: Array    # f32 []
    light_dir: Array     # f32 [3] normalized light direction
    light_ambient: Array # f32 []
    ground_color: Array  # f32 [3]
    horizon_color: Array # f32 [3]
    tex_seed: Array      # int32 [] seed of the per-tile variant hash
    tex_variant: Array   # int32 [H, W] per-tile texture variant pick
                         # (= variant_hash(tile_id, tex_seed))
    obj_visible: Array   # bool [M] optional-object visibility draw

    dyn: DynObjState     # dynamic object states


@struct.dataclass
class StepOutput:
    obs: Array       # uint8 [h, w, c]
    reward: Array    # f32 []
    done: Array      # bool []
    # info fields (reference: Simulator.get_agent_info, kept as arrays)
    lane_dist: Array
    lane_dot_dir: Array
    lane_angle_deg: Array
    in_lane: Array
    collision: Array  # bool []
    timestamp: Array  # f32 []


def tree_dtype(x, dtype):
    """Cast all float leaves of a pytree to dtype."""
    import jax

    def cast(leaf):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            return leaf.astype(dtype)
        return leaf

    return jax.tree_util.tree_map(cast, x)

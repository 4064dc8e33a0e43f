"""Fisheye camera distortion as a precomputed remap gather.

The reference warps the rendered rectilinear image with the Duckiebot's
fisheye calibration through cv2.remap (reference:
distortion.py::Distortion.distort — hard-coded K/D/R/P matrices,
SURVEY.md §2.14). Here the same plumb-bob radial model is inverted
offline (host numpy, Newton iterations) into a static source-coordinate
grid; applying distortion on device is then a single gather — no OpenCV,
no host round-trip.

The exact calibration numbers are not recorded in SURVEY.md (empty
reference mount); the defaults below are representative Duckiebot-class
values expressed resolution-independently.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# Normalized intrinsics (fraction of width/height) and radial coefficients
FX, FY = 0.477, 0.643
CX, CY = 0.5, 0.5
K1, K2, K3 = -0.28, 0.07, 0.0


@functools.lru_cache(maxsize=None)
def _undistort_coords(width: int, height: int):
    """Newton-inverted undistorted normalized coords (xu, yu) [H, W] at
    every destination (fisheye) pixel center."""
    fx, fy = FX * width, FY * height
    cx, cy = CX * width, CY * height

    u, v = np.meshgrid(np.arange(width) + 0.5, np.arange(height) + 0.5)
    # normalized distorted coordinates
    xd = (u - cx) / fx
    yd = (v - cy) / fy

    # invert r_d = r_u * (1 + k1 r_u^2 + k2 r_u^4 + k3 r_u^6) by Newton
    rd = np.hypot(xd, yd)
    ru = rd.copy()
    for _ in range(8):
        f = ru * (1 + K1 * ru**2 + K2 * ru**4 + K3 * ru**6) - rd
        fp = 1 + 3 * K1 * ru**2 + 5 * K2 * ru**4 + 7 * K3 * ru**6
        ru = ru - f / np.maximum(fp, 1e-6)
    scale = np.where(rd > 1e-9, ru / np.maximum(rd, 1e-9), 1.0)
    return xd * scale, yd * scale


@functools.lru_cache(maxsize=None)
def _remap_grid(width: int, height: int):
    """Integer source-pixel grid [H, W] (flattened index) for the warp."""
    fx, fy = FX * width, FY * height
    cx, cy = CX * width, CY * height
    xu, yu = _undistort_coords(width, height)
    su = np.clip((xu * fx + cx).astype(np.int32), 0, width - 1)
    sv = np.clip((yu * fy + cy).astype(np.int32), 0, height - 1)
    return sv * width + su  # numpy: trace-safe cached constant


@functools.lru_cache(maxsize=None)
def undistorted_ndc(width: int, height: int):
    """Per-pixel NDC ray factors implementing the fisheye AT RAY LEVEL.

    The renderers build camera rays as d = fwd + xn*right + yn*up with
    xn = xn_b * tan(fov_x/2), yn = yn_b * tan(fov_y/2) and LINEAR ramps
    xn_b = ((x+.5)/W - .5)*2, yn_b = (.5 - (y+.5)/H)*2. Substituting
    xn_b -> 2*FX*xu, yn_b -> -2*FY*yu (this function) renders destination
    pixel p directly along the ray the post-render remap would have
    sampled at the CONTINUOUS source coordinate (the remap then floors it
    to the nearest source pixel): with cx = W/2, the remap source
    u* = xu*fx + cx maps to xn = (u*/W - .5)*2*tanx = 2*FX*xu*tanx.

    Ray-level distortion is therefore exact (no nearest-neighbor
    resample), free (the ramp was per-pixel math anyway), composes with
    per-env DR fov scaling identically (the remap acted on pixels,
    independent of fov), and works at any resolution (no [HW, HW]
    permutation matrix). Returns float32 (xb, yb), each [H, W]; numpy
    (trace-safe cached constant).
    """
    xu, yu = _undistort_coords(width, height)
    return (
        (2.0 * FX * xu).astype(np.float32),
        (-2.0 * FY * yu).astype(np.float32),
    )


def apply_distortion(cfg, rgb):
    """Warp a rectilinear frame [H, W, C] into the fisheye view."""
    H, W = cfg.camera_height, cfg.camera_width
    grid = jnp.asarray(_remap_grid(W, H))
    flat = rgb.reshape(H * W, rgb.shape[-1])
    return flat[grid.reshape(-1)].reshape(H, W, rgb.shape[-1])


@functools.lru_cache(maxsize=None)
def _perm_matrix_bf16(width: int, height: int):
    """The remap as a [HW, HW] one-hot permutation matrix (bf16).

    Gathers are pathologically slow on the target TPU runtime; a static
    permutation applied as ONE bf16 matmul runs on the MXU instead —
    out[p] = sum_q P[p, q] * img[q] with P one-hot rows.
    """
    hw = width * height
    grid = np.asarray(_remap_grid(width, height)).reshape(-1)
    P = np.zeros((hw, hw), dtype=np.float32)
    P[np.arange(hw), grid] = 1.0
    return P  # cached as numpy; cast at use (trace-safe)


# Above this pixel count the dense [HW, HW] permutation matrix becomes
# memory-prohibitive ((H*W)^2 * 2 bytes: ~128 MB at 128x128, ~170 GB at
# the reference 640x480); fall back to the gather-based warp there.
PERM_MATMUL_MAX_PIXELS = 96 * 96


def apply_distortion_planes(cfg, planes):
    """Fisheye warp for the fused renderer's uint8 channel planes
    [B, C, S, 128] (C=3 RGB or 1 luma) — one bf16 permutation matmul, no
    gathers. Large resolutions fall back to the gather path (dense
    matrix too big).

    LEGACY post-render path: production renderers bake the distortion
    into the per-pixel ray table instead (undistorted_ndc), which is
    exact and free; this warp remains the recorded remap semantics the
    ray-level path is tested against (tests/test_distortion_fused.py).
    """
    B, C = planes.shape[0], planes.shape[1]
    H, W = cfg.camera_height, cfg.camera_width
    hw = H * W
    if hw > PERM_MATMUL_MAX_PIXELS:
        grid = jnp.asarray(_remap_grid(W, H)).reshape(-1)
        flat = planes.reshape(B * C, hw)
        return flat[:, grid].reshape(planes.shape)
    P = jnp.asarray(_perm_matrix_bf16(W, H), jnp.bfloat16)
    flat = planes.reshape(B * C, hw).astype(jnp.bfloat16)
    warped = jax.lax.dot_general(
        flat, P,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out = jnp.clip(warped + 0.5, 0, 255).astype(jnp.uint8)
    return out.reshape(planes.shape)

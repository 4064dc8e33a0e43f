"""Texture-atlas preview derived from the analytic shader.

The live renderer shades tiles procedurally per pixel (render/shading.py
— the TPU-native replacement for the reference's PNG textures +
graphics.py::Texture variant cache). This module rasterizes that shader
onto a texel grid to produce a classic atlas — useful for previews,
docs, and as the reference image in golden tests.

Atlas layout: uint8 [N_KINDS, N_VARIANTS, TEX, TEX, 3].
"""
from __future__ import annotations

import functools

import numpy as np

from dtown import types as T
from dtown.randomization import N_TEX_VARIANTS

TEX = 128  # texels per tile edge


@functools.lru_cache(maxsize=1)
def tile_atlas() -> np.ndarray:
    import jax.numpy as jnp

    from dtown.render.shading import shade_tile

    n_kinds = max(T.TILE_KINDS.values()) + 1
    v, u = np.meshgrid(
        (np.arange(TEX) + 0.5) / TEX, (np.arange(TEX) + 0.5) / TEX,
        indexing="ij",
    )
    u = jnp.asarray(u, jnp.float32)
    v = jnp.asarray(v, jnp.float32)
    atlas = np.zeros((n_kinds, N_TEX_VARIANTS, TEX, TEX, 3), dtype=np.uint8)
    for kind in range(n_kinds):
        for var in range(N_TEX_VARIANTS):
            rgb = shade_tile(
                jnp.full((TEX, TEX), kind, jnp.int32),
                jnp.zeros((TEX, TEX), jnp.int32),
                jnp.full((TEX, TEX), var, jnp.int32),
                u, v,
            )
            atlas[kind, var] = np.asarray(rgb * 255.0 + 0.5, dtype=np.uint8)
    return atlas

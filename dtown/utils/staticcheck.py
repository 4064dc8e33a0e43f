"""Trace-time concreteness helpers."""
from __future__ import annotations

import jax.numpy as jnp


def concrete_any(x, default: bool = True) -> bool:
    """bool(any(x)) when x is concrete; `default` when x is a tracer.

    Used to drop whole compute phases (object SAT, NPC updates, object
    rendering) at trace time for single-map jits where the map arrays are
    closure constants.
    """
    try:
        return bool(jnp.any(x))
    except Exception:
        return default

"""Host-side metric sink with cross-device aggregation.

The reference's observability surface is the per-step ``get_agent_info``
dict plus a pyglet text overlay (SURVEY.md §5 metrics row). The rebuild
keeps per-step info as batched arrays on device; this sink is the host
endpoint: scalar metrics stream in per iteration (already pmean'd across
the mesh inside shard_map — dtown/parallel/shard.py), are aggregated into
running statistics, and optionally append to a JSONL file for offline
plots.
"""
from __future__ import annotations

import json
import time
from typing import Optional

import numpy as np


class MetricSink:
    """Running aggregation of scalar metric dicts + optional JSONL log."""

    def __init__(self, jsonl_path: Optional[str] = None):
        self.path = jsonl_path
        self.history: list[dict] = []
        self._t0 = time.time()
        self._fh = open(jsonl_path, "a") if jsonl_path else None

    def log(self, step: int, metrics: dict, extra: Optional[dict] = None):
        rec = {"step": int(step), "t": round(time.time() - self._t0, 3)}
        for k, v in metrics.items():
            rec[k] = float(np.asarray(v))
        if extra:
            rec.update(extra)
        self.history.append(rec)
        if self._fh:
            self._fh.write(json.dumps(rec) + "\n")
            self._fh.flush()
        return rec

    def summary(self, key: str) -> dict:
        vals = np.asarray([h[key] for h in self.history if key in h])
        if len(vals) == 0:
            return {}
        return {
            "last": float(vals[-1]),
            "mean": float(vals.mean()),
            "min": float(vals.min()),
            "max": float(vals.max()),
            "n": int(len(vals)),
        }

    def improved(self, key: str, head: int = 5, tail: int = 5) -> bool:
        """True if the tail-mean of `key` beats its head-mean (simple
        learning-progress check)."""
        vals = [h[key] for h in self.history if key in h]
        if len(vals) < head + tail:
            return False
        return float(np.mean(vals[-tail:])) > float(np.mean(vals[:head]))

    def close(self):
        if self._fh:
            self._fh.close()
            self._fh = None


def all_device_mean(tree, axis_name):
    """In-graph mesh-wide mean of a metric pytree (jax.lax.pmean wrapper
    for use inside shard_map; XLA lowers it to an ICI all-reduce)."""
    import jax

    return jax.tree_util.tree_map(
        lambda m: jax.lax.pmean(m, axis_name), tree
    )

"""Checkpoint / resume (SURVEY.md §5: absent in the reference; here the
full vectorized env-state pytree + learner params + PRNG keys persist
via orbax, enabling multi-host restart)."""
from __future__ import annotations

import os
import re

import jax


def save(path: str, state_pytree):
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state_pytree, force=True)
    ckptr.wait_until_finished()


def save_atomic(path: str, state_pytree, keep: int = 2):
    """Crash-safe periodic overwrite for elastic training.

    A plain `save(force=True)` DELETES the existing checkpoint before
    writing the new one — a kill during any overwrite loses both
    snapshots (measured: the kill-resume e2e test caught exactly this).
    Here `path` becomes a directory of rotating orbax slots plus a
    pointer file LATEST, flipped by atomic os.replace only after the
    new slot is fully committed: a kill at ANY instant leaves LATEST
    naming one intact snapshot. `restore`/`restore_any` follow the
    pointer transparently (and still accept plain orbax dirs).

    keep: snapshots retained after each save (>= 1; the pointee always
    survives). keep > 2 enables rollback to older iterations: slots()
    lists the retained directories oldest-first, and any of them can be
    passed to restore()/restore_any() directly. Legacy two-slot (A/B)
    directories keep working and rotate into the sequence scheme.
    """
    base = os.path.abspath(path)
    os.makedirs(base, exist_ok=True)
    cur = _read_pointer(base)
    seq = 0
    if cur is not None:
        m = re.match(r"s(\d+)$", cur)
        seq = int(m.group(1)) + 1 if m else 1
    # A lost/corrupt LATEST must not restart numbering below surviving
    # slots: slots() orders by sequence number, so a new s000000 under
    # older s000007+ would invert rotation and pruning (advisor r3).
    # Seed from the highest existing slot instead.
    existing = [int(os.path.basename(d)[1:]) for d in slots(base)
                if re.match(r"s(\d+)$", os.path.basename(d))]
    if existing:
        seq = max(seq, max(existing) + 1)
    nxt = "s%06d" % seq
    save(os.path.join(base, nxt), state_pytree)
    tmp = os.path.join(base, "LATEST.tmp")
    with open(tmp, "w") as f:
        f.write(nxt)
    os.replace(tmp, os.path.join(base, "LATEST"))
    # prune: oldest first, never the just-committed pointee
    import shutil

    old = slots(base)[:-max(1, int(keep))]
    for d in old:
        if os.path.basename(d) != nxt:
            shutil.rmtree(d, ignore_errors=True)


def slots(path: str):
    """Retained save_atomic snapshot directories, oldest-first (legacy
    A/B slots order by mtime before the numbered sequence)."""
    base = os.path.abspath(path)
    if not os.path.isdir(base):
        return []
    legacy, seq = [], []
    for name in os.listdir(base):
        full = os.path.join(base, name)
        if not os.path.isdir(full):
            continue
        if re.match(r"s(\d+)$", name):
            seq.append(full)
        elif name in ("A", "B"):
            legacy.append(full)
    legacy.sort(key=os.path.getmtime)
    seq.sort(key=lambda d: int(os.path.basename(d)[1:]))
    return legacy + seq


def _read_pointer(base: str):
    p = os.path.join(base, "LATEST")
    if os.path.exists(p):
        with open(p) as f:
            return f.read().strip()
    return None


def resolve(path: str) -> str:
    """The actual orbax directory behind `path` (follows a save_atomic
    LATEST pointer; plain orbax dirs pass through)."""
    base = os.path.abspath(path)
    cur = _read_pointer(base)
    return os.path.join(base, cur) if cur else base


def restore(path: str, template_pytree):
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(resolve(path), template_pytree)


def restore_any(path: str):
    """Restore a checkpoint without a template pytree (topology inferred
    from the checkpoint metadata). Used by offline tools (eval_policy)
    that don't know the training-time env count / optimizer layout."""
    import logging

    import orbax.checkpoint as ocp

    # orbax warns that template-free restore is "generally UNSAFE"; for
    # read-only offline inspection of our own checkpoints it is fine.
    logging.getLogger("absl").setLevel(logging.ERROR)
    ckptr = ocp.StandardCheckpointer()
    try:
        return ckptr.restore(resolve(path))
    except Exception as direct_err:  # noqa: BLE001 — see below
        # Cross-backend restore (e.g. a TPU-trained checkpoint opened on
        # a CPU-only eval host): the recorded device shardings don't
        # resolve, so fall back to restoring every leaf as host numpy —
        # jit re-places them on first use. orbax surfaces the sharding
        # -resolution failure as ValueError on some versions but other
        # types on others (advisor r4), so catch broadly, log which
        # path ran, and chain the original error if the numpy fallback
        # fails too (a genuinely corrupt checkpoint still raises).
        try:
            import numpy as _np

            pt = ocp.PyTreeCheckpointer()
            meta = pt.metadata(resolve(path)).item_metadata
            restore_args = jax.tree_util.tree_map(
                lambda _: ocp.RestoreArgs(restore_type=_np.ndarray), meta
            )
            out = pt.restore(resolve(path), restore_args=restore_args)
        except Exception:
            raise direct_err
        logging.getLogger(__name__).info(
            "restore_any: direct restore failed (%s: %s); used the "
            "host-numpy fallback", type(direct_err).__name__, direct_err)
        return out

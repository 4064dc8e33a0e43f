"""Checkpoint / resume (SURVEY.md §5: absent in the reference; here the
full vectorized env-state pytree + learner params + PRNG keys persist
via orbax, enabling multi-host restart)."""
from __future__ import annotations

import jax


def save(path: str, state_pytree):
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state_pytree, force=True)
    ckptr.wait_until_finished()


def restore(path: str, template_pytree):
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, template_pytree)


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
    return ckptr.restore(path)

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

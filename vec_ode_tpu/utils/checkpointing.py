"""Checkpoint/resume for long ensemble runs.

The reference's 'checkpoints' are time-grid hits, not fault tolerance
(SURVEY §5). This adds actual fault tolerance: the integration carry
(:class:`~vec_ode_tpu.driver.IntState`) is a flat pytree of arrays, so it
serializes directly — with orbax when available (StandardCheckpointer, the
current non-deprecated surface), else a numpy ``.npz`` fallback — and
:func:`~vec_ode_tpu.driver.resume` continues from it.
"""

from __future__ import annotations

import pathlib
from typing import Optional

import jax
import numpy as np

from ..driver import IntState


def save_state(path, state: IntState) -> None:
    """Persist an integration carry. Uses orbax if importable (sharded,
    async-capable), else a plain npz of host arrays."""
    path = pathlib.Path(path)
    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path.resolve(), jax.device_get(state), force=True)
        ckptr.wait_until_finished()
        return
    except ImportError:
        pass
    flat, treedef = jax.tree_util.tree_flatten(state)
    np.savez(
        path.with_suffix(".npz"),
        **{f"leaf_{i}": np.asarray(a) for i, a in enumerate(flat)},
    )


def load_state(path, like: Optional[IntState] = None) -> IntState:
    """Restore a carry saved by :func:`save_state`. ``like`` (a template
    IntState with matching structure) is required for the orbax path and
    used for structure/dtype validation in the npz path."""
    path = pathlib.Path(path)
    try:
        import orbax.checkpoint as ocp

        if path.exists() and path.is_dir():
            if like is None:
                raise ValueError(
                    "load_state from orbax requires a template `like`"
                )
            ckptr = ocp.StandardCheckpointer()
            restored = ckptr.restore(
                path.resolve(), jax.device_get(like)
            )
            return jax.tree_util.tree_map(jax.numpy.asarray, restored)
    except ImportError:
        pass
    data = np.load(path.with_suffix(".npz"))
    leaves = [data[f"leaf_{i}"] for i in range(len(data.files))]
    if like is None:
        raise ValueError("load_state from npz requires a template `like`")
    treedef = jax.tree_util.tree_structure(like)
    return jax.tree_util.tree_unflatten(
        treedef, [jax.numpy.asarray(a) for a in leaves]
    )

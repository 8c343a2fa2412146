"""Checkpoint / resume for simulation state.

The reference has none (SURVEY.md §5).  Here state is one pytree, so a
checkpoint is a flat .npz of its leaves plus the treedef — trivially portable
and resumable across processes and device topologies."""

from __future__ import annotations

import json
from typing import Any, Tuple

import jax
import numpy as np


def _normalized(path: str) -> str:
    """np.savez silently appends '.npz' when missing — normalize up front so
    save_state(p) / load_state(p) agree for any spelling of p."""
    return path if str(path).endswith(".npz") else str(path) + ".npz"


def save_state(path: str, state: Any, **metadata) -> None:
    leaves, treedef = jax.tree_util.tree_flatten(state)
    arrays = {f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)}
    arrays["__meta__"] = np.frombuffer(
        json.dumps({"num_leaves": len(leaves), **metadata}).encode(), dtype=np.uint8
    )
    np.savez(_normalized(path), **arrays)


def load_state(path: str, like: Any) -> Tuple[Any, dict]:
    """Load a checkpoint into the structure of `like` (same pytree shape).

    Leaf count/shapes/dtypes are validated against `like` so a mismatched
    checkpoint fails here with a clear error instead of downstream inside jit.
    """
    with np.load(_normalized(path)) as data:
        meta = json.loads(bytes(data["__meta__"]).decode())
        leaves = [data[f"leaf_{i}"] for i in range(meta.pop("num_leaves"))]
    like_leaves, treedef = jax.tree_util.tree_flatten(like)
    if len(leaves) != len(like_leaves):
        raise ValueError(
            f"checkpoint {path!r} holds {len(leaves)} leaves but the target "
            f"structure has {len(like_leaves)}"
        )
    for i, (got, want) in enumerate(zip(leaves, like_leaves)):
        want = np.asarray(want)
        if got.shape != want.shape or got.dtype != want.dtype:
            raise ValueError(
                f"checkpoint leaf {i}: shape/dtype {got.shape}/{got.dtype} does "
                f"not match target {want.shape}/{want.dtype} — was the geometry "
                "(capacity, cells, atom count) changed since the save?"
            )
    return jax.tree_util.tree_unflatten(treedef, leaves), meta

"""Checkpoint / resume for simulation state.

The reference has none (SURVEY.md §5).  Here state is one pytree, so a
checkpoint is a flat .npz of its leaves plus the treedef — trivially portable
and resumable across processes and device topologies."""

from __future__ import annotations

import json
from typing import Any, Tuple

import jax
import numpy as np


def save_state(path: str, state: Any, **metadata) -> None:
    leaves, treedef = jax.tree_util.tree_flatten(state)
    arrays = {f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)}
    arrays["__meta__"] = np.frombuffer(
        json.dumps({"num_leaves": len(leaves), **metadata}).encode(), dtype=np.uint8
    )
    np.savez(path, **arrays)


def load_state(path: str, like: Any) -> Tuple[Any, dict]:
    """Load a checkpoint into the structure of `like` (same pytree shape)."""
    with np.load(path) as data:
        meta = json.loads(bytes(data["__meta__"]).decode())
        leaves = [data[f"leaf_{i}"] for i in range(meta.pop("num_leaves"))]
    treedef = jax.tree_util.tree_structure(like)
    return jax.tree_util.tree_unflatten(treedef, leaves), meta

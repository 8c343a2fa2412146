"""Observability: progress logging, throughput counters, NaN guards, and
profiler hooks — the operational subsystems the reference lacks entirely
(SURVEY.md §5: no tracing, no metrics, no failure detection)."""

from __future__ import annotations

import contextlib
import logging
import time
from typing import Any, Callable, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger("emdee_tpu")


class ThroughputMeter:
    """Steps/sec and atom-steps/sec over rollout chunks."""

    def __init__(self, num_atoms: int):
        self.num_atoms = num_atoms
        self._t0: Optional[float] = None
        self._steps = 0

    def start(self) -> None:
        self._t0 = time.perf_counter()
        self._steps = 0

    def update(self, steps: int, sync: Any = None) -> dict:
        if sync is not None:
            jax.block_until_ready(sync)
        self._steps += steps
        elapsed = time.perf_counter() - self._t0
        stats = {
            "steps": self._steps,
            "elapsed_s": elapsed,
            "steps_per_s": self._steps / elapsed,
            "atom_steps_per_s": self._steps * self.num_atoms / elapsed,
        }
        logger.info(
            "%d steps | %.1f steps/s | %.3g atom-steps/s",
            stats["steps"], stats["steps_per_s"], stats["atom_steps_per_s"],
        )
        return stats


def check_finite(tree: Any, where: str = "state") -> None:
    """Host-side NaN/Inf guard over a pytree — raise loudly instead of
    letting a blown-up trajectory keep burning chip time."""
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(leaf)
        if np.issubdtype(arr.dtype, np.floating) and not np.isfinite(arr).all():
            name = jax.tree_util.keystr(path)
            raise FloatingPointError(
                f"non-finite values in {where}{name} "
                f"(NaNs: {np.isnan(arr).sum()}, Infs: {np.isinf(arr).sum()})"
            )


def guard_energy(previous: Optional[float], current: float, rel_jump: float = 0.5):
    """Failure detection for long rollouts: flag sudden energy jumps."""
    if previous is not None and abs(current - previous) > rel_jump * max(
        abs(previous), 1e-12
    ):
        raise FloatingPointError(
            f"energy jumped {previous:.6g} → {current:.6g}: likely unstable "
            "timestep or stale neighbor state"
        )
    return current


@contextlib.contextmanager
def profile_trace(log_dir: str = "/tmp/emdee_trace") -> Iterator[None]:
    """jax.profiler trace around a code block (view with TensorBoard's
    profile plugin)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info("profiler trace written to %s", log_dir)

"""Periodic-boundary-condition helpers (cubic box, scalar edge L).

The reference applies the minimum-image convention on box-scaled coordinates:
``s - round(s)`` then rescale by L (nonbonded.jl:40,60-61,70), and wraps to
[0, 1) with ``s - floor(s)`` for cell binning (cells.jl:80-85).  Both are pure
elementwise ops that XLA fuses into surrounding arithmetic.
"""

from __future__ import annotations

import jax.numpy as jnp


def minimum_image(scaled: jnp.ndarray) -> jnp.ndarray:
    """Minimum-image displacement for box-scaled coordinates.

    Maps each component into [-0.5, 0.5).  Matches `minimum_image(s) =
    s - round(s)` (nonbonded.jl:40); note jnp.round and Julia `round` both use
    round-half-to-even, so parity is exact.
    """
    return scaled - jnp.round(scaled)


def displacement(pos_i: jnp.ndarray, pos_j: jnp.ndarray, box) -> jnp.ndarray:
    """Minimum-image displacement vector(s) r_i - r_j in a cubic box."""
    return box * minimum_image((pos_i - pos_j) / box)


def wrap_scaled(scaled: jnp.ndarray) -> jnp.ndarray:
    """Wrap box-scaled coordinates into [0, 1) (cells.jl:80-85 behavior)."""
    return scaled - jnp.floor(scaled)


def wrap(positions: jnp.ndarray, box) -> jnp.ndarray:
    """Wrap absolute positions into [0, L)."""
    return box * wrap_scaled(positions / box)

"""Device-mesh construction for spatial domain decomposition.

The reference is strictly single-GPU (SURVEY.md §2b: no MPI/NCCL, its only
"communication" is warp shuffles and atomics).  The TPU-native scale-out axis
is a `jax.sharding.Mesh`: atoms are sharded into spatial slabs, ghost
positions ride ICI via `ppermute`, and reductions are `psum` — one level up
the hierarchy from what shuffles+atomics do intra-GPU.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


ATOM_AXIS = "atoms"


def make_mesh(num_devices: Optional[int] = None, devices: Optional[Sequence] = None) -> Mesh:
    """1D mesh over the atom/slab axis.

    MD domain decomposition is communication-light (nearest-neighbor halos),
    so a 1D ring — which maps onto a TPU torus ring, all traffic on ICI — is
    the right first topology; 3D meshes only pay off at very large slices.
    """
    if devices is None:
        devices = jax.devices()
        if num_devices is not None:
            devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (ATOM_AXIS,))

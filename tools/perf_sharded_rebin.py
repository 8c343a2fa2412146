"""Measured per-shard Pallas rebin at 1M-atoms-per-shard geometry (VERDICT
r4 item 4's 'Done' measurement): the grid-sharded engine on a (1,1,1) mesh
at the 1M-atom config (M=37, C=32) with the window-pass rebin kernel vs the
XLA routing rounds.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_sharded_rebin.py
"""

from __future__ import annotations

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/emdee_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import jax
import numpy as np

from emdee_tpu.distributed.grid_sharded import (
    distribute_grid,
    make_grid_mesh,
    make_grid_sharded_sim,
)
from emdee_tpu.neighbors.cell_dense import (
    cell_dense_init,
    detect_uniform_params,
    suggest_cell_dense_config,
)
from emdee_tpu.potentials.lennard_jones import LennardJonesModel, lennard_jones_atom
from emdee_tpu.utils.lattice import fcc_lattice, maxwell_boltzmann


def main(steps=60):
    cells = int(round((1_000_000 / 4) ** (1 / 3)))
    pos, box = fcc_lattice(cells, density=0.8442)
    n = pos.shape[0]
    vel = maxwell_boltzmann(n, 0.72, seed=0)
    model = LennardJonesModel.create(2.5, 2.0)
    params = lennard_jones_atom(np.ones(n), np.ones(n))
    uni = detect_uniform_params(params)
    config = suggest_cell_dense_config(n, box, cutoff=2.5, switch=2.0, skin=0.35)
    st = cell_dense_init(pos, vel, np.ones(n), params, config)
    print(f"n={n} M={config.cells_per_dim} C={config.capacity} "
          f"overflow={bool(st.overflow)}", flush=True)
    mesh = make_grid_mesh((1, 1, 1))
    st_sh = distribute_grid(st, config, mesh)
    for rk in (True, False):
        rollout, _ = make_grid_sharded_sim(
            config, model, 0.005, mesh, backend="auto",
            uniform_params=uni, rebin_kernel=rk,
        )
        # rebin_every=2: rebin-heavy window isolates the rebin delta.
        out = rollout(st_sh, num_steps=steps, rebin_every=2)
        jax.block_until_ready(out.positions)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = rollout(st_sh, num_steps=steps, rebin_every=2)
            jax.block_until_ready(out.positions)
            best = min(best, time.perf_counter() - t0)
        print(
            f"rebin_kernel={rk}: {best / steps * 1e3:.3f} ms/step at "
            f"rebin_every=2 (overflow={bool(out.overflow)})", flush=True,
        )


if __name__ == "__main__":
    main()

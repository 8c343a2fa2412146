"""Perf breakdown probe for the dense-cell engine on real TPU.

Variants isolate where the 3.09 ms/step at 97.5k atoms goes:
  base        — bench.py configuration as-is (capacity from the formula = 40)
  cap32/cap24 — forced smaller slot capacity (cap24 may overflow: timing-only)
  norebin     — rebin_every = num_steps (isolates amortized rebin cost)

Each prints one JSON line.  State evolves between warmup and timing (axon
dedups identical dispatches — never time the same (executable, args) twice).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def run_variant(name, capacity=None, rebin_every=None, steps=600, backend="auto"):
    import jax
    import jax.numpy as jnp

    from emdee_tpu.neighbors.cell_dense import (
        cell_dense_init,
        make_cell_dense_sim,
        suggest_cell_dense_config,
        suggest_rebin_interval,
    )
    from emdee_tpu.potentials.lennard_jones import LennardJonesModel, lennard_jones_atom
    from emdee_tpu.utils.lattice import fcc_lattice, maxwell_boltzmann

    cells = int(round((100_000 / 4) ** (1 / 3)))
    pos, box = fcc_lattice(cells, density=0.8442)
    n = pos.shape[0]
    vel = maxwell_boltzmann(n, 1.44, seed=0)

    config = suggest_cell_dense_config(n, box, cutoff=2.5, switch=2.0, skin=0.35)
    if capacity is not None:
        config = config._replace(capacity=capacity)
    model = LennardJonesModel.create(2.5, 2.0)
    params = lennard_jones_atom(np.ones(n), np.ones(n))

    state = cell_dense_init(pos, vel, np.ones(n), params, config)
    rollout, energy = make_cell_dense_sim(config, model, dt=0.005, backend=backend)

    if rebin_every is None:
        rebin_every = suggest_rebin_interval(config.skin, 0.005, temperature=0.75)

    t_c0 = time.perf_counter()
    state = rollout(state, num_steps=200, rebin_every=2)
    jax.block_until_ready(state.positions)
    t_compile = time.perf_counter() - t_c0

    # warmup compile of the measured shape; evolves state so the timed
    # dispatch below has genuinely different inputs
    state = rollout(state, num_steps=steps, rebin_every=rebin_every)
    jax.block_until_ready(state.positions)

    t0 = time.perf_counter()
    state_m = rollout(state, num_steps=steps, rebin_every=rebin_every)
    jax.block_until_ready(state_m.positions)
    elapsed = time.perf_counter() - t0

    out = {
        "variant": name,
        "n": n,
        "M": config.cells_per_dim,
        "capacity": config.capacity,
        "rebin_every": rebin_every,
        "steps": steps,
        "ms_per_step": round(1e3 * elapsed / steps, 4),
        "atom_steps_per_s": round(n * steps / elapsed, 0),
        "overflow": bool(state_m.overflow),
        "compile_s": round(t_compile, 1),
    }
    print(json.dumps(out), flush=True)
    return out


if __name__ == "__main__":
    which = sys.argv[1:] or ["base", "cap32", "cap24", "norebin", "norebin24"]
    for w in which:
        if w == "base":
            run_variant("base")
        elif w == "cap32":
            run_variant("cap32", capacity=32)
        elif w == "cap24":
            run_variant("cap24", capacity=24)
        elif w == "norebin":
            run_variant("norebin", rebin_every=10**9)
        elif w == "norebin24":
            run_variant("norebin24", capacity=24, rebin_every=10**9)

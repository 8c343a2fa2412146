"""Headline benchmark: atom-steps/sec/chip on a 100k-atom LJ fluid.

Classic LJ-melt configuration (the standard MD throughput benchmark): FCC
lattice at reduced density 0.8442, T*=1.44, rc=2.5σ, dt=0.005 — NVE with the
gather-free dense-cell engine (emdee_tpu.neighbors.cell_dense) fused into one
`lax.scan`, so the whole measurement window lives on-device.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where the
baseline is BASELINE.json's north-star 1e8 atom-steps/sec/chip.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main(n_target: int = 100_000, steps: int = 1000, report: bool = True) -> dict:
    import jax
    import jax.numpy as jnp

    from emdee_tpu.neighbors.cell_dense import (
        cell_dense_init,
        detect_uniform_params,
        make_cell_dense_sim,
        suggest_cell_dense_config,
    )
    from emdee_tpu.potentials.lennard_jones import LennardJonesModel, lennard_jones_atom
    from emdee_tpu.utils.lattice import fcc_lattice, maxwell_boltzmann

    cells = int(round((n_target / 4) ** (1 / 3)))
    pos, box = fcc_lattice(cells, density=0.8442)
    n = pos.shape[0]
    vel = maxwell_boltzmann(n, 1.44, seed=0)

    from emdee_tpu.neighbors.cell_dense import suggest_rebin_interval

    config = suggest_cell_dense_config(n, box, cutoff=2.5, switch=2.0, skin=0.35)
    model = LennardJonesModel.create(2.5, 2.0)
    params = lennard_jones_atom(np.ones(n), np.ones(n))

    state = cell_dense_init(pos, vel, np.ones(n), params, config)
    if bool(state.overflow):
        config = config._replace(capacity=config.capacity * 2)
        state = cell_dense_init(pos, vel, np.ones(n), params, config)
    rollout, energy = make_cell_dense_sim(
        config, model, dt=0.005, backend="auto",
        uniform_params=detect_uniform_params(params),
    )

    # Melt start: half the initial T*=1.44 kinetic energy converts to
    # potential; the equilibrated T is ~0.7 — pick the rebin cadence for it.
    rebin_every = suggest_rebin_interval(config.skin, 0.005, temperature=0.75)
    # Equilibrate off-measurement (frequent rebins for the hot start).
    state = rollout(state, num_steps=200, rebin_every=2)
    state = state._replace(overflow=jnp.asarray(False))
    jax.block_until_ready(state.positions)
    state_m = rollout(state, num_steps=steps, rebin_every=rebin_every)
    jax.block_until_ready(state_m.positions)

    t0 = time.perf_counter()
    state_m = rollout(state, num_steps=steps, rebin_every=rebin_every)
    jax.block_until_ready(state_m.positions)
    elapsed = time.perf_counter() - t0

    overflowed = bool(state_m.overflow)
    atom_steps = n * steps / elapsed
    result = {
        "metric": f"atom-steps/sec/chip ({n}-atom LJ fluid, rc=2.5, NVE, dense-cell engine)",
        "value": round(atom_steps, 1),
        "unit": "atom-steps/s",
        "vs_baseline": round(atom_steps / 1e8, 4),
    }
    if overflowed:
        # A capacity/staleness overflow means interactions may have been
        # dropped — the number is not a valid benchmark result.
        print("ERROR: capacity overflow during measured run", file=sys.stderr)
        result["invalid"] = True
        result["value"] = 0.0
        result["vs_baseline"] = 0.0
    if report:
        print(json.dumps(result))
    if overflowed:
        raise SystemExit(1)
    return result


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    main(n, steps)

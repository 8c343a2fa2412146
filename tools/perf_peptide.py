"""Protein-scale throughput probe: 20k+-atom solvated poly-alanine
(amber03 + TIP3P-style water) on the dense engine, band-split exclusions.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_peptide.py [n_res] [box]
"""

from __future__ import annotations

import json
import sys
import tempfile
import time

import numpy as np


def main(n_res=12, box=60.0, steps=100, rebin_every=6):
    import jax

    from emdee_tpu.modelling.forcefield import ForceField
    from emdee_tpu.modelling.solvate import build_solvated_polyalanine
    from emdee_tpu.modelling.system import System
    from emdee_tpu.neighbors.cell_dense import CSVRConfig
    from emdee_tpu.neighbors.cell_dense_molecular import (
        build_exclusion_tables,
        dense_sim_from_system,
    )

    pdb, n_pep, n_wat = build_solvated_polyalanine(n_res=n_res, box=box)
    with tempfile.NamedTemporaryFile("w", suffix=".pdb", delete=False) as f:
        f.write(pdb)
        path = f.name
    ff = ForceField(
        "/root/reference/src/data/amber03.xml",
        "/root/reference/test/data/dibenzo-p-dioxin-in-water.xml",
    )
    system = System(path, ff)
    n = len(system)
    pairs, lj_s, c_s = system.exclusions(coulomb=True)
    e_nat = int(build_exclusion_tables(n, pairs, lj_s)[0].shape[-1])

    rng = np.random.default_rng(3)
    vel = rng.normal(scale=0.05, size=(n, 3))
    state, rollout, energy, config = dense_sim_from_system(
        system, cutoff=7.0, switch=6.0, dt=5e-4, skin=1.0, velocities=vel,
        thermostat=CSVRConfig(temperature=300.0, tau=0.05, kB=0.00831446),
    )
    assert not bool(state.overflow), "init overflow"
    key = jax.random.PRNGKey(0)
    out = rollout(state, num_steps=steps, rebin_every=rebin_every, rng=key)
    jax.block_until_ready(out.positions)
    t0 = time.perf_counter()
    out = rollout(state, num_steps=steps, rebin_every=rebin_every, rng=key)
    jax.block_until_ready(out.positions)
    dt = (time.perf_counter() - t0) / steps
    print(json.dumps({
        "variant": f"solvated_polyala{n_res}_box{box:g}",
        "atoms": n,
        "natural_E": e_nat,
        "cells": config.cells_per_dim,
        "capacity": config.capacity,
        "ms_per_step": round(1e3 * dt, 4),
        "atom_steps_per_s": round(n / dt, 0),
        "overflow": bool(out.overflow),
    }), flush=True)


if __name__ == "__main__":
    n_res = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    box = float(sys.argv[2]) if len(sys.argv) > 2 else 60.0
    main(n_res, box)

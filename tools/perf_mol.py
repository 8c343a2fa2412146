"""Molecular-system throughput probe: tiled dibenzo-p-dioxin-in-water at
~97k atoms (charges + kernel exclusions + slot-space bonded terms) on the
dense engine.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_mol.py [reps] [steps]
"""

from __future__ import annotations

import itertools
import json
import sys
import time

import numpy as np


def tile_system(system, reps=2):
    from emdee_tpu.modelling.system import System

    n = len(system)
    box = float(system.box_lengths[0])
    positions, bonds, spans = [], [], []
    names, resnames, ff_types = [], [], []
    for k, (ix, iy, iz) in enumerate(itertools.product(range(reps), repeat=3)):
        off = np.array([ix, iy, iz], float) * box
        positions.append(np.asarray(system.positions) + off)
        bonds += [(a + k * n, b + k * n) for a, b in system.bonds]
        spans += [(lo + k * n, hi + k * n) for lo, hi in system.residue_spans]
        names += list(system.names)
        resnames += list(system.resnames)
        ff_types += list(system.ff_types)
    reps3 = reps**3
    return System(
        names=names,
        resnames=resnames,
        residue_spans=spans,
        positions=np.concatenate(positions),
        velocities=np.zeros((n * reps3, 3)),
        masses=np.tile(np.asarray(system.masses), reps3),
        bonds=bonds,
        ff_types=ff_types,
        charges=np.tile(np.asarray(system.charges), reps3),
        box_lengths=np.asarray([box * reps] * 3),
        force_field=system.force_field,
    )


def bench_mol(reps=4, steps=120, rebin_every=6, band="auto"):
    import jax

    from emdee_tpu.modelling.forcefield import ForceField
    from emdee_tpu.modelling.system import System
    from emdee_tpu.neighbors.cell_dense_molecular import dense_sim_from_system

    ff = ForceField("/root/reference/test/data/dibenzo-p-dioxin-in-water.xml")
    base = System("/root/reference/test/data/dibenzo-p-dioxin-in-water.pdb", ff)
    system = tile_system(base, reps)
    n = len(system)
    rng = np.random.default_rng(5)
    vel = rng.normal(scale=0.05, size=(n, 3))

    # skin=1.0 + spill: cell side 8.19 Å holds rc+skin with the 0.15 Å spill
    # margin to spare, and boundary-spill balancing drops capacity from
    # mean+2.5σ (80) to 64 — pair work scales as capacity², and the VMEM
    # estimate falls under the resident-kernel threshold (measured
    # 10.0 → 6.3 ms/step on v5e; overflow flag stays clear, see
    # tests/test_cell_dense_molecular.py::test_molecular_dense_spill_...).
    state, rollout, energy, config = dense_sim_from_system(
        system, cutoff=7.0, switch=6.0, dt=5e-4, skin=1.0, velocities=vel,
        spill=True, exclusion_band=band,
    )
    assert not bool(state.overflow), "init overflow"
    from emdee_tpu.neighbors.cell_dense_molecular import build_exclusion_tables

    pairs, lj_s, c_s = system.exclusions(coulomb=True)
    tabs = build_exclusion_tables(n, pairs, lj_s, c_s)
    e_width = int(tabs[0].shape[-1])

    out = rollout(state, num_steps=steps, rebin_every=rebin_every)
    jax.block_until_ready(out.positions)
    t0 = time.perf_counter()
    out = rollout(state, num_steps=steps, rebin_every=rebin_every)
    jax.block_until_ready(out.positions)
    dt_s = (time.perf_counter() - t0) / steps
    print(json.dumps({
        "variant": f"mol_dioxin_reps{reps}_band{band}",
        "atoms": n,
        "cells": config.cells_per_dim,
        "capacity": config.capacity,
        "excl_width_E": e_width,
        "ms_per_step": round(1e3 * dt_s, 4),
        "atom_steps_per_s": round(n / dt_s, 0),
        "overflow": bool(out.overflow),
    }), flush=True)


if __name__ == "__main__":
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 120
    band = sys.argv[3] if len(sys.argv) > 3 else "auto"
    bench_mol(reps, steps, band="auto" if band == "auto" else int(band))

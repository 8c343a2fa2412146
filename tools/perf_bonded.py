"""Slot-space bonded-term cost at the 97k benchmark config.

Synthetic molecular system on the LJ-bench geometry (C=32): uniform LJ +
DSF charges + E=2 kernel exclusion tags, then + harmonic bonds/angles over
atom triplets.  Round 2 measured the bonded terms' ATOM-SPACE round trip at
~2 ms/step; the slot-space bindings should reduce the increment to the
per-term gather/scatter cost alone.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_bonded.py
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def setup_system():
    from emdee_tpu.neighbors.cell_dense import (
        cell_dense_init,
        gather_dense_atoms,
        make_cell_dense_sim,
        suggest_cell_dense_config,
    )
    from emdee_tpu.potentials.lennard_jones import LennardJonesModel, lennard_jones_atom
    from emdee_tpu.utils.lattice import fcc_lattice, maxwell_boltzmann

    cells = int(round((100_000 / 4) ** (1 / 3)))
    pos, box = fcc_lattice(cells, density=0.8442)
    n = pos.shape[0]
    vel = maxwell_boltzmann(n, 1.44, seed=0)
    config = suggest_cell_dense_config(n, box, cutoff=2.5, switch=2.0, skin=0.35)
    model = LennardJonesModel.create(2.5, 2.0)
    params = lennard_jones_atom(np.ones(n), np.ones(n))
    state = cell_dense_init(pos, vel, np.ones(n), params, config)
    rollout, _ = make_cell_dense_sim(config, model, dt=0.005, backend="auto")
    state = rollout(state, num_steps=200, rebin_every=2)
    pos_eq, vel_eq = gather_dense_atoms(state, n)
    return pos_eq, vel_eq, box, n, config, model, params


def run(with_bonded: bool, steps=200):
    import jax
    import jax.numpy as jnp

    from emdee_tpu.neighbors.cell_dense import cell_dense_init
    from emdee_tpu.neighbors.cell_dense_molecular import make_molecular_dense_sim
    from emdee_tpu.potentials.bonded import AngleTable, BondTable, BondedSystem
    from emdee_tpu.potentials.coulomb import DSFCoulomb

    pos_eq, vel_eq, box, n, config, model, params = setup_system()
    q = np.where(np.arange(n) % 2 == 0, 0.2, -0.2).astype(np.float32)
    coul = DSFCoulomb.create(2.5, alpha=0.25, coulomb_constant=1.0)
    base = np.arange(0, n - 2, 3)
    pairs = np.concatenate(
        [np.stack([base, base + 1], 1), np.stack([base + 1, base + 2], 1)]
    ).astype(np.int32)
    ljs = np.zeros(len(pairs), np.float32)

    # k = 0 everywhere: identical gather/compute/scatter COST, zero forces —
    # the synthetic "bonds" connect atoms that are far apart in the melt, so
    # nonzero k would blow up the dynamics and overflow the run.
    bonded = None
    if with_bonded:
        nb = len(pairs)
        cap = -(-nb // 8) * 8
        pad = cap - nb
        bonds = BondTable(
            atoms=jnp.asarray(np.concatenate([pairs, np.full((pad, 2), n, np.int32)])),
            length=jnp.asarray(np.concatenate([np.full(nb, 1.1, np.float32), np.zeros(pad, np.float32)])),
            k=jnp.asarray(np.concatenate([np.zeros(nb, np.float32), np.zeros(pad, np.float32)])),
            valid=jnp.asarray(np.arange(cap) < nb),
        )
        trip = np.stack([base, base + 1, base + 2], 1).astype(np.int32)
        na = len(trip)
        cap_a = -(-na // 8) * 8
        pad_a = cap_a - na
        angles = AngleTable(
            atoms=jnp.asarray(np.concatenate([trip, np.full((pad_a, 3), n, np.int32)])),
            theta0=jnp.asarray(np.concatenate([np.full(na, 1.9, np.float32), np.zeros(pad_a, np.float32)])),
            k=jnp.asarray(np.concatenate([np.zeros(na, np.float32), np.zeros(pad_a, np.float32)])),
            valid=jnp.asarray(np.arange(cap_a) < na),
        )
        bonded = BondedSystem(bonds=bonds, angles=angles, torsions=None, impropers=None)

    state = cell_dense_init(pos_eq, vel_eq, np.ones(n), params, config, charges=q)
    rollout, energy = make_molecular_dense_sim(
        config, model, 0.005, n,
        params=params, charges=q, coulomb=coul,
        exclusion_pairs=jnp.asarray(pairs), exclusion_scales=jnp.asarray(ljs),
        bonded=bonded,
    )
    out = rollout(state, num_steps=steps, rebin_every=6)
    jax.block_until_ready(out.positions)
    t0 = time.perf_counter()
    out = rollout(state, num_steps=steps, rebin_every=6)
    jax.block_until_ready(out.positions)
    dt = (time.perf_counter() - t0) / steps
    print(json.dumps({
        "variant": "molecular_97k" + ("_bonded_slot" if with_bonded else "_pairs_only"),
        "ms_per_step": round(1e3 * dt, 4),
        "overflow": bool(out.overflow),
    }), flush=True)


if __name__ == "__main__":
    which = sys.argv[1:] or ["pairs", "bonded"]
    for w in which:
        run(with_bonded=(w == "bonded"))

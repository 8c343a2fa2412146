"""Feasibility measurements for the molecule-contiguous water-angle path.

The remaining molecular wall is the angle gather/scatter rows
(docs/PERF.md "Molecular step trace (r5)").  A gather-free evaluation of
H-O-H angles needs each water's three atoms in CONSECUTIVE SLOTS of one
cell (then legs are static rolls of the slot arrays).  This probe measures,
at the equilibrated 97k dioxin-in-water spill config:

  1. fraction of waters with all three atoms in the SAME cell (the
     geometric ceiling for any same-cell contiguity scheme);
  2. fraction already in consecutive slots today (stability of routing);
  3. fraction of cells whose occupied slots are atom-id-sorted (what a
     within-cell id-sort pass at rebin time would need to restore);
  4. occupancy histogram + straggler-tail sizes at C_t in 52..62 (the
     capacity-squared lever).

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_mol_contig.py [steps]
"""

from __future__ import annotations

import json
import sys

import numpy as np

from perf_mol import tile_system


def main(steps=600):
    from emdee_tpu.modelling.forcefield import ForceField
    from emdee_tpu.modelling.system import System
    from emdee_tpu.neighbors.cell_dense_molecular import dense_sim_from_system

    ff = ForceField("/root/reference/test/data/dibenzo-p-dioxin-in-water.xml")
    base = System("/root/reference/test/data/dibenzo-p-dioxin-in-water.pdb", ff)
    system = tile_system(base, 4)
    n = len(system)
    rng = np.random.default_rng(5)
    vel = rng.normal(scale=0.05, size=(n, 3))
    state, rollout, energy, config = dense_sim_from_system(
        system, cutoff=7.0, switch=6.0, dt=5e-4, skin=1.0, velocities=vel,
        spill=True, exclusion_band="auto",
    )
    st = rollout(state, num_steps=steps, rebin_every=6)
    assert not bool(st.overflow)

    atom_id = np.asarray(st.atom_id)        # (M3, C)
    valid = np.asarray(st.valid)
    m3, C = atom_id.shape
    ns = m3 * C
    # atom -> (cell, slot)
    cell_of = np.full(n + 1, -1, np.int64)
    slot_of = np.full(n + 1, -1, np.int64)
    cells = np.repeat(np.arange(m3), C)
    slots = np.tile(np.arange(C), m3)
    ids = atom_id.reshape(-1)
    ok = valid.reshape(-1)
    cell_of[ids[ok]] = cells[ok]
    slot_of[ids[ok]] = slots[ok]

    waters = [lo for lo, hi in system.residue_spans if hi - lo == 3]
    w = np.asarray(waters)
    same_cell = (cell_of[w] == cell_of[w + 1]) & (cell_of[w] == cell_of[w + 2])
    consec = same_cell & (slot_of[w + 1] == slot_of[w] + 1) & (
        slot_of[w + 2] == slot_of[w] + 2
    )
    # within-cell id-sortedness
    sorted_cells = 0
    occ = valid.sum(axis=1)
    for c in range(m3):
        a = atom_id[c][valid[c]]
        if np.all(np.diff(a) > 0):
            sorted_cells += 1
    print(json.dumps({
        "steps": steps, "n": n, "waters": len(w),
        "same_cell_frac": round(float(same_cell.mean()), 4),
        "consec_slot_frac": round(float(consec.mean()), 4),
        "id_sorted_cell_frac": round(sorted_cells / m3, 4),
        "occ_mean": round(float(occ.mean()), 2),
        "occ_max": int(occ.max()),
    }))
    for ct in (52, 54, 56, 58, 60, 62):
        tail = np.maximum(occ - ct, 0).sum()
        print(json.dumps({"C_t": ct, "tail_atoms": int(tail),
                          "cells_over": int((occ > ct).sum())}))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 600)

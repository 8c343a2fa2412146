"""Decompose the r5 production molecular step (97k dioxin-in-water, spill
geometry, resident kernel, in-kernel bonds): full step vs bonded-stripped.

The difference isolates the per-step cost of the remaining bonded machinery
(angle/torsion slot-space gathers + exclusive-set/merged scatters + leftover
correction) — the wall PERF.md's round-5 molecular section says a sub-5 ms
step must break.  Decides whether an MXU-window gather kernel is worth
building in the time left.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_mol_r5b.py [steps]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/emdee_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")


def main(steps=200):
    import jax

    from emdee_tpu.modelling.forcefield import ForceField
    from emdee_tpu.modelling.system import System
    from emdee_tpu.neighbors.cell_dense_molecular import dense_sim_from_system
    from tools.perf_mol import tile_system

    ff = ForceField("/root/reference/test/data/dibenzo-p-dioxin-in-water.xml")
    base = System("/root/reference/test/data/dibenzo-p-dioxin-in-water.pdb", ff)
    system = tile_system(base, 4)
    n = len(system)
    rng = np.random.default_rng(5)
    vel = rng.normal(scale=0.05, size=(n, 3))

    variants = (
        ("full", dict()),
        # Strips angles/torsions/impropers AND the not-absorbed bond
        # remainder from the extra-force path; the kernel tags (exclusions)
        # stay, as does the beyond-band leftover correction.
        ("no_bonded", dict(with_bonded=False)),
        # Everything nonbonded only: no bonded AND no exclusion machinery
        # (tags still needed for correctness, so keep kernel mode; this
        # variant only exists to see the pair+integrator+rebin floor).
        ("no_bonded_no_coulomb", dict(with_bonded=False, with_coulomb=False)),
    )
    for name, kw in variants:
        state, rollout, energy, config = dense_sim_from_system(
            system, cutoff=7.0, switch=6.0, dt=5e-4, skin=1.0,
            velocities=vel, spill=True, **kw,
        )
        if bool(state.overflow):
            print(json.dumps({"variant": name, "invalid": True}), flush=True)
            continue
        out = rollout(state, num_steps=steps, rebin_every=6)
        jax.block_until_ready(out.positions)
        t0 = time.perf_counter()
        out = rollout(state, num_steps=steps, rebin_every=6)
        jax.block_until_ready(out.positions)
        dt_s = (time.perf_counter() - t0) / steps
        print(json.dumps({
            "variant": name,
            "atoms": n,
            "capacity": config.capacity,
            "ms_per_step": round(1e3 * dt_s, 4),
            "overflow": bool(out.overflow),
        }), flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 200)

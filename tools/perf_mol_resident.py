"""Can the 97k dioxin-in-water config run the VMEM-resident kernel?

The auto backend sends M=12/C=80 molecular configs to the HBM-streaming
kernel because the VMEM estimate (with coulomb/exclusion factors) crosses
13 MB.  The estimate is conservative; this probe forces `backend="pallas"`
and measures (a) whether Mosaic accepts the scoped VMEM, (b) the pair-pass
cost vs the streaming kernel's — deciding whether a pencil-chunked resident
variant is worth building or residency already fits.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_mol_resident.py [reps]
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main(reps=4, steps=120):
    import jax

    from emdee_tpu.modelling.forcefield import ForceField
    from emdee_tpu.modelling.system import System
    from emdee_tpu.neighbors.cell_dense_molecular import dense_sim_from_system
    from tools.perf_mol import tile_system

    ff = ForceField("/root/reference/test/data/dibenzo-p-dioxin-in-water.xml")
    base = System("/root/reference/test/data/dibenzo-p-dioxin-in-water.pdb", ff)
    system = tile_system(base, reps)
    n = len(system)
    rng = np.random.default_rng(5)
    vel = rng.normal(scale=0.05, size=(n, 3))

    for backend in ("pallas", "pallas_streaming"):
        try:
            state, rollout, energy, config = dense_sim_from_system(
                system, cutoff=7.0, switch=6.0, dt=5e-4, skin=1.0,
                velocities=vel, backend=backend,
            )
            assert not bool(state.overflow)
            out = rollout(state, num_steps=steps, rebin_every=6)
            jax.block_until_ready(out.positions)
            t0 = time.perf_counter()
            out = rollout(state, num_steps=steps, rebin_every=6)
            jax.block_until_ready(out.positions)
            dt_s = (time.perf_counter() - t0) / steps
            print(json.dumps({
                "variant": f"mol_{backend}",
                "atoms": n,
                "ms_per_step": round(1e3 * dt_s, 4),
                "overflow": bool(out.overflow),
                "pe": float(energy(out)[0]),
            }), flush=True)
        except Exception as exc:  # noqa: BLE001 — report, keep probing
            print(json.dumps({
                "variant": f"mol_{backend}",
                "error": str(exc)[:400],
            }), flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4)

"""Device-trace profile of the 97k molecular production step.

Leaf-op attribution of the 6.3 ms molecular step (dioxin-in-water, spill
geometry, resident kernel, in-kernel bonds): pair-kernel custom call vs the
angle/torsion gather/scatter rows vs rebin vs integrator/glue.  Decides
where a sub-5 ms step must come from (VERDICT r4 item 3 follow-up) with a
measured breakdown instead of the perf_mol_r5b subtraction probe.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_profile_mol.py [steps]
Prints JSON lines; raw trace in /tmp/emdee_profile_mol.
"""

from __future__ import annotations

import os
import sys

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/emdee_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import perf_profile

TRACE_DIR = "/tmp/emdee_profile_mol"
perf_profile.TRACE_DIR = TRACE_DIR


def run_block(steps=60):
    import jax

    from emdee_tpu.modelling.forcefield import ForceField
    from emdee_tpu.modelling.system import System
    from emdee_tpu.neighbors.cell_dense_molecular import dense_sim_from_system
    from perf_mol import tile_system

    ff = ForceField("/root/reference/test/data/dibenzo-p-dioxin-in-water.xml")
    base = System("/root/reference/test/data/dibenzo-p-dioxin-in-water.pdb", ff)
    system = tile_system(base, 4)
    n = len(system)
    rng = np.random.default_rng(5)
    vel = rng.normal(scale=0.05, size=(n, 3))
    state, rollout, energy, config = dense_sim_from_system(
        system, cutoff=7.0, switch=6.0, dt=5e-4, skin=1.0,
        velocities=vel, spill=True,
    )
    assert not bool(state.overflow)
    out = rollout(state, num_steps=steps, rebin_every=6)  # warm compile
    jax.block_until_ready(out.positions)
    with jax.profiler.trace(TRACE_DIR):
        out = rollout(state, num_steps=steps, rebin_every=6)
        jax.block_until_ready(out.positions)
    return n, steps


if __name__ == "__main__":
    os.makedirs(TRACE_DIR, exist_ok=True)
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    n, steps = run_block(steps)
    perf_profile.summarize(n, steps)

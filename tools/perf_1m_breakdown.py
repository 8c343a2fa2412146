"""1M-atom step breakdown on the real TPU: force pass vs rebin vs residue.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_1m_breakdown.py \
    [observed_step_ms]

If an observed end-to-end step time (from bench.py's 1M variant) is given,
the residual after the force pass and the amortized rebin is printed too.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main(n=1_000_000, reps=20, observed_step_ms=None):
    import jax

    from emdee_tpu.neighbors.cell_dense import (
        _rebin_shift,
        cell_dense_init,
        suggest_cell_dense_config,
    )
    from emdee_tpu.neighbors.pallas_cell_kernel import pallas_cell_forces_streaming
    from emdee_tpu.potentials.lennard_jones import LennardJonesModel, lennard_jones_atom
    from emdee_tpu.utils.lattice import cubic_lattice, maxwell_boltzmann  # noqa

    cells = int(round((n / 4) ** (1 / 3)))
    from emdee_tpu.utils.lattice import fcc_lattice
    pos, L = fcc_lattice(cells, density=0.8442)
    n = pos.shape[0]
    vel = maxwell_boltzmann(n, 1.44, seed=4)
    params = lennard_jones_atom(np.ones(n), np.ones(n))
    config = suggest_cell_dense_config(n, L, cutoff=2.5, switch=2.0, skin=0.35)
    model = LennardJonesModel.create(2.5, 2.0)
    st = cell_dense_init(pos, vel, np.ones(n), params, config)
    print(json.dumps({"m": config.cells_per_dim, "c": config.capacity,
                      "overflow": bool(st.overflow)}), flush=True)

    force = jax.jit(
        lambda s: pallas_cell_forces_streaming(
            s, model, config, uniform_params=(0.5, 2.0)
        )[0]
    )
    f = force(st)
    jax.block_until_ready(f)
    t0 = time.perf_counter()
    for _ in range(reps):
        f = force(st)
    jax.block_until_ready(f)
    t_force = (time.perf_counter() - t0) / reps * 1e3

    rebin = jax.jit(lambda s: _rebin_shift(s, config, uniform_params=(0.5, 2.0), uniform_mass=1.0))
    s2 = rebin(st)
    jax.block_until_ready(s2.positions)
    t0 = time.perf_counter()
    for _ in range(reps):
        s2 = rebin(st)
    jax.block_until_ready(s2.positions)
    t_rebin = (time.perf_counter() - t0) / reps * 1e3

    out = {
        "variant": "breakdown_1m",
        "force_ms": round(t_force, 3),
        "rebin_ms": round(t_rebin, 3),
        "amortized_rebin_ms": round(t_rebin / 6.0, 3),
    }
    if observed_step_ms is not None:
        out["step_ms_observed"] = observed_step_ms
        out["residual_ms"] = round(observed_step_ms - t_force - t_rebin / 6.0, 3)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main(observed_step_ms=float(sys.argv[1]) if len(sys.argv) > 1 else None)

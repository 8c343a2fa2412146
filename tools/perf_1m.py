"""1M-atom streaming-kernel probes: on-device numerics check + throughput.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_1m.py [check|bench1m|benchmol]
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def check(n=20_000):
    """Real-TPU differential: streaming kernel vs the (already bench-gated)
    resident Pallas kernel — the XLA dense engine's giant unrolled stencil
    takes many minutes to compile through the tunnel, so the resident kernel
    (itself checked against XLA by bench.py's preamble) is the anchor."""
    import jax

    from emdee_tpu.neighbors.cell_dense import (
        cell_dense_init,
        suggest_cell_dense_config,
    )
    from emdee_tpu.neighbors.pallas_cell_kernel import (
        pallas_cell_forces,
        pallas_cell_forces_streaming,
    )
    from emdee_tpu.potentials.lennard_jones import LennardJonesModel, lennard_jones_atom
    from emdee_tpu.utils.lattice import cubic_lattice, maxwell_boltzmann

    pos, L = cubic_lattice(n, 0.7, jitter=0.12, seed=3)
    vel = maxwell_boltzmann(n, 1.0, seed=4)
    params = lennard_jones_atom(np.ones(n), np.ones(n))
    config = suggest_cell_dense_config(n, L, cutoff=2.5, switch=2.0, skin=0.3)
    model = LennardJonesModel.create(2.5, 2.0)
    st = cell_dense_init(pos, vel, np.ones(n), params, config)
    f_ref = pallas_cell_forces(st, model, config)[0]
    f_s = pallas_cell_forces_streaming(st, model, config)[0]
    f_u = pallas_cell_forces_streaming(st, model, config, uniform_params=(0.5, 2.0))[0]
    valid = np.asarray(st.valid)
    ref = np.asarray(jax.device_get(f_ref))[valid]
    out = np.asarray(jax.device_get(f_s))[valid]
    outu = np.asarray(jax.device_get(f_u))[valid]
    scale = max(float(np.abs(ref).max()), 1.0)
    print(json.dumps({
        "variant": "streaming_check",
        "rel_maxdiff": float(np.abs(out - ref).max()) / scale,
        "rel_maxdiff_uniform": float(np.abs(outu - ref).max()) / scale,
    }), flush=True)


def bench1m(steps=200):
    import bench

    r = bench.main(1_000_000, steps, report=False)
    r["variant"] = "bench_1m"
    print(json.dumps(r), flush=True)


if __name__ == "__main__":
    which = sys.argv[1:] or ["check", "bench1m"]
    for w in which:
        if w == "check":
            check()
        elif w == "bench1m":
            bench1m()

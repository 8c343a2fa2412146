"""Round-4 streaming-kernel ablation on the real TPU: const-tile inputs and
rows_per_program batching vs the round-3 baseline (14.5 ns/atom at 1M).

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_r4.py [natoms]

Prints one JSON line per variant:
  - rpp=1:   isolates the const-tiles-as-inputs change (round 3 built the
             is_self/expand/seg tiles in-kernel every program),
  - rpp=auto (pick_streaming_rows): adds per-program batching,
plus the shift-rebin time at the same config (round-3 baseline 13.8 ms/rebin
at M=37) — the other 1M lever.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main(n=1_000_000, reps=20):
    import jax
    import jax.numpy as jnp

    from emdee_tpu.neighbors.cell_dense import (
        _rebin_shift,
        cell_dense_init,
        suggest_cell_dense_config,
    )
    from emdee_tpu.neighbors.pallas_cell_kernel import (
        _prep_streaming_inputs,
        pick_streaming_rows,
        streaming_halfshell_call,
    )
    from emdee_tpu.potentials.lennard_jones import LennardJonesModel, lennard_jones_atom
    from emdee_tpu.utils.lattice import fcc_lattice, maxwell_boltzmann

    cells = int(round((n / 4) ** (1 / 3)))
    pos, L = fcc_lattice(cells, density=0.8442)
    n = pos.shape[0]
    vel = maxwell_boltzmann(n, 1.44, seed=4)
    params = lennard_jones_atom(np.ones(n), np.ones(n))
    config = suggest_cell_dense_config(n, L, cutoff=2.5, switch=2.0, skin=0.35)
    model = LennardJonesModel.create(2.5, 2.0)
    st = cell_dense_init(pos, vel, np.ones(n), params, config)
    m = config.cells_per_dim
    auto_rpp = pick_streaming_rows((m, m, m), config.capacity, 3, 3, 3)
    print(json.dumps({
        "m": m, "c": config.capacity, "overflow": bool(st.overflow),
        "auto_rpp": auto_rpp,
    }), flush=True)

    uni = (0.5, 2.0)

    def force_fn(rpp):
        @jax.jit
        def f(s):
            views, centers = _prep_streaming_inputs(s, config, uniform=True)
            outs = streaming_halfshell_call(
                views, centers, config, (m, m, m),
                uniform_params=uni, rows_per_program=rpp,
            )
            return outs[0]

        return f

    results = {}
    for label, rpp in (("rpp1", 1), (f"rpp{auto_rpp}", auto_rpp)):
        fn = force_fn(rpp)
        out = fn(st)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(st)
        jax.block_until_ready(out)
        ms = (time.perf_counter() - t0) / reps * 1e3
        results[label] = ms
        print(json.dumps({"variant": f"stream_force_{label}", "ms": round(ms, 3),
                          "ns_per_atom": round(ms * 1e6 / n, 2)}), flush=True)

    rebin = jax.jit(
        lambda s: _rebin_shift(s, config, uniform_params=uni, uniform_mass=1.0)
    )
    s2 = rebin(st)
    jax.block_until_ready(s2.positions)
    t0 = time.perf_counter()
    for _ in range(reps):
        s2 = rebin(s2)
    jax.block_until_ready(s2.positions)
    ms = (time.perf_counter() - t0) / reps * 1e3
    print(json.dumps({"variant": "shift_rebin", "ms": round(ms, 3)}), flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000)

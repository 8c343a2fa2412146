"""Round-4 streaming-kernel + rebin probes on the real TPU, vs the round-3
baselines (force pass 14.5 ns/atom, shift rebin 13.8 ms at 1M / M=37).

All timed loops are on-device `lax.scan`s with output-dependent input nudges
— axon dedups identical dispatches, so a host loop re-submitting the same
(executable, input) pair can report absurd times (0.2 ms was observed for a
1M-atom force pass).

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_r4.py [natoms]

Measures:
  - the streaming force pass (const tiles as inputs + multi-spec ghost
    blocks; the rows_per_program batching knob was removed after measuring
    it a no-op — 12.02 vs 12.07 ms, bit-identical — once const tiles
    deleted the fixed cost it amortized, and its auto-pick OOM'd scoped
    VMEM at M=37),
  - the shift rebin in the leapfrog (no force transport) and KDK (force
    transport) structures.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def timed_scan(name, step, state, iters, per_atom=None):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def scan(st):
        def body(carry, _):
            return step(carry), None

        st, _ = jax.lax.scan(body, st, jnp.arange(iters))
        return st

    out = scan(state)
    jax.block_until_ready(out.positions)
    t0 = time.perf_counter()
    out = scan(out)
    jax.block_until_ready(out.positions)
    ms = (time.perf_counter() - t0) / iters * 1e3
    rec = {"variant": name, "ms_per_call": round(ms, 3)}
    if per_atom:
        rec["ns_per_atom"] = round(ms * 1e6 / per_atom, 2)
    print(json.dumps(rec), flush=True)


def main(n=1_000_000, iters=20):
    from emdee_tpu.neighbors.cell_dense import (
        _rebin_shift,
        cell_dense_init,
        suggest_cell_dense_config,
    )
    from emdee_tpu.neighbors.pallas_cell_kernel import (
        _prep_streaming_inputs,
        streaming_halfshell_call,
    )
    from emdee_tpu.potentials.lennard_jones import lennard_jones_atom
    from emdee_tpu.utils.lattice import fcc_lattice, maxwell_boltzmann

    cells = int(round((n / 4) ** (1 / 3)))
    pos, L = fcc_lattice(cells, density=0.8442)
    n = pos.shape[0]
    vel = maxwell_boltzmann(n, 1.44, seed=4)
    params = lennard_jones_atom(np.ones(n), np.ones(n))
    config = suggest_cell_dense_config(n, L, cutoff=2.5, switch=2.0, skin=0.35)
    st = cell_dense_init(pos, vel, np.ones(n), params, config)
    m = config.cells_per_dim
    print(json.dumps({
        "m": m, "c": config.capacity, "overflow": bool(st.overflow),
    }), flush=True)

    uni = (0.5, 2.0)

    def force_step(s):
        ghosts, centers = _prep_streaming_inputs(s, config, uniform=True)
        f = streaming_halfshell_call(
            ghosts, centers, config, (m, m, m), uniform_params=uni,
        )[0]
        return s._replace(positions=s.positions + 1e-12 * f[0, 0, 0])

    timed_scan("stream_force", force_step, st, iters, per_atom=n)

    timed_scan(
        "shift_rebin_leapfrog",
        lambda s: _rebin_shift(s, config, uniform_params=uni, uniform_mass=1.0),
        st, iters,
    )

    import jax.numpy as jnp

    def kdk_step(s):
        s2, f2 = _rebin_shift(
            s, config, forces=jnp.zeros_like(s.positions),
            uniform_params=uni, uniform_mass=1.0,
        )
        return s2._replace(positions=s2.positions + 1e-12 * f2[0, 0, 0])

    timed_scan("shift_rebin_kdk", kdk_step, st, iters)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000)

"""Round-4b 1M-atom residual hunt: what besides the raw streaming pair pass
and the rebin fills the 13.67 ms step (73.2M) — the ≥75M target needs the
step at ≤13.33 ms.

Times, each as an on-device `lax.scan` (axon dedups identical host-loop
dispatches — see perf_r4.py):

  - raw streaming halfshell call (no reaction fold)     [r4 anchor: 11.67 ns/atom]
  - full `pallas_cell_forces_streaming` (fold included)
  - shift rebin, XLA rounds vs whole-pass Pallas kernel [anchor: 13.1 vs 6.26 ms]
  - one leapfrog step (drift + full force + kick) — the production body

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_r4b.py [natoms]
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
    return ms


def main(n=1_000_000, iters=20):
    import jax.numpy as jnp

    from emdee_tpu.neighbors.cell_dense import (
        _rebin_shift,
        cell_dense_init,
        suggest_cell_dense_config,
    )
    from emdee_tpu.neighbors.pallas_cell_kernel import (
        _prep_streaming_inputs,
        pallas_cell_forces_streaming,
        streaming_halfshell_call,
    )
    from emdee_tpu.potentials.lennard_jones import (
        LennardJonesModel,
        lennard_jones_atom,
    )
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
    print(json.dumps({
        "m": m, "c": config.capacity, "overflow": bool(st.overflow),
    }), flush=True)

    uni = (0.5, 2.0)

    def raw_step(s):
        ghosts, centers = _prep_streaming_inputs(s, config, uniform=True)
        f = streaming_halfshell_call(
            ghosts, centers, config, (m, m, m), uniform_params=uni,
        )[0]
        return s._replace(positions=s.positions + 1e-12 * f[0, 0, 0])

    timed_scan("stream_raw", raw_step, st, iters, per_atom=n)

    def full_step(s):
        f = pallas_cell_forces_streaming(s, model, config, uniform_params=uni)[0]
        return s._replace(positions=s.positions + 1e-12 * f[0, 0])

    timed_scan("stream_folded", full_step, st, iters, per_atom=n)

    timed_scan(
        "rebin_xla",
        lambda s: _rebin_shift(s, config, uniform_params=uni, uniform_mass=1.0),
        st, iters,
    )
    timed_scan(
        "rebin_pallas",
        lambda s: _rebin_shift(
            s, config, uniform_params=uni, uniform_mass=1.0, backend="pallas"
        ),
        st, iters,
    )

    dt = jnp.float32(1e-6)  # tiny: keep bins valid over the timed scan

    def leapfrog(s):
        new_pos = jnp.where(
            s.valid[..., None], s.positions + dt * s.velocities, s.positions
        )
        s = s._replace(positions=new_pos)
        f = pallas_cell_forces_streaming(s, model, config, uniform_params=uni)[0]
        return s._replace(
            velocities=s.velocities + dt * f * s.inv_masses[..., None],
            step=s.step + 1,
        )

    timed_scan("leapfrog_step", leapfrog, st, iters, per_atom=n)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000)

"""Headline benchmark: atom-steps/sec/chip on a 100k-atom LJ fluid.

Classic LJ-melt configuration (the standard MD throughput benchmark): FCC
lattice at reduced density 0.8442, T*=1.44, rc=2.5σ, dt=0.005 — NVE with the
gather-free dense-cell engine (emdee_tpu.neighbors.cell_dense) fused into one
`lax.scan`, so the whole measurement window lives on-device.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where the
baseline is BASELINE.json's north-star 1e8 atom-steps/sec/chip.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main(n_target: int = 100_000, steps: int = 1000, report: bool = True) -> dict:
    import jax
    import jax.numpy as jnp

    from emdee_tpu.neighbors.cell_dense import (
        cell_dense_init,
        detect_uniform_params,
        make_cell_dense_sim,
        suggest_cell_dense_config,
    )
    from emdee_tpu.potentials.lennard_jones import LennardJonesModel, lennard_jones_atom
    from emdee_tpu.utils.lattice import fcc_lattice, maxwell_boltzmann

    cells = int(round((n_target / 4) ** (1 / 3)))
    pos, box = fcc_lattice(cells, density=0.8442)
    n = pos.shape[0]
    vel = maxwell_boltzmann(n, 1.44, seed=0)

    from emdee_tpu.neighbors.cell_dense import suggest_rebin_interval

    model = LennardJonesModel.create(2.5, 2.0)
    params = lennard_jones_atom(np.ones(n), np.ones(n))

    uni = detect_uniform_params(params)

    def build(config):
        rollout, energy = make_cell_dense_sim(
            config, model, dt=0.005, backend="auto",
            uniform_params=uni, uniform_mass=1.0,
        )
        return rollout

    # Equilibrate the melt at the WIDE capacity (mean+2.5σ): the hot start's
    # density transients exceed what boundary-spill balancing can shed, so
    # the tight config is only packed once the liquid is equilibrated.
    from emdee_tpu.neighbors.cell_dense import gather_dense_atoms

    wide = suggest_cell_dense_config(n, box, cutoff=2.5, switch=2.0, skin=0.35)
    state = cell_dense_init(pos, vel, np.ones(n), params, wide)
    if bool(state.overflow):
        wide = wide._replace(capacity=wide.capacity + 8)
        state = cell_dense_init(pos, vel, np.ones(n), params, wide)
    state = build(wide)(state, num_steps=200, rebin_every=2)
    if bool(state.overflow):
        raise SystemExit("equilibration overflow at wide capacity")
    pos_eq, vel_eq = gather_dense_atoms(state, n)

    def run_spill():
        """Tight-capacity measured window (mean+0.5σ ≈ C=24 vs C=32 — pair
        work ~C²) via one-directional boundary-spill balancing.

        A snapshot repack cannot reach the tight capacity (only ~4% of a
        cell's atoms sit within the spill margin of a +face at any instant),
        so the equilibrated state is SQUEEZED over ~20 rebins at wide
        capacity with `spill_target` set — thermal motion refreshes the
        near-face eligible set each rebin, and hold-backs catch every
        down-crosser — then the empty upper slot columns are sliced off."""
        from emdee_tpu.neighbors.cell_dense import shrink_capacity

        tight = suggest_cell_dense_config(
            n, box, cutoff=2.5, switch=2.0, skin=0.25, spill=True,
            spill_margin=0.11,
        )
        squeeze_cfg = tight._replace(
            capacity=max(wide.capacity, tight.capacity + 8),
            spill_target=tight.capacity,
        )
        st = cell_dense_init(pos_eq, vel_eq, np.ones(n), params, squeeze_cfg)
        if bool(st.overflow):
            return None, True
        rebin_every = suggest_rebin_interval(tight.skin, 0.005, temperature=0.75)
        st = build(squeeze_cfg)(st, num_steps=25 * rebin_every, rebin_every=rebin_every)
        if bool(st.overflow):
            return None, True
        try:
            st, config = shrink_capacity(st, squeeze_cfg, tight.capacity)
        except ValueError:
            return None, True
        rollout = build(config)
        st_m = rollout(st, num_steps=steps, rebin_every=rebin_every)
        jax.block_until_ready(st_m.positions)
        if bool(st_m.overflow):
            return None, True

        t0 = time.perf_counter()
        st_m = rollout(st, num_steps=steps, rebin_every=rebin_every)
        jax.block_until_ready(st_m.positions)
        elapsed = time.perf_counter() - t0
        return elapsed, bool(st_m.overflow)

    def run(spill: bool):
        if spill:
            return run_spill()
        st = cell_dense_init(pos_eq, vel_eq, np.ones(n), params, wide)
        if bool(st.overflow):
            return None, True
        rollout = build(wide)
        rebin_every = suggest_rebin_interval(wide.skin, 0.005, temperature=0.75)
        st_m = rollout(st, num_steps=steps, rebin_every=rebin_every)
        jax.block_until_ready(st_m.positions)

        t0 = time.perf_counter()
        st_m = rollout(st, num_steps=steps, rebin_every=rebin_every)
        jax.block_until_ready(st_m.positions)
        elapsed = time.perf_counter() - t0
        return elapsed, bool(st_m.overflow)

    elapsed, overflowed = run(spill=True)
    if overflowed or elapsed is None:
        print(
            "note: spill-balanced config overflowed; falling back to the "
            "wide-capacity config",
            file=sys.stderr,
        )
        elapsed, overflowed = run(spill=False)
    atom_steps = n * steps / elapsed
    result = {
        "metric": f"atom-steps/sec/chip ({n}-atom LJ fluid, rc=2.5, NVE, dense-cell engine)",
        "value": round(atom_steps, 1),
        "unit": "atom-steps/s",
        "vs_baseline": round(atom_steps / 1e8, 4),
    }
    if overflowed:
        # A capacity/staleness overflow means interactions may have been
        # dropped — the number is not a valid benchmark result.
        print("ERROR: capacity overflow during measured run", file=sys.stderr)
        result["invalid"] = True
        result["value"] = 0.0
        result["vs_baseline"] = 0.0
    if report:
        print(json.dumps(result))
    if overflowed:
        raise SystemExit(1)
    return result


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    main(n, steps)

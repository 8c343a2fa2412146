"""Second-stage perf probe: isolate force-pass and rebin costs + occupancy.

All loops keep state genuinely evolving (axon dedups identical dispatches).
"""

from __future__ import annotations

import json
import sys
import time
from functools import partial

import numpy as np


def setup(capacity=None, skin=0.35, spill=False):
    import jax
    import jax.numpy as jnp

    from emdee_tpu.neighbors.cell_dense import (
        cell_dense_init,
        make_cell_dense_sim,
        suggest_cell_dense_config,
    )
    from emdee_tpu.potentials.lennard_jones import LennardJonesModel, lennard_jones_atom
    from emdee_tpu.utils.lattice import fcc_lattice, maxwell_boltzmann

    cells = int(round((100_000 / 4) ** (1 / 3)))
    pos, box = fcc_lattice(cells, density=0.8442)
    n = pos.shape[0]
    vel = maxwell_boltzmann(n, 1.44, seed=0)
    config = suggest_cell_dense_config(n, box, cutoff=2.5, switch=2.0, skin=skin, spill=spill)
    # Equilibrate at the wide non-spill capacity, repack tight afterwards.
    base_config = suggest_cell_dense_config(n, box, cutoff=2.5, switch=2.0, skin=skin)
    model = LennardJonesModel.create(2.5, 2.0)
    params = lennard_jones_atom(np.ones(n), np.ones(n))
    # Equilibrate at the formula capacity (never overflows), then re-pack at
    # the probe capacity so occupancy is the realistic liquid structure.
    state = cell_dense_init(pos, vel, np.ones(n), params, base_config)
    rollout, _ = make_cell_dense_sim(base_config, model, dt=0.005, backend="auto")
    state = rollout(state, num_steps=200, rebin_every=2)
    from emdee_tpu.neighbors.cell_dense import gather_dense_atoms

    pos_eq, vel_eq = gather_dense_atoms(state, n)
    if capacity is not None:
        config = config._replace(capacity=capacity)
    state = cell_dense_init(pos_eq, vel_eq, np.ones(n), params, config)
    return state, config, model, n


def occupancy():
    import jax

    state, config, model, n = setup()
    counts = np.asarray(state.valid).reshape(config.num_cells, config.capacity).sum(1)
    hist = np.bincount(counts, minlength=config.capacity + 1)
    out = {
        "variant": "occupancy",
        "mean": float(counts.mean()),
        "max": int(counts.max()),
        "hist": {str(i): int(c) for i, c in enumerate(hist) if c},
        "atoms_beyond_24": int(np.maximum(counts - 24, 0).sum()),
        "atoms_beyond_28": int(np.maximum(counts - 28, 0).sum()),
        "cells": int(config.num_cells),
    }
    print(json.dumps(out), flush=True)


def force_only(capacity, iters=400):
    import jax
    import jax.numpy as jnp

    from emdee_tpu.neighbors.pallas_cell_kernel import pallas_cell_forces

    state, config, model, n = setup(capacity=capacity)
    up = (0.5, 2.0)

    @partial(jax.jit, static_argnames=())
    def scan_forces(st):
        def body(carry, _):
            st = carry
            f = pallas_cell_forces(st, model, config, uniform_params=up)[0]
            # minimal evolution so no two dispatches see identical inputs
            st = st._replace(positions=st.positions + 1e-7 * f)
            return st, None

        st, _ = jax.lax.scan(body, st, None, length=iters)
        return st

    out = scan_forces(state)
    jax.block_until_ready(out.positions)
    out2 = scan_forces(out)
    jax.block_until_ready(out2.positions)
    t0 = time.perf_counter()
    out3 = scan_forces(out2)
    jax.block_until_ready(out3.positions)
    dt = (time.perf_counter() - t0) / iters
    print(
        json.dumps(
            {"variant": f"force_only_c{capacity}", "ms_per_call": round(1e3 * dt, 4)}
        ),
        flush=True,
    )


def rebin_only(capacity, iters=120, shift=False):
    import jax
    import jax.numpy as jnp

    from emdee_tpu.neighbors.cell_dense import _rebin, _rebin_shift

    state, config, model, n = setup(capacity=capacity)

    @partial(jax.jit, static_argnames=())
    def scan_rebin(st):
        def body(carry, i):
            st = carry
            # drift all atoms a little so each rebin sees fresh positions
            st = st._replace(
                positions=st.positions
                + jnp.where(st.valid[..., None], 0.02 * (1.0 + 0.1 * jnp.sin(1.0 * i)), 0.0)
            )
            st, f = (_rebin_shift if shift else _rebin)(st, config, forces=st.positions)
            return st, None

        st, _ = jax.lax.scan(body, st, jnp.arange(iters), length=iters)
        return st

    out = scan_rebin(state)
    jax.block_until_ready(out.positions)
    out2 = scan_rebin(out)
    jax.block_until_ready(out2.positions)
    t0 = time.perf_counter()
    out3 = scan_rebin(out2)
    jax.block_until_ready(out3.positions)
    dt = (time.perf_counter() - t0) / iters
    print(
        json.dumps(
            {
                "variant": f"rebin_only_c{capacity}" + ("_shift" if shift else ""),
                "ms_per_call": round(1e3 * dt, 4),
                "overflow": bool(out3.overflow),
            }
        ),
        flush=True,
    )


def step_only(capacity, iters=400, spill=False, skin=0.35):
    """Full one_step cost (force + integrator), no rebins: rollout with
    rebin_every > iters runs a single rebin then `iters` plain steps."""
    import jax

    from emdee_tpu.neighbors.cell_dense import make_cell_dense_sim

    state, config, model, n = setup(capacity=capacity, spill=spill, skin=skin)
    rollout, _ = make_cell_dense_sim(
        config, model, dt=0.005, backend="auto", uniform_params=(0.5, 2.0)
    )

    def run(st):
        return rollout(st, num_steps=iters, rebin_every=iters + 1)

    out = run(state)
    jax.block_until_ready(out.positions)
    out = run(out)
    jax.block_until_ready(out.positions)
    t0 = time.perf_counter()
    out = run(out)
    jax.block_until_ready(out.positions)
    dt = (time.perf_counter() - t0) / iters
    print(
        json.dumps(
            {
                "variant": f"step_only_c{capacity}" + ("_spill" if spill else ""),
                "ms_per_step": round(1e3 * dt, 4),
                "overflow": bool(out.overflow),
                "config_cap": config.capacity,
                "cells": config.cells_per_dim,
            }
        ),
        flush=True,
    )


def bench_spill(skin=0.25, steps=1000):
    """Full benchmark loop with the spill config (mirrors bench.py)."""
    import jax

    from emdee_tpu.neighbors.cell_dense import (
        make_cell_dense_sim,
        suggest_rebin_interval,
    )

    state, config, model, n = setup(spill=True, skin=skin)
    rollout, _ = make_cell_dense_sim(
        config, model, dt=0.005, backend="auto", uniform_params=(0.5, 2.0)
    )
    rebin_every = suggest_rebin_interval(config.skin, 0.005, temperature=0.75)
    state = rollout(state, num_steps=200, rebin_every=rebin_every)
    jax.block_until_ready(state.positions)
    t0 = time.perf_counter()
    out = rollout(state, num_steps=steps, rebin_every=rebin_every)
    jax.block_until_ready(out.positions)
    dt = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "variant": f"bench_spill_skin{skin}",
                "atom_steps_per_s": round(n * steps / dt, 0),
                "ms_per_step": round(1e3 * dt / steps, 4),
                "rebin_every": rebin_every,
                "cap": config.capacity,
                "overflow": bool(out.overflow),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    which = sys.argv[1:] or ["occupancy", "force24", "force32", "rebin40", "rebin24"]
    for w in which:
        if w == "occupancy":
            occupancy()
        elif w.startswith("force"):
            force_only(int(w[5:]))
        elif w.startswith("rebinshift"):
            rebin_only(int(w[10:]), shift=True)
        elif w.startswith("rebin"):
            rebin_only(int(w[5:]))
        elif w.startswith("stepspill"):
            step_only(int(w[9:]), spill=True, skin=0.25)
        elif w.startswith("step"):
            step_only(int(w[4:]))
        elif w.startswith("benchspill"):
            bench_spill(float(w[10:]) if len(w) > 10 else 0.25)

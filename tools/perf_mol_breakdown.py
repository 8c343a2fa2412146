"""Per-component breakdown of the 97k molecular step (tiled dioxin-in-water,
rc=7 Å, C=80, band-4 kernel tags): pair kernel vs bonded vs leftover
correction vs rebin.  Decides where the next molecular-perf effort goes.

All loops keep inputs genuinely evolving (axon dedups identical dispatches).
Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_mol_breakdown.py [reps] [iters]
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def setup(reps=4):
    import jax.numpy as jnp

    from emdee_tpu.modelling.bonded import build_bonded_system
    from emdee_tpu.modelling.forcefield import ForceField
    from emdee_tpu.modelling.system import System
    from emdee_tpu.neighbors.cell_dense import cell_dense_init, suggest_cell_dense_config
    from emdee_tpu.neighbors.cell_dense_molecular import (
        build_exclusion_tables,
        make_exclusion_aux_fn,
        make_slot_pair_correction,
    )
    from emdee_tpu.potentials.coulomb import DSFCoulomb, KJMOL_ANGSTROM, coulomb_consts
    from emdee_tpu.potentials.lennard_jones import LennardJonesModel
    from tools.perf_mol import tile_system

    ff = ForceField("/root/reference/test/data/dibenzo-p-dioxin-in-water.xml")
    base = System("/root/reference/test/data/dibenzo-p-dioxin-in-water.pdb", ff)
    system = tile_system(base, reps)
    n = len(system)
    box = float(system.box_lengths[0])
    params = system.lj_params(10.0)
    pairs, lj_s, c_s = system.exclusions(coulomb=True)
    config = suggest_cell_dense_config(n, box, cutoff=7.0, switch=6.0, skin=1.0)
    model = LennardJonesModel.create(7.0, 6.0)
    coul = DSFCoulomb.create(7.0, 0.2, KJMOL_ANGSTROM)
    cc = coulomb_consts(coul)
    tabs, leftover = build_exclusion_tables(n, pairs, lj_s, c_s, band_e=4)
    aux_fn = make_exclusion_aux_fn(n, *tabs)
    corr = make_slot_pair_correction(
        n, *leftover, model, params, coul, jnp.asarray(system.charges, jnp.float32)
    )
    bonded = build_bonded_system(system, length_scale=10.0)
    rng = np.random.default_rng(5)
    vel = rng.normal(scale=0.05, size=(n, 3))
    state = cell_dense_init(
        np.asarray(system.positions, np.float32), vel.astype(np.float32),
        np.asarray(system.masses, np.float32), params, config,
        charges=np.asarray(system.charges, np.float32),
    )
    return state, config, model, cc, aux_fn, corr, bonded, n


def timed_scan(name, fn, state, iters):
    """fn(state) -> (M3,C,3) forces; scan with output-dependent position nudge."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def scan(st):
        def body(carry, _):
            f = fn(carry)
            eps = 1e-12 * f[0, 0, 0]
            return carry._replace(positions=carry.positions + eps), None

        st, _ = jax.lax.scan(body, st, jnp.arange(iters))
        return st

    out = scan(state)
    jax.block_until_ready(out.positions)
    t0 = time.perf_counter()
    out = scan(out)
    jax.block_until_ready(out.positions)
    dt = (time.perf_counter() - t0) / iters
    print(json.dumps({"variant": name, "ms_per_call": round(1e3 * dt, 4)}), flush=True)
    return dt


def main(reps=4, iters=60):
    import jax
    import jax.numpy as jnp

    from emdee_tpu.neighbors.pallas_cell_kernel import pallas_cell_forces_streaming
    from emdee_tpu.potentials.bonded import bonded_forces_analytic

    state, config, model, cc, aux_fn, corr, bonded, n = setup(reps)
    print(json.dumps({"atoms": n, "cells": config.cells_per_dim,
                      "capacity": config.capacity}), flush=True)
    box = jnp.float32(config.box)
    aux = jax.jit(aux_fn)(state)
    ns = config.num_slots

    def atom_slot_of(st):
        ids = jnp.where(st.valid, st.atom_id, n).reshape(-1)
        return (
            jnp.full((n + 1,), ns, jnp.int32).at[ids].set(jnp.arange(ns, dtype=jnp.int32))
        )

    atom_slot = jax.jit(atom_slot_of)(state)
    btabs = bonded.remap(atom_slot)
    cbind = corr[0](atom_slot)

    def pos_ext(st):
        return jnp.concatenate(
            [st.positions.reshape(-1, 3), jnp.zeros((1, 3), jnp.float32)], axis=0
        )

    def pair_fn(st):
        return pallas_cell_forces_streaming(st, model, config, coulomb=cc, excl=aux)[0]

    def bonded_fn(st):
        f = bonded_forces_analytic(pos_ext(st), box, btabs)
        return f[:-1].reshape(st.positions.shape)

    def corr_fn(st):
        return corr[1](pos_ext(st), cbind, box)[:-1].reshape(st.positions.shape)

    def merged_fn(st):
        from emdee_tpu.potentials.bonded import bonded_force_rows

        pos = pos_ext(st)
        i1, c1 = bonded_force_rows(pos, box, btabs)
        i2, c2 = corr[1].rows(pos, cbind, box)
        f = jnp.zeros_like(pos).at[jnp.concatenate([i1, i2])].add(
            jnp.concatenate([c1, c2])
        )
        return f[:-1].reshape(st.positions.shape)

    def full_fn(st):
        return pair_fn(st) + merged_fn(st)

    timed_scan("pair_streaming", pair_fn, state, iters)
    timed_scan("bonded_analytic", bonded_fn, state, iters)
    timed_scan("leftover_corr", corr_fn, state, iters)
    timed_scan("merged_bonded_corr", merged_fn, state, iters)
    timed_scan("full_force", full_fn, state, iters)

    # rebin (per-rebin, amortize over rebin_every=6) + aux rebuild costs
    from emdee_tpu.neighbors.cell_dense import _rebin_shift

    @jax.jit
    def rebin_scan(st):
        def body(carry, _):
            st2 = _rebin_shift(carry, config)
            return st2._replace(positions=st2.positions + 1e-12 * st2.positions[0, 0, 0]), None

        st, _ = jax.lax.scan(body, st, jnp.arange(iters))
        return st

    out = rebin_scan(state)
    jax.block_until_ready(out.positions)
    t0 = time.perf_counter()
    out = rebin_scan(out)
    jax.block_until_ready(out.positions)
    print(json.dumps({"variant": "rebin_shift",
                      "ms_per_call": round(1e3 * (time.perf_counter() - t0) / iters, 4)}),
          flush=True)

    @jax.jit
    def aux_scan(st):
        def body(carry, _):
            a = aux_fn(carry)
            b = bonded.remap(atom_slot_of(carry))
            # keep both computations live through the carry
            eps = 1e-12 * a[0].reshape(-1)[0]
            eps = eps + 1e-20 * b.bonds.atoms.reshape(-1)[0].astype(jnp.float32)
            return carry._replace(positions=carry.positions + eps), None

        st, _ = jax.lax.scan(body, st, jnp.arange(iters))
        return st

    out = aux_scan(state)
    jax.block_until_ready(out.positions)
    t0 = time.perf_counter()
    out = aux_scan(out)
    jax.block_until_ready(out.positions)
    print(json.dumps({"variant": "aux_rebuild(tags+bonded_remap)",
                      "ms_per_call": round(1e3 * (time.perf_counter() - t0) / iters, 4)}),
          flush=True)


if __name__ == "__main__":
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 60
    main(reps, iters)

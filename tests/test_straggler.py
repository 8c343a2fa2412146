"""C-tight straggler engine tests (neighbors/cell_dense_straggler.py).

The engine stores C_t atoms/cell and parks the occupancy tail in a tiny aux
buffer evaluated by the kernel's straggler pass; everything here gates it
against the WIDE-capacity engine, which holds every atom in the grid — same
physics, different storage.  Differential anchor: `rollout.wide_state` maps
a straggler state onto the plain C_w slot grid, where the existing engine
(and its own oracle chain, tests/test_cell_dense.py) takes over."""

import jax.numpy as jnp
import numpy as np
import pytest

from emdee_tpu.neighbors.cell_dense import (
    cell_dense_forces,
    cell_dense_init,
    detect_uniform_params,
    gather_dense_atoms,
    make_cell_dense_sim,
    suggest_cell_dense_config,
)
from emdee_tpu.neighbors.cell_dense_straggler import (
    StragglerConfig,
    gather_straggler_atoms,
    make_straggler_sim,
    straggler_init,
    suggest_straggler_config,
)
from emdee_tpu.potentials.lennard_jones import LennardJonesModel, lennard_jones_atom
from emdee_tpu.utils.lattice import fcc_lattice, maxwell_boltzmann

MODEL = LennardJonesModel.create(2.5, 2.0)


@pytest.fixture(scope="module")
def melt():
    """Equilibrated 2048-atom LJ melt (hot FCC start cooled into liquid
    occupancy statistics) + a straggler config with a real parked tail."""
    pos, L = fcc_lattice(8, density=0.8442)
    n = pos.shape[0]
    vel = maxwell_boltzmann(n, 1.44, seed=5)
    params = lennard_jones_atom(np.ones(n), np.ones(n))
    uni = detect_uniform_params(params)
    wide = suggest_cell_dense_config(n, L, cutoff=2.5, switch=2.0, skin=0.35)
    st_w = cell_dense_init(pos, vel, np.ones(n), params, wide)
    w_roll, _ = make_cell_dense_sim(
        wide, model=MODEL, dt=0.005, backend="xla",
        uniform_params=uni, uniform_mass=1.0,
    )
    st_w = w_roll(st_w, num_steps=120, rebin_every=2)
    assert not bool(st_w.overflow)
    pos_eq, vel_eq = gather_dense_atoms(st_w, n)
    occ = np.asarray(st_w.valid).sum(axis=1)
    # C_t two below the observed max → a real tail; at M=4 the 9-hood spans
    # over half the box, so Kn must cover most of the aux buffer.
    ct = int(occ.max()) - 2
    sconfig = StragglerConfig(
        grid=wide._replace(capacity=ct),
        wide_capacity=wide.capacity + 8,
        aux_capacity=64,
        kn=48,
    )
    st = straggler_init(pos_eq, vel_eq, np.ones(n), params, sconfig)
    assert not bool(st.grid.overflow)
    n_aux = int((np.asarray(st.aux_cell) < sconfig.grid.num_cells).sum())
    assert n_aux >= 5, "fixture must produce a real parked tail"
    return st, sconfig, uni, n


def test_forces_match_wide_engine(melt):
    """Grid+straggler forces ≡ the wide XLA engine on the identical atom
    set (sum-order roundoff only)."""
    st, sconfig, uni, n = melt
    rollout, _ = make_straggler_sim(
        sconfig, MODEL, dt=0.005, uniform_params=uni,
        uniform_mass=1.0, backend="pallas_interpret",
    )
    wide_st = rollout.wide_state(st)
    f_ref, _, _ = cell_dense_forces(wide_st, MODEL, sconfig.wide, compute_energy=True)
    fr = np.zeros((n, 3), np.float32)
    ids = np.asarray(wide_st.atom_id).reshape(-1)
    keep = np.asarray(wide_st.valid).reshape(-1)
    fr[ids[keep]] = np.asarray(f_ref).reshape(-1, 3)[keep]

    # One 1-step rollout with dt=0 isolates the force path: after the
    # initial half-kick + closing half un-kick, velocities are unchanged
    # UNLESS forces disagree between calls — instead probe forces via a
    # tiny-dt kick and difference the velocities.
    dt = 1e-6
    r2, _ = make_straggler_sim(
        sconfig, MODEL, dt=dt, uniform_params=uni,
        uniform_mass=1.0, backend="pallas_interpret",
    )
    out = r2(st, num_steps=1, rebin_every=1)
    p0, v0 = gather_straggler_atoms(st, sconfig, n)
    p1, v1 = gather_straggler_atoms(out, sconfig, n)
    f_probe = (v1 - v0) / dt  # leapfrog over one step: v += dt·f(midpoint)
    scale = max(np.abs(fr).max(), 1.0)
    assert np.abs(f_probe - fr).max() / scale < 5e-3  # dt-probe noise dominates


@pytest.mark.parametrize(
    "backend,strag_pass",
    [
        # Quick tier runs the production pass (XLA 27-row gather); the
        # interpret-only kernel tile and the streaming grid backend are
        # full-tier (each ≈45 s — quick-time budget).
        ("pallas_interpret", "xla"),
        pytest.param("pallas_interpret", "kernel", marks=pytest.mark.full),
        pytest.param(
            "pallas_streaming_interpret", "xla", marks=pytest.mark.full
        ),
    ],
)
def test_nve_and_trajectory_vs_wide(melt, backend, strag_pass):
    """24-step NVE: energy conserved, trajectory ≡ the wide engine, and the
    aux buffer re-parks across rebins — for BOTH straggler passes (the
    in-kernel 9-hood tile and the pure-XLA 27-row gather) and for the
    HBM-streaming grid kernel (the 1M-shape backend, probed and refuted as
    a 1M production path in docs/PERF.md r5 but kept correct)."""
    st, sconfig, uni, n = melt
    rollout, energy = make_straggler_sim(
        sconfig, MODEL, dt=0.005, uniform_params=uni,
        uniform_mass=1.0, backend=backend, strag_pass=strag_pass,
    )
    pe0, _, ke0 = (float(x) for x in energy(st))
    out = rollout(st, num_steps=24, rebin_every=6)
    assert not bool(out.grid.overflow)
    pe1, _, ke1 = (float(x) for x in energy(out))
    assert abs((pe1 + ke1) - (pe0 + ke0)) / abs(pe0 + ke0) < 1e-4
    assert int(out.grid.step) == 24
    n_aux = int((np.asarray(out.aux_cell) < sconfig.grid.num_cells).sum())
    assert n_aux >= 1  # the tail regenerates; parking keeps working

    w_roll, _ = make_cell_dense_sim(
        sconfig.wide, MODEL, dt=0.005, backend="pallas_interpret",
        uniform_params=uni, uniform_mass=1.0,
    )
    w_out = w_roll(rollout.wide_state(st), num_steps=24, rebin_every=6)
    assert not bool(w_out.overflow)
    p_s, v_s = gather_straggler_atoms(out, sconfig, n)
    p_w, v_w = gather_dense_atoms(w_out, n)
    np.testing.assert_allclose(p_s, p_w, atol=1e-3)
    np.testing.assert_allclose(v_s, v_w, atol=1e-2)


@pytest.mark.full
def test_overflow_flags_trip(melt):
    """Undersized Kn and A trip the sticky flag instead of dropping pairs."""
    st, sconfig, uni, n = melt
    tiny_kn = sconfig._replace(kn=2)
    r1, _ = make_straggler_sim(
        tiny_kn, MODEL, dt=0.005, uniform_params=uni,
        uniform_mass=1.0, backend="pallas_interpret",
    )
    out = r1(st, num_steps=2, rebin_every=2)
    assert bool(out.grid.overflow)

    # A too small: re-init must flag (the tail cannot be stored).
    p, v = gather_straggler_atoms(st, sconfig, n)
    params = lennard_jones_atom(np.ones(n), np.ones(n))
    tiny_a = sconfig._replace(aux_capacity=2)
    st2 = straggler_init(p, v, np.ones(n), params, tiny_a)
    assert bool(st2.grid.overflow)


def test_suggest_straggler_config():
    cfg = suggest_straggler_config(100_000, 48.7, cutoff=2.5, switch=2.0)
    assert cfg.grid.capacity < cfg.wide_capacity
    assert cfg.wide_capacity % 8 == 0
    assert cfg.sentinel == cfg.wide.num_slots

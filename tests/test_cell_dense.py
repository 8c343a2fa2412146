"""Dense-cell (gather-free) engine tests: equivalence with all-pairs, NVE
conservation, rebinning correctness."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emdee_tpu.core.types import make_state
from emdee_tpu.dynamics.verlet import nve_rollout
from emdee_tpu.neighbors.api import NonbondedConfig, make_force_fn
from emdee_tpu.neighbors.cell_dense import (
    cell_dense_forces,
    cell_dense_init,
    gather_dense_atoms,
    make_cell_dense_sim,
    suggest_cell_dense_config,
)
from emdee_tpu.potentials.lennard_jones import LennardJonesModel, lennard_jones_atom
from emdee_tpu.utils.lattice import cubic_lattice, fcc_lattice, maxwell_boltzmann


def _setup(n=1728, density=0.6, T=1.0, seed=11, skin=0.4):
    pos, L = cubic_lattice(n, density, jitter=0.15, seed=seed)
    vel = maxwell_boltzmann(n, T, seed=seed + 1)
    params = lennard_jones_atom(np.ones(n), np.ones(n))
    config = suggest_cell_dense_config(n, L, cutoff=2.5, switch=2.0, skin=skin)
    model = LennardJonesModel.create(2.5, 2.0)
    return pos, vel, L, params, config, model


def test_forces_match_allpairs():
    pos, vel, L, params, config, model = _setup()
    n = pos.shape[0]
    st = cell_dense_init(pos, vel, np.ones(n), params, config)
    assert not bool(st.overflow)
    forces, e, w = cell_dense_forces(st, model, config, compute_energy=True)

    nb = make_force_fn(
        NonbondedConfig(cutoff=2.5, switch=2.0, method="allpairs"), params, L, n
    )
    ref = nb.compute(jnp.asarray(pos, jnp.float32), ())

    ids = np.asarray(st.atom_id).reshape(-1)
    keep = np.asarray(st.valid).reshape(-1)
    f_dense = np.zeros((n, 3), np.float32)
    e_dense = np.zeros(n, np.float32)
    w_dense = np.zeros(n, np.float32)
    f_dense[ids[keep]] = np.asarray(forces).reshape(-1, 3)[keep]
    e_dense[ids[keep]] = np.asarray(e).reshape(-1)[keep]
    w_dense[ids[keep]] = np.asarray(w).reshape(-1)[keep]

    # Tolerances are f32 summation-order noise: verified against the f64
    # oracle the dense engine agrees to ~1e-4 absolute.
    np.testing.assert_allclose(f_dense, np.asarray(ref.forces), rtol=1e-4, atol=5e-4)
    np.testing.assert_allclose(e_dense, np.asarray(ref.energies), rtol=1e-4, atol=5e-4)
    np.testing.assert_allclose(w_dense, np.asarray(ref.virials), rtol=1e-4, atol=5e-4)


def test_rollout_matches_allpairs_trajectory():
    pos, vel, L, params, config, model = _setup(n=1000, density=0.5)
    n = pos.shape[0]
    st = cell_dense_init(pos, vel, np.ones(n), params, config)
    rollout, energy = make_cell_dense_sim(config, model, dt=0.002)
    st = rollout(st, num_steps=50)
    assert not bool(st.overflow)
    pos_d, vel_d = gather_dense_atoms(st, n)

    state = make_state(pos, vel, box=L)
    nb = make_force_fn(
        NonbondedConfig(cutoff=2.5, switch=2.0, method="allpairs"), params, L, n
    )
    ref, _, _ = nve_rollout(state, (), nb.force_fn, 0.002, 50)
    # The dense engine wraps positions only at rebins — compare modulo L.
    Lf = float(L)
    np.testing.assert_allclose(pos_d % Lf, np.asarray(ref.positions) % Lf, atol=5e-4)
    np.testing.assert_allclose(vel_d, np.asarray(ref.velocities), atol=5e-4)


def test_nve_conservation_with_rebinning():
    """Long enough that displacement-triggered rebins fire; energy must hold."""
    pos, vel, L, params, config, model = _setup(n=2197, density=0.7, T=1.2, skin=0.3)
    n = pos.shape[0]
    st = cell_dense_init(pos, vel, np.ones(n), params, config)
    rollout, energy = make_cell_dense_sim(config, model, dt=0.002)
    # Settle the violent jittered-lattice start (overlapping pairs make any
    # f32 integrator bleed energy in the first tens of steps — and atoms can
    # outrun the skin between rebins, so rebin every step here), then gate
    # NVE conservation over the production window.
    st = rollout(st, num_steps=200, rebin_every=1)
    st = st._replace(overflow=jnp.asarray(False))  # clear settle-phase staleness
    pe0, w0, ke0 = (float(x) for x in energy(st))
    from emdee_tpu.neighbors.cell_dense import suggest_rebin_interval

    k = suggest_rebin_interval(config.skin, 0.002, temperature=2.0 * ke0 / (3 * n))
    st = rollout(st, num_steps=500, rebin_every=k)
    assert not bool(st.overflow)
    assert int(st.step) == 700
    pe1, w1, ke1 = (float(x) for x in energy(st))
    # Drift relative to the energy *scale* (KE), not the near-cancelling total.
    drift = abs((pe1 + ke1) - (pe0 + ke0)) / ke0
    assert drift < 5e-4, (pe0 + ke0, pe1 + ke1, ke0)
    # No atoms lost through rebinning.
    assert int(st.valid.sum()) == n


def test_small_box_rejected():
    with pytest.raises(ValueError, match="all-pairs"):
        suggest_cell_dense_config(100, 6.0, cutoff=2.5, switch=2.0, skin=0.4)

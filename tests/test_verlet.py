"""Integrator tests: NVE energy conservation, reversibility, rollout plumbing.

The energy-drift gate is BASELINE config 4's fidelity criterion — the
reference has no integrator at all (SURVEY.md §0)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emdee_tpu.core.types import ENERGIES, VIRIALS, State, make_state
from emdee_tpu.dynamics.observables import energy_drift, kinetic_energy, temperature
from emdee_tpu.dynamics.verlet import nve_rollout, velocity_verlet_step
from emdee_tpu.neighbors.api import NonbondedConfig, make_force_fn
from emdee_tpu.potentials.lennard_jones import lennard_jones_atom
from emdee_tpu.utils.checkpoint import load_state, save_state
from emdee_tpu.utils.lattice import cubic_lattice, maxwell_boltzmann


def _lj_system(n=216, density=0.7, T=1.0, method="allpairs", **cfg_kw):
    pos, L = cubic_lattice(n, density, jitter=0.05, seed=4)
    vel = maxwell_boltzmann(n, T, seed=5)
    state = make_state(pos, vel, box=L)
    config = NonbondedConfig(cutoff=2.5, switch=2.0, method=method, **cfg_kw)
    nb = make_force_fn(config, lennard_jones_atom(np.ones(n), np.ones(n)), L, n)
    return state, nb


def _energy_fn(nb):
    def fn(positions, aux):
        out = nb.compute(positions, aux, outputs=ENERGIES | VIRIALS)
        return jnp.sum(out.energies), jnp.sum(out.virials)

    return fn


@pytest.mark.parametrize("method,n", [("allpairs", 216), ("neighbor_list", 1000)])
def test_nve_energy_conservation(method, n):
    """Total energy drift < 1e-4 (relative) over 400 steps at dt=0.002."""
    state, nb = _lj_system(n=n, method=method, skin=0.4 if method != "allpairs" else 0.0)
    aux = nb.init(state.positions)
    final, aux, traj = nve_rollout(
        state, aux, nb.force_fn, dt=0.002, num_steps=400, record_every=40,
        energy_fn=_energy_fn(nb),
    )
    total = np.asarray(traj.kinetic_energy) + np.asarray(traj.potential_energy)
    drift = float(energy_drift(jnp.asarray(total)))
    assert drift < 1e-4, f"NVE drift {drift} too large: {total}"
    assert int(final.step) == 400


def test_methods_agree_stepwise():
    """allpairs and neighbor_list produce the same trajectory."""
    state, nb_ap = _lj_system(n=1000, method="allpairs")
    _, nb_nl = _lj_system(n=1000, method="neighbor_list", skin=0.4)
    aux_ap = nb_ap.init(state.positions)
    aux_nl = nb_nl.init(state.positions)
    s_ap, _, _ = nve_rollout(state, aux_ap, nb_ap.force_fn, 0.002, 50)
    s_nl, _, _ = nve_rollout(state, aux_nl, nb_nl.force_fn, 0.002, 50)
    np.testing.assert_allclose(
        np.asarray(s_ap.positions), np.asarray(s_nl.positions), atol=2e-4
    )


def test_time_reversibility():
    """Velocity-Verlet is symplectic/time-reversible: integrate forward,
    negate velocities, integrate back → recover the start."""
    state, nb = _lj_system(n=125, density=0.5)
    aux = nb.init(state.positions)
    fwd, aux, _ = nve_rollout(state, aux, nb.force_fn, 0.002, 100)
    back = fwd._replace(velocities=-fwd.velocities)
    rec, _, _ = nve_rollout(back, aux, nb.force_fn, 0.002, 100)
    np.testing.assert_allclose(
        np.asarray(rec.positions), np.asarray(state.positions), atol=5e-4
    )


def test_single_step_matches_manual():
    """One velocity-Verlet step against a hand-rolled NumPy step."""
    state, nb = _lj_system(n=64, density=0.4)
    aux = nb.init(state.positions)
    f0, _ = nb.force_fn(state.positions, state.box, aux)
    dt = 0.001
    new_state, f1, _ = velocity_verlet_step(state, f0, aux, nb.force_fn, dt)

    m = np.asarray(state.masses)[:, None]
    v_half = np.asarray(state.velocities) + 0.5 * dt * np.asarray(f0) / m
    x1 = np.asarray(state.positions) + dt * v_half
    L = float(state.box)
    x1 -= L * np.floor(x1 / L)
    np.testing.assert_allclose(np.asarray(new_state.positions), x1, atol=1e-5)
    f1_ref, _ = nb.force_fn(jnp.asarray(x1, jnp.float32), state.box, aux)
    v1 = v_half + 0.5 * dt * np.asarray(f1_ref) / m
    np.testing.assert_allclose(np.asarray(new_state.velocities), v1, atol=1e-5)


def test_momentum_conservation():
    state, nb = _lj_system(n=125, density=0.6)
    aux = nb.init(state.positions)
    final, _, _ = nve_rollout(state, aux, nb.force_fn, 0.002, 200)
    p0 = np.asarray(state.velocities).sum(axis=0)
    p1 = np.asarray(final.velocities).sum(axis=0)
    np.testing.assert_allclose(p1, p0, atol=1e-3)


def test_checkpoint_roundtrip(tmp_path):
    state, nb = _lj_system(n=64, density=0.4)
    aux = nb.init(state.positions)
    mid, aux, _ = nve_rollout(state, aux, nb.force_fn, 0.002, 20)
    path = str(tmp_path / "ckpt.npz")
    save_state(path, mid, dt=0.002)
    restored, meta = load_state(path, mid)
    assert meta["dt"] == 0.002
    np.testing.assert_array_equal(np.asarray(restored.positions), np.asarray(mid.positions))
    assert int(restored.step) == 20
    # Resuming continues identically to an uninterrupted run.
    cont, _, _ = nve_rollout(restored, aux, nb.force_fn, 0.002, 20)
    full, _, _ = nve_rollout(state, nb.init(state.positions), nb.force_fn, 0.002, 40)
    np.testing.assert_allclose(
        np.asarray(cont.positions), np.asarray(full.positions), atol=1e-5
    )

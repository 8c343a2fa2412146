"""Langevin NVT and observability tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emdee_tpu.core.types import State, make_state
from emdee_tpu.dynamics.langevin import nvt_rollout
from emdee_tpu.dynamics.observables import temperature
from emdee_tpu.neighbors.api import NonbondedConfig, make_force_fn
from emdee_tpu.potentials.lennard_jones import lennard_jones_atom
from emdee_tpu.utils.lattice import cubic_lattice, maxwell_boltzmann
from emdee_tpu.utils.observability import ThroughputMeter, check_finite, guard_energy


def test_langevin_thermostats_to_target():
    """Start cold (T=0.2), thermostat at T*=1.0 → mean T near 1.0."""
    n = 343
    pos, L = cubic_lattice(n, 0.6, jitter=0.05, seed=9)
    state = make_state(pos, maxwell_boltzmann(n, 0.2, seed=10), box=L)
    state = state._replace(rng=jax.random.PRNGKey(0))
    nb = make_force_fn(
        NonbondedConfig(cutoff=2.5, switch=2.0, method="allpairs"),
        lennard_jones_atom(np.ones(n), np.ones(n)), L, n,
    )
    final, _, traj = nvt_rollout(
        state, (), nb.force_fn, dt=0.004, friction=2.0, temperature=1.0,
        num_steps=1500, record_every=100,
    )
    temps = 2.0 * np.asarray(traj.kinetic_energy) / (3.0 * n)
    # Discard the first records (equilibration), then check the mean.
    assert abs(temps[5:].mean() - 1.0) < 0.12, temps


def test_bussi_thermostats_to_target():
    """CSVR: start cold (T=0.2), thermostat at T*=1.0 → mean T near 1.0,
    and the rescale is global (velocity directions preserved per step)."""
    from emdee_tpu.dynamics.bussi import csvr_rollout

    n = 343
    pos, L = cubic_lattice(n, 0.6, jitter=0.05, seed=9)
    state = make_state(pos, maxwell_boltzmann(n, 0.2, seed=10), box=L)
    state = state._replace(rng=jax.random.PRNGKey(3))
    nb = make_force_fn(
        NonbondedConfig(cutoff=2.5, switch=2.0, method="allpairs"),
        lennard_jones_atom(np.ones(n), np.ones(n)), L, n,
    )
    temps = []
    for _ in range(8):
        state, _ = csvr_rollout(
            state, (), nb.force_fn, dt=0.004, tau=0.2, temperature=1.0,
            num_steps=200,
        )
        temps.append(float(temperature(state)))
    assert abs(np.mean(temps[2:]) - 1.0) < 0.12, temps


def test_bussi_requires_rng():
    from emdee_tpu.dynamics.bussi import bussi_step

    n = 27
    pos, L = cubic_lattice(n, 0.3, seed=1)
    state = make_state(pos, box=L)  # rng=None
    nb = make_force_fn(
        NonbondedConfig(cutoff=2.0, switch=1.5, method="allpairs"),
        lennard_jones_atom(np.ones(n), np.ones(n)), L, n,
    )
    f, _ = nb.force_fn(state.positions, state.box, ())
    with pytest.raises(ValueError, match="rng"):
        bussi_step(state, f, (), nb.force_fn, 0.002, 0.5, 1.0)


def test_langevin_requires_rng():
    n = 27
    pos, L = cubic_lattice(n, 0.3, seed=1)
    state = make_state(pos, box=L)  # rng=None
    nb = make_force_fn(
        NonbondedConfig(cutoff=2.0, switch=1.5, method="allpairs"),
        lennard_jones_atom(np.ones(n), np.ones(n)), L, n,
    )
    from emdee_tpu.dynamics.langevin import langevin_baoab_step

    f, _ = nb.force_fn(state.positions, state.box, ())
    with pytest.raises(ValueError, match="rng"):
        langevin_baoab_step(state, f, (), nb.force_fn, 0.002, 1.0, 1.0)


def test_check_finite_catches_nan():
    good = make_state(np.zeros((4, 3)), box=5.0)
    check_finite(good)  # no raise
    bad = good._replace(positions=good.positions.at[1, 2].set(jnp.nan))
    with pytest.raises(FloatingPointError, match="non-finite"):
        check_finite(bad)


def test_guard_energy():
    assert guard_energy(None, -100.0) == -100.0
    assert guard_energy(-100.0, -99.0) == -99.0
    with pytest.raises(FloatingPointError, match="energy jumped"):
        guard_energy(-100.0, 50.0)


def test_throughput_meter():
    meter = ThroughputMeter(num_atoms=1000)
    meter.start()
    stats = meter.update(10)
    assert stats["steps"] == 10
    assert stats["atom_steps_per_s"] > 0


def test_berendsen_npt_relaxes_pressure():
    """NPT: start compressed at high pressure, couple to P*=1.0 → the box
    expands and the mean pressure approaches the target."""
    from emdee_tpu.dynamics.bussi import bussi_step
    from emdee_tpu.dynamics.npt import instantaneous_pressure, npt_rollout
    from emdee_tpu.neighbors.allpairs import compute_nonbonded_allpairs
    from emdee_tpu.core.types import FORCES, VIRIALS
    from emdee_tpu.potentials.lennard_jones import LennardJonesModel

    n = 343
    pos, L = cubic_lattice(n, 0.9, jitter=0.05, seed=12)  # compressed liquid
    state = make_state(pos, maxwell_boltzmann(n, 1.0, seed=13), box=L)
    state = state._replace(rng=jax.random.PRNGKey(5))
    model = LennardJonesModel.create(2.5, 2.0)
    params = lennard_jones_atom(np.ones(n), np.ones(n))

    def force_fn(p, box_, aux):
        out = compute_nonbonded_allpairs(
            p, box_, model, params, None, None, None, outputs=FORCES
        )
        return out.forces, aux

    def virial_fn(p, box_, aux):
        out = compute_nonbonded_allpairs(
            p, box_, model, params, None, None, None, outputs=VIRIALS
        )
        return jnp.sum(out.virials)

    thermo = lambda st, f, ax, ffn, dt_: bussi_step(st, f, ax, ffn, dt_, 0.2, 1.0)

    p0 = float(instantaneous_pressure(state, virial_fn(state.positions, state.box, ())))
    out, _, boxes = npt_rollout(
        state, (), force_fn, virial_fn, dt=0.004, tau_p=0.5, pressure=1.0,
        num_steps=1500, kappa=0.3, thermostat_step=thermo,
    )
    p1 = float(instantaneous_pressure(out, virial_fn(out.positions, out.box, ())))
    # Compressed start is far above P*=1; coupling must bring it close.
    assert p0 > 3.0, p0
    assert abs(p1 - 1.0) < 1.5, (p0, p1)
    assert float(out.box) > float(state.box)  # the box expanded
    assert np.isfinite(np.asarray(boxes)).all()


def test_fire_minimization_relaxes_forces():
    """FIRE: a jittered lattice relaxes to near-zero forces with monotone-ish
    potential-energy decrease."""
    from emdee_tpu.core.types import ENERGIES
    from emdee_tpu.dynamics.minimize import FireConfig, fire_minimize

    n = 343
    pos, L = cubic_lattice(n, 0.8, jitter=0.12, seed=17)
    state = make_state(pos, np.zeros((n, 3)), box=L)
    nb = make_force_fn(
        NonbondedConfig(cutoff=2.5, switch=2.0, method="allpairs"),
        lennard_jones_atom(np.ones(n), np.ones(n)), L, n,
    )
    pe0 = float(jnp.sum(nb.compute(state.positions, (), outputs=ENERGIES).energies))
    f0 = float(jnp.max(jnp.abs(nb.force_fn(state.positions, state.box, ())[0])))
    out, _, hist = fire_minimize(
        state, (), nb.force_fn, num_steps=1000,
        config=FireConfig(dt_start=0.001, dt_max=0.008),
    )
    pe1 = float(jnp.sum(nb.compute(out.positions, (), outputs=ENERGIES).energies))
    f1 = float(jnp.max(jnp.abs(nb.force_fn(out.positions, out.box, ())[0])))
    assert pe1 < pe0 - 1.0, (pe0, pe1)
    assert f1 < 0.02 * f0, (f0, f1)
    assert f1 < 2.0, f1

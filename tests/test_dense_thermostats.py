"""Thermostats on the production dense-cell engine (CSVR + Langevin NVT).

The reference has no integrator at all (SURVEY.md §0); these gate the
engine-resident thermostat hooks: starting far from the target temperature,
the thermostatted rollout must relax to it and hold it.
"""

import jax
import numpy as np
import pytest

from emdee_tpu.neighbors.cell_dense import (
    CSVRConfig,
    LangevinConfig,
    cell_dense_init,
    make_cell_dense_sim,
    suggest_cell_dense_config,
)
from emdee_tpu.potentials.lennard_jones import LennardJonesModel, lennard_jones_atom
from emdee_tpu.utils.lattice import fcc_lattice, maxwell_boltzmann


def _setup(t_init=0.2):
    pos, box = fcc_lattice(6, density=0.7)  # 864 atoms
    n = pos.shape[0]
    vel = maxwell_boltzmann(n, t_init, seed=11)
    params = lennard_jones_atom(np.ones(n), np.ones(n))
    config = suggest_cell_dense_config(n, box, cutoff=2.5, switch=2.0, skin=0.35)
    model = LennardJonesModel.create(2.5, 2.0)
    st = cell_dense_init(pos, vel, np.ones(n), params, config)
    assert not bool(st.overflow)
    return st, config, model, n


def _temperature(state, n):
    v = np.asarray(state.velocities)
    valid = np.asarray(state.valid)
    ke = 0.5 * float((v[valid] ** 2).sum())
    return 2.0 * ke / (3.0 * n - 3.0)


@pytest.mark.parametrize(
    "thermostat",
    [
        # Statistical relaxation gates are slow (≈52 s each) — full tier;
        # the quick tier keeps the CSVR relax gate on the allpairs engine
        # (test_dynamics_extra.py) and the rng-API check below.
        pytest.param(
            CSVRConfig(temperature=1.0, tau=0.2), marks=pytest.mark.full
        ),
        pytest.param(
            LangevinConfig(temperature=1.0, friction=2.0), marks=pytest.mark.full
        ),
    ],
    ids=["csvr", "langevin"],
)
def test_dense_thermostat_relaxes_to_target(thermostat):
    st, config, model, n = _setup(t_init=0.2)
    rollout, energy = make_cell_dense_sim(
        config, model, dt=0.004, backend="xla", thermostat=thermostat,
    )
    key = jax.random.PRNGKey(3)
    out = rollout(st, num_steps=600, rebin_every=5, rng=key)
    assert not bool(out.overflow)
    t1 = _temperature(out, n)
    # Relaxed from 0.2 to ~1.0 (canonical KE fluctuations at N=864 are ~5%,
    # plus equilibration noise).
    assert 0.85 < t1 < 1.15
    # Holds the target over a further window.
    out2 = rollout(out, num_steps=300, rebin_every=5, rng=jax.random.PRNGKey(5))
    t2 = _temperature(out2, n)
    assert 0.85 < t2 < 1.15


def test_dense_thermostat_smoke():
    """Quick-tier execution gate for the dense thermostatted rollout: a cold
    start must heat toward the target within a short window (the full
    statistical relaxation gates above are full-tier)."""
    st, config, model, n = _setup(t_init=0.2)
    rollout, _ = make_cell_dense_sim(
        config, model, dt=0.004, backend="xla",
        thermostat=CSVRConfig(temperature=1.0, tau=0.2),
    )
    out = rollout(st, num_steps=60, rebin_every=5, rng=jax.random.PRNGKey(3))
    assert not bool(out.overflow)
    assert _temperature(out, n) > 0.3  # pumped well above the cold start


def test_dense_thermostat_requires_rng():
    st, config, model, n = _setup()
    rollout, _ = make_cell_dense_sim(
        config, model, dt=0.004, backend="xla",
        thermostat=CSVRConfig(temperature=1.0, tau=0.2),
    )
    with pytest.raises(ValueError, match="rng"):
        rollout(st, num_steps=4, rebin_every=2)


@pytest.mark.full
def test_dense_nve_unchanged_by_thermostat_plumbing():
    """rng threading must not change the NVE path: same trajectory as before
    (bitwise) whether or not an (unused) key is passed."""
    st, config, model, n = _setup(t_init=0.8)
    rollout, _ = make_cell_dense_sim(config, model, dt=0.004, backend="xla")
    a = rollout(st, num_steps=40, rebin_every=5)
    b = rollout(st, num_steps=40, rebin_every=5, rng=jax.random.PRNGKey(9))
    np.testing.assert_array_equal(np.asarray(a.positions), np.asarray(b.positions))


@pytest.mark.full
def test_dense_npt_relaxes_pressure():
    """Berendsen pressure coupling on the dense engine: from a compressed LJ
    liquid far above the target pressure, the dynamic box must expand and the
    measured pressure must move to the target — all in ONE compiled rollout
    (the dynamic state.box protocol)."""
    from emdee_tpu.neighbors.cell_dense import BerendsenBarostatConfig, _state_box

    pos, box = fcc_lattice(6, density=0.85)
    n = pos.shape[0]
    vel = maxwell_boltzmann(n, 1.0, seed=21)
    params = lennard_jones_atom(np.ones(n), np.ones(n))
    config = suggest_cell_dense_config(n, box, cutoff=2.5, switch=2.0, skin=0.35)
    model = LennardJonesModel.create(2.5, 2.0)
    st = cell_dense_init(pos, vel, np.ones(n), params, config)
    assert not bool(st.overflow)

    target_p = 0.5
    nvt, energy = make_cell_dense_sim(
        config, model, dt=0.004, backend="xla",
        thermostat=CSVRConfig(temperature=1.0, tau=0.2),
    )
    rollout, _ = make_cell_dense_sim(
        config, model, dt=0.004, backend="xla",
        thermostat=CSVRConfig(temperature=1.0, tau=0.2),
        barostat=BerendsenBarostatConfig(pressure=target_p, tau=0.4, kappa=1.0),
    )

    def pressure(state):
        pe, vir, ke = (float(x) for x in energy(state))
        b = float(_state_box(state, config))
        return (2.0 * ke + vir) / (3.0 * b**3)

    # Melt/equilibrate at fixed box first: the cold stretched FCC lattice
    # starts under tension (negative virial pressure).
    st = nvt(st, num_steps=400, rebin_every=5, rng=jax.random.PRNGKey(7))
    assert not bool(st.overflow)
    p0 = pressure(st)
    assert p0 > 1.5  # equilibrated compressed liquid, above target

    out = rollout(st, num_steps=800, rebin_every=5, rng=jax.random.PRNGKey(13))
    assert not bool(out.overflow)
    b1 = float(out.box)
    assert b1 > box * 1.01  # the box expanded
    p1 = pressure(out)
    assert abs(p1 - target_p) < 0.5 * abs(p0 - target_p)  # most of the gap closed

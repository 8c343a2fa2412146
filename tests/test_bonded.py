"""Bonded-potential tests: analytic values, autodiff forces, and parameter
assignment on the reference fixture (which the reference itself parses but
never evaluates — SURVEY.md §0)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emdee_tpu.potentials.bonded import (
    AngleTable,
    BondTable,
    BondedSystem,
    TorsionTable,
    angle_energy,
    bond_energy,
    torsion_energy,
)
from tests.conftest import reference_data_path

BOX = jnp.float32(100.0)


def _bond_table(pairs, r0, k, n=10):
    m = len(pairs)
    return BondTable(
        atoms=jnp.asarray(pairs, jnp.int32),
        length=jnp.asarray(r0, jnp.float32),
        k=jnp.asarray(k, jnp.float32),
        valid=jnp.ones(m, bool),
    )


def test_bond_energy_analytic():
    pos = jnp.asarray([[0.0, 0, 0], [1.5, 0, 0]], jnp.float32)
    table = _bond_table([(0, 1)], [1.0], [100.0])
    e = bond_energy(pos, BOX, table)
    assert float(e) == pytest.approx(0.5 * 100 * 0.5**2, rel=1e-5)


def test_bond_force_direction():
    pos = jnp.asarray([[0.0, 0, 0], [1.5, 0, 0]], jnp.float32)
    table = _bond_table([(0, 1)], [1.0], [100.0])
    bs = BondedSystem(bonds=table, angles=None, torsions=None, impropers=None)
    f = bs.force_fn()(pos, BOX)
    # Stretched bond pulls atoms together: F = k(r − r0) = 50 inward.
    np.testing.assert_allclose(np.asarray(f[0]), [50.0, 0, 0], atol=1e-3)
    np.testing.assert_allclose(np.asarray(f[1]), [-50.0, 0, 0], atol=1e-3)


def test_bond_pbc():
    """Bond across the periodic boundary uses the minimum image."""
    box = jnp.float32(10.0)
    pos = jnp.asarray([[0.2, 0, 0], [9.8, 0, 0]], jnp.float32)  # distance 0.4
    table = _bond_table([(0, 1)], [0.4], [100.0])
    assert float(bond_energy(pos, box, table)) == pytest.approx(0.0, abs=1e-6)


def test_angle_energy_analytic():
    pos = jnp.asarray([[1.0, 0, 0], [0.0, 0, 0], [0.0, 1.0, 0]], jnp.float32)
    table = AngleTable(
        atoms=jnp.asarray([[0, 1, 2]], jnp.int32),
        theta0=jnp.asarray([np.pi / 3], jnp.float32),
        k=jnp.asarray([10.0], jnp.float32),
        valid=jnp.ones(1, bool),
    )
    e = angle_energy(pos, BOX, table)
    assert float(e) == pytest.approx(0.5 * 10 * (np.pi / 2 - np.pi / 3) ** 2, rel=1e-4)


def test_torsion_energy_analytic():
    """Planar cis arrangement: φ=0 → E = k(1 + cos(nφ − φ0))."""
    pos = jnp.asarray(
        [[1.0, 1.0, 0], [0.0, 0.9, 0], [0.0, -1.0, 0], [1.0, -1.1, 0]], jnp.float32
    )
    table = TorsionTable(
        atoms=jnp.asarray([[0, 1, 2, 3]], jnp.int32),
        periodicity=jnp.asarray([[2, 0]], jnp.int32),
        phase=jnp.asarray([[np.pi, 0.0]], jnp.float32),
        k=jnp.asarray([[4.0, 0.0]], jnp.float32),
        valid=jnp.ones(1, bool),
    )
    e = torsion_energy(pos, BOX, table)
    # cis: φ=0; E = 4(1 + cos(0 − π)) = 0 … plus the k=0 second term → 4·(1−1)=0
    assert float(e) == pytest.approx(4.0 * (1 + np.cos(-np.pi)), abs=1e-4)


def test_torsion_forces_finite_difference():
    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.normal(0, 1, (4, 3)), jnp.float32) * 1.5
    table = TorsionTable(
        atoms=jnp.asarray([[0, 1, 2, 3]], jnp.int32),
        periodicity=jnp.asarray([[1, 3]], jnp.int32),
        phase=jnp.asarray([[0.0, np.pi]], jnp.float32),
        k=jnp.asarray([[2.0, 0.7]], jnp.float32),
        valid=jnp.ones(1, bool),
    )
    bs = BondedSystem(bonds=None, angles=None, torsions=table, impropers=None)
    f = bs.force_fn()(pos, BOX)
    eps = 1e-3
    for a in range(4):
        for d in range(3):
            pp = pos.at[a, d].add(eps)
            pm = pos.at[a, d].add(-eps)
            fd = -(float(torsion_energy(pp, BOX, table)) - float(torsion_energy(pm, BOX, table))) / (2 * eps)
            assert float(f[a, d]) == pytest.approx(fd, abs=2e-2)


@pytest.mark.skipif(
    reference_data_path("dibenzo-p-dioxin-in-water.xml") is None,
    reason="reference fixtures not mounted",
)
def test_assignment_on_fixture():
    """Assign bonded parameters to the dioxin-in-water system: every water
    has 2 bonds + 1 angle; the dioxin's rings yield torsions."""
    from emdee_tpu.modelling.bonded import build_bonded_system
    from emdee_tpu.modelling.forcefield import ForceField
    from emdee_tpu.modelling.system import System

    ff = ForceField(reference_data_path("dibenzo-p-dioxin-in-water.xml"))
    system = System(reference_data_path("dibenzo-p-dioxin-in-water.pdb"), ff)
    bonded = build_bonded_system(system, length_scale=10.0)  # nm → Å

    n_bonds = int(bonded.bonds.valid.sum())
    n_angles = int(bonded.angles.valid.sum())
    assert n_bonds == len(system.bonds)
    # 499 waters à 1 angle, plus the dioxin's angles.
    assert n_angles >= 499
    assert bonded.torsions is not None and int(bonded.torsions.valid.sum()) > 0

    # Energy + forces evaluate finitely and respond to geometry.
    pos = jnp.asarray(system.positions, jnp.float32)
    box = jnp.float32(float(system.box_lengths[0]))
    e = bonded.energy(pos, box)
    assert np.isfinite(float(e))
    f = bonded.force_fn()(pos, box)
    assert np.isfinite(np.asarray(f)).all()
    assert float(jnp.abs(f).max()) > 0

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


def test_analytic_forces_match_autodiff():
    """`bonded_forces_analytic` (one gather/scatter set) must reproduce the
    autodiff gradient of the energies for every term type, including shared
    atoms across terms and pad rows."""
    import jax

    from emdee_tpu.potentials.bonded import (
        AngleTable,
        BondTable,
        BondedSystem,
        TorsionTable,
        bonded_forces_analytic,
    )

    rng = np.random.default_rng(0)
    n = 60
    pos = jnp.asarray(rng.uniform(0, 10, (n, 3)).astype(np.float32))
    box = jnp.float32(10.0)

    def pad8(k):
        return max(8, -(-k // 8) * 8)

    def distinct_rows(count, arity):
        out = np.zeros((count, arity), np.int32)
        for r in range(count):
            out[r] = rng.choice(n, arity, replace=False)
        return out

    nb = 21
    cap = pad8(nb)
    ba = np.full((cap, 2), n, np.int32)
    ba[:nb] = distinct_rows(nb, 2)
    bonds = BondTable(
        jnp.asarray(ba),
        jnp.asarray(rng.uniform(0.8, 1.5, cap).astype(np.float32)),
        jnp.asarray(rng.uniform(10, 50, cap).astype(np.float32)),
        jnp.asarray(np.arange(cap) < nb),
    )
    na_ = 17
    cap_a = pad8(na_)
    aa = np.full((cap_a, 3), n, np.int32)
    aa[:na_] = distinct_rows(na_, 3)
    angles = AngleTable(
        jnp.asarray(aa),
        jnp.asarray(rng.uniform(1.5, 2.2, cap_a).astype(np.float32)),
        jnp.asarray(rng.uniform(10, 40, cap_a).astype(np.float32)),
        jnp.asarray(np.arange(cap_a) < na_),
    )
    nt = 13
    cap_t = pad8(nt)
    ta = np.full((cap_t, 4), n, np.int32)
    for r in range(nt):
        ta[r] = rng.choice(n, 4, replace=False)
    tors = TorsionTable(
        atoms=jnp.asarray(ta),
        periodicity=jnp.asarray(rng.integers(1, 4, (cap_t, 3)).astype(np.int32)),
        phase=jnp.asarray(rng.uniform(0, 3.1, (cap_t, 3)).astype(np.float32)),
        k=jnp.asarray(rng.uniform(1, 8, (cap_t, 3)).astype(np.float32)),
        valid=jnp.asarray(np.arange(cap_t) < nt),
    )
    bs = BondedSystem(bonds=bonds, angles=angles, torsions=tors, impropers=tors)
    f_auto = np.asarray(-jax.grad(lambda p: bs.energy(p, box))(pos))
    f_ana = np.asarray(bonded_forces_analytic(pos, box, bs))
    scale = max(np.abs(f_auto).max(), 1.0)
    np.testing.assert_allclose(f_ana, f_auto, atol=2e-6 * scale)

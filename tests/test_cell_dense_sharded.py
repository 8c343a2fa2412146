"""Sharded dense-cell engine tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emdee_tpu.distributed.cell_dense_sharded import (
    distribute_cell_dense,
    make_sharded_cell_dense_sim,
    validate_sharded_config,
)
from emdee_tpu.distributed.mesh import make_mesh
from emdee_tpu.neighbors.cell_dense import (
    cell_dense_forces,
    cell_dense_init,
    gather_dense_atoms,
    make_cell_dense_sim,
    suggest_cell_dense_config,
)
from emdee_tpu.potentials.lennard_jones import LennardJonesModel, lennard_jones_atom
from emdee_tpu.utils.lattice import cubic_lattice, maxwell_boltzmann

pytestmark = pytest.mark.skipif(
    jax.device_count() < 2, reason="needs multi-device (virtual) mesh"
)


def _setup(n=4096, density=0.25, T=0.9, seed=21, ndev=4):
    # Box must hold ndev·2 cell layers: pick density accordingly.
    pos, L = cubic_lattice(n, density, jitter=0.1, seed=seed)
    vel = maxwell_boltzmann(n, T, seed=seed + 1)
    params = lennard_jones_atom(np.ones(n), np.ones(n))
    config = suggest_cell_dense_config(n, L, cutoff=2.5, switch=2.0, skin=0.3)
    m = config.cells_per_dim
    # Force divisibility for the test mesh.
    m = (m // ndev) * ndev
    if m < 2 * ndev:
        raise ValueError("test system too small")
    config = config._replace(cells_per_dim=m)
    model = LennardJonesModel.create(2.5, 2.0)
    st = cell_dense_init(pos, vel, np.ones(n), params, config)
    return st, config, model, n


def test_validate_config():
    st, config, model, n = _setup()
    assert validate_sharded_config(config, 4) >= 2
    with pytest.raises(ValueError, match="divide evenly"):
        validate_sharded_config(config._replace(cells_per_dim=10), 4)


def test_sharded_forces_match_single_device():
    st, config, model, n = _setup()
    mesh = make_mesh(4)
    st_sh = distribute_cell_dense(st, mesh)
    rollout, energy = make_sharded_cell_dense_sim(config, model, 0.002, mesh)
    pe, vir, ke = energy(st_sh)

    f_ref, e_ref, w_ref = cell_dense_forces(st, model, config, compute_energy=True)
    valid = np.asarray(st.valid)
    np.testing.assert_allclose(
        float(pe), float(jnp.where(st.valid, e_ref, 0).sum()), rtol=1e-5, atol=1e-2
    )
    np.testing.assert_allclose(
        float(vir), float(jnp.where(st.valid, w_ref, 0).sum()), rtol=1e-5, atol=1e-2
    )


def test_sharded_rollout_matches_single_device():
    st, config, model, n = _setup(n=2048, density=0.09)
    mesh = make_mesh(4)
    rollout_1, _ = make_cell_dense_sim(config, model, dt=0.002, backend="xla")
    ref = rollout_1(st, num_steps=30, rebin_every=5)

    st_sh = distribute_cell_dense(st, mesh)
    rollout_n, _ = make_sharded_cell_dense_sim(config, model, 0.002, mesh)
    out = rollout_n(st_sh, num_steps=30, rebin_every=5)

    assert not bool(out.overflow)
    assert int(out.step) == 30
    p_ref, v_ref = gather_dense_atoms(ref, n)
    p_out, v_out = gather_dense_atoms(out, n)
    np.testing.assert_allclose(p_out, p_ref, atol=2e-4)
    np.testing.assert_allclose(v_out, v_ref, atol=2e-4)


@pytest.mark.full
def test_sharded_energy_conservation():
    st, config, model, n = _setup(n=4096, density=0.25, T=0.8)
    mesh = make_mesh(4)
    st_sh = distribute_cell_dense(st, mesh)
    rollout, energy = make_sharded_cell_dense_sim(config, model, 0.002, mesh)
    st_sh = rollout(st_sh, num_steps=100, rebin_every=2)  # settle hot start
    st_sh = st_sh._replace(overflow=jnp.asarray(False))
    pe0, _, ke0 = (float(x) for x in energy(st_sh))
    st_sh = rollout(st_sh, num_steps=200, rebin_every=5)
    assert not bool(st_sh.overflow)
    pe1, _, ke1 = (float(x) for x in energy(st_sh))
    assert abs((pe1 + ke1) - (pe0 + ke0)) / max(ke0, 1.0) < 5e-4

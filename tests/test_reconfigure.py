"""NPT geometry re-config protocol: when the dynamic box drifts past the
static-geometry guard, `reconfigure_dense_state` / `reconfigure_grid_state`
re-derive the cell grid at the current box and the run continues.

Reference match: the reference re-derives its cell grid whenever the cell
count changes (cells.jl:46-76); here that operation lives host-side because
M and C are trace-time statics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emdee_tpu.neighbors.cell_dense import (
    cell_dense_forces,
    cell_dense_init,
    gather_dense_atoms,
    gather_dense_fields,
    reconfigure_dense_state,
    suggest_cell_dense_config,
)
from emdee_tpu.potentials.lennard_jones import LennardJonesModel, lennard_jones_atom
from emdee_tpu.utils.lattice import cubic_lattice, maxwell_boltzmann


def _state(n=864, density=0.4, box_scale=1.0, charges=False, seed=3):
    pos, L = cubic_lattice(n, density, jitter=0.08, seed=seed)
    vel = maxwell_boltzmann(n, 0.9, seed=seed + 1)
    params = lennard_jones_atom(np.full(n, 1.01), np.full(n, 0.97))
    config = suggest_cell_dense_config(n, L, cutoff=2.5, switch=2.0, skin=0.3)
    q = None
    if charges:
        q = np.where(np.arange(n) % 2 == 0, 0.1, -0.1).astype(np.float32)
    st = cell_dense_init(pos, vel, np.linspace(1.0, 2.0, n), params, config, charges=q)
    assert not bool(st.overflow)
    return st, config, n


def test_gather_fields_roundtrip():
    st, config, n = _state(charges=True)
    f = gather_dense_fields(st, n)
    from emdee_tpu.core.types import LJParams

    st2 = cell_dense_init(
        f["positions"], f["velocities"], f["masses"],
        LJParams(half_sigma=f["half_sigma"], twice_sqrt_eps=f["twice_sqrt_eps"]),
        config, charges=f["charges"],
    )
    np.testing.assert_array_equal(np.asarray(st2.atom_id), np.asarray(st.atom_id))
    np.testing.assert_allclose(
        np.asarray(st2.positions), np.asarray(st.positions), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(st2.half_sigma), np.asarray(st.half_sigma), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(st2.charges), np.asarray(st.charges), atol=0
    )


def test_reconfigure_after_box_growth():
    """Simulate an NPT box that grew 40%: the re-derived config gets more
    cells, the re-init state carries every field, and physics (energy at the
    gathered coordinates) is preserved."""
    st, config, n = _state(charges=True)
    grown = float(config.box) * 1.4
    # μ-rescale exactly like the barostat: positions scale with the box.
    mu = grown / float(config.box)
    st = st._replace(
        positions=st.positions * mu,
        ref_positions=st.ref_positions * mu,
        box=jnp.float32(grown),
        step=jnp.asarray(123, jnp.int32),
    )
    model = LennardJonesModel.create(2.5, 2.0)

    st2, cfg2 = reconfigure_dense_state(st, config)
    assert cfg2.cells_per_dim > config.cells_per_dim
    assert cfg2.box == pytest.approx(grown, rel=1e-6)
    assert not bool(st2.overflow)
    assert int(st2.step) == 123
    assert st2.charges is not None

    # Same atoms, same coordinates → same energy under the new geometry.
    _, e_old, _ = cell_dense_forces(st, model, config, compute_energy=True)
    _, e_new, _ = cell_dense_forces(st2, model, cfg2, compute_energy=True)
    pe_old = float(jnp.where(st.valid, e_old, 0).sum())
    pe_new = float(jnp.where(st2.valid, e_new, 0).sum())
    assert pe_new == pytest.approx(pe_old, rel=1e-5, abs=1e-2)

    p1, v1 = gather_dense_atoms(st, n)
    p2, v2 = gather_dense_atoms(st2, n)
    np.testing.assert_allclose(v2, v1, atol=0)
    # Coordinates agree modulo the box wrap applied at re-init.
    d = np.abs(p2 - p1)
    d = np.minimum(d, grown - d)
    assert float(d.max()) < 1e-3


def test_reconfigure_after_box_shrink_guard():
    """The guard case: box shrank below M·(rc+skin) — re-derive drops M and
    clears the tripped flag; too-small boxes raise instead of mis-binning."""
    st, config, n = _state(density=0.3)
    shrunk = config.cells_per_dim * (config.cutoff + config.skin) * 0.98
    mu = shrunk / float(config.box)
    st = st._replace(
        positions=st.positions * mu, ref_positions=st.ref_positions * mu,
        box=jnp.float32(shrunk), overflow=jnp.asarray(True),
    )
    st2, cfg2 = reconfigure_dense_state(st, config)
    assert cfg2.cells_per_dim < config.cells_per_dim
    assert not bool(st2.overflow)

    with pytest.raises(ValueError):
        tiny = st._replace(box=jnp.float32(4.0))
        reconfigure_dense_state(tiny, config)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 (virtual) devices")
@pytest.mark.full
def test_reconfigure_grid_continues_npt():
    """Grid-sharded continuation: grow the box past the shard geometry,
    reconfigure over the same mesh, and keep rolling — the full protocol a
    long NPT run uses when the sticky geometry guard trips."""
    from emdee_tpu.distributed.grid_sharded import (
        distribute_grid,
        gather_grid_atoms,
        make_grid_mesh,
        make_grid_sharded_sim,
        reconfigure_grid_state,
        validate_grid_config,
    )

    st, config, n = _state(n=1728, density=0.25)
    m8 = (config.cells_per_dim // 2) * 2
    config = config._replace(cells_per_dim=max(m8, 4))
    st, config = reconfigure_dense_state(st, config, cells_multiple_of=2)
    mesh = make_grid_mesh((2, 2, 2))
    validate_grid_config(config, mesh)
    model = LennardJonesModel.create(2.5, 2.0)

    grown = float(config.box) * 1.5
    mu = grown / float(config.box)
    st = st._replace(
        positions=st.positions * mu, ref_positions=st.ref_positions * mu,
        box=jnp.float32(grown), overflow=jnp.asarray(True),
    )
    st_sh = distribute_grid(st, config, mesh)

    st2_sh, cfg2 = reconfigure_grid_state(st_sh, config, mesh)
    assert cfg2.cells_per_dim % 2 == 0
    assert cfg2.cells_per_dim > config.cells_per_dim

    rollout, energy = make_grid_sharded_sim(cfg2, model, 0.002, mesh, backend="xla")
    out = rollout(st2_sh, num_steps=4, rebin_every=2)
    assert not bool(out.overflow)
    assert int(out.step) == int(st.step) + 4
    pe, _, _ = (float(x) for x in energy(out))
    assert np.isfinite(pe)
    p, v = gather_grid_atoms(out, cfg2, n)
    assert np.isfinite(p).all() and np.isfinite(v).all()

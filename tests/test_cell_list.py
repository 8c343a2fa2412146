"""Cell-list and neighbor-list tests.

Resurrects the spirit of the reference's disabled `test_cells`
(runtests.jl:6-17: incremental update ≡ from-scratch binning) and adds the
equivalence gate the reference never had: neighbor-listed forces ≡ all-pairs
forces (SURVEY.md §4 implications)."""

import jax.numpy as jnp
import numpy as np
import pytest

from emdee_tpu.core.types import ALL_OUTPUTS
from emdee_tpu.neighbors.allpairs import compute_nonbonded_allpairs
from emdee_tpu.neighbors.api import NonbondedConfig, make_force_fn
from emdee_tpu.neighbors.cell_list import (
    build_cell_list,
    cells_per_dimension,
    compute_cell_ids,
    stencil_cell_ids,
    stencil_offsets,
)
from emdee_tpu.neighbors.neighbor_list import (
    build_neighbor_list,
    estimate_max_neighbors,
    needs_rebuild,
)
from emdee_tpu.potentials.lennard_jones import LennardJonesModel, lennard_jones_atom
from emdee_tpu.utils.lattice import cubic_lattice


def _sample(n=500, density=0.5, seed=0, jitter=0.3):
    pos, L = cubic_lattice(n, density, jitter=jitter, seed=seed)
    return jnp.asarray(pos, jnp.float32), jnp.float32(L)


def test_cell_ids_match_reference_binning():
    """id = vx + M(vy + M vz) with v = ⌊M·wrap(s)⌋ (cells.jl:80-85, 0-based)."""
    pos = jnp.asarray([[0.0, 0.0, 0.0], [9.99, 9.99, 9.99], [5.0, 0.0, 0.0],
                       [-0.1, 0.0, 0.0]], jnp.float32)
    m = 4
    ids = compute_cell_ids(pos, jnp.float32(10.0), m)
    assert ids[0] == 0
    assert ids[1] == m**3 - 1
    assert ids[2] == 2
    assert ids[3] == 3  # negative wraps to the last cell in x


def test_cell_list_counts_and_table():
    pos, L = _sample(400)
    m = cells_per_dimension(float(L), 1.5, 2)
    cl = build_cell_list(pos, L, cells_per_dim=m, capacity=16)
    counts = np.asarray(cl.cell_counts)
    assert counts.sum() == 400
    assert not bool(cl.overflow)
    # Every table entry's atom really is in that cell.
    table = np.asarray(cl.cell_table)
    ids = np.asarray(cl.cell_ids)
    for cell in range(table.shape[0]):
        entries = table[cell][table[cell] < 400]
        assert len(entries) == counts[cell]
        assert all(ids[e] == cell for e in entries)


def test_cell_list_overflow_flag():
    pos = jnp.zeros((50, 3), jnp.float32)  # all atoms in one cell
    cl = build_cell_list(pos, jnp.float32(10.0), cells_per_dim=5, capacity=8)
    assert bool(cl.overflow)


def test_rebuild_equals_fresh_build():
    """The reference's disabled test_cells invariant: binning after motion
    equals from-scratch binning (runtests.jl:6-17) — trivially true for
    bin-and-sort, asserted for the dense table."""
    pos, L = _sample(300)
    moved = (pos + 0.01) % L
    m = cells_per_dimension(float(L), 1.5, 2)
    a = build_cell_list(moved, L, cells_per_dim=m, capacity=16)
    b = build_cell_list(moved, L, cells_per_dim=m, capacity=16)
    np.testing.assert_array_equal(np.asarray(a.cell_ids), np.asarray(b.cell_ids))
    np.testing.assert_array_equal(np.asarray(a.cell_table), np.asarray(b.cell_table))


def test_stencil_offsets_geometry():
    full = stencil_offsets(11, ndiv=2, half=False)
    half = stencil_offsets(11, ndiv=2, half=True)
    # Full shell pairs up exactly into ±v; half is one of each.
    assert len(full) == 2 * len(half)
    as_set = {tuple(v) for v in full}
    assert (0, 0, 0) not in as_set
    for v in full:
        assert tuple(-v) in as_set
    # ndiv=1 must include the full 26-neighborhood.
    assert len(stencil_offsets(5, ndiv=1, half=False)) == 26


def test_stencil_cell_ids_wrap():
    m = 5
    offs = np.array([[1, 0, 0], [-1, 0, 0]], np.int32)
    table = np.asarray(stencil_cell_ids(m, offs))
    # Cell 0 = (0,0,0): +x → 1, −x wraps → 4.
    assert table[0, 0] == 1 and table[0, 1] == 4


def test_neighbor_list_complete_and_correct():
    """Every pair within cutoff is listed (both directions), nothing beyond
    cutoff is kept, against a brute-force O(N²) check."""
    pos, L = _sample(350, density=0.6, seed=2)
    cutoff = 1.6
    m = cells_per_dimension(float(L), cutoff, 2)
    nbrs = build_neighbor_list(
        pos, L, cutoff, cells_per_dim=m, cell_capacity=24,
        max_neighbors=estimate_max_neighbors(350, float(L), cutoff, multiplier=3.0),
    )
    assert not bool(nbrs.overflow)
    idx = np.asarray(nbrs.idx)
    p = np.asarray(pos, np.float64)
    Lf = float(L)
    d = p[:, None, :] - p[None, :, :]
    d -= Lf * np.round(d / Lf)
    r2 = (d**2).sum(-1)
    n = p.shape[0]
    within = (r2 < cutoff**2) & ~np.eye(n, dtype=bool)
    listed = np.zeros_like(within)
    for i in range(n):
        for j in idx[i][idx[i] < n]:
            listed[i, j] = True
    assert (within & ~listed).sum() == 0, "missing pairs"
    # Everything listed is within cutoff (list built without skin here).
    assert (listed & (r2 >= cutoff**2 + 1e-6)).sum() == 0


def test_needs_rebuild_trigger():
    pos, L = _sample(100)
    m = cells_per_dimension(float(L), 1.5, 2)
    nbrs = build_neighbor_list(pos, L, 1.5, cells_per_dim=m, cell_capacity=16,
                               max_neighbors=48)
    assert not bool(needs_rebuild(nbrs, pos, L, 0.4))
    shifted = pos.at[0, 0].add(0.21)
    assert bool(needs_rebuild(nbrs, shifted, L, 0.4))
    assert not bool(needs_rebuild(nbrs, shifted, L, 0.5))


@pytest.mark.parametrize("n,density", [(500, 0.4), (1728, 0.8)])
def test_neighborlist_forces_match_allpairs(n, density):
    """The central equivalence gate: O(N) path ≡ O(N²) path elementwise."""
    pos, L = _sample(n, density=density, seed=3, jitter=0.2)
    model_cfg = NonbondedConfig(cutoff=2.5, switch=2.0, method="neighbor_list", skin=0.4)
    nb = make_force_fn(model_cfg, lennard_jones_atom(np.ones(n), np.ones(n)), float(L), n)
    aux = nb.init(pos)
    out = nb.compute(pos, aux, outputs=ALL_OUTPUTS)

    model = LennardJonesModel.create(2.5, 2.0)
    ref = compute_nonbonded_allpairs(
        pos, L, model, lennard_jones_atom(np.ones(n), np.ones(n)),
    )
    np.testing.assert_allclose(np.asarray(out.forces), np.asarray(ref.forces),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.energies), np.asarray(ref.energies),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.virials), np.asarray(ref.virials),
                               rtol=1e-4, atol=1e-4)

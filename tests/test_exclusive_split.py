"""`_split_exclusive_terms` invariants: the exclusive/shared partition is
complete, exclusive rows have globally unique targets, and the scatter-set +
scatter-add evaluation is bit-identical to one merged scatter-add."""

import numpy as np

import jax.numpy as jnp

from emdee_tpu.neighbors.cell_dense_molecular import _split_exclusive_terms
from emdee_tpu.potentials.bonded import (
    AngleTable,
    BondTable,
    BondedSystem,
    bonded_force_rows,
)


def _system(num_atoms):
    """3 waters (atoms 0-8, one exclusive angle each) + a chain (9-12) whose
    angles share atoms, + a bond on the chain."""
    angles = AngleTable(
        atoms=jnp.asarray(
            [[1, 0, 2], [4, 3, 5], [7, 6, 8], [9, 10, 11], [10, 11, 12],
             [num_atoms] * 3, [num_atoms] * 3, [num_atoms] * 3],
            jnp.int32,
        ),
        theta0=jnp.asarray([1.9, 1.9, 1.9, 2.0, 2.0, 0, 0, 0], jnp.float32),
        k=jnp.asarray([400.0, 400.0, 400.0, 300.0, 250.0, 0, 0, 0], jnp.float32),
        valid=jnp.asarray([True] * 5 + [False] * 3),
    )
    bonds = BondTable(
        atoms=jnp.asarray(
            [[9, 10]] + [[num_atoms] * 2] * 7, jnp.int32
        ),
        length=jnp.asarray([1.2] + [0.0] * 7, jnp.float32),
        k=jnp.asarray([500.0] + [0.0] * 7, jnp.float32),
        valid=jnp.asarray([True] + [False] * 7),
    )
    return BondedSystem(bonds=bonds, angles=angles, torsions=None, impropers=None)


def test_partition_and_uniqueness():
    n = 13
    sys_ = _system(n)
    excl, shared = _split_exclusive_terms(sys_, None, n)
    # The three water angles are exclusive; chain angles share atoms 10/11
    # with each other and the bond, so they (and the bond) are shared.
    assert excl is not None and excl.bonds is None
    assert int(np.asarray(excl.angles.valid).sum()) == 3
    assert shared is not None
    assert int(np.asarray(shared.angles.valid).sum()) == 2
    assert int(np.asarray(shared.bonds.valid).sum()) == 1
    # Exclusive scatter targets are globally unique (pad row aside).
    va = np.asarray(excl.angles.atoms)[np.asarray(excl.angles.valid)].ravel()
    assert len(va) == len(set(va))
    shared_atoms = set(
        np.asarray(shared.angles.atoms)[np.asarray(shared.angles.valid)].ravel()
    ) | set(np.asarray(shared.bonds.atoms)[np.asarray(shared.bonds.valid)].ravel())
    assert not (set(va) & shared_atoms)


def test_leftover_pairs_break_exclusivity():
    n = 13
    sys_ = _system(n)
    # A leftover correction pair touching atom 4 must demote water #2's angle.
    excl, shared = _split_exclusive_terms(sys_, np.asarray([[4, 12]]), n)
    assert int(np.asarray(excl.angles.valid).sum()) == 2
    assert int(np.asarray(shared.angles.valid).sum()) == 3


def test_set_plus_add_matches_merged_add():
    n = 13
    sys_ = _system(n)
    excl, shared = _split_exclusive_terms(sys_, None, n)
    rng = np.random.default_rng(3)
    pos = jnp.asarray(rng.uniform(0, 9.0, (n + 1, 3)), jnp.float32)
    box = jnp.float32(9.0)

    idx, con = bonded_force_rows(pos, box, sys_)
    ref = jnp.zeros_like(pos).at[idx].add(con)

    f = jnp.zeros_like(pos)
    ix, cx = bonded_force_rows(pos, box, excl)
    f = f.at[ix].set(cx)
    is_, cs = bonded_force_rows(pos, box, shared)
    f = f.at[is_].add(cs)
    assert bool(jnp.all(f[:-1] == ref[:-1])), "set+add != merged add"

"""Modelling-layer tests: canonicalization, force-field parsing, system
building — including the reference's own golden integration values
(runtests.jl:44-53: 1519 atoms, 500 residues for dibenzo-p-dioxin in water).
"""

import numpy as np
import pytest

from emdee_tpu.modelling.forcefield import ForceField, sanitized
from emdee_tpu.modelling.graphs import (
    bonded_paths,
    canonical_form,
    color_classes,
    exclusion_table,
)
from tests.conftest import reference_data_path

FIXTURE_XML = reference_data_path("dibenzo-p-dioxin-in-water.xml")
FIXTURE_PDB = reference_data_path("dibenzo-p-dioxin-in-water.pdb")
needs_fixture = pytest.mark.skipif(
    FIXTURE_XML is None, reason="reference fixtures not mounted"
)


# ---------------------------------------------------------------------------
# canonical_form
# ---------------------------------------------------------------------------


def _random_graph(n, p, rng):
    adj = rng.random((n, n)) < p
    adj = np.triu(adj, 1)
    return adj | adj.T


def _permute(adj, colors, perm):
    return adj[np.ix_(perm, perm)], [colors[i] for i in perm]


def test_canonical_invariant_under_relabeling():
    """Isomorphic colored graphs get identical canonical adjacency."""
    rng = np.random.default_rng(0)
    for trial in range(20):
        n = int(rng.integers(3, 24))
        adj = _random_graph(n, 0.3, rng)
        colors = rng.choice([1.008, 12.011, 15.999], size=n)
        _, canon1 = canonical_form(adj, colors)
        perm = rng.permutation(n)
        adj2, colors2 = _permute(adj, colors, perm)
        _, canon2 = canonical_form(adj2, colors2)
        np.testing.assert_array_equal(canon1, canon2)


def test_canonical_distinguishes_colors():
    """Same topology, different colorings → different canonical matrices
    (path H-O-H vs O-H-H)."""
    adj = np.array([[0, 1, 0], [1, 0, 1], [0, 1, 0]], bool)
    _, water = canonical_form(adj, [1.008, 15.999, 1.008])
    _, weird = canonical_form(adj, [15.999, 1.008, 1.008])
    assert not np.array_equal(water, weird)


def test_canonical_order_consistency():
    """order satisfies canonical = adj[order][:, order], and relabeled graphs
    map corresponding atoms to the same canonical position."""
    rng = np.random.default_rng(1)
    adj = _random_graph(12, 0.35, rng)
    colors = rng.choice([1.0, 12.0, 16.0], size=12)
    order, canon = canonical_form(adj, colors)
    np.testing.assert_array_equal(canon, adj[np.ix_(order, order)])
    perm = rng.permutation(12)
    adj2, colors2 = _permute(adj, colors, perm)
    order2, canon2 = canonical_form(adj2, colors2)
    # canonical position i refers to the same underlying atom in both.
    np.testing.assert_array_equal(np.asarray(perm)[order2], order)


def test_color_binning_atol():
    """Colors within atol merge into one class (molecular_graphs.jl:66-69)."""
    classes = color_classes([1.008, 1.0079, 12.011, 12.01, 16.0], atol=0.1)
    assert classes[0] == classes[1]
    assert classes[2] == classes[3]
    assert len(set(classes.tolist())) == 3


def test_automorphic_graph():
    """Fully symmetric graph (benzene ring, all same color) canonicalizes."""
    n = 6
    adj = np.zeros((n, n), bool)
    for i in range(n):
        adj[i, (i + 1) % n] = adj[(i + 1) % n, i] = True
    order, canon = canonical_form(adj, [12.011] * n)
    assert canon.sum() == 12  # still a 6-cycle
    # Rotated ring → same canonical form.
    perm = np.roll(np.arange(n), 2)
    _, canon2 = canonical_form(adj[np.ix_(perm, perm)], [12.011] * n)
    np.testing.assert_array_equal(canon, canon2)


# ---------------------------------------------------------------------------
# exclusions
# ---------------------------------------------------------------------------


def test_bonded_paths_butane():
    """Linear chain 0-1-2-3: 1-2 {01,12,23}, 1-3 {02,13}, 1-4 {03}."""
    p12, p13, p14 = bonded_paths(4, [(0, 1), (1, 2), (2, 3)])
    assert p12.tolist() == [[0, 1], [1, 2], [2, 3]]
    assert p13.tolist() == [[0, 2], [1, 3]]
    assert p14.tolist() == [[0, 3]]


def test_bonded_paths_ring_shortest_wins():
    """Cyclobutane: the '1-4' pair across the ring is 1-3 by the short way."""
    p12, p13, p14 = bonded_paths(4, [(0, 1), (1, 2), (2, 3), (3, 0)])
    assert len(p12) == 4
    assert sorted(map(tuple, p13.tolist())) == [(0, 2), (1, 3)]
    assert len(p14) == 0


def test_exclusion_table_scales_and_padding():
    pairs, scales = exclusion_table(4, [(0, 1), (1, 2), (2, 3)], lj14_scale=0.5, pad_to=8)
    assert pairs.shape == (8, 2)
    assert scales[:3].tolist() == [0, 0, 0]  # 1-2
    assert scales[3:5].tolist() == [0, 0]  # 1-3
    assert scales[5] == 0.5  # 1-4
    assert (pairs[6:] == 4).all() and (scales[6:] == 1.0).all()


# ---------------------------------------------------------------------------
# force-field parsing + system building (reference fixtures)
# ---------------------------------------------------------------------------


def test_sanitized():
    assert sanitized("C1'-*") == "C1p_a"


@needs_fixture
def test_forcefield_parse():
    ff = ForceField(FIXTURE_XML)
    assert set(ff.atom_types) == {"HW", "OW", "ca", "os", "ha"}
    assert ff.atom_types["OW"]["mass"] == pytest.approx(15.9994001)
    assert set(ff.templates) == {"HOH", "aaa"}
    assert ff.templates["HOH"].num_atoms == 3
    assert ff.templates["aaa"].num_atoms == 22
    assert ff.nonbonded["ca"]["sigma"] == pytest.approx(0.339967012)
    # Water template: canonical order puts the two H (mass 1.008) first,
    # each bonded to the single O.
    adjacency = ff.templates["HOH"].adjacency
    assert adjacency.sum() == 4
    charges = [a.charge for a in ff.templates["HOH"].atoms]
    assert sorted(charges) == pytest.approx([-0.84, 0.42, 0.42])


@needs_fixture
def test_system_golden_counts():
    """The reference's integration gate: 1519 atoms, 500 residues
    (runtests.jl:48)."""
    from emdee_tpu.modelling.system import System

    ff = ForceField(FIXTURE_XML)
    system = System(FIXTURE_PDB, ff)
    assert len(system) == 1519
    assert system.count_residues() == 500
    # Every atom got a type and sensible charge.
    assert all(t != "" for t in system.ff_types)
    water_os = [t for t in system.ff_types if t == "OW"]
    assert len(water_os) == 499  # 499 waters
    # Each residue is net-neutral here.
    for s, e in system.residue_spans:
        assert abs(system.charges[s:e].sum()) < 1e-6
    # Box from CRYST1.
    np.testing.assert_allclose(system.box_lengths, 24.56, atol=1e-3)


@needs_fixture
def test_system_bridge_to_device_arrays():
    """The System → kernel bridge the reference never built (SURVEY.md §1)."""
    from emdee_tpu.modelling.system import System

    ff = ForceField(FIXTURE_XML)
    system = System(FIXTURE_PDB, ff)
    params = system.lj_params(length_scale=10.0)  # nm → Å
    assert params.half_sigma.shape == (1519,)
    # OW sigma = 3.15061 Å-ish in amber-type water models.
    ow = [i for i, t in enumerate(system.ff_types) if t == "OW"]
    assert 1.0 < float(params.half_sigma[ow[0]]) < 2.5
    pairs, scales = system.exclusions()
    assert pairs.shape[1] == 2
    # 499 waters à 2 bonds + 1 angle = 3 excluded pairs each, plus dioxin.
    assert len(pairs) >= 499 * 3
    state = system.make_state()
    assert state.positions.shape == (1519, 3)
    assert float(state.box) == pytest.approx(24.56, abs=1e-3)

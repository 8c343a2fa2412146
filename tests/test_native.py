"""Native (C++) component tests, differential against the Python oracles.

Skipped cleanly when no compiler is available (the Python fallbacks then
carry the functionality)."""

import numpy as np
import pytest

from emdee_tpu.native import canon, chemio
from tests.conftest import reference_data_path

pytestmark = pytest.mark.skipif(
    not canon.available(), reason="native library unavailable (no compiler?)"
)


def test_native_canonical_matches_python():
    """C++ canonical form ≡ pure-Python canonical form on random colored
    graphs (including automorphism-rich ones)."""
    from emdee_tpu.modelling.graphs import _refine, color_classes
    import emdee_tpu.modelling.graphs as graphs_mod

    rng = np.random.default_rng(7)
    for trial in range(25):
        n = int(rng.integers(2, 20))
        adj = rng.random((n, n)) < 0.3
        adj = np.triu(adj, 1)
        adj = adj | adj.T
        colors = rng.choice([1.008, 12.011, 15.999], size=n)
        classes = color_classes(colors)

        native_order, native_adj = canon.canonical_form(adj, classes)
        # Pure-Python path (bypass the native shortcut).
        orig = graphs_mod._native_canonical_form
        graphs_mod._native_canonical_form = lambda *a: None
        try:
            py_order, py_adj = graphs_mod.canonical_form(adj, colors)
        finally:
            graphs_mod._native_canonical_form = orig
        np.testing.assert_array_equal(native_adj, py_adj)
        # Orders may differ within automorphisms; both must relabel to the
        # same canonical adjacency.
        np.testing.assert_array_equal(
            adj[np.ix_(native_order, native_order)], native_adj
        )


def test_native_xyz_matches_python():
    path = reference_data_path("lj_sample.xyz")
    if path is None:
        pytest.skip("reference fixtures not mounted")
    from emdee_tpu.io.xyz import _read_xyz_stream

    names_c, pos_c, vel_c, _ = chemio.read_xyz(path)
    with open(path) as fh:
        frame_py = _read_xyz_stream(fh)
    assert names_c == frame_py.names
    np.testing.assert_array_equal(pos_c, frame_py.positions)
    assert vel_c is None and frame_py.velocities is None  # plain 4-column file


def test_native_pdb_matches_python():
    path = reference_data_path("dibenzo-p-dioxin-in-water.pdb")
    if path is None:
        pytest.skip("reference fixtures not mounted")
    from emdee_tpu.io.pdb import _read_pdb_stream

    frame_c = chemio.read_pdb(path)
    with open(path) as fh:
        frame_py = _read_pdb_stream(fh)
    assert frame_c.names == frame_py.names
    assert frame_c.resnames == frame_py.resnames
    np.testing.assert_array_equal(frame_c.resids, frame_py.resids)
    np.testing.assert_array_equal(frame_c.is_hetatm, frame_py.is_hetatm)
    np.testing.assert_allclose(frame_c.positions, frame_py.positions)
    np.testing.assert_allclose(frame_c.box_lengths, frame_py.box_lengths)
    assert frame_c.bonds == frame_py.bonds

"""Differential tests: all-pairs JAX engine vs the float64 NumPy oracle.

Mirrors the reference's GPU-vs-oracle gate (runtests.jl:19-42: 800 atoms,
L=10, rc=3, rs=2.5, tolerance 1e-4) with symmetric tolerances.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from emdee_tpu.core.types import ALL_OUTPUTS, ENERGIES, FORCES, VIRIALS
from emdee_tpu.neighbors.allpairs import compute_nonbonded_allpairs
from emdee_tpu.potentials.lennard_jones import LennardJonesModel, lennard_jones_atom
from tests.oracle import allpairs_oracle


def _uniform_params(n, eps=1.0, sigma=1.0):
    p = lennard_jones_atom(np.full(n, eps), np.full(n, sigma))
    return p


@pytest.mark.parametrize("parity_mode", [True, False])
def test_allpairs_matches_oracle_lj_sample(lj_sample, parity_mode):
    """The reference's own differential gate, in both cutoff semantics."""
    pos, L, rc, rs = lj_sample
    n = pos.shape[0]
    model = LennardJonesModel.create(rc, rs)
    params = _uniform_params(n)

    out = compute_nonbonded_allpairs(
        jnp.asarray(pos, jnp.float32), jnp.float32(L), model, params,
        parity_mode=parity_mode,
    )
    f_ref, e_ref, w_ref = allpairs_oracle(pos, L, rc, rs, 0.5, 2.0, parity_mode=parity_mode)

    # The reference gate compares two float32 implementations at 1e-4
    # (runtests.jl:39-41); against a float64 oracle the f32 engine carries
    # ~N·eps accumulation, so allow a matching relative term.
    np.testing.assert_allclose(np.asarray(out.forces), f_ref, rtol=2e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.energies), e_ref, rtol=2e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.virials), w_ref, rtol=2e-3, atol=1e-4)


def test_output_bitmask_selection():
    """Static output selection (the Val-bitmask idea, nonbonded.jl:12-14)."""
    rng = np.random.default_rng(0)
    pos = rng.uniform(0, 10, (64, 3))
    model = LennardJonesModel.create(3.0, 2.5)
    params = _uniform_params(64)
    args = (jnp.asarray(pos, jnp.float32), jnp.float32(10.0), model, params)

    out_f = compute_nonbonded_allpairs(*args, outputs=FORCES)
    assert out_f.forces is not None and out_f.energies is None and out_f.virials is None
    out_e = compute_nonbonded_allpairs(*args, outputs=ENERGIES)
    assert out_e.forces is None and out_e.energies is not None
    out_all = compute_nonbonded_allpairs(*args, outputs=ALL_OUTPUTS)
    np.testing.assert_allclose(np.asarray(out_all.forces), np.asarray(out_f.forces))
    np.testing.assert_allclose(np.asarray(out_all.energies), np.asarray(out_e.energies))


def test_padding_mask():
    """Masked (padded) atoms are inert and results match the unpadded system —
    the explicit-mask replacement for the reference's undef padding contract
    (nonbonded.jl:28-38, SURVEY.md §2c)."""
    rng = np.random.default_rng(1)
    n, n_pad = 100, 160
    pos = rng.uniform(0, 8, (n, 3))
    pos_padded = np.concatenate([pos, np.full((n_pad - n, 3), 1.234)])
    mask = np.arange(n_pad) < n
    model = LennardJonesModel.create(2.5, 2.0)

    out = compute_nonbonded_allpairs(
        jnp.asarray(pos, jnp.float32), jnp.float32(8.0), model, _uniform_params(n),
    )
    out_p = compute_nonbonded_allpairs(
        jnp.asarray(pos_padded, jnp.float32), jnp.float32(8.0), model,
        _uniform_params(n_pad), mask=jnp.asarray(mask),
    )
    np.testing.assert_allclose(
        np.asarray(out_p.forces)[:n], np.asarray(out.forces), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(out_p.forces)[n:], 0.0)
    np.testing.assert_allclose(
        np.asarray(out_p.energies)[:n], np.asarray(out.energies), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(out_p.energies)[n:], 0.0)


def test_binary_mixture_mixing():
    """Per-atom heterogeneous params (Lorentz-Berthelot baked into σ/2, 2√ε)
    agree with the f64 oracle — BASELINE config 2."""
    rng = np.random.default_rng(2)
    n = 128
    pos = rng.uniform(0, 6, (n, 3))
    eps = np.where(np.arange(n) % 2 == 0, 1.0, 0.5)
    sigma = np.where(np.arange(n) % 2 == 0, 1.0, 1.3)
    params = lennard_jones_atom(eps, sigma)
    model = LennardJonesModel.create(2.5, 2.0)
    out = compute_nonbonded_allpairs(
        jnp.asarray(pos, jnp.float32), jnp.float32(6.0), model, params,
    )
    f_ref, e_ref, w_ref = allpairs_oracle(pos, 6.0, 2.5, 2.0, 0.5 * sigma, 2.0 * np.sqrt(eps))
    # Random dense packing creates overlapping pairs with huge magnitudes —
    # compare relatively (f32 vs f64).
    np.testing.assert_allclose(np.asarray(out.forces), f_ref, rtol=2e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(out.energies), e_ref, rtol=2e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(out.virials), w_ref, rtol=2e-4, atol=1e-3)


def test_newton_third_law():
    """Total force is zero (momentum conservation) on a physical (jittered
    lattice) configuration."""
    rng = np.random.default_rng(3)
    side = 6
    grid = np.stack(np.meshgrid(*[np.arange(side)] * 3, indexing="ij"), -1).reshape(-1, 3)
    L = side * 1.2
    pos = grid * 1.2 + rng.uniform(-0.1, 0.1, grid.shape)
    n = pos.shape[0]
    model = LennardJonesModel.create(3.0, 2.5)
    out = compute_nonbonded_allpairs(
        jnp.asarray(pos, jnp.float32), jnp.float32(L), model, _uniform_params(n),
    )
    np.testing.assert_allclose(np.asarray(out.forces).sum(axis=0), 0.0, atol=1e-3)

"""Unit tests for the LJ pair potential (potentials/lennard_jones.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from emdee_tpu.potentials.lennard_jones import (
    LennardJonesModel,
    lennard_jones_atom,
    pair_interaction,
)
from tests.oracle import lj_interaction_f64


def _pair(r2, rc=3.0, rs=2.5, eps=1.0, sigma=1.0, parity_mode=False):
    model = LennardJonesModel.create(rc, rs)
    p = lennard_jones_atom(eps, sigma)
    return pair_interaction(
        jnp.asarray(r2, jnp.float32),
        model,
        p.half_sigma[0],
        p.twice_sqrt_eps[0],
        p.half_sigma[0],
        p.twice_sqrt_eps[0],
        parity_mode=parity_mode,
    )


def test_param_transform():
    """(ε,σ) → (σ/2, 2√ε) (lennard_jones.jl:13)."""
    p = lennard_jones_atom(0.25, 3.0)
    assert np.isclose(p.half_sigma[0], 1.5)
    assert np.isclose(p.twice_sqrt_eps[0], 1.0)


def test_lj_minimum():
    """E(2^{1/6}σ) = −ε and force = 0 at the minimum (inside the switch-on)."""
    r_min2 = 2.0 ** (1.0 / 3.0)  # (2^{1/6})² for σ=1
    E, mrE = _pair(r_min2, rc=5.0, rs=4.0)
    assert np.isclose(float(E), -1.0, atol=1e-6)
    assert np.isclose(float(mrE), 0.0, atol=1e-5)


def test_lj_zero_crossing():
    E, _ = _pair(1.0, rc=5.0, rs=4.0)  # r = σ → E = 0
    assert np.isclose(float(E), 0.0, atol=1e-6)


@pytest.mark.parametrize("parity_mode", [False, True])
def test_matches_f64_oracle(parity_mode):
    r2 = np.linspace(0.8, 12.0, 113)
    E, mrE = _pair(r2, parity_mode=parity_mode)
    E64, mrE64 = lj_interaction_f64(r2, 3.0, 2.5, 0.5, 2.0, 0.5, 2.0, parity_mode=parity_mode)
    np.testing.assert_allclose(np.asarray(E), E64, rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(mrE), mrE64, rtol=2e-5, atol=2e-5)


def test_true_cutoff_vanishes():
    """Engine mode: zero energy and force at/beyond rc."""
    for r2 in [9.0, 10.0, 100.0]:
        E, mrE = _pair(r2, rc=3.0, rs=2.5)
        assert float(E) == 0.0
        assert float(mrE) == 0.0


def test_parity_mode_reproduces_quirk():
    """Reference quirk: beyond rc the clamp maps x→0 so g=1 and the bare LJ
    interaction survives (SURVEY.md §2c)."""
    E, _ = _pair(16.0, rc=3.0, rs=2.5, parity_mode=True)
    s6 = (1.0 / 16.0) ** 3
    assert np.isclose(float(E), 4 * s6 * (s6 - 1), rtol=1e-5)


def test_switch_continuity():
    """g splices smoothly: value/derivative continuous at rs and rc."""
    rc, rs = 3.0, 2.5
    eps = 1e-3
    for r in (rs, rc):
        E_lo, F_lo = _pair((r - eps) ** 2, rc=rc, rs=rs)
        E_hi, F_hi = _pair((r + eps) ** 2, rc=rc, rs=rs)
        assert abs(float(E_hi) - float(E_lo)) < 1e-3
        assert abs(float(F_hi) - float(F_lo)) < 5e-3


def test_mixing_rules():
    """Lorentz-Berthelot via pre-transformed params: σ12=(σ1+σ2)/2, ε12=√(ε1ε2)."""
    p1 = lennard_jones_atom(0.5, 1.0)
    p2 = lennard_jones_atom(2.0, 3.0)
    model = LennardJonesModel.create(50.0, 40.0)
    sigma12 = 2.0
    eps12 = 1.0
    r2 = (2.0 ** (1.0 / 6.0) * sigma12) ** 2
    E, mrE = pair_interaction(
        jnp.float32(r2), model,
        p1.half_sigma[0], p1.twice_sqrt_eps[0],
        p2.half_sigma[0], p2.twice_sqrt_eps[0],
    )
    assert np.isclose(float(E), -eps12, atol=1e-5)
    assert np.isclose(float(mrE), 0.0, atol=1e-4)

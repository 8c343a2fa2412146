"""Differential tests for the whole-pass Pallas rebin kernel.

`pallas_rebin.route_axis_pass_pallas` implements the SAME stable-order
routing algorithm as `cell_dense._route_axis_pass` (no-spill path), so its
output must be BIT-IDENTICAL — not merely close — to the XLA rounds on every
field, including the int32 atom ids and the validity mask.  These tests run
the kernel in interpreter mode on the CPU mesh (the suite's standard pattern
for kernel coverage without hardware; the production Mosaic lowering is
additionally gated on-device by tools/perf_r4.py and the bench preamble).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from emdee_tpu.neighbors.cell_dense import (
    _rebin_shift,
    cell_dense_init,
    make_cell_dense_sim,
    suggest_cell_dense_config,
)
from emdee_tpu.potentials.lennard_jones import LennardJonesModel, lennard_jones_atom
from emdee_tpu.utils.lattice import cubic_lattice, maxwell_boltzmann

FIELDS = (
    "positions", "velocities", "inv_masses", "half_sigma",
    "twice_sqrt_eps", "atom_id", "valid", "charges",
)


def _assert_states_bitequal(a, b):
    for name in FIELDS:
        x, y = getattr(a, name), getattr(b, name)
        if x is None and y is None:
            continue
        assert bool(jnp.all(x == y)), f"{name} differs"
    assert bool(a.overflow) == bool(b.overflow)


def _drifted_state(n, seed, charges=False, varied_params=False):
    pos, box = cubic_lattice(n, 0.65, jitter=0.2, seed=seed)
    vel = maxwell_boltzmann(n, 1.3, seed=seed + 1)
    rng = np.random.default_rng(seed)
    if varied_params:
        params = lennard_jones_atom(
            rng.uniform(0.8, 1.2, n), rng.uniform(0.9, 1.1, n)
        )
    else:
        params = lennard_jones_atom(np.ones(n), np.ones(n))
    config = suggest_cell_dense_config(n, box, cutoff=2.5, switch=2.0, skin=0.35)
    q = rng.uniform(-0.5, 0.5, n).astype(np.float32) if charges else None
    st = cell_dense_init(pos, vel, np.ones(n), params, config, charges=q)
    assert not bool(st.overflow)
    # Drift in SLOT space (after binning) so a real fraction of atoms cross
    # their cell faces — including across the periodic seam — exactly like
    # inter-rebin motion.
    vmax = float(jnp.max(jnp.abs(st.velocities)))
    drift = (0.45 * config.skin / vmax) * st.velocities
    st = st._replace(
        positions=jnp.where(st.valid[..., None], st.positions + drift, 0.0)
    )
    return st, config


@pytest.mark.parametrize(
    "charges,varied,forces",
    [
        # The plain (uniform, no-forces) combo routes the FEWEST fields and
        # took 54 s on the CI box — full tier; the all-features combo (14 s)
        # keeps the bit-exact gate in the quick tier.
        pytest.param(False, False, False, marks=pytest.mark.full),
        (True, True, True),
    ],
)
def test_rebin_kernel_bitexact(charges, varied, forces):
    st, config = _drifted_state(2500, seed=11, charges=charges, varied_params=varied)
    f = None
    if forces:
        f = 0.1 * jnp.asarray(
            np.random.default_rng(3).normal(size=st.positions.shape), jnp.float32
        )
    if forces:
        a, fa = _rebin_shift(st, config, forces=f, backend="xla")
        b, fb = _rebin_shift(st, config, forces=f, backend="pallas_interpret")
        assert bool(jnp.all(fa == fb))
    else:
        a = _rebin_shift(st, config, backend="xla")
        b = _rebin_shift(st, config, backend="pallas_interpret")
    _assert_states_bitequal(a, b)
    # The rebin must actually have routed something for this to be a test.
    assert not bool(a.overflow)
    moved = int(jnp.sum((a.atom_id != st.atom_id) & a.valid))
    assert moved > 10, f"fixture too static: only {moved} slots changed"


def test_rebin_kernel_uniform_fastpath_bitexact():
    st, config = _drifted_state(2500, seed=21)
    a = _rebin_shift(st, config, uniform_params=(0.5, 2.0), uniform_mass=1.0,
                     backend="xla")
    b = _rebin_shift(st, config, uniform_params=(0.5, 2.0), uniform_mass=1.0,
                     backend="pallas_interpret")
    _assert_states_bitequal(a, b)


def test_rollout_with_kernel_rebin_matches_xla():
    """A short NVE rollout where ONLY the rebin backend differs must agree
    bitwise: the kernel rebin produces the identical slot assignment, so the
    force pass sees identical inputs."""
    n = 1500
    pos, box = cubic_lattice(n, 0.7, jitter=0.1, seed=7)
    vel = maxwell_boltzmann(n, 1.0, seed=8)
    params = lennard_jones_atom(np.ones(n), np.ones(n))
    config = suggest_cell_dense_config(n, box, cutoff=2.5, switch=2.0, skin=0.35)
    model = LennardJonesModel.create(2.5, 2.0)
    st = cell_dense_init(pos, vel, np.ones(n), params, config)

    roll_x, _ = make_cell_dense_sim(config, model, 0.004, backend="xla",
                                    rebin="shift_xla")
    roll_p, _ = make_cell_dense_sim(config, model, 0.004, backend="xla",
                                    rebin="shift_pallas_interpret")
    a = roll_x(st, num_steps=12, rebin_every=4)
    b = roll_p(st, num_steps=12, rebin_every=4)
    assert not bool(a.overflow)
    for name in ("positions", "velocities", "atom_id", "valid"):
        assert bool(jnp.all(getattr(a, name) == getattr(b, name))), name

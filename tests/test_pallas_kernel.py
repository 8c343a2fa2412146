"""Pallas dense-cell kernel tests (interpreter mode on CPU).

The kernel's numerics are gated against the XLA dense engine and the f64
oracle; on real TPU the same comparisons are re-run by bench tooling."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emdee_tpu.neighbors.cell_dense import (
    cell_dense_forces,
    cell_dense_init,
    gather_dense_atoms,
    make_cell_dense_sim,
    suggest_cell_dense_config,
)
from emdee_tpu.neighbors.pallas_cell_kernel import pallas_cell_forces
from emdee_tpu.potentials.lennard_jones import LennardJonesModel, lennard_jones_atom
from emdee_tpu.utils.lattice import cubic_lattice, maxwell_boltzmann


def _setup(n=864, density=0.5, seed=3, jitter=0.15):
    pos, L = cubic_lattice(n, density, jitter=jitter, seed=seed)
    vel = maxwell_boltzmann(n, 1.0, seed=seed + 1)
    params = lennard_jones_atom(np.ones(n), np.ones(n))
    config = suggest_cell_dense_config(n, L, cutoff=2.5, switch=2.0, skin=0.3)
    model = LennardJonesModel.create(2.5, 2.0)
    st = cell_dense_init(pos, vel, np.ones(n), params, config)
    return st, config, model, n


def test_kernel_matches_xla_dense():
    st, config, model, n = _setup()
    f_ref, e_ref, w_ref = cell_dense_forces(st, model, config, compute_energy=True)
    f_k, e_k, w_k = pallas_cell_forces(
        st, model, config, compute_energy=True, interpret=True
    )
    valid = np.asarray(st.valid)
    scale = np.abs(np.asarray(f_ref)[valid]).max()
    np.testing.assert_allclose(
        np.asarray(f_k)[valid], np.asarray(f_ref)[valid], atol=2e-5 * max(scale, 1.0)
    )
    np.testing.assert_allclose(
        np.asarray(e_k)[valid], np.asarray(e_ref)[valid], rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(w_k)[valid], np.asarray(w_ref)[valid], rtol=1e-4, atol=2e-3
    )


def test_kernel_zero_on_empty_slots():
    st, config, model, n = _setup()
    f_k, e_k, _ = pallas_cell_forces(
        st, model, config, compute_energy=True, interpret=True
    )
    invalid = ~np.asarray(st.valid)
    np.testing.assert_array_equal(np.asarray(f_k)[invalid], 0.0)
    np.testing.assert_array_equal(np.asarray(e_k)[invalid], 0.0)


@pytest.mark.full
def test_sim_with_pallas_backend_matches_xla():
    st, config, model, n = _setup(n=512, density=0.4)
    roll_x, energy_x = make_cell_dense_sim(config, model, dt=0.002, backend="xla")
    roll_p, energy_p = make_cell_dense_sim(
        config, model, dt=0.002, backend="pallas_interpret"
    )
    sx = roll_x(st, num_steps=20)
    sp = roll_p(st, num_steps=20)
    px, _ = gather_dense_atoms(sx, n)
    pp, _ = gather_dense_atoms(sp, n)
    np.testing.assert_allclose(pp, px, atol=1e-4)
    ex = [float(v) for v in energy_x(sx)]
    ep = [float(v) for v in energy_p(sp)]
    np.testing.assert_allclose(ep, ex, rtol=1e-4, atol=1e-3)


@pytest.mark.full
def test_streaming_kernel_matches_xla_dense():
    """The HBM-streaming variant (for N beyond VMEM residency) gates against
    the XLA dense engine too."""
    from emdee_tpu.neighbors.pallas_cell_kernel import pallas_cell_forces_streaming

    st, config, model, n = _setup()
    f_ref, e_ref, w_ref = cell_dense_forces(st, model, config, compute_energy=True)
    f_k, e_k, w_k = pallas_cell_forces_streaming(
        st, model, config, compute_energy=True, interpret=True
    )
    valid = np.asarray(st.valid)
    scale = np.abs(np.asarray(f_ref)[valid]).max()
    np.testing.assert_allclose(
        np.asarray(f_k)[valid], np.asarray(f_ref)[valid], atol=2e-5 * max(scale, 1.0)
    )
    np.testing.assert_allclose(
        np.asarray(e_k)[valid], np.asarray(e_ref)[valid], rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(w_k)[valid], np.asarray(w_ref)[valid], rtol=1e-4, atol=2e-3
    )
    # Uniform-params fast path: bit-identical to the non-uniform variant for
    # a single LJ type (σ/2+σ/2 squared and 2√ε·2√ε reduce to the same f32
    # constants; measured diff exactly 0.0 on v5e at 100k atoms).
    f_u = pallas_cell_forces_streaming(
        st, model, config, interpret=True, uniform_params=(0.5, 2.0)
    )[0]
    np.testing.assert_array_equal(np.asarray(f_u)[valid], np.asarray(f_k)[valid])


def test_kernel_charged_with_exclusions_matches_xla():
    """Charged pairs (DSF) + kernel-resident exclusion tags, interpret mode:
    the Pallas path must match the XLA dense path elementwise."""
    from emdee_tpu.neighbors.cell_dense_molecular import (
        build_exclusion_tables,
        make_exclusion_aux_fn,
    )
    from emdee_tpu.potentials.coulomb import DSFCoulomb, coulomb_consts

    n = 864
    pos, L = cubic_lattice(n, 0.5, jitter=0.15, seed=5)
    rng = np.random.default_rng(6)
    q = np.where(np.arange(n) % 2 == 0, 0.3, -0.3).astype(np.float32)
    q -= q.mean()
    params = lennard_jones_atom(np.ones(n), np.ones(n))
    config = suggest_cell_dense_config(n, L, cutoff=2.5, switch=2.0, skin=0.3)
    model = LennardJonesModel.create(2.5, 2.0)
    coul = DSFCoulomb.create(2.5, alpha=0.25, coulomb_constant=1.0)
    st = cell_dense_init(
        pos, maxwell_boltzmann(n, 1.0, seed=7), np.ones(n), params, config,
        charges=q,
    )
    # Synthetic triplet exclusions (0 for 1-2-ish, 0.5/0.8 scaled 1-4-ish).
    base = np.arange(0, n - 2, 3)
    pairs = np.concatenate(
        [np.stack([base, base + 1], 1), np.stack([base + 1, base + 2], 1)]
    )
    ljs = np.where(np.arange(len(pairs)) % 2 == 0, 0.0, 0.5).astype(np.float32)
    cs = np.where(np.arange(len(pairs)) % 2 == 0, 0.0, 0.8).astype(np.float32)
    tabs = build_exclusion_tables(n, pairs, ljs, cs)
    aux = make_exclusion_aux_fn(n, *tabs)(st)

    f_x, e_x, w_x = cell_dense_forces(st, model, config, coul, aux, compute_energy=True)
    f_p, e_p, w_p = pallas_cell_forces(
        st, model, config, compute_energy=True, interpret=True,
        coulomb=coulomb_consts(coul), excl=aux,
    )
    valid = np.asarray(st.valid)
    scale = max(np.abs(np.asarray(f_x)[valid]).max(), 1.0)
    np.testing.assert_allclose(
        np.asarray(f_p)[valid], np.asarray(f_x)[valid], atol=2e-4 * scale
    )
    np.testing.assert_allclose(
        np.asarray(e_p)[valid], np.asarray(e_x)[valid], atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(w_p)[valid], np.asarray(w_x)[valid], atol=1e-3
    )
    # The tags actually fire: energy differs from the unexcluded evaluation.
    _, e0, _ = cell_dense_forces(st, model, config, coul, None, compute_energy=True)
    assert abs(float(jnp.where(st.valid, e_x - e0, 0.0).sum())) > 1.0

@pytest.mark.full
def test_streaming_kernel_charged_with_exclusions_matches_xla():
    """The HBM-streaming kernel carries the full molecular feature set (DSF
    Coulomb + kernel-resident exclusion tags + half-shell Newton reactions):
    it must match the XLA dense path elementwise, like the resident kernel."""
    from emdee_tpu.neighbors.cell_dense_molecular import (
        build_exclusion_tables,
        make_exclusion_aux_fn,
    )
    from emdee_tpu.neighbors.pallas_cell_kernel import pallas_cell_forces_streaming
    from emdee_tpu.potentials.coulomb import DSFCoulomb, coulomb_consts

    n = 864
    pos, L = cubic_lattice(n, 0.5, jitter=0.15, seed=5)
    q = np.where(np.arange(n) % 2 == 0, 0.3, -0.3).astype(np.float32)
    q -= q.mean()
    params = lennard_jones_atom(np.ones(n), np.ones(n))
    config = suggest_cell_dense_config(n, L, cutoff=2.5, switch=2.0, skin=0.3)
    model = LennardJonesModel.create(2.5, 2.0)
    coul = DSFCoulomb.create(2.5, alpha=0.25, coulomb_constant=1.0)
    st = cell_dense_init(
        pos, maxwell_boltzmann(n, 1.0, seed=7), np.ones(n), params, config,
        charges=q,
    )
    base = np.arange(0, n - 2, 3)
    pairs = np.concatenate(
        [np.stack([base, base + 1], 1), np.stack([base + 1, base + 2], 1)]
    )
    ljs = np.where(np.arange(len(pairs)) % 2 == 0, 0.0, 0.5).astype(np.float32)
    cs = np.where(np.arange(len(pairs)) % 2 == 0, 0.0, 0.8).astype(np.float32)
    tabs = build_exclusion_tables(n, pairs, ljs, cs)
    aux = make_exclusion_aux_fn(n, *tabs)(st)

    f_x, e_x, w_x = cell_dense_forces(st, model, config, coul, aux, compute_energy=True)
    f_s, e_s, w_s = pallas_cell_forces_streaming(
        st, model, config, compute_energy=True, interpret=True,
        coulomb=coulomb_consts(coul), excl=aux,
    )
    valid = np.asarray(st.valid)
    scale = max(np.abs(np.asarray(f_x)[valid]).max(), 1.0)
    np.testing.assert_allclose(
        np.asarray(f_s)[valid], np.asarray(f_x)[valid], atol=2e-4 * scale
    )
    np.testing.assert_allclose(
        np.asarray(e_s)[valid], np.asarray(e_x)[valid], atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(w_s)[valid], np.asarray(w_x)[valid], atol=1e-3
    )


@pytest.mark.full
def test_kernel_rows_per_program_matches_default():
    """Multi-pencil programs (rows_per_program > 1, including a ragged last
    program) must agree with the default one-pencil grid — only reaction
    accumulation order changes (f32 roundoff)."""
    from emdee_tpu.neighbors.pallas_cell_kernel import _prep_inputs, halfshell_call

    st, config, model, n = _setup()
    m = config.cells_per_dim
    assert (m * m) % 3 != 0  # exercises the overhang guard
    inputs = _prep_inputs(st, config, uniform=False)
    rs2 = float(config.switch) ** 2
    rc2 = float(config.cutoff) ** 2

    outs1 = halfshell_call(
        inputs, config, (m, m, m), interpret=True, rows_per_program=1,
    )
    outs3 = halfshell_call(
        inputs, config, (m, m, m), interpret=True, rows_per_program=3,
    )
    for a, b in zip(outs1[:3], outs3[:3]):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(outs3[3]), np.asarray(outs1[3]), atol=1e-4
    )

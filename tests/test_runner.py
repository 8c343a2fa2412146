"""High-level runner test: chunks, trajectory dumps, checkpoints, records."""

import numpy as np
import pytest

from emdee_tpu.neighbors.cell_dense import (
    cell_dense_init,
    make_cell_dense_sim,
    suggest_cell_dense_config,
)
from emdee_tpu.potentials.lennard_jones import LennardJonesModel, lennard_jones_atom
from emdee_tpu.utils.lattice import cubic_lattice, maxwell_boltzmann
from emdee_tpu.utils.runner import RunnerConfig, run_dense_simulation


@pytest.mark.full
def test_runner_end_to_end(tmp_path):
    n = 512
    pos, L = cubic_lattice(n, 0.5, jitter=0.05, seed=3)
    cfg = suggest_cell_dense_config(n, L, cutoff=2.5, switch=2.0, skin=0.4)
    model = LennardJonesModel.create(2.5, 2.0)
    st = cell_dense_init(
        pos, maxwell_boltzmann(n, 0.8, seed=4), np.ones(n),
        lennard_jones_atom(np.ones(n), np.ones(n)), cfg,
    )
    rollout, energy = make_cell_dense_sim(cfg, model, dt=0.002, backend="xla")

    traj = str(tmp_path / "traj.xyz")
    ckpt = str(tmp_path / "ckpt.npz")
    final, history = run_dense_simulation(
        st, rollout, energy,
        RunnerConfig(total_steps=60, chunk_steps=20, trajectory_path=traj,
                     checkpoint_path=ckpt, log=False),
        num_atoms=n, rebin_every=5,
    )
    assert int(final.step) == 60
    assert len(history) == 3
    # 3 trajectory frames of n atoms each.
    lines = open(traj).read().splitlines()
    assert lines.count(str(n)) == 3
    # Checkpoint loads back.
    from emdee_tpu.utils.checkpoint import load_state

    restored, meta = load_state(ckpt, final)
    assert meta["step"] == 60
    # Energy roughly conserved across chunks.
    totals = [h["total"] for h in history]
    assert abs(totals[-1] - totals[0]) / abs(totals[0]) < 0.05


def test_rollout_records():
    n = 512
    pos, L = cubic_lattice(n, 0.5, jitter=0.05, seed=3)
    cfg = suggest_cell_dense_config(n, L, cutoff=2.5, switch=2.0, skin=0.4)
    model = LennardJonesModel.create(2.5, 2.0)
    st = cell_dense_init(
        pos, maxwell_boltzmann(n, 0.8, seed=4), np.ones(n),
        lennard_jones_atom(np.ones(n), np.ones(n)), cfg,
    )
    rollout, energy = make_cell_dense_sim(cfg, model, dt=0.002, backend="xla")
    final, records = rollout(st, num_steps=40, rebin_every=10, record=True)
    steps, pe, vir, ke = records
    assert steps.shape == (4,)
    assert int(steps[-1]) == 40
    totals = np.asarray(pe) + np.asarray(ke)
    assert np.all(np.isfinite(totals))
    assert abs(totals[-1] - totals[0]) / abs(totals[0]) < 0.05

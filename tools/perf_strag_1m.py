"""1M-atom straggler-engine design probe (r5): can the C-tight grid +
streaming kernel beat the C=32 streaming headline (82.0M)?

Subprobes:
  occupancy — equilibrated 1M occupancy-tail statistics at C_t ∈
              {28, 29, 30, 31}: the aux-buffer size A the tail needs, per
              snapshot.  (The XLA straggler pass costs scale with the STATIC
              A, so the design point is the smallest safe tail.)
  step      — end-to-end ms/step: plain streaming C=32 rollout vs the
              straggler engine on the streaming kernel at given (C_t, A).

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_strag_1m.py \
       [occupancy|step C_t A ...]
All timed loops are on-device lax.scan rollouts (the production paths).
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/emdee_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import jax
import numpy as np

from emdee_tpu.neighbors.cell_dense import (
    cell_dense_init,
    detect_uniform_params,
    gather_dense_atoms,
    make_cell_dense_sim,
    suggest_cell_dense_config,
    suggest_rebin_interval,
)
from emdee_tpu.neighbors.cell_dense_straggler import (
    StragglerConfig,
    make_straggler_sim,
    straggler_init,
)
from emdee_tpu.potentials.lennard_jones import LennardJonesModel, lennard_jones_atom
from emdee_tpu.utils.lattice import fcc_lattice, maxwell_boltzmann


def _setup_1m():
    cells = int(round((1_000_000 / 4) ** (1 / 3)))
    pos, box = fcc_lattice(cells, density=0.8442)
    n = pos.shape[0]
    vel = maxwell_boltzmann(n, 1.44, seed=0)
    model = LennardJonesModel.create(2.5, 2.0)
    params = lennard_jones_atom(np.ones(n), np.ones(n))
    uni = detect_uniform_params(params)
    config = suggest_cell_dense_config(n, box, cutoff=2.5, switch=2.0, skin=0.35)
    state = cell_dense_init(pos, vel, np.ones(n), params, config)
    rollout, _ = make_cell_dense_sim(
        config, model, dt=0.005, backend="auto", uniform_params=uni, uniform_mass=1.0
    )
    state = rollout(state, num_steps=100, rebin_every=2)  # settle the hot start
    assert not bool(state.overflow)
    _, vel_eq = gather_dense_atoms(state, n)
    t_eq = float((vel_eq.astype(np.float64) ** 2).sum() / (3.0 * n - 3.0))
    rebin_every = suggest_rebin_interval(config.skin, 0.005, temperature=t_eq)
    print(f"n={n} M={config.cells_per_dim} C={config.capacity} "
          f"T_eq={t_eq:.3f} rebin_every={rebin_every}")
    return state, config, model, uni, params, n, rebin_every, rollout


def probe_occupancy(snapshots: int = 20, stride: int = 30):
    state, config, model, uni, params, n, rebin_every, rollout = _setup_1m()
    m = config.cells_per_dim
    thresholds = (28, 29, 30, 31)
    tails = {c: [] for c in thresholds}
    maxocc = []
    for _ in range(snapshots):
        state = rollout(state, num_steps=stride, rebin_every=rebin_every)
        occ = np.asarray(state.valid).reshape(m, m, m, -1).sum(axis=3)
        maxocc.append(int(occ.max()))
        for c in thresholds:
            tails[c].append(int(np.maximum(occ - c, 0).sum()))
    assert not bool(state.overflow)
    print(f"max occupancy over {snapshots} snapshots: {max(maxocc)}")
    for c in thresholds:
        print(f"  C_t={c}: tail min/mean/max = {min(tails[c])}/"
              f"{np.mean(tails[c]):.1f}/{max(tails[c])}")


def _timed(rollout, state, steps, rebin_every):
    out = rollout(state, num_steps=steps, rebin_every=rebin_every)
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = rollout(state, num_steps=steps, rebin_every=rebin_every)
        jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
        best = min(best, time.perf_counter() - t0)
    ovf = out.overflow if hasattr(out, "overflow") else out.grid.overflow
    return best / steps * 1e3, bool(ovf)


def probe_step(points, steps: int = 600):
    state, config, model, uni, params, n, rebin_every, rollout = _setup_1m()
    ms, ovf = _timed(rollout, state, steps, rebin_every)
    print(f"plain streaming C={config.capacity}: {ms:.3f} ms/step "
          f"({n / ms * 1e3 / 1e6:.1f}M at./s) ovf={ovf}")
    pos, vel = gather_dense_atoms(state, n)
    for c_t, a_cap in points:
        c_w = -(-(c_t + 6) // 4) * 4
        scfg = StragglerConfig(
            grid=config._replace(capacity=c_t),
            wide_capacity=c_w, aux_capacity=a_cap, kn=16,
        )
        sst = straggler_init(pos, vel, np.ones(n), params, scfg)
        sroll, _ = make_straggler_sim(
            scfg, model, 0.005, uni, backend="pallas_streaming"
        )
        ms, ovf = _timed(sroll, sst, steps, rebin_every)
        print(f"straggler streaming C_t={c_t} C_w={c_w} A={a_cap}: "
              f"{ms:.3f} ms/step ({n / ms * 1e3 / 1e6:.1f}M at./s) ovf={ovf}")


if __name__ == "__main__":
    args = sys.argv[1:] or ["occupancy"]
    if args[0] == "occupancy":
        probe_occupancy()
    elif args[0] == "step":
        vals = [int(v) for v in args[1:]] or [30, 256]
        points = list(zip(vals[0::2], vals[1::2]))
        probe_step(points)

"""Round-5 probes: C-tight straggler-engine design data + carry-layout timing.

Decides the straggler engine's design point (VERDICT r4 item 1):
  occupancy — equilibrated 97k occupancy-tail statistics: how many atoms sit
              beyond capacity {24, 26, 28, 30} per snapshot (the aux-buffer
              size A), and the max 9-row-neighborhood straggler count (the
              kernel's per-pencil list width Kn) for each threshold.
  force     — force-pass time at FORCED capacities {24, 28, 30, 32}
              (timing-only: overflowing cells drop atoms; the numbers price
              the vreg quantization — (ceil(C/8), ceil(M·C/128)) classes —
              not physics).
  step      — end-to-end component-carry step at the bench config (the r5
              layout-glue fix), vs the r4 1.19-1.22 ms baseline.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_r5.py [probes...]
All timed loops are on-device lax.scan with output-dependent input nudges
(axon dedups identical dispatches).
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/emdee_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import jax
import jax.numpy as jnp
import numpy as np

from emdee_tpu.neighbors.cell_dense import (
    cell_dense_init,
    detect_uniform_params,
    gather_dense_atoms,
    make_cell_dense_sim,
    suggest_cell_dense_config,
    suggest_rebin_interval,
)
from emdee_tpu.potentials.lennard_jones import LennardJonesModel, lennard_jones_atom
from emdee_tpu.utils.lattice import fcc_lattice, maxwell_boltzmann


def _equilibrated():
    cells = int(round((100_000 / 4) ** (1 / 3)))
    pos, box = fcc_lattice(cells, density=0.8442)
    n = pos.shape[0]
    vel = maxwell_boltzmann(n, 1.44, seed=0)
    model = LennardJonesModel.create(2.5, 2.0)
    params = lennard_jones_atom(np.ones(n), np.ones(n))
    uni = detect_uniform_params(params)
    wide = suggest_cell_dense_config(n, box, cutoff=2.5, switch=2.0, skin=0.35)
    state = cell_dense_init(pos, vel, np.ones(n), params, wide)
    rollout, _ = make_cell_dense_sim(
        wide, model, dt=0.005, backend="auto", uniform_params=uni, uniform_mass=1.0
    )
    state = rollout(state, num_steps=200, rebin_every=2)
    assert not bool(state.overflow)
    return state, wide, model, uni, n


def probe_occupancy(snapshots: int = 40, stride: int = 30):
    """Tail statistics over `snapshots` equilibrated configurations."""
    state, wide, model, uni, n = _equilibrated()
    m = wide.cells_per_dim
    rollout, _ = make_cell_dense_sim(
        wide, model, dt=0.005, backend="auto", uniform_params=uni, uniform_mass=1.0
    )
    thresholds = (24, 26, 28, 30)
    tails = {c: [] for c in thresholds}
    kns = {c: [] for c in thresholds}
    maxocc = []
    # 9-row pencil neighborhood aggregation matrix (wrapped ±1 in z and y).
    rows = np.arange(m * m)
    rz, ry = rows // m, rows % m
    for _ in range(snapshots):
        state = rollout(state, num_steps=stride, rebin_every=6)
        occ = np.asarray(state.valid).reshape(m, m, m, -1).sum(axis=(3,))
        occ_cells = occ  # (m, m, m) per-cell occupancy (x fastest: axes z,y,x)
        maxocc.append(int(occ_cells.max()))
        for c in thresholds:
            excess = np.maximum(occ_cells - c, 0)
            tails[c].append(int(excess.sum()))
            per_row = excess.sum(axis=2)  # (z, y) pencil rows
            hood = np.zeros_like(per_row)
            for dz in (-1, 0, 1):
                for dy in (-1, 0, 1):
                    hood += np.roll(np.roll(per_row, dz, 0), dy, 1)
            kns[c].append(int(hood.max()))
    assert not bool(state.overflow)
    print(f"max occupancy over {snapshots} snapshots: {max(maxocc)}")
    for c in thresholds:
        print(
            f"  C_t={c}: tail min/mean/max = {min(tails[c])}/"
            f"{np.mean(tails[c]):.1f}/{max(tails[c])}   "
            f"Kn(9-hood max) = {max(kns[c])}"
        )


def _timed_scan(fn, state0, reps=3, length=60):
    """Scan `fn` (state→state) `length` times on device; best-of-reps ms/call."""

    @jax.jit
    def run(st):
        return jax.lax.scan(lambda s, _: (fn(s), None), st, None, length=length)[0]

    out = run(state0)
    jax.block_until_ready(out.positions)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = run(state0)
        jax.block_until_ready(out.positions)
        best = min(best, (time.perf_counter() - t0) / length)
    return best * 1e3


def probe_force():
    from emdee_tpu.neighbors.pallas_cell_kernel import pallas_cell_forces_split

    state, wide, model, uni, n = _equilibrated()
    pos_eq, vel_eq = gather_dense_atoms(state, n)
    for cap in (24, 28, 30, 32):
        config = wide._replace(capacity=cap)
        st = cell_dense_init(pos_eq, vel_eq, np.ones(n), lennard_jones_atom(np.ones(n), np.ones(n)), config)
        dropped = n - int(np.asarray(st.valid).sum())

        def step(s, config=config):
            fx, fy, fz = pallas_cell_forces_split(
                s.positions[..., 0], s.positions[..., 1], s.positions[..., 2],
                s.valid, config, uniform_params=uni,
            )
            # Output-dependent nudge keeps the dispatch stream unique.
            return s._replace(
                positions=s.positions + 1e-7 * jnp.stack([fx, fy, fz], -1)
            )

        ms = _timed_scan(step, st)
        print(f"  C={cap}: force pass {ms:.3f} ms  (dropped {dropped} atoms — timing only)")


def probe_step():
    state, wide, model, uni, n = _equilibrated()
    pos_eq, vel_eq = gather_dense_atoms(state, n)
    t_eq = float((vel_eq.astype(np.float64) ** 2).sum() / (3.0 * n - 3.0))
    rebin_every = suggest_rebin_interval(wide.skin, 0.005, temperature=t_eq)
    params = lennard_jones_atom(np.ones(n), np.ones(n))
    st0 = cell_dense_init(pos_eq, vel_eq, np.ones(n), params, wide)
    for cc in (True, False):
        rollout, _ = make_cell_dense_sim(
            wide, model, dt=0.005, backend="auto",
            uniform_params=uni, uniform_mass=1.0, component_carry=cc,
        )
        out = rollout(st0, num_steps=600, rebin_every=rebin_every)
        jax.block_until_ready(out.positions)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = rollout(st0, num_steps=600, rebin_every=rebin_every)
            jax.block_until_ready(out.positions)
            best = min(best, time.perf_counter() - t0)
        print(
            f"  component_carry={cc}: {best / 600 * 1e3:.3f} ms/step "
            f"({n * 600 / best / 1e6:.1f}M atom-steps/s) overflow={bool(out.overflow)}"
        )


def probe_strag(ct: int = 30, cw: int = 40, a_cap: int = 128, kn: int = 16,
                pass_mode: str = "kernel"):
    """End-to-end straggler-engine step at the bench config + on-device
    numerics check vs the wide XLA engine."""
    from emdee_tpu.neighbors.cell_dense import cell_dense_forces
    from emdee_tpu.neighbors.cell_dense_straggler import (
        StragglerConfig,
        gather_straggler_atoms,
        make_straggler_sim,
        straggler_init,
    )
    from emdee_tpu.potentials.lennard_jones import lennard_jones_atom

    state, wide, model, uni, n = _equilibrated()
    pos_eq, vel_eq = gather_dense_atoms(state, n)
    t_eq = float((vel_eq.astype(np.float64) ** 2).sum() / (3.0 * n - 3.0))
    rebin_every = suggest_rebin_interval(wide.skin, 0.005, temperature=t_eq)
    params = lennard_jones_atom(np.ones(n), np.ones(n))
    sconfig = StragglerConfig(
        grid=wide._replace(capacity=ct), wide_capacity=cw,
        aux_capacity=a_cap, kn=kn,
    )
    st = straggler_init(pos_eq, vel_eq, np.ones(n), params, sconfig)
    n_aux = int((np.asarray(st.aux_cell) < sconfig.grid.num_cells).sum())
    print(f"  C_t={ct} C_w={cw} A={a_cap} Kn={kn} pass={pass_mode}: "
          f"{n_aux} stragglers at init, init overflow={bool(st.grid.overflow)}")
    if bool(st.grid.overflow):
        return
    rollout, energy = make_straggler_sim(
        sconfig, model, dt=0.005, uniform_params=uni, uniform_mass=1.0,
        strag_pass=pass_mode,
    )
    # Numerics: straggler forces vs the wide XLA engine on-device, via a
    # tiny-dt velocity probe (1 leapfrog step at dt=1e-6 ⇒ Δv/dt ≈ f).
    wide_st = rollout.wide_state(st)
    f_ref, _, _ = cell_dense_forces(wide_st, model, sconfig.wide, compute_energy=True)
    fr = np.zeros((n, 3), np.float32)
    ids = np.asarray(wide_st.atom_id).reshape(-1)
    keep = np.asarray(wide_st.valid).reshape(-1)
    fr[ids[keep]] = np.asarray(f_ref).reshape(-1, 3)[keep]
    r_probe, _ = make_straggler_sim(
        sconfig, model, dt=1e-6, uniform_params=uni, uniform_mass=1.0,
        strag_pass=pass_mode,
    )
    outp = r_probe(st, num_steps=1, rebin_every=1)
    _, v0 = gather_straggler_atoms(st, sconfig, n)
    _, v1 = gather_straggler_atoms(outp, sconfig, n)
    fp = (v1 - v0) / 1e-6
    rel = float(np.abs(fp - fr).max()) / max(float(np.abs(fr).max()), 1.0)
    print(f"  force check vs wide XLA (dt-probe): max rel {rel:.2e}")
    pe0 = float(energy(st)[0])

    out = rollout(st, num_steps=600, rebin_every=rebin_every)
    jax.block_until_ready(out.grid.positions)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = rollout(st, num_steps=600, rebin_every=rebin_every)
        jax.block_until_ready(out.grid.positions)
        best = min(best, time.perf_counter() - t0)
    n_aux1 = int((np.asarray(out.aux_cell) < sconfig.grid.num_cells).sum())
    print(
        f"  straggler engine: {best / 600 * 1e3:.3f} ms/step "
        f"({n * 600 / best / 1e6:.1f}M atom-steps/s) overflow={bool(out.grid.overflow)} "
        f"aux after={n_aux1}"
    )
    # Energy drift over the measured window (leapfrog NVE should conserve).
    ke0 = float(energy(st)[2])
    pe_o, _, ke_o = (float(x) for x in energy(out))
    drift = abs((pe_o + ke_o) - (pe0 + ke0)) / abs(pe0 + ke0)
    print(f"  NVE rel drift over 600 steps: {drift:.2e}")


if __name__ == "__main__":
    which = sys.argv[1:] or ["occupancy", "force", "step"]
    for w in which:
        print(f"== {w} ==")
        if w.startswith("strag"):
            parts = w.split(":")
            args = [v if v.isalpha() else int(v) for v in parts[1:]]
            probe_strag(*args)
        else:
            {"occupancy": probe_occupancy, "force": probe_force, "step": probe_step}[w]()

"""Device-trace profile of the 100k-atom production step (VERDICT r3 item 6).

Captures a jax.profiler trace of the benchmark configuration's scan block
(force pass + integrator + amortized rebin) on the real TPU, then prints a
per-HLO-op duration summary from the trace — attributing where the measured
step time sits relative to the ~94M atom-steps/s op-model floor
(docs/PERF.md "The 1e8 ceiling question"): Pallas custom-call time vs XLA
glue (ghost build, reaction fold, integrator, rebin rounds) vs inter-op gaps
(scheduling/dispatch).

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_profile.py
Prints JSON lines; the raw trace lands in /tmp/emdee_profile for manual
inspection (tensorboard or trace.json.gz).
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

import numpy as np

TRACE_DIR = "/tmp/emdee_profile"


def run_block(steps=60):
    import jax

    from emdee_tpu.neighbors.cell_dense import (
        cell_dense_init,
        detect_uniform_params,
        make_cell_dense_sim,
        suggest_cell_dense_config,
    )
    from emdee_tpu.potentials.lennard_jones import LennardJonesModel, lennard_jones_atom
    from emdee_tpu.utils.lattice import fcc_lattice, maxwell_boltzmann

    cells = int(round((100_000 / 4) ** (1 / 3)))
    pos, box = fcc_lattice(cells, density=0.8442)
    n = pos.shape[0]
    vel = maxwell_boltzmann(n, 1.44, seed=0)
    model = LennardJonesModel.create(2.5, 2.0)
    params = lennard_jones_atom(np.ones(n), np.ones(n))
    uni = detect_uniform_params(params)
    config = suggest_cell_dense_config(n, box, cutoff=2.5, switch=2.0, skin=0.35)
    state = cell_dense_init(pos, vel, np.ones(n), params, config)
    if os.environ.get("EMDEE_PROFILE_ENGINE", "straggler") == "straggler":
        # r5 production path: C-tight straggler config (bench.py's).
        from emdee_tpu.neighbors.cell_dense_straggler import (
            StragglerConfig,
            gather_straggler_atoms,
            make_straggler_sim,
            straggler_init,
        )
        from emdee_tpu.neighbors.cell_dense import gather_dense_atoms

        rollout0, _ = make_cell_dense_sim(
            config, model, dt=0.005, backend="auto",
            uniform_params=uni, uniform_mass=1.0,
        )
        state = rollout0(state, num_steps=100, rebin_every=2)  # settle
        pos_eq, vel_eq = gather_dense_atoms(state, n)
        sconfig = StragglerConfig(
            grid=config._replace(capacity=config.capacity - 4),
            wide_capacity=config.capacity + 4, aux_capacity=64, kn=16,
        )
        st = straggler_init(pos_eq, vel_eq, np.ones(n), params, sconfig)
        s_roll, _ = make_straggler_sim(
            sconfig, model, dt=0.005, uniform_params=uni, uniform_mass=1.0,
        )
        st = s_roll(st, num_steps=steps, rebin_every=6)  # warm compile
        jax.block_until_ready(st.grid.positions)
        with jax.profiler.trace(TRACE_DIR):
            st = s_roll(st, num_steps=steps, rebin_every=6)
            jax.block_until_ready(st.grid.positions)
        return n, steps
    rollout, _ = make_cell_dense_sim(
        config, model, dt=0.005, backend="auto",
        uniform_params=uni, uniform_mass=1.0,
    )
    state = rollout(state, num_steps=steps, rebin_every=6)  # warm compile
    jax.block_until_ready(state.positions)
    with jax.profiler.trace(TRACE_DIR):
        state = rollout(state, num_steps=steps, rebin_every=6)
        jax.block_until_ready(state.positions)
    return n, steps


def summarize(n, steps):
    paths = sorted(glob.glob(f"{TRACE_DIR}/plugins/profile/*/*.trace.json.gz"))
    if not paths:
        print(json.dumps({"error": "no trace found"}))
        return
    with gzip.open(paths[-1]) as f:
        t = json.load(f)
    ev = t["traceEvents"]
    pids = {
        e["pid"]: e["args"].get("name")
        for e in ev
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    dev_pids = {p for p, name in pids.items() if name and "TPU" in name}
    # tid 2 carries the executable-level spans; higher tids the HLO ops.
    ops = [e for e in ev if e.get("ph") == "X" and e.get("pid") in dev_pids]
    if not ops:
        print(json.dumps({"error": "no device events"}))
        return
    hlo_all = [e for e in ops if not str(e.get("name", "")).startswith("jit_")]
    top = [e for e in ops if str(e.get("name", "")).startswith("jit_")]
    # LEAF ops only: container spans (while bodies, closed_call, inlined
    # computation calls) enclose their children on the same tid — counting
    # them double-books every nested op (the straggler rollout's nested
    # scans made this visible; the r4 path had no container spans).
    hlo = []
    by_tid = defaultdict(list)
    for e in hlo_all:
        by_tid[(e.get("pid"), e.get("tid"))].append(e)
    for evs in by_tid.values():
        evs.sort(key=lambda e: (e["ts"], -e["dur"]))
        stack = []
        has_child = [False] * len(evs)
        for i, e in enumerate(evs):
            while stack and evs[stack[-1]]["ts"] + evs[stack[-1]]["dur"] <= e["ts"]:
                stack.pop()
            if stack:
                has_child[stack[-1]] = True
            stack.append(i)
        hlo.extend(e for i, e in enumerate(evs) if not has_child[i])
    by_name = defaultdict(float)
    for e in hlo:
        by_name[e["name"]] += e["dur"]
    total_hlo = sum(by_name.values())
    total_exec = sum(e["dur"] for e in top)
    # The scan block is one executable; gaps = executable span − Σ op time.
    print(json.dumps({
        "variant": "profile_100k",
        "steps": steps,
        "executable_ms_total": round(total_exec / 1e3, 3),
        "hlo_ops_ms_total": round(total_hlo / 1e3, 3),
        "gap_ms_total": round((total_exec - total_hlo) / 1e3, 3),
        "per_step_ms": round(total_exec / steps / 1e3, 4),
    }), flush=True)
    for name, dur in sorted(by_name.items(), key=lambda kv: -kv[1])[:18]:
        print(json.dumps({
            "op": name[:90],
            "ms_total": round(dur / 1e3, 3),
            "ms_per_step": round(dur / steps / 1e3, 4),
            "pct_of_ops": round(100 * dur / total_hlo, 1),
        }), flush=True)


if __name__ == "__main__":
    os.makedirs(TRACE_DIR, exist_ok=True)
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    n, steps = run_block(steps)
    summarize(n, steps)

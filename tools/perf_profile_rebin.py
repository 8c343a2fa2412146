"""Device-trace profile of the 1M-atom shift rebin (VERDICT r3 item 1b).

Captures a jax.profiler trace of a scan over `_rebin_shift` at the 1M-atom
configuration (M=37, C=32) and prints the per-HLO-op duration summary —
attributing the measured ~13 ms/rebin to window concats, log-shift
roll/select rounds, rank matmuls, spill logic, or scheduling gaps, so the
fused-kernel attack targets the real cost.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_profile_rebin.py [natoms]
Prints JSON lines; raw trace in /tmp/emdee_profile_rebin.
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

import numpy as np

TRACE_DIR = "/tmp/emdee_profile_rebin"


def run_block(n=1_000_000, iters=30):
    import jax
    import jax.numpy as jnp

    from emdee_tpu.neighbors.cell_dense import (
        _rebin_shift,
        cell_dense_init,
        suggest_cell_dense_config,
    )
    from emdee_tpu.potentials.lennard_jones import lennard_jones_atom
    from emdee_tpu.utils.lattice import fcc_lattice, maxwell_boltzmann

    cells = int(round((n / 4) ** (1 / 3)))
    pos, L = fcc_lattice(cells, density=0.8442)
    n = pos.shape[0]
    vel = maxwell_boltzmann(n, 1.44, seed=4)
    params = lennard_jones_atom(np.ones(n), np.ones(n))
    config = suggest_cell_dense_config(n, L, cutoff=2.5, switch=2.0, skin=0.35)
    st = cell_dense_init(pos, vel, np.ones(n), params, config)
    uni = (0.5, 2.0)

    @jax.jit
    def scan(s):
        def body(carry, _):
            return _rebin_shift(carry, config, uniform_params=uni, uniform_mass=1.0), None

        s, _ = jax.lax.scan(body, s, jnp.arange(iters))
        return s

    out = scan(st)
    jax.block_until_ready(out.positions)
    with jax.profiler.trace(TRACE_DIR):
        out = scan(out)
        jax.block_until_ready(out.positions)
    return n, iters


def summarize(n, iters):
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
    ops = [e for e in ev if e.get("ph") == "X" and e.get("pid") in dev_pids]
    if not ops:
        print(json.dumps({"error": "no device events"}))
        return
    hlo = [e for e in ops if not str(e.get("name", "")).startswith("jit_")]
    top = [e for e in ops if str(e.get("name", "")).startswith("jit_")]
    by_name = defaultdict(float)
    for e in hlo:
        by_name[e["name"]] += e["dur"]
    total_hlo = sum(by_name.values())
    total_exec = sum(e["dur"] for e in top)
    print(json.dumps({
        "variant": f"profile_rebin_{n}",
        "iters": iters,
        "executable_ms_total": round(total_exec / 1e3, 3),
        "hlo_ops_ms_total": round(total_hlo / 1e3, 3),
        "gap_ms_total": round((total_exec - total_hlo) / 1e3, 3),
        "per_rebin_ms": round(total_exec / iters / 1e3, 4),
    }), flush=True)
    for name, dur in sorted(by_name.items(), key=lambda kv: -kv[1])[:24]:
        print(json.dumps({
            "op": name[:100],
            "ms_per_rebin": round(dur / iters / 1e3, 4),
            "pct_of_ops": round(100 * dur / total_hlo, 1),
        }), flush=True)


if __name__ == "__main__":
    os.makedirs(TRACE_DIR, exist_ok=True)
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n, iters = run_block(n)
    summarize(n, iters)
